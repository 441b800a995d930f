"""ONNX weight import without the onnx package.

The reference ships its production models as ONNX graphs
(`/root/reference/.MISSING_LARGE_BLOBS:2-3`, XMM-SuperRes.onnx /
XMM-DeNoise.onnx, consumed via onnxruntime in
`utils/run_inference_on_file.py:42-48`). Neither onnx nor onnxruntime is
available here, and an ONNX ModelProto is just protobuf — so this module
parses the wire format directly and lifts the initializers onto the Flax
parameter pytree:

  * minimal protobuf reader (varint / length-delimited) for
    ModelProto -> GraphProto -> TensorProto fields,
  * torch->flax name normalization for the RRDB models
    (conv "weight" (O, I, kh, kw) -> HWIO kernel via (2, 3, 1, 0) transpose),
  * shape-aware fallback matching by graph order for unrecognized names.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import jax
import numpy as np

# --------------------------------------------------------------------------- #
# Protobuf wire-format reader
# --------------------------------------------------------------------------- #


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, Union[int, bytes]]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wtype = key >> 3, key & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"Unsupported wire type {wtype}")
        yield field, wtype, val


_ONNX_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    6: np.int32,
    7: np.int64,
    10: np.float16,
    11: np.float64,
}


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    """TensorProto -> (name, array)."""
    dims: List[int] = []
    data_type = 1
    name = ""
    raw: Optional[bytes] = None
    float_data: List[float] = []
    int64_data: List[int] = []
    for field, wtype, val in _iter_fields(buf):
        if field == 1:
            if wtype == 0:
                dims.append(val)
            else:  # packed
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    dims.append(v)
        elif field == 2:
            data_type = val
        elif field == 4:
            if wtype == 2:
                float_data.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                float_data.append(struct.unpack("<f", val)[0])
        elif field == 7:
            if wtype == 2:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    int64_data.append(v)
            else:
                int64_data.append(val)
        elif field == 8:
            name = val.decode("utf-8")
        elif field == 9:
            raw = val

    dtype = _ONNX_DTYPES.get(data_type, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif float_data:
        arr = np.asarray(float_data, np.float32)
    elif int64_data:
        arr = np.asarray(int64_data, np.int64)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims) if dims else arr


def read_onnx_initializers(path: Union[str, Path, bytes]) -> Dict[str, np.ndarray]:
    """All graph initializers of an ONNX file, in graph order."""
    blob = path if isinstance(path, bytes) else Path(path).read_bytes()
    out: Dict[str, np.ndarray] = {}
    for field, wtype, val in _iter_fields(blob):  # ModelProto
        if field == 7 and wtype == 2:  # graph: GraphProto
            for gfield, gw, gval in _iter_fields(val):
                if gfield == 5 and gw == 2:  # initializer: TensorProto
                    name, arr = _parse_tensor(gval)
                    out[name] = arr
    return out


# --------------------------------------------------------------------------- #
# Mapping onto Flax pytrees
# --------------------------------------------------------------------------- #


def _flax_path(keypath) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in keypath)


def _normalize_torch_name(name: str) -> str:
    """torch state-dict name -> flax RRDB path (rrdb.py module names).

    conv_first.weight        -> trunk/conv_first/kernel
    rrdb.0.RDB1.conv1.weight -> trunk/rrdb_0/RDB1/conv1/kernel
    trunk_conv.weight        -> trunk/trunk_conv/kernel
    upsampling.0.weight      -> upconv_0/kernel (Sequential stride of 3:
                                conv, lrelu, pixelshuffle per stage)
    """
    for prefix in ("model.", "module.", "net."):
        if name.startswith(prefix):
            name = name[len(prefix) :]
    parts = name.split(".")
    leaf = {"weight": "kernel", "bias": "bias"}.get(parts[-1], parts[-1])
    mods = parts[:-1]
    out: List[str] = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m in ("conv_first", "trunk_conv"):
            out.extend(["trunk", m])
        elif m == "rrdb" and i + 1 < len(mods) and mods[i + 1].isdigit():
            out.extend(["trunk", f"rrdb_{mods[i + 1]}"])
            i += 1
        elif m == "upsampling" and i + 1 < len(mods) and mods[i + 1].isdigit():
            out.append(f"upconv_{int(mods[i + 1]) // 3}")
            i += 1
        else:
            out.append(m)
        i += 1
    return "/".join(out + [leaf])


def import_onnx_params(
    onnx_path: Union[str, Path], params_template: Any
) -> Any:
    """Initializers -> Flax params, NCHW->HWIO transposed.

    Name-matched first (torch export conventions); any leftovers are matched
    by (transposed) shape in graph order — robust to exporter renamings like
    `onnx::Conv_123`.
    """
    inits = read_onnx_initializers(onnx_path)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    targets = [( _flax_path(kp), leaf) for kp, leaf in flat]
    assigned: Dict[int, np.ndarray] = {}
    used = set()

    def _converted(arr: np.ndarray, target_shape) -> Optional[np.ndarray]:
        if arr.ndim == 4 and tuple(arr.transpose(2, 3, 1, 0).shape) == tuple(
            target_shape
        ):
            return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
        if arr.ndim == 2 and tuple(arr.T.shape) == tuple(target_shape) and (
            arr.shape != tuple(target_shape) or arr.shape[0] == arr.shape[1]
        ):
            return np.ascontiguousarray(arr.T)  # torch Linear (out, in) -> (in, out)
        if tuple(arr.shape) == tuple(target_shape):
            return arr
        return None

    # pass 1: by normalized name
    norm_map = {_normalize_torch_name(k): k for k in inits}
    for i, (path, leaf) in enumerate(targets):
        key = norm_map.get(path)
        if key is None:
            continue
        conv = _converted(inits[key], leaf.shape)
        if conv is not None:
            assigned[i] = conv.astype(np.asarray(leaf).dtype)
            used.add(key)

    # pass 2: leftovers by shape in graph order
    leftovers = [k for k in inits if k not in used]
    for i, (path, leaf) in enumerate(targets):
        if i in assigned:
            continue
        for k in leftovers:
            conv = _converted(inits[k], leaf.shape)
            if conv is not None:
                assigned[i] = conv.astype(np.asarray(leaf).dtype)
                leftovers.remove(k)
                break

    missing = [targets[i][0] for i in range(len(targets)) if i not in assigned]
    if missing:
        raise ValueError(
            f"ONNX import could not match {len(missing)} parameters: "
            f"{missing[:5]}..."
        )

    leaves = [assigned[i] for i in range(len(targets))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# --------------------------------------------------------------------------- #
# Writer (testing / export parity without the onnx package)
# --------------------------------------------------------------------------- #


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wtype: int, payload: bytes) -> bytes:
    head = _varint((num << 3) | wtype)
    if wtype == 2:
        return head + _varint(len(payload)) + payload
    return head + payload


def write_onnx_initializers(
    path: Union[str, Path], tensors: Dict[str, np.ndarray]
) -> Path:
    """Minimal ModelProto containing only named float initializers — enough
    to exercise the import path end-to-end in tests."""
    graph = b""
    for name, arr in tensors.items():
        arr = np.asarray(arr, np.float32)
        t = b""
        for d in arr.shape:
            t += _field(1, 0, _varint(d))
        t += _field(2, 0, _varint(1))  # FLOAT
        t += _field(8, 2, name.encode())
        t += _field(9, 2, arr.astype("<f4").tobytes())
        graph += _field(5, 2, t)
    model = _field(7, 2, graph)
    path = Path(path)
    path.write_bytes(model)
    return path


def _flax_to_torch_name(path: str) -> str:
    """Inverse of :func:`_normalize_torch_name` for the RRDB models."""
    parts = path.split("/")
    leaf = {"kernel": "weight", "bias": "bias"}[parts[-1]]
    mods = parts[:-1]
    out: List[str] = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m == "trunk":
            pass  # flattened away in torch naming
        elif m.startswith("rrdb_"):
            out.extend(["rrdb", m.split("_")[1]])
        elif m.startswith("upconv_"):
            out.extend(["upsampling", str(int(m.split("_")[1]) * 3)])
        else:
            out.append(m)
        i += 1
    return ".".join(out + [leaf])


def export_onnx_params(params: Any, path: Union[str, Path]) -> Path:
    """Export a Flax RRDB parameter pytree as ONNX initializers with torch
    state-dict naming (HWIO -> OIHW), interchangeable with the reference's
    shipped checkpoint format."""
    if "params" in params:
        params = params["params"]
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    tensors: Dict[str, np.ndarray] = {}
    for keypath, leaf in flat:
        name = _flax_to_torch_name(_flax_path(keypath))
        arr = np.asarray(leaf)
        if arr.ndim == 4:  # HWIO -> OIHW
            arr = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
        tensors[name] = arr
    return write_onnx_initializers(path, tensors)

"""Minimal ONNX graph executor for the RRDB deployment graphs.

Fills the role of onnxruntime in the reference's ONNX serve path
(`/root/reference/xmm_superres_denoise/utils/run_inference_on_file.py:42-48`)
when onnxruntime is unavailable: parses a ModelProto (wire format, no onnx
package) into nodes + initializers and evaluates the op subset emitted by
`onnx_export.export_rrdb_onnx_model` — Conv, LeakyRelu, Concat, Mul, Add,
DepthToSpace (CRD and DCR), Clip — with XLA doing the convs.

Also the independent validation engine for the exporter: the graph is
executed purely from its own parsed structure (attrs, wiring, initializer
names), never from the Flax model (tests/test_onnx_export.py).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Union

import jax.numpy as jnp
import numpy as np
from jax import lax

from .onnx_import import _iter_fields, _parse_tensor


@dataclass
class OnnxNode:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    name: str = ""
    attrs: Dict[str, object] = field(default_factory=dict)


@dataclass
class OnnxGraph:
    nodes: List[OnnxNode]
    initializers: Dict[str, np.ndarray]
    inputs: List[str]
    outputs: List[str]


def _parse_attr(buf: bytes):
    name, f, i, s, t, ints = "", None, None, None, None, []
    floats: list = []
    for fieldno, wtype, val in _iter_fields(buf):
        if fieldno == 1:
            name = val.decode()
        elif fieldno == 2:
            f = struct.unpack("<f", val)[0]
        elif fieldno == 3:
            i = val
        elif fieldno == 4:
            s = val.decode()
        elif fieldno == 5:
            # t (TensorProto): torch's exporter emits Clip bounds / scalar
            # multipliers as Constant nodes with a tensor `value` attr
            t = _parse_tensor(val)[1]
        elif fieldno == 7:
            if wtype == 5:
                floats.append(struct.unpack("<f", val)[0])
            else:  # packed repeated float: 4-byte little-endian chunks
                floats.extend(
                    struct.unpack(f"<{len(val) // 4}f", val[: len(val) // 4 * 4])
                )
        elif fieldno == 8:
            if wtype == 0:
                ints.append(val)
            else:  # packed
                p = 0
                while p < len(val):
                    b = val[p]
                    v, shift = 0, 0
                    while True:
                        v |= (val[p] & 0x7F) << shift
                        shift += 7
                        p += 1
                        if not val[p - 1] & 0x80:
                            break
                    ints.append(v)
    if ints:
        return name, ints
    if floats:
        return name, floats
    for v in (i, f, s, t):
        if v is not None:
            return name, v
    return name, None


def _parse_node(buf: bytes) -> OnnxNode:
    node = OnnxNode("", [], [])
    for fieldno, _, val in _iter_fields(buf):
        if fieldno == 1:
            node.inputs.append(val.decode())
        elif fieldno == 2:
            node.outputs.append(val.decode())
        elif fieldno == 3:
            node.name = val.decode()
        elif fieldno == 4:
            node.op_type = val.decode()
        elif fieldno == 5:
            k, v = _parse_attr(val)
            node.attrs[k] = v
    return node


def _vi_name(buf: bytes) -> str:
    for fieldno, _, val in _iter_fields(buf):
        if fieldno == 1:
            return val.decode()
    return ""


def read_onnx_model(path: Union[str, Path, bytes]) -> OnnxGraph:
    blob = path if isinstance(path, bytes) else Path(path).read_bytes()
    graph = OnnxGraph([], {}, [], [])
    for fieldno, wtype, val in _iter_fields(blob):  # ModelProto
        if fieldno == 7 and wtype == 2:
            for g, gw, gval in _iter_fields(val):
                if g == 1:
                    graph.nodes.append(_parse_node(gval))
                elif g == 5:
                    name, arr = _parse_tensor(gval)
                    graph.initializers[name] = arr
                elif g == 11:
                    graph.inputs.append(_vi_name(gval))
                elif g == 12:
                    graph.outputs.append(_vi_name(gval))
    return graph


def _depth_to_space(x, block: int, mode: str):
    n, c, h, w = x.shape
    co = c // (block * block)
    if mode == "CRD":  # torch pixel_shuffle ordering
        x = x.reshape(n, co, block, block, h, w)
        x = x.transpose(0, 1, 4, 2, 5, 3)
    else:  # DCR (ONNX default)
        x = x.reshape(n, block, block, co, h, w)
        x = x.transpose(0, 3, 4, 1, 5, 2)
    return x.reshape(n, co, h * block, w * block)


def run_graph(
    graph: OnnxGraph, feeds: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Evaluate the graph on NCHW float inputs; returns the graph outputs."""
    env: Dict[str, np.ndarray] = dict(graph.initializers)
    env.update({k: np.asarray(v, np.float32) for k, v in feeds.items()})

    for node in graph.nodes:
        a = node.attrs
        ins = [env[i] for i in node.inputs]
        if node.op_type == "Conv":
            x, w = jnp.asarray(ins[0]), jnp.asarray(ins[1])
            pads = a.get("pads", [0, 0, 0, 0])
            strides = a.get("strides", [1, 1])
            groups = int(a.get("group", 1))
            dn = lax.conv_dimension_numbers(
                x.shape, w.shape, ("NCHW", "OIHW", "NCHW")
            )
            y = lax.conv_general_dilated(
                x, w, tuple(strides),
                [(pads[0], pads[2]), (pads[1], pads[3])],
                dimension_numbers=dn, feature_group_count=groups,
            )
            if len(ins) > 2:
                y = y + jnp.asarray(ins[2])[None, :, None, None]
            out = np.asarray(y)
        elif node.op_type == "LeakyRelu":
            alpha = float(a.get("alpha", 0.01))
            x = ins[0]
            out = np.where(x >= 0, x, alpha * x).astype(np.float32)
        elif node.op_type == "Relu":
            out = np.maximum(ins[0], 0.0).astype(np.float32)
        elif node.op_type == "Concat":
            out = np.concatenate(ins, axis=int(a.get("axis", 0)))
        elif node.op_type == "Mul":
            out = (ins[0] * ins[1]).astype(np.float32)
        elif node.op_type == "Add":
            out = (ins[0] + ins[1]).astype(np.float32)
        elif node.op_type == "DepthToSpace":
            out = _depth_to_space(
                np.asarray(ins[0]), int(a["blocksize"]), a.get("mode", "DCR")
            )
        elif node.op_type == "Constant":
            # torch legacy exporter (dynamo=False) emits Clip bounds and
            # scalar multipliers as Constant nodes rather than initializers.
            # Exporter paths may use any of the value_* attribute spellings.
            if "value" in a:
                out = np.asarray(a["value"])
            elif "value_float" in a:
                out = np.asarray(a["value_float"], dtype=np.float32)
            elif "value_int" in a:
                out = np.asarray(a["value_int"], dtype=np.int64)
            elif "value_floats" in a:
                out = np.asarray(a["value_floats"], dtype=np.float32)
            elif "value_ints" in a:
                out = np.asarray(a["value_ints"], dtype=np.int64)
            else:
                raise NotImplementedError(
                    "onnx_runtime_lite: Constant node "
                    f"{node.outputs[0]!r} has no supported value attribute "
                    f"(attrs: {sorted(a)})"
                )
        elif node.op_type == "Clip":
            def _scalar(v):
                return float(np.asarray(v).reshape(-1)[0])

            lo = _scalar(ins[1]) if len(ins) > 1 else float(a.get("min", -np.inf))
            hi = _scalar(ins[2]) if len(ins) > 2 else float(a.get("max", np.inf))
            out = np.clip(ins[0], lo, hi).astype(np.float32)
        else:
            raise NotImplementedError(
                f"onnx_runtime_lite: unsupported op {node.op_type!r}"
            )
        env[node.outputs[0]] = out

    return {o: env[o] for o in graph.outputs}

"""HAT OCAB (overlapping cross-attention) vs an independent torch computation."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavyweight numerics; default path runs -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from xmm_superres_denoise_tpu.models.hat import OCAB, rpi_oca


def test_ocab_matches_manual_torch():
    g = np.random.default_rng(0)
    C, nh, H, W, ws = 8, 2, 8, 8, 4
    overlap = 0.5  # owin = 6, (owin - ws) = 2 even
    x = g.normal(size=(1, H * W, C)).astype(np.float32)

    m = OCAB(dim=C, input_resolution=(H, W), window_size=ws,
             overlap_ratio=overlap, num_heads=nh, mlp_ratio=2.0)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), (H, W))
    ours = np.asarray(m.apply(variables, jnp.asarray(x), (H, W)))

    p = variables["params"]
    owin = int(ws * overlap) + ws
    d = C // nh
    scale = d ** -0.5

    def dense(t, node):  # t (..., in)
        return t @ torch.from_numpy(np.asarray(node["kernel"])) + torch.from_numpy(
            np.asarray(node["bias"])
        )

    def ln(t, node):
        return F.layer_norm(
            t, (C,), torch.from_numpy(np.asarray(node["scale"])),
            torch.from_numpy(np.asarray(node["bias"])), eps=1e-5,
        )

    t = torch.from_numpy(x)
    shortcut = t
    t = ln(t, p["norm1"]).view(1, H, W, C)

    qkv = dense(t, p["qkv"])  # (1, H, W, 3C)
    q = qkv[..., :C]
    kv = qkv[..., C:].permute(0, 3, 1, 2)  # (1, 2C, H, W)

    # q windows (non-overlapping)
    qw = q.view(1, H // ws, ws, W // ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    qw = qw.reshape(-1, ws * ws, C)

    # kv windows via unfold
    unf = torch.nn.Unfold(kernel_size=owin, stride=ws, padding=(owin - ws) // 2)
    kvw = unf(kv)  # (1, 2C*owin*owin, nW)
    nW = kvw.shape[-1]
    kvw = kvw.view(1, 2 * C, owin * owin, nW).permute(0, 3, 2, 1).reshape(
        nW, owin * owin, 2 * C
    )
    kw_, vw_ = kvw[..., :C], kvw[..., C:]

    def split_heads(z, n):
        return z.reshape(-1, n, nh, d).permute(0, 2, 1, 3)

    qh = split_heads(qw, ws * ws) * scale
    kh = split_heads(kw_, owin * owin)
    vh = split_heads(vw_, owin * owin)
    attn = qh @ kh.transpose(-2, -1)
    table = torch.from_numpy(np.asarray(p["relative_position_bias_table"]))
    rpi = torch.from_numpy(rpi_oca(ws, overlap).astype(np.int64))
    bias = table[rpi.view(-1)].view(ws * ws, owin * owin, nh).permute(2, 0, 1)
    attn = (attn + bias.unsqueeze(0)).softmax(-1)
    out = (attn @ vh).permute(0, 2, 1, 3).reshape(-1, ws * ws, C)
    out = out.view(1, H // ws, W // ws, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    out = out.reshape(1, H * W, C)
    t2 = dense(out, p["proj"]) + shortcut

    # MLP tail
    y = ln(t2, p["norm2"])
    y = dense(y, p["mlp"]["fc1"])
    y = F.gelu(y)
    y = dense(y, p["mlp"]["fc2"])
    ref = (t2 + y).numpy()

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

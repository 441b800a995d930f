"""DRCT RDG vs an independent torch computation (incl. the fixed residual).

The reference RDG returns its input unchanged (drct.py:200-203, SURVEY.md
§2.4); this framework returns x5*0.2 + x per the upstream DRCT intent — the
torch reference below implements the FIXED semantics.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavyweight numerics; default path runs -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from xmm_superres_denoise_tpu.models.drct import RDG
from xmm_superres_denoise_tpu.models.swin_common import (
    relative_position_index,
    shifted_window_mask,
)


def _dense(t, node):
    return t @ torch.from_numpy(np.asarray(node["kernel"])) + torch.from_numpy(
        np.asarray(node["bias"])
    )


def _ln(t, node, c):
    return F.layer_norm(
        t, (c,), torch.from_numpy(np.asarray(node["scale"])),
        torch.from_numpy(np.asarray(node["bias"])), eps=1e-5,
    )


def _swin_block(t, node, h, w, c, heads, ws, shift, mlp_ratio):
    b = t.shape[0]
    shortcut = t
    x = _ln(t, node["norm1"], c).view(b, h, w, c)
    if shift:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    xw = x.view(b, h // ws, ws, w // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(-1, ws * ws, c)
    attn_p = node["attn"]
    qkv = _dense(xw, attn_p["qkv"])
    b_, n, _ = qkv.shape
    d = c // heads
    qkv = qkv.reshape(b_, n, 3, heads, d).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * d**-0.5, qkv[1], qkv[2]
    a = q @ k.transpose(-2, -1)
    table = torch.from_numpy(np.asarray(attn_p["relative_position_bias_table"]))
    rpi = torch.from_numpy(relative_position_index(ws, ws).astype(np.int64))
    a = a + table[rpi.view(-1)].view(n, n, heads).permute(2, 0, 1).unsqueeze(0)
    mask_np = shifted_window_mask(h, w, ws, shift)
    if mask_np is not None:
        mask = torch.from_numpy(mask_np)
        nW = mask.shape[0]
        a = a.view(b_ // nW, nW, heads, n, n) + mask.unsqueeze(1).unsqueeze(0)
        a = a.view(-1, heads, n, n)
    a = a.softmax(-1)
    xw = (a @ v).transpose(1, 2).reshape(b_, n, c)
    xw = _dense(xw, attn_p["proj"])
    xw = xw.view(b, h // ws, w // ws, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
    x = xw.reshape(b, h, w, c)
    if shift:
        x = torch.roll(x, (shift, shift), dims=(1, 2))
    t = shortcut + x.reshape(b, h * w, c)
    y = _ln(t, node["norm2"], c)
    y = F.gelu(_dense(y, node["mlp"]["fc1"]))
    y = _dense(y, node["mlp"]["fc2"])
    return t + y


def _conv1x1(t, node, h, w):
    b, l, cin = t.shape
    img = t.view(b, h, w, cin)
    wk = torch.from_numpy(np.asarray(node["kernel"]))[0, 0]  # (I, O)
    out = img @ wk + torch.from_numpy(np.asarray(node["bias"]))
    return out.reshape(b, h * w, -1)


def test_rdg_matches_manual_torch():
    dim, gc, nh, ws, h, w = 8, 4, 2, 4, 8, 8
    g = np.random.default_rng(2)
    x = g.normal(size=(1, h * w, dim)).astype(np.float32)
    m = RDG(dim=dim, input_resolution=(h, w), num_heads=nh, window_size=ws,
            mlp_ratio=2.0, gc=gc)
    variables = m.init(jax.random.PRNGKey(2), jnp.asarray(x), (h, w))
    ours = np.asarray(m.apply(variables, jnp.asarray(x), (h, w)))

    p = variables["params"]
    t = torch.from_numpy(x)

    def heads_for(channels, i):
        return nh if i == 1 or channels % nh == 0 else nh - (channels % nh)

    lrelu = lambda z: F.leaky_relu(z, 0.2)
    # block 1 (shift 0, mlp 2.0)
    c1 = dim
    y = _swin_block(t, p["swin1"], h, w, c1, heads_for(c1, 1), ws, 0, 2.0)
    x1 = lrelu(_conv1x1(y, p["adjust1"], h, w))
    cat1 = torch.cat([x1, t], dim=-1)
    # block 2 (shift ws//2 -> clamped? input_res (8,8) > ws 4 -> shift 2)
    c2 = dim + gc
    y = _swin_block(cat1, p["swin2"], h, w, c2, heads_for(c2, 2), ws, 2, 2.0)
    x2 = lrelu(_conv1x1(y, p["adjust2"], h, w))
    cat2 = torch.cat([cat1, x2], dim=-1)
    c3 = dim + 2 * gc
    y = _swin_block(cat2, p["swin3"], h, w, c3, heads_for(c3, 3), ws, 0, 2.0)
    x3 = lrelu(_conv1x1(y, p["adjust3"], h, w))
    cat3 = torch.cat([cat2, x3], dim=-1)
    c4 = dim + 3 * gc
    y = _swin_block(cat3, p["swin4"], h, w, c4, heads_for(c4, 4), ws, 2, 1.0)
    x4 = lrelu(_conv1x1(y, p["adjust4"], h, w))
    cat4 = torch.cat([cat3, x4], dim=-1)
    c5 = dim + 4 * gc
    y = _swin_block(cat4, p["swin5"], h, w, c5, heads_for(c5, 5), ws, 0, 1.0)
    x5 = _conv1x1(y, p["adjust5"], h, w)
    ref = (x5 * 0.2 + t).numpy()

    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-5)

"""Restormer building blocks vs independent torch computations."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavyweight numerics; default path runs -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from xmm_superres_denoise_tpu.models.restormer import ChannelLayerNorm, MDTA


def test_channel_layernorm_matches_torch_formula():
    """WithBias variant: (x - mu) / sqrt(var + 1e-5) * w + b over channels
    with BIASED variance (restormer.py:42-58)."""
    g = np.random.default_rng(0)
    x = g.normal(size=(2, 5, 7, 16)).astype(np.float32)
    m = ChannelLayerNorm(16)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial affine
    v = {"params": {"weight": jnp.asarray(g.normal(size=(16,)), jnp.float32),
                    "bias": jnp.asarray(g.normal(size=(16,)), jnp.float32)}}
    ours = np.asarray(m.apply(v, jnp.asarray(x)))

    t = torch.from_numpy(x)
    mu = t.mean(-1, keepdim=True)
    var = t.var(-1, keepdim=True, unbiased=False)
    ref = (t - mu) / torch.sqrt(var + 1e-5)
    ref = ref * torch.from_numpy(np.asarray(v["params"]["weight"]))
    ref = ref + torch.from_numpy(np.asarray(v["params"]["bias"]))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_mdta_matches_manual_torch():
    """Transposed channel attention with L2-normalized q/k and learned
    temperature (restormer.py:106-147), cross-checked from the Flax params."""
    g = np.random.default_rng(1)
    C, nh, H, W = 8, 2, 6, 5
    x = g.normal(size=(1, H, W, C)).astype(np.float32)
    m = MDTA(C, nh, use_bias=True)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW

    def conv1x1(t, node):
        wk = torch.from_numpy(np.asarray(node["kernel"]))  # (1,1,I,O)
        w = wk[0, 0].T.unsqueeze(-1).unsqueeze(-1)  # (O,I,1,1)
        b = torch.from_numpy(np.asarray(node["bias"]))
        return F.conv2d(t, w, b)

    def dwconv3x3(t, node):
        wk = torch.from_numpy(np.asarray(node["kernel"]))  # (3,3,1,O)
        w = wk.permute(3, 2, 0, 1)  # (O,1,3,3)
        b = torch.from_numpy(np.asarray(node["bias"]))
        return F.conv2d(t, w, b, padding=1, groups=t.shape[1])

    qkv = dwconv3x3(conv1x1(xt, p["qkv"]), p["qkv_dwconv"])
    q, k, v = qkv.chunk(3, dim=1)
    d = C // nh

    def heads(t):
        return t.reshape(1, nh, d, H * W)

    q, k, v = heads(q), heads(k), heads(v)
    q = F.normalize(q, dim=-1)
    k = F.normalize(k, dim=-1)
    temp = torch.from_numpy(np.asarray(p["temperature"]))
    attn = (q @ k.transpose(-2, -1)) * temp
    attn = attn.softmax(dim=-1)
    out = attn @ v  # (1, nh, d, HW)
    out = out.reshape(1, C, H, W)
    ref = conv1x1(out, p["project_out"]).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

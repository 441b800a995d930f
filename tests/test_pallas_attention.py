"""Fused attention-core kernel vs the XLA path (interpret mode on CPU)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavyweight numerics; default path runs -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.models.swin_common import (
    WindowAttention,
    set_pallas_attention,
    shifted_window_mask,
)
from xmm_superres_denoise_tpu.ops.pallas_attention import attention_core_pallas


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    set_pallas_attention(None)


def _attn(n_windows=4, ws=4, c=16, heads=2, seed=0):
    n = ws * ws
    g = np.random.default_rng(seed)
    x = jnp.asarray(g.normal(size=(n_windows, n, c)), jnp.float32)
    attn = WindowAttention(c, (ws, ws), heads)
    variables = attn.init(jax.random.PRNGKey(seed), x)
    return x, attn, variables


def test_attention_core_matches_einsum_path():
    x, attn, variables = _attn()
    ref = attn.apply(variables, x)

    # Force the fused branch (interpret mode via monkeypatched pallas flag)
    import xmm_superres_denoise_tpu.ops.pallas_attention as pa

    orig = pa.attention_core_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pa.attention_core_pallas = interp
    try:
        set_pallas_attention(True)
        out = attn.apply(variables, x)
    finally:
        pa.attention_core_pallas = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_attention_core_with_mask():
    ws, c, heads = 4, 16, 2
    x, attn, variables = _attn(n_windows=8, ws=ws, c=c, heads=heads, seed=1)
    mask = jnp.asarray(shifted_window_mask(8, 8, ws, 2))  # 4 windows/image
    ref = attn.apply(variables, x, mask)

    import xmm_superres_denoise_tpu.ops.pallas_attention as pa

    orig = pa.attention_core_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pa.attention_core_pallas = interp
    try:
        set_pallas_attention(True)
        out = attn.apply(variables, x, mask)
    finally:
        pa.attention_core_pallas = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_direct():
    g = np.random.default_rng(2)
    G, n, c, nh = 4, 16, 8, 2
    qkv = jnp.asarray(g.normal(size=(G, n, 3 * c)), jnp.float32)
    bias = jnp.asarray(g.normal(size=(nh, n, n)) * 0.1, jnp.float32)
    out = attention_core_pallas(
        qkv, bias, num_heads=nh, scale=0.5, group=2, interpret=True
    )
    assert out.shape == (G, n, c)
    # manual reference
    q = qkv.reshape(G, n, 3, nh, c // nh)[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv.reshape(G, n, 3, nh, c // nh)[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv.reshape(G, n, 3, nh, c // nh)[:, :, 2].transpose(0, 2, 1, 3)
    attn = jnp.einsum("ghnd,ghmd->ghnm", q * 0.5, k) + bias[None]
    attn = jax.nn.softmax(attn, axis=-1)
    ref = jnp.einsum("ghnm,ghmd->ghnd", attn, v).transpose(0, 2, 1, 3).reshape(G, n, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

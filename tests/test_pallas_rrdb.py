"""Fused Pallas dense-block kernel + S2D transform (interpret mode on CPU)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavyweight numerics; default path runs -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from xmm_superres_denoise_tpu.models import GeneratorRRDB_DN, GeneratorRRDB_SR
from xmm_superres_denoise_tpu.models.rrdb import ResidualDenseBlock5C
from xmm_superres_denoise_tpu.ops.pallas_rrdb import (
    dense_block_pallas,
    make_fast_rrdb_forward,
)
from xmm_superres_denoise_tpu.ops.space_to_depth import d2s, s2d, s2d_conv_weights


def _weights(C, seed=0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    ws = []
    for j in range(1, 6):
        ws.append(jnp.asarray(g.normal(size=(3, 3, C * j, C)) * 0.05, dtype))
        ws.append(jnp.asarray(g.normal(size=(C,)) * 0.05, dtype))
    return ws


def _ref_block(C, ws, x):
    m = ResidualDenseBlock5C(C, C)
    params = {
        "params": {
            f"conv{j}": {"kernel": ws[2 * (j - 1)], "bias": ws[2 * (j - 1) + 1]}
            for j in range(1, 6)
        }
    }
    return m.apply(params, x)


def test_s2d_conv_transform_exact():
    g = np.random.default_rng(1)
    x = jnp.asarray(g.normal(size=(2, 12, 16, 3)), jnp.float32)
    w = g.normal(size=(3, 3, 3, 5)).astype(np.float32)
    b = g.normal(size=(5,)).astype(np.float32)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn
    ) + b
    w2, b2 = s2d_conv_weights(w, b)
    xs = s2d(x)
    dn2 = lax.conv_dimension_numbers(xs.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    ys = lax.conv_general_dilated(
        xs, jnp.asarray(w2), (1, 1), "SAME", dimension_numbers=dn2
    ) + b2
    np.testing.assert_allclose(np.asarray(d2s(ys)), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 4)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(d2s(s2d(x))), np.asarray(x))


@pytest.mark.parametrize("shape,tile", [((2, 16, 16, 8), (8, 8)), ((1, 13, 21, 8), (8, 8))])
def test_dense_block_pallas_matches_flax(shape, tile):
    C = shape[-1]
    ws = _weights(C)
    x = jnp.asarray(np.random.default_rng(3).normal(size=shape), jnp.float32)
    y = dense_block_pallas(x, *ws, tile=tile, interpret=True)
    ref = _ref_block(C, ws, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fast_forward_matches_model():
    g = np.random.default_rng(4)
    for cls, kw in ((GeneratorRRDB_DN, {}), (GeneratorRRDB_SR, dict(num_upsample=1))):
        m = cls(num_filters=8, num_res_blocks=2, **kw)
        x = jnp.asarray(g.uniform(0, 1, (1, 32, 32, 1)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(params, x)
        fast = make_fast_rrdb_forward(
            m, params, dtype=jnp.float32, tile=(16, 16), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(fast(x)), np.asarray(ref), rtol=1e-5, atol=2e-5
        )

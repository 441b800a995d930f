"""Exactness of the whole-forward S2D pipelines vs the Flax graphs.

The S2D conv transform is exact (structural-zero kernel expansion,
tests/test_pallas_rrdb.py); these tests assert the FULL composed forwards
(trunk + heads + clips + skips) agree with `model.apply` in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.models import GeneratorRRDB_DN, GeneratorRRDB_SR
from xmm_superres_denoise_tpu.ops.s2d_forward import (
    make_s2d_dn_forward,
    make_s2d_sr_forward,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, shape), jnp.float32
    )


@pytest.mark.parametrize("nf,nb,hw", [(8, 1, 16), (32, 4, 32)])
def test_s2d_sr_forward_matches_flax(nf, nb, hw):
    model = GeneratorRRDB_SR(
        in_channels=1, out_channels=1, num_filters=nf, num_res_blocks=nb,
        num_upsample=1,
    )
    x = _rand((2, hw, hw, 1), seed=1)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    ref = jnp.clip(model.apply(params, x), 0.0, 1.0)
    fwd = make_s2d_sr_forward(model, params, dtype=jnp.float32)
    got = fwd(x)
    assert got.shape == ref.shape == (2, 2 * hw, 2 * hw, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_s2d_dn_forward_matches_flax():
    model = GeneratorRRDB_DN(
        in_channels=1, out_channels=1, num_filters=8, num_res_blocks=2,
    )
    x = _rand((2, 16, 16, 1), seed=2)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    ref = jnp.clip(model.apply(params, x), 0.0, 1.0)
    fwd = make_s2d_dn_forward(model, params, dtype=jnp.float32)
    got = fwd(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_s2d_sr_forward_bf16_close():
    """bf16 serving path stays within serving tolerance of the f32 graph."""
    model = GeneratorRRDB_SR(num_filters=8, num_res_blocks=1, num_upsample=1)
    x = _rand((1, 16, 16, 1), seed=3)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = jnp.clip(model.apply(params, x), 0.0, 1.0)
    got = make_s2d_sr_forward(model, params, dtype=jnp.bfloat16)(x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.05
    )

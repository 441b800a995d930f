"""RRDB model family: shapes, ranges, pixel-shuffle parity with torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from xmm_superres_denoise_tpu.models import (
    GeneratorRRDB_DN,
    GeneratorRRDB_SR,
    pixel_shuffle,
    pixel_unshuffle,
)


def test_pixel_shuffle_matches_torch():
    x = np.random.default_rng(0).normal(size=(2, 8, 5, 7)).astype(np.float32)  # NCHW
    ref = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # (2, 2, 10, 14)
    ours = np.asarray(
        pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6, 6, 12)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pixel_unshuffle(pixel_shuffle(x, 2), 2)), np.asarray(x), rtol=1e-6
    )


def test_dn_shapes_and_range():
    model = GeneratorRRDB_DN(num_filters=8, num_res_blocks=1)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2, 64, 64, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 64, 64, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_sr_shapes_and_range():
    model = GeneratorRRDB_SR(num_filters=8, num_res_blocks=1, num_upsample=1)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 64, 64, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_sr_two_stage_upsample():
    model = GeneratorRRDB_SR(num_filters=4, num_res_blocks=1, num_upsample=2)
    x = jnp.zeros((1, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 64, 64, 1)


def test_memory_efficient_same_output():
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (1, 32, 32, 1)), jnp.float32)
    m1 = GeneratorRRDB_DN(num_filters=8, num_res_blocks=2, memory_efficient=False)
    m2 = GeneratorRRDB_DN(num_filters=8, num_res_blocks=2, memory_efficient=True)
    p = m1.init(jax.random.PRNGKey(5), x)
    y1 = m1.apply(p, x)
    y2 = m2.apply(p, x)  # remat must not change numerics
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_jit_grad_flow():
    model = GeneratorRRDB_DN(num_filters=4, num_res_blocks=1)
    x = jnp.ones((1, 16, 16, 1)) * 0.25
    params = model.init(jax.random.PRNGKey(6), x)

    @jax.jit
    def loss_fn(p):
        return jnp.mean((model.apply(p, x) - 0.5) ** 2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)
    assert any(float(jnp.abs(t).max()) > 0 for t in flat)


def test_registry_upscale_power_of_two():
    """esr_gen stage count must be log2(scale): the reference's
    int(scale/2) coincides at 2x/4x but built a 16x model for an 8x
    config; non-power-of-two scales must be rejected at build time."""
    import jax
    import jax.numpy as jnp
    import pytest

    from xmm_superres_denoise_tpu.config import (
        ModelCfg, OptimizerCfg, RrdbCfg,
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    def cfg():
        return ModelCfg(
            name="esr_gen", memory_efficient=False, batch_size=1,
            model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
            optimizer=OptimizerCfg(learning_rate=1e-4),
        )

    # 8x builds THREE x2 stages and outputs 8x (int(8/2)=4 gave 16x)
    m8 = build_model(cfg(), (16, 16), (128, 128))
    x = jnp.zeros((1, 16, 16, 1))
    y = m8.apply(m8.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 128, 128, 1)

    with pytest.raises(ValueError, match="power-of-two"):
        build_model(cfg(), (16, 16), (96, 96))  # 6x
    with pytest.raises(ValueError, match="power-of-two"):
        build_model(cfg(), (16, 16), (16, 16))  # 1x (SR needs >= 2)

"""S2D training fast path: value AND gradient parity with the plain apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.models import GeneratorRRDB_DN, GeneratorRRDB_SR
from xmm_superres_denoise_tpu.ops.s2d_forward import make_s2d_train_apply
from xmm_superres_denoise_tpu.ops.space_to_depth import (
    s2d_conv_weights,
    s2d_conv_weights_jnp,
)


def test_jnp_weight_transform_matches_numpy():
    g = np.random.default_rng(0)
    w = g.normal(size=(3, 3, 5, 7)).astype(np.float32)
    b = g.normal(size=(7,)).astype(np.float32)
    w2n, b2n = s2d_conv_weights(w, b)
    w2j, b2j = s2d_conv_weights_jnp(jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(w2j), w2n, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2j), b2n, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cls", [GeneratorRRDB_SR, GeneratorRRDB_DN])
def test_s2d_train_apply_value_and_grad_parity(cls):
    kw = dict(in_channels=1, out_channels=1, num_filters=8, num_res_blocks=1)
    if cls is GeneratorRRDB_SR:
        kw["num_upsample"] = 1
    model = cls(**kw)
    g = np.random.default_rng(1)
    x = jnp.asarray(g.uniform(0, 1, (2, 16, 16, 1)), jnp.float32)
    tgt_mult = 2 if cls is GeneratorRRDB_SR else 1
    y = jnp.asarray(
        g.uniform(0, 1, (2, 16 * tgt_mult, 16 * tgt_mult, 1)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x[:1])
    apply_s2d = make_s2d_train_apply(model)

    def loss_plain(p):
        return jnp.mean((jnp.clip(model.apply(p, x), 0, 1) - y) ** 2)

    def loss_s2d(p):
        return jnp.mean((apply_s2d(p, x) - y) ** 2)

    l1, g1 = jax.value_and_grad(loss_plain)(params)
    l2, g2 = jax.value_and_grad(loss_s2d)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_trainer_wires_s2d_train(tmp_path):
    """ModelCfg.s2d_train routes the trainer's apply through the S2D path,
    and one boring-dataset train step decreases finite loss."""
    from xmm_superres_denoise_tpu.config.schema import (
        DatasetCfg,
        HrDatasetCfg,
        LossCfg,
        LrDatasetCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
        TrainerCfg,
    )
    from xmm_superres_denoise_tpu.data.datamodule import XmmDataModule
    from xmm_superres_denoise_tpu.train.loop import Trainer
    from xmm_superres_denoise_tpu.train.loss import create_loss

    ds = DatasetCfg(
        directory=tmp_path, scaling="sqrt", type="boring", batch_size=4,
        debug=True, name="boring_s2d",
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=32),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=64),
    )
    mc = ModelCfg(
        name="esr_gen", memory_efficient=False, batch_size=4, s2d_train=True,
        model=RrdbCfg(base_model="esr_gen", filters=8, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    tc = TrainerCfg(epochs=1, checkpoint_root=tmp_path / "ckpt")
    dm = XmmDataModule(ds, splits_root=tmp_path / "splits", boring_size=16)
    trainer = Trainer(mc, tc, dm, create_loss(None, LossCfg(l1=1.0)),
                      metric_names=["l1"])
    state = trainer.init_state()
    batch = next(iter(trainer.dm.loader("train", mesh=trainer.mesh)))
    state2, loss = trainer._train_step(state, batch)
    assert np.isfinite(float(loss))


def test_trainer_rejects_s2d_train_for_transformers(tmp_path):
    from xmm_superres_denoise_tpu.config.schema import (
        DatasetCfg,
        HrDatasetCfg,
        LossCfg,
        LrDatasetCfg,
        ModelCfg,
        OptimizerCfg,
        TrainerCfg,
        TransformerCfg,
    )
    from xmm_superres_denoise_tpu.data.datamodule import XmmDataModule
    from xmm_superres_denoise_tpu.train.loop import Trainer
    from xmm_superres_denoise_tpu.train.loss import create_loss

    ds = DatasetCfg(
        directory=tmp_path, scaling="sqrt", type="boring", batch_size=2,
        debug=True, name="boring_s2d_rej",
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=32),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=64),
    )
    mc = ModelCfg(
        name="swinir", memory_efficient=False, batch_size=2, s2d_train=True,
        model=TransformerCfg(
            base_model="swinir", img_size=32, window_size=8, patch_size=1,
            embed_dim=16, depths=[2], num_heads=[2], mlp_ratio=2.0,
            upsampler="pixelshuffle",
        ),
        optimizer=OptimizerCfg(learning_rate=2e-4),
    )
    tc = TrainerCfg(epochs=1, checkpoint_root=tmp_path / "ckpt")
    dm = XmmDataModule(ds, splits_root=tmp_path / "splits", boring_size=8)
    with pytest.raises(ValueError, match="RRDB"):
        Trainer(mc, tc, dm, create_loss(None, LossCfg(l1=1.0)))


def test_s2d_train_apply_remat_parity():
    """remat=True (per-dense-block jax.checkpoint) preserves values/grads."""
    model = GeneratorRRDB_SR(in_channels=1, out_channels=1, num_filters=8,
                             num_res_blocks=1, num_upsample=1)
    g = np.random.default_rng(2)
    x = jnp.asarray(g.uniform(0, 1, (2, 16, 16, 1)), jnp.float32)
    y = jnp.asarray(g.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    a0 = make_s2d_train_apply(model, remat=False)
    a1 = make_s2d_train_apply(model, remat=True)

    def loss(apply_fn):
        return lambda p: jnp.mean((apply_fn(p, x) - y) ** 2)

    l0, g0 = jax.value_and_grad(loss(a0))(params)
    l1, g1 = jax.value_and_grad(loss(a1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_trainer_accelerator_knob_verified(tmp_path):
    """Legacy `accelerator` is honored observably: a mismatch with the real
    JAX backend raises instead of silently proceeding (round-1 dead-knob
    class). Tests run on the CPU backend, so accelerator='tpu' must fail
    and accelerator='cpu' must pass."""
    from xmm_superres_denoise_tpu.config.schema import (
        DatasetCfg,
        HrDatasetCfg,
        LossCfg,
        LrDatasetCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
        TrainerCfg,
    )
    from xmm_superres_denoise_tpu.data.datamodule import XmmDataModule
    from xmm_superres_denoise_tpu.train.loop import Trainer
    from xmm_superres_denoise_tpu.train.loss import create_loss

    ds = DatasetCfg(
        directory=tmp_path, scaling="sqrt", type="boring", batch_size=2,
        debug=True, name="boring_acc",
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=32),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=32),
    )
    mc = ModelCfg(
        name="rrdb_denoise", memory_efficient=False, batch_size=2,
        model=RrdbCfg(base_model="rrdb_denoise", filters=4,
                      residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    dm = XmmDataModule(ds, splits_root=tmp_path / "splits", boring_size=8)
    loss = create_loss(None, LossCfg(l1=1.0))

    tc_bad = TrainerCfg(epochs=1, checkpoint_root=tmp_path / "c1",
                        accelerator="tpu")
    with pytest.raises(RuntimeError, match="accelerator"):
        Trainer(mc, tc_bad, dm, loss)

    tc_ok = TrainerCfg(epochs=1, checkpoint_root=tmp_path / "c2",
                       accelerator="cpu")
    Trainer(mc, tc_ok, dm, loss)  # matches the test backend: no raise

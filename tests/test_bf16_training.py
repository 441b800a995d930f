"""Mixed-precision training (trainer.precision="bf16"): bf16 model
forward/backward, f32 master params/loss/optimizer — the TPU MXU's
2x-rate training mode (no reference equivalent; Lightning precision is
never set, reference train.py:148-155).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xmm_superres_denoise_tpu.config.schema import LossCfg, TrainerCfg
from xmm_superres_denoise_tpu.models.rrdb import GeneratorRRDB_SR
from xmm_superres_denoise_tpu.parallel.mesh import make_mesh
from xmm_superres_denoise_tpu.train import (
    TrainState,
    create_loss,
    make_fsdp_train_step,
    make_train_step,
)


def _setup(batch=4):
    model = GeneratorRRDB_SR(
        in_channels=1, out_channels=1, num_filters=4, num_res_blocks=1,
        num_upsample=1,
    )
    g = np.random.default_rng(0)
    lr = jnp.asarray(g.uniform(0, 1, (batch, 32, 32, 1)), jnp.float32)
    hr = jnp.asarray(g.uniform(0, 1, (batch, 64, 64, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr[:1])
    apply_fn = lambda p, x: jnp.clip(model.apply(p, x), 0.0, 1.0)  # noqa: E731
    loss_fn = create_loss(None, LossCfg(l1=1.0))
    tx = optax.adam(1e-3)
    return apply_fn, loss_fn, tx, params, lr, hr


def _leaf_dtypes(tree):
    return {np.dtype(leaf.dtype) for leaf in jax.tree_util.tree_leaves(tree)}


def test_bf16_step_close_to_f32_and_masters_stay_f32():
    apply_fn, loss_fn, tx, params, lr, hr = _setup()
    mesh = make_mesh(data=1)
    batch = {"lr": lr, "hr": hr}

    step32 = make_train_step(apply_fn, loss_fn, tx, mesh, donate=False)
    step16 = make_train_step(apply_fn, loss_fn, tx, mesh, donate=False,
                             compute_dtype=jnp.bfloat16)
    s32, loss32 = step32(TrainState.create(params, tx), batch)
    s16, loss16 = step16(TrainState.create(params, tx), batch)

    # loss and updated params agree to bf16 tolerance but are not equal
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=0.05)
    assert float(loss16) != float(loss32)
    p32 = np.concatenate([np.ravel(x) for x in
                          jax.tree_util.tree_leaves(s32.params)])
    p16 = np.concatenate([np.ravel(x) for x in
                          jax.tree_util.tree_leaves(s16.params)])
    np.testing.assert_allclose(p16, p32, atol=2e-3)

    # master params and optimizer state stay f32 (mixed, not cast-through)
    assert _leaf_dtypes(s16.params) == {np.dtype("float32")}
    assert _leaf_dtypes(s16.opt_state) <= {np.dtype("float32"),
                                           np.dtype("int32")}


def test_bf16_padded_batch_invariance():
    """The weight/padding algebra runs in f32 and must stay exact under
    bf16 compute: padded rows (w=0) contribute exactly nothing."""
    apply_fn, loss_fn, tx, params, lr, hr = _setup(batch=3)
    mesh = make_mesh(data=1)
    step = make_train_step(apply_fn, loss_fn, tx, mesh, donate=False,
                           compute_dtype=jnp.bfloat16)

    plain = {"lr": lr, "hr": hr, "weight": jnp.ones((3,), jnp.float32)}
    padded = {
        "lr": jnp.concatenate([lr, lr[-1:]]),
        "hr": jnp.concatenate([hr, hr[-1:]]),
        "weight": jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32),
    }
    s_plain, l_plain = step(TrainState.create(params, tx), plain)
    s_pad, l_pad = step(TrainState.create(params, tx), padded)
    np.testing.assert_allclose(float(l_pad), float(l_plain), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_bf16_loss_descends():
    apply_fn, loss_fn, tx, params, lr, hr = _setup()
    mesh = make_mesh(data=1)
    step = make_train_step(apply_fn, loss_fn, tx, mesh, donate=False,
                           compute_dtype=jnp.bfloat16)
    state = TrainState.create(params, tx)
    batch = {"lr": lr, "hr": hr}
    first = None
    for _ in range(20):
        state, loss = step(state, batch)
        first = float(loss) if first is None else first
    assert float(loss) < first


def test_bf16_fsdp_step():
    apply_fn, loss_fn, tx, params, lr, hr = _setup()
    step = make_fsdp_train_step(apply_fn, loss_fn, tx,
                                compute_dtype=jnp.bfloat16)
    state, loss = step(TrainState.create(params, tx), {"lr": lr, "hr": hr})
    assert np.isfinite(float(loss))
    assert _leaf_dtypes(state.params) == {np.dtype("float32")}


def test_precision_config_normalization():
    assert TrainerCfg(precision="bf16").precision == "bf16"
    assert TrainerCfg(precision="bf16-mixed").precision == "bf16"
    assert TrainerCfg(precision="32").precision == "f32"
    assert TrainerCfg(precision=32).precision == "f32"
    assert TrainerCfg().precision == "f32"
    with pytest.raises(Exception):
        TrainerCfg(precision="fp16")  # fp16 needs loss scaling; unsupported


def test_trainer_picks_up_precision(tmp_path):
    """trainer.precision='bf16' in a run config reaches the step factory."""
    from tests.test_cli import _write_run_config
    from xmm_superres_denoise_tpu.cli import load_run_config

    p = _write_run_config(tmp_path)
    text = p.read_text().replace("[trainer]", '[trainer]\nprecision = "bf16"')
    p.write_text(text)
    ROOT = Path(__file__).resolve().parents[1]
    ds, m, t, sc, loss = load_run_config(p, res_dir=ROOT / "res")
    assert t.precision == "bf16"

    from xmm_superres_denoise_tpu.data.datamodule import XmmDataModule
    from xmm_superres_denoise_tpu.train.loop import Trainer
    from xmm_superres_denoise_tpu.train.loss import create_loss as mk_loss

    dm = XmmDataModule(ds)
    trainer = Trainer(m, t, dm, mk_loss(sc, loss))
    assert trainer._compute_dtype == jnp.bfloat16

"""Gradient accumulation (trainer.accumulate_grad_batches): k micro-batch
(grads, loss, weight)-sum triples reproduce the one-big-batch update
exactly (weighted-mean loss algebra, train/steps.py:make_accum_steps) —
the Lightning trainer knob rebuilt TPU-native.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xmm_superres_denoise_tpu.config.schema import LossCfg
from xmm_superres_denoise_tpu.models.rrdb import GeneratorRRDB_SR
from xmm_superres_denoise_tpu.parallel.mesh import make_mesh
from xmm_superres_denoise_tpu.train import (
    TrainState,
    accum_add,
    create_loss,
    make_accum_steps,
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


def _accum_update(grad_step, apply_step, params, tx, micro_batches):
    acc = None
    for b in micro_batches:
        acc = accum_add(acc, grad_step(params, b))
    return apply_step(TrainState.create(params, tx), *acc)


def test_accum_matches_big_batch_dp():
    """Two half-batches through (grad_step, apply_step) == one full batch
    through make_train_step, on the shard_map DP path."""
    apply_fn, loss_fn, tx, params, lr, hr = _setup(batch=4)
    mesh = make_mesh(data=1)

    big = make_train_step(apply_fn, loss_fn, tx, mesh, donate=False)
    s_big, l_big = big(TrainState.create(params, tx), {"lr": lr, "hr": hr})

    grad_step, apply_step = make_accum_steps(
        apply_fn, loss_fn, tx, mesh=mesh, donate=False,
    )
    halves = [
        {"lr": lr[:2], "hr": hr[:2]},
        {"lr": lr[2:], "hr": hr[2:]},
    ]
    s_acc, l_acc = _accum_update(grad_step, apply_step, params, tx, halves)

    np.testing.assert_allclose(float(l_acc), float(l_big), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_acc.params),
                    jax.tree_util.tree_leaves(s_big.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_accum_weighted_padding_exact():
    """A padded (w=0) row inside a micro-batch contributes nothing."""
    apply_fn, loss_fn, tx, params, lr, hr = _setup(batch=4)
    grad_step, apply_step = make_accum_steps(apply_fn, loss_fn, tx,
                                             donate=False)

    plain = [
        {"lr": lr[:2], "hr": hr[:2]},
        {"lr": lr[2:], "hr": hr[2:]},
    ]
    padded = [
        {"lr": lr[:2], "hr": hr[:2]},
        {
            "lr": jnp.concatenate([lr[2:], lr[-1:]]),
            "hr": jnp.concatenate([hr[2:], hr[-1:]]),
            "weight": jnp.asarray([1.0, 1.0, 0.0], jnp.float32),
        },
    ]
    s_a, l_a = _accum_update(grad_step, apply_step, params, tx, plain)
    s_b, l_b = _accum_update(grad_step, apply_step, params, tx, padded)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_accum_gspmd_path_matches_dp():
    """mesh=None (GSPMD/FSDP wiring) computes the same sums as the
    shard_map path on one device."""
    apply_fn, loss_fn, tx, params, lr, hr = _setup(batch=4)
    g_dp, _ = make_accum_steps(apply_fn, loss_fn, tx, mesh=make_mesh(data=1))
    g_plain, _ = make_accum_steps(apply_fn, loss_fn, tx, mesh=None)
    batch = {"lr": lr, "hr": hr}
    for a, b in zip(jax.tree_util.tree_leaves(g_dp(params, batch)),
                    jax.tree_util.tree_leaves(g_plain(params, batch))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_trainer_accumulates(tmp_path):
    """A boring fit with accumulate_grad_batches=2 through the real
    Trainer steps the optimizer once per two loader batches — and the
    tail group (batches % k != 0) is not dropped."""
    from tests.test_cli import _write_run_config
    from xmm_superres_denoise_tpu.cli import load_run_config
    from xmm_superres_denoise_tpu.config import (
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
    )
    from xmm_superres_denoise_tpu.data.datamodule import XmmDataModule
    from xmm_superres_denoise_tpu.train.loop import Trainer
    from xmm_superres_denoise_tpu.train.loss import create_loss as mk_loss

    p = _write_run_config(tmp_path)
    text = p.read_text().replace(
        "[trainer]", "[trainer]\naccumulate_grad_batches = 2"
    ).replace("batch_size = 8", "batch_size = 4")
    p.write_text(text)
    ROOT = Path(__file__).resolve().parents[1]
    ds, _, t, _, _ = load_run_config(p, res_dir=ROOT / "res")
    assert t.accumulate_grad_batches == 2
    t = t.model_copy(update={"log_images_every_n_epochs": 0})

    mc = ModelCfg(
        name="esr_gen", memory_efficient=False, batch_size=4,
        model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    # boring_size=20 -> 16 train samples -> 4 loader batches of 4 ->
    # 2 optimizer steps/epoch; with 22 -> 17 train -> 5 batches -> 3 steps
    # (tail group of one batch still steps)
    for size, expected in ((20, 2), (22, 3)):
        dm = XmmDataModule(ds, splits_root=tmp_path / f"s{size}",
                           boring_size=size)
        t_i = t.model_copy(
            update={"checkpoint_root": tmp_path / f"ck{size}"}
        )
        trainer = Trainer(mc, t_i, dm, mk_loss(None, LossCfg(l1=1.0)),
                          metric_names=["psnr", "l1"])
        assert trainer._accum == 2
        result = trainer.fit(seed=0)
        n_batches = sum(1 for _ in dm.loader("train", mesh=trainer.mesh))
        assert (n_batches + 1) // 2 == expected
        assert int(trainer._live_state.step) == expected * t.epochs
        assert np.isfinite(result.best_val_loss)

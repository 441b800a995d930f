"""End-to-end trainer on the BoringDataset over an 8-device CPU mesh.

Exercises the full fit/val/test loop (shard_map DP step, psum'd metrics,
orbax checkpointing/resume) — the pyramid level the reference never had
(SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from xmm_superres_denoise_tpu.config import (
    DatasetCfg,
    HrDatasetCfg,
    LossCfg,
    LrDatasetCfg,
    MeshCfg,
    ModelCfg,
    OptimizerCfg,
    RrdbCfg,
    TrainerCfg,
)
from xmm_superres_denoise_tpu.data import XmmDataModule
from xmm_superres_denoise_tpu.parallel import make_mesh
from xmm_superres_denoise_tpu.train import Trainer, create_loss


def _boring_cfg(tmp_path, lr_res=32, res_mult=2, batch=8):
    return DatasetCfg(
        agn=0,
        batch_size=batch,
        check_files=False,
        debug=True,
        comb_hr=False,
        crop_mode="center",
        directory=tmp_path,
        mode="img",
        name="boring_test",
        scaling="sqrt",
        type="boring",
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=lr_res),
        hr=HrDatasetCfg(exp=100, clamp_max=0.0005584, res=lr_res * res_mult),
    )


def _model_cfg(name="esr_gen"):
    return ModelCfg(
        name=name,
        memory_efficient=False,
        batch_size=8,
        model=RrdbCfg(
            base_model=name, in_channels=1, out_channels=1, filters=4,
            residual_blocks=1,
        ),
        optimizer=OptimizerCfg(learning_rate=1e-4, betas=(0.9, 0.999)),
    )


@pytest.fixture
def trainer(tmp_path):
    assert len(jax.devices()) == 8, "test harness must expose 8 CPU devices"
    ds_cfg = _boring_cfg(tmp_path)
    dm = XmmDataModule(ds_cfg, splits_root=tmp_path / "splits", boring_size=32)
    tr_cfg = TrainerCfg(
        epochs=2,
        checkpoint_root=tmp_path / "ckpt",
        mesh=MeshCfg(data="auto", fsdp=1),
    )
    loss = create_loss(None, LossCfg(l1=1.0))
    return Trainer(
        _model_cfg(), tr_cfg, dm, loss, metric_names=["psnr", "l1"]
    )


def test_fit_runs_and_checkpoints(trainer):
    result = trainer.fit(seed=0)
    assert len(result.history) == 2
    assert np.isfinite(result.best_val_loss)
    assert result.best_step >= 1
    h0 = result.history[0]
    # val metrics present with the reference's key layout
    assert "val/loss" in h0 and "val/linear/psnr" in h0
    # input-baseline metrics only on the first epoch (one-shot)
    assert "val/linear/in/psnr" in h0
    assert "val/linear/in/psnr" not in result.history[1]
    # checkpoint exists and test() restores best
    logs = trainer.test(extended=False)
    assert "test/loss" in logs and np.isfinite(logs["test/loss"])


def test_resume_from_checkpoint(trainer):
    trainer.fit(seed=0)
    trainer.trainer_config.epochs = 3
    result = trainer.fit(seed=0, resume=True)
    # only one extra epoch runs
    assert len(result.history) == 1
    assert result.history[0]["epoch"] == 2


def test_train_step_updates_params(trainer):
    state = trainer.init_state(seed=1)
    batch = next(iter(trainer.dm.loader("train", mesh=trainer.mesh)))
    before = jax.device_get(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    state2, loss = trainer._train_step(state, batch)
    after = jax.device_get(jax.tree_util.tree_leaves(state2.params)[0])
    assert np.isfinite(float(loss))
    assert not np.allclose(before, after)
    assert int(state2.step) == 1


def test_extended_metrics_eval_path(trainer):
    """trainer.test(extended=True) exercises the full piq-equivalent suite
    (VIF-p, FSIM, GMSD, MS-GMSD, HaarPSI, MDSI) + input baselines."""
    trainer.fit(seed=0)
    logs = trainer.test(extended=True)
    for m in ("vif_p", "fsim", "gmsd", "ms_gmsd", "haarpsi", "msdi"):
        assert f"test/linear/{m}" in logs, m
        assert np.isfinite(logs[f"test/linear/{m}"]), m
        assert f"test/linear/in/{m}" in logs, m


def test_padded_train_step_matches_unpadded(trainer):
    """Padded rows (weight=0, duplicated last sample) must contribute nothing
    to the update: one step on a B=5 batch padded to 8 over the 8-device mesh
    equals the same step on the raw B=5 batch over a 1-device mesh."""
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.parallel.mesh import (
        make_mesh,
        pad_batch_to_devices,
        replicate,
    )
    from xmm_superres_denoise_tpu.train.steps import make_train_step

    rng = np.random.default_rng(0)
    b = 5
    lr = rng.uniform(0, 1, (b, 32, 32, 1)).astype(np.float32)
    hr = rng.uniform(0, 1, (b, 64, 64, 1)).astype(np.float32)

    mesh8 = trainer.mesh
    mesh1 = make_mesh(data=1, fsdp=1)

    padded, valid = pad_batch_to_devices({"lr": lr, "hr": hr}, 8)
    batch8 = {**padded, "weight": (np.arange(8) < valid).astype(np.float32)}
    batch1 = {"lr": lr, "hr": hr, "weight": np.ones(b, np.float32)}

    # SGD makes the update linear in the gradient, so param equality below
    # is gradient equality (Adam's first step is ~sign(g), which amplifies
    # float noise where g ~ 0).
    import optax

    from xmm_superres_denoise_tpu.train.steps import TrainState

    tx = optax.sgd(0.1)
    host_params = jax.device_get(trainer.init_state(seed=3).params)
    host_state = TrainState.create(host_params, tx)
    outs = []
    for mesh, batch in ((mesh8, batch8), (mesh1, batch1)):
        step = make_train_step(
            trainer._apply, trainer.loss_fn, tx, mesh, donate=False
        )
        st = replicate(mesh, host_state)
        st2, loss = step(st, {k: jnp.asarray(v) for k, v in batch.items()})
        outs.append((jax.device_get(st2.params), float(loss)))
    (p_pad, l_pad), (p_raw, l_raw) = outs
    assert np.isclose(l_pad, l_raw, rtol=1e-5)
    for a, e in zip(
        jax.tree_util.tree_leaves(p_pad), jax.tree_util.tree_leaves(p_raw)
    ):
        np.testing.assert_allclose(a, e, rtol=1e-4, atol=1e-6)


def test_emergency_checkpoint_on_exception(trainer, monkeypatch):
    """Any exception escaping the fit loop saves a restorable emergency
    snapshot of the live mid-epoch state (SURVEY.md §5.3)."""
    monkeypatch.setattr(
        trainer,
        "_run_eval",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected mid-fit failure")
        ),
    )
    with pytest.raises(RuntimeError, match="injected"):
        trainer.fit(seed=0)
    template = jax.device_get(trainer.init_state(seed=0))
    restored = trainer.ckpt.restore_emergency(template)
    # the snapshot reflects the live trained state, not init: step advanced
    assert int(restored.step) > 0


@pytest.mark.slow
def test_transformer_fsdp_fit_and_resume(tmp_path):
    """End-to-end FSDP fit (VERDICT r2 #6): tiny DRCT through the GSPMD
    train step with parameters actually sharded over the fsdp mesh axis,
    multi-epoch, with orbax save + mid-run resume reproducing the same
    final state as an uninterrupted run."""
    from xmm_superres_denoise_tpu.config import TransformerCfg
    from xmm_superres_denoise_tpu.parallel.mesh import FSDP_AXIS

    def make_trainer(root):
        ds_cfg = _boring_cfg(root, lr_res=32, res_mult=2, batch=8)
        dm = XmmDataModule(ds_cfg, splits_root=root / "splits", boring_size=16)
        tr_cfg = TrainerCfg(
            epochs=3,
            checkpoint_root=root / "ckpt",
            mesh=MeshCfg(data=4, fsdp=2),
        )
        mc = ModelCfg(
            name="drct",
            memory_efficient=True,
            batch_size=8,
            model=TransformerCfg(
                base_model="drct", img_size=32, window_size=8, embed_dim=64,
                num_heads=[2], depths=[2], patch_size=1,
                upsampler="pixelshuffle",
            ),
            optimizer=OptimizerCfg(learning_rate=2e-3, betas=(0.9, 0.999)),
        )
        loss = create_loss(None, LossCfg(l1=1.0))
        return Trainer(mc, tr_cfg, dm, loss, metric_names=["psnr"])

    # uninterrupted 3-epoch run
    t_full = make_trainer(tmp_path / "full")
    assert t_full._fsdp
    state = t_full.init_state(seed=0)
    specs = [
        str(getattr(l.sharding, "spec", None))
        for l in jax.tree_util.tree_leaves(state.params)
    ]
    assert any(FSDP_AXIS in s for s in specs), "no param actually fsdp-sharded"
    # Boring targets are ~N(0,1): with L1 + output clamp the optimum is the
    # constant-0 prediction, reached within epoch 0 — so descent is
    # measured from the INIT state's val loss, not epoch-to-epoch.
    init_val = t_full._run_eval(
        state.params, "val", "val", include_input_metrics=False
    )["val/loss"]
    full = t_full.fit(seed=0)
    assert len(full.history) == 3
    assert full.best_val_loss < init_val, (full.best_val_loss, init_val)

    # interrupted run: 2 epochs, then resume for the 3rd
    t_a = make_trainer(tmp_path / "resumed")
    t_a.trainer_config.epochs = 2
    t_a.fit(seed=0)
    t_b = make_trainer(tmp_path / "resumed")
    resumed = t_b.fit(seed=0, resume=True)
    assert len(resumed.history) == 1 and resumed.history[0]["epoch"] == 2

    final_full, _ = t_full.ckpt.restore(jax.device_get(t_full.init_state()))
    final_res, _ = t_b.ckpt.restore(jax.device_get(t_b.init_state()))
    for a, b in zip(
        jax.tree_util.tree_leaves(final_full.params),
        jax.tree_util.tree_leaves(final_res.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_emergency_checkpoint_survives_donated_state(trainer, monkeypatch):
    """When the crash is the train step itself, the live state's buffers
    were donated to it and cannot be read back — the emergency path must
    fall back to the periodic host mirror instead of silently failing."""
    real_step = trainer._train_step
    calls = {"n": 0}

    def failing_step(state, batch):
        if calls["n"] >= 1:
            # simulate a mid-step crash AFTER the input buffers were
            # donated: delete them, then raise like an XlaRuntimeError
            for leaf in jax.tree_util.tree_leaves(state):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            raise RuntimeError("injected step crash (buffers donated)")
        calls["n"] += 1
        return real_step(state, batch)

    monkeypatch.setattr(trainer, "_train_step", failing_step)
    with pytest.raises(RuntimeError, match="injected step crash"):
        trainer.fit(seed=0)
    # the host mirror (taken on the first batch) backed the snapshot:
    # the restored state IS the mirror, bit for bit
    template = jax.device_get(trainer.init_state(seed=0))
    restored = trainer.ckpt.restore_emergency(template)
    assert int(restored.step) > 0
    for a, e in zip(
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
        jax.tree_util.tree_leaves(trainer._host_snapshot.params),
    ):
        np.testing.assert_array_equal(a, e)


def test_checkpoint_retention_keeps_latest(tmp_path):
    """Once val/loss starts worsening, new steps must still be retained:
    best_fn-only retention (BestN without LatestN) deleted every post-best
    save right after it landed, so resume-from-latest silently rewound to
    the best epoch (regression)."""
    import jax.numpy as jnp
    import optax

    from xmm_superres_denoise_tpu.train.checkpoints import CheckpointManager
    from xmm_superres_denoise_tpu.train.steps import TrainState

    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    state = TrainState.create({"w": jnp.zeros((2,))}, optax.adam(1e-3))
    losses = [5.0, 1.0, 2.0, 3.0, 4.0]  # best at step 1, worsening after
    for step, vl in enumerate(losses):
        mgr.save(step, state, vl)
    assert mgr.latest_step() == 4, "latest save must survive retention"
    _, restored_step = mgr.restore(state)
    assert restored_step == 4
    _, best_step = mgr.restore_best(state)
    assert best_step == 1
    mgr.close()


def test_empty_eval_split_reports_nan_not_zero(tmp_path):
    """A zero-sample split (boring_size=8 -> torch remainder rule gives
    test 0 samples) must report loss=NaN, not a perfect-looking 0.0."""
    ds_cfg = _boring_cfg(tmp_path)
    dm = XmmDataModule(ds_cfg, splits_root=tmp_path / "splits", boring_size=8)
    tr_cfg = TrainerCfg(
        epochs=1, checkpoint_root=tmp_path / "ckpt",
        mesh=MeshCfg(data="auto", fsdp=1),
    )
    loss = create_loss(None, LossCfg(l1=1.0))
    t = Trainer(_model_cfg(), tr_cfg, dm, loss, metric_names=["psnr", "l1"])
    state = t.init_state(seed=0)
    logs = t._run_eval(state.params, "test", "test",
                       include_input_metrics=False)
    assert np.isnan(logs["test/loss"])


def test_checkpoint_save_nan_monitor_never_best(tmp_path):
    """A NaN val/loss (empty val split) must neither become the recorded
    best nor poison BestN retention ordering."""
    import jax.numpy as jnp
    import optax

    from xmm_superres_denoise_tpu.train.checkpoints import CheckpointManager
    from xmm_superres_denoise_tpu.train.steps import TrainState

    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    state = TrainState.create({"w": jnp.zeros((2,))}, optax.adam(1e-3))
    mgr.save(0, state, float("nan"))
    assert mgr.best_metadata() is None
    mgr.save(1, state, 2.0)
    mgr.save(2, state, float("nan"))
    _, best_step = mgr.restore_best(state)
    assert best_step == 1
    assert mgr.latest_step() == 2
    mgr.close()


def test_params_npz_handles_list_pytrees(tmp_path):
    """npz export/import must stringify non-dict keypath entries (list index
    SequenceKey.idx is an int; '/'.join crashed on it)."""
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.train.checkpoints import (
        load_params_npz,
        save_params_npz,
    )

    tree = {
        "blocks": [{"w": jnp.full((2, 2), 3.0)}, {"w": jnp.full((2, 2), 7.0)}],
        "bias": jnp.ones((3,)),
    }
    p = tmp_path / "params.npz"
    save_params_npz(p, tree)
    back = load_params_npz(p, tree)
    np.testing.assert_array_equal(np.asarray(back["blocks"][1]["w"]), 7.0)
    np.testing.assert_array_equal(np.asarray(back["bias"]), 1.0)


def test_loader_reproducible_and_thread_cleanup(trainer, tmp_path):
    """Same seed -> identical shuffle order across interpreter salts (the
    split token must not come from hash()), and an abandoned loader must
    release its producer thread instead of parking on a full queue."""
    import threading

    dm = trainer.dm
    a = [np.asarray(b["lr"]).sum() for b in dm.loader("train", epoch=1)]
    b = [np.asarray(b["lr"]).sum() for b in dm.loader("train", epoch=1)]
    np.testing.assert_allclose(a, b)
    c = [np.asarray(b["lr"]).sum() for b in dm.loader("train", epoch=2)]
    assert not np.allclose(a, c), "different epochs should reshuffle"

    import time

    def _drained_count(limit: float = 10.0) -> int:
        # earlier loaders' producers exit asynchronously: wait for a
        # stable count so the baseline isn't inflated (which would mask
        # a genuine leak from the abandoned generator below)
        deadline = time.time() + limit
        n = threading.active_count()
        while time.time() < deadline:
            time.sleep(0.2)
            m = threading.active_count()
            if m == n:
                return m
            n = m
        return n

    before = _drained_count()
    gen = dm.loader("train", epoch=3)
    next(gen)
    gen.close()  # abandon mid-epoch (simulates a crashed train step)
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before, "producer thread leaked"


def test_gradient_clip_val_wires_into_optimizer(tmp_path):
    """trainer.gradient_clip_val clips the global grad norm BEFORE Adam
    (Lightning's default clip algorithm): with clip=0.5 and grads of norm
    5, Adam's first moment accumulates the clipped gradient; with the
    default 0 the raw gradient. Pins the knob actually reaching the
    optimizer chain."""
    import jax.numpy as jnp
    import optax

    def make(clip):
        ds_cfg = _boring_cfg(tmp_path / f"c{clip}")
        dm = XmmDataModule(ds_cfg, splits_root=tmp_path / f"s{clip}",
                           boring_size=8)
        tr_cfg = TrainerCfg(
            epochs=1, checkpoint_root=tmp_path / f"k{clip}",
            mesh=MeshCfg(data="auto", fsdp=1), gradient_clip_val=clip,
        )
        loss = create_loss(None, LossCfg(l1=1.0))
        return Trainer(_model_cfg(), tr_cfg, dm, loss, metric_names=["l1"])

    params = {"w": jnp.zeros((2,))}
    grads = {"w": jnp.asarray([3.0, 4.0])}  # global norm 5

    def first_moment(tx):
        state = tx.init(params)
        _, new_state = tx.update(grads, state, params)
        leaves = [s for s in jax.tree_util.tree_leaves(new_state)
                  if np.asarray(s).shape == (2,)]
        # ScaleByAdamState.mu and .nu both have param shape; mu = (1-b1)*g
        # is the larger one for g<1... identify mu as the leaf matching
        # (1-b1)*g_direction: just return all and let the caller match.
        return leaves

    t_clip = make(0.5)
    t_plain = make(0.0)
    b1 = 0.9

    # plain: some state leaf equals (1-b1) * raw grads
    target_plain = (1 - b1) * np.asarray([3.0, 4.0])
    assert any(np.allclose(l, target_plain) for l in first_moment(t_plain.tx))

    # clipped: grads scaled to norm 0.5 -> (1-b1) * [0.3, 0.4]
    target_clip = (1 - b1) * np.asarray([0.3, 0.4])
    moments = first_moment(t_clip.tx)
    assert any(np.allclose(l, target_clip) for l in moments)
    assert not any(np.allclose(l, target_plain) for l in moments)


@pytest.mark.slow
def test_scan_layers_fit_and_resume(tmp_path):
    """Full Trainer stack with a scan-compressed DRCT (round 4): fit,
    orbax save of the stacked-param state, and mid-run resume reproducing
    the uninterrupted run exactly — proving the scanned layout flows
    through the train loop, checkpoints, and best-val tracking."""
    from xmm_superres_denoise_tpu.config import TransformerCfg

    def make_trainer(root):
        ds_cfg = _boring_cfg(root, lr_res=32, res_mult=2, batch=4)
        dm = XmmDataModule(ds_cfg, splits_root=root / "splits", boring_size=12)
        tr_cfg = TrainerCfg(
            epochs=3, checkpoint_root=root / "ckpt", mesh=MeshCfg(data=2),
        )
        mc = ModelCfg(
            name="drct",
            memory_efficient=True,
            batch_size=4,
            scan_layers=True,
            model=TransformerCfg(
                base_model="drct", img_size=32, window_size=8, embed_dim=64,
                num_heads=[2, 2], depths=[2, 2], patch_size=1,
                upsampler="pixelshuffle",
            ),
            optimizer=OptimizerCfg(learning_rate=2e-3, betas=(0.9, 0.999)),
        )
        loss = create_loss(None, LossCfg(l1=1.0))
        return Trainer(mc, tr_cfg, dm, loss, metric_names=["psnr"])

    t_full = make_trainer(tmp_path / "full")
    state = t_full.init_state(seed=0)
    assert "layers_scan" in state.params["params"]
    stacked = jax.tree_util.tree_leaves(
        state.params["params"]["layers_scan"]
    )[0]
    assert stacked.shape[0] == 2  # group axis
    full = t_full.fit(seed=0)
    assert len(full.history) == 3

    t_a = make_trainer(tmp_path / "resumed")
    t_a.trainer_config.epochs = 2
    t_a.fit(seed=0)
    t_b = make_trainer(tmp_path / "resumed")
    resumed = t_b.fit(seed=0, resume=True)
    assert len(resumed.history) == 1 and resumed.history[0]["epoch"] == 2

    final_full, _ = t_full.ckpt.restore(jax.device_get(t_full.init_state()))
    final_res, _ = t_b.ckpt.restore(jax.device_get(t_b.init_state()))
    for a, b in zip(
        jax.tree_util.tree_leaves(final_full.params),
        jax.tree_util.tree_leaves(final_res.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_scan_layers_fsdp_fit_and_resume(tmp_path):
    """scan_layers x FSDP (VERDICT r4 #4): the scan-compressed DRCT through
    `make_fsdp_train_step` with params GSPMD-sharded over the fsdp mesh
    axis. DRCT/HAT default `scan_layers=true` and are exactly the models
    the reference FSDPs (train.py:142-146), so the combination must hold:

      * stacked `layers_scan` leaves never shard their leading group axis
        (lax.scan slices it per iteration — parallel/sharding.fsdp_shardings
        excludes axis 0 for scanned subtrees), while their weight axes DO
        shard;
      * one FSDP train step from a shared init matches the DP scanned step
        (same math, different partitioning);
      * fit + orbax resume reproduce the uninterrupted run.
    """
    from xmm_superres_denoise_tpu.config import TransformerCfg
    from xmm_superres_denoise_tpu.parallel.mesh import FSDP_AXIS

    def make_trainer(root, fsdp):
        ds_cfg = _boring_cfg(root, lr_res=32, res_mult=2, batch=8)
        dm = XmmDataModule(ds_cfg, splits_root=root / "splits", boring_size=16)
        tr_cfg = TrainerCfg(
            epochs=3,
            checkpoint_root=root / "ckpt",
            mesh=MeshCfg(data=4, fsdp=2) if fsdp else MeshCfg(data=4),
        )
        mc = ModelCfg(
            name="drct",
            memory_efficient=True,
            batch_size=8,
            scan_layers=True,
            model=TransformerCfg(
                base_model="drct", img_size=32, window_size=8, embed_dim=64,
                num_heads=[2, 2], depths=[2, 2], patch_size=1,
                upsampler="pixelshuffle",
            ),
            optimizer=OptimizerCfg(learning_rate=2e-3, betas=(0.9, 0.999)),
        )
        loss = create_loss(None, LossCfg(l1=1.0))
        return Trainer(mc, tr_cfg, dm, loss, metric_names=["psnr"])

    t_full = make_trainer(tmp_path / "full", fsdp=True)
    assert t_full._fsdp
    state = t_full.init_state(seed=0)
    scan_tree = state.params["params"]["layers_scan"]
    assert jax.tree_util.tree_leaves(scan_tree)[0].shape[0] == 2  # group axis
    scan_specs = [
        tuple(l.sharding.spec) for l in jax.tree_util.tree_leaves(scan_tree)
    ]
    # leading group axis NEVER sharded ...
    assert all(
        (len(s) == 0 or s[0] is None) for s in scan_specs
    ), scan_specs
    # ... while the weight axes of the big scanned leaves are
    assert any(
        FSDP_AXIS in s for s in scan_specs
    ), "no scanned leaf actually fsdp-sharded"

    # single-step numerics vs the DP scanned path from the same init
    t_dp = make_trainer(tmp_path / "dp", fsdp=False)
    assert not t_dp._fsdp
    state_dp = t_dp.init_state(seed=0)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(jax.device_get(state_dp.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    batch_fsdp = next(iter(
        t_full.dm.loader("train", mesh=t_full.mesh, epoch=0)
    ))
    batch_dp = next(iter(t_dp.dm.loader("train", mesh=t_dp.mesh, epoch=0)))
    np.testing.assert_array_equal(
        np.asarray(batch_fsdp["lr"]), np.asarray(batch_dp["lr"])
    )
    _, loss_fsdp = t_full._train_step(state, batch_fsdp)
    _, loss_dp = t_dp._train_step(state_dp, batch_dp)
    np.testing.assert_allclose(
        float(loss_fsdp), float(loss_dp), rtol=1e-5, atol=1e-7
    )

    full = t_full.fit(seed=0)
    assert len(full.history) == 3

    t_a = make_trainer(tmp_path / "resumed", fsdp=True)
    t_a.trainer_config.epochs = 2
    t_a.fit(seed=0)
    t_b = make_trainer(tmp_path / "resumed", fsdp=True)
    resumed = t_b.fit(seed=0, resume=True)
    assert len(resumed.history) == 1 and resumed.history[0]["epoch"] == 2

    final_full, _ = t_full.ckpt.restore(jax.device_get(t_full.init_state()))
    final_res, _ = t_b.ckpt.restore(jax.device_get(t_b.init_state()))
    for a, b in zip(
        jax.tree_util.tree_leaves(final_full.params),
        jax.tree_util.tree_leaves(final_res.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_epoch_callback_merges_into_history(trainer):
    """The per-epoch diagnostics hook (convergence-run instrumentation)
    receives (epoch, state) and its dict lands in the history entries."""
    seen = []

    def cb(epoch, state):
        assert state.params is not None
        seen.append(epoch)
        return {"diag/probe": float(epoch) + 0.5}

    trainer.epoch_callback = cb
    result = trainer.fit(seed=0)
    assert seen == [0, 1]
    assert [h["diag/probe"] for h in result.history] == [0.5, 1.5]

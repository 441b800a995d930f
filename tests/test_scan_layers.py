"""Scan-compressed transformer layer stacks (VERDICT r3 #4).

`DRCT(scan_layers=True)` / `HAT(scan_layers=True)` trace ONE group body and
`lax.scan` it over stacked per-group params, collapsing the production train
graphs ~6x (the unrolled forms lowered to ~180 MB MLIR — past the dev
runtime's remote AOT compile-helper cap, docs/TRAINING.md). These tests pin
exact equivalence with the unrolled form (outputs bitwise-close, grads to
f32 reduction-order noise) and the param-layout converters both ways.
Reference anchor: the reference trains these models via Lightning FSDP
(`/root/reference/train.py:141-146`); graph compression is the TPU-idiomatic
alternative that keeps them single-chip-trainable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.models.drct import DRCT
from xmm_superres_denoise_tpu.models.hat import HAT
from xmm_superres_denoise_tpu.models.scan_stack import (
    stack_layer_params,
    unstack_layer_params,
)

DRCT_KW = dict(
    img_size=16, patch_size=1, in_chans=1, embed_dim=8, depths=(2, 2, 2),
    num_heads=(2, 2, 2), window_size=4, gc=8, mlp_ratio=2.0, upscale=2,
    upsampler="pixelshuffle",
)
HAT_KW = dict(
    img_size=16, patch_size=1, in_chans=1, embed_dim=32, depths=(2, 2, 2),
    num_heads=(2, 2, 2), window_size=4, mlp_ratio=2.0, upscale=2,
    upsampler="pixelshuffle",
)


def _x(seed=0, shape=(1, 16, 16, 1)):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, shape), jnp.float32
    )


def _models(cls, kw, **extra):
    return cls(**kw), cls(**kw, scan_layers=True, **extra)


@pytest.mark.parametrize(
    "cls,kw", [(DRCT, DRCT_KW), (HAT, HAT_KW)], ids=["drct", "hat"]
)
def test_scan_matches_unrolled_forward(cls, kw):
    x = _x()
    m_u, m_s = _models(cls, kw)
    p_u = m_u.init(jax.random.PRNGKey(0), x)
    p_s = {"params": stack_layer_params(p_u["params"])}
    y_u = np.asarray(m_u.apply(p_u, x))
    y_s = np.asarray(m_s.apply(p_s, x))
    np.testing.assert_allclose(y_s, y_u, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize(
    "cls,kw", [(DRCT, DRCT_KW), (HAT, HAT_KW)], ids=["drct", "hat"]
)
def test_scan_matches_unrolled_grads(cls, kw):
    """Train-path equivalence: same loss gradients (up to f32 reduction
    order) — the property that licenses training with the scanned form and
    serving/exporting with the unrolled one."""
    x = _x(1)
    m_u, m_s = _models(cls, kw)
    p_u = m_u.init(jax.random.PRNGKey(0), x)
    p_s = {"params": stack_layer_params(p_u["params"])}

    g_u = jax.grad(lambda p: jnp.sum(m_u.apply({"params": p}, x) ** 2))(
        p_u["params"]
    )
    g_s = jax.grad(lambda p: jnp.sum(m_s.apply({"params": p}, x) ** 2))(
        p_s["params"]
    )
    g_s_flat = jax.tree_util.tree_flatten_with_path(
        unstack_layer_params(g_s)
    )[0]
    g_u_flat = jax.tree_util.tree_flatten_with_path(g_u)[0]
    assert len(g_u_flat) == len(g_s_flat)
    for (kp_u, a), (kp_s, b) in zip(g_u_flat, g_s_flat):
        assert kp_u == kp_s
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=str(kp_u),
        )


def test_scan_remat_matches_unrolled():
    """use_checkpoint=True remats the whole scanned group body (the
    memory-efficient production config) — same outputs and grads."""
    x = _x(2)
    m_u = HAT(**HAT_KW)
    m_r = HAT(**HAT_KW, scan_layers=True, use_checkpoint=True)
    p_u = m_u.init(jax.random.PRNGKey(0), x)
    p_s = {"params": stack_layer_params(p_u["params"])}
    np.testing.assert_allclose(
        np.asarray(m_r.apply(p_s, x)), np.asarray(m_u.apply(p_u, x)),
        rtol=2e-6, atol=2e-6,
    )
    g_u = jax.grad(lambda p: jnp.sum(m_u.apply({"params": p}, x) ** 2))(
        p_u["params"]
    )
    g_r = unstack_layer_params(
        jax.grad(lambda p: jnp.sum(m_r.apply({"params": p}, x) ** 2))(
            p_s["params"]
        )
    )
    for (kp_u, a), (kp_r, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_u)[0],
        jax.tree_util.tree_flatten_with_path(g_r)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=str(kp_u),
        )


def test_stack_unstack_roundtrip():
    x = _x()
    m_u = DRCT(**DRCT_KW)
    p_u = m_u.init(jax.random.PRNGKey(3), x)["params"]
    back = unstack_layer_params(stack_layer_params(p_u))
    fa = jax.tree_util.tree_flatten_with_path(p_u)[0]
    fb = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(fa) == len(fb)
    for (kp_a, a), (kp_b, b) in zip(fa, fb):
        assert kp_a == kp_b
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_init_shapes_match_stacked_unrolled():
    """Direct init of the scanned model yields the stacked layout (leading
    axis = group count) with exactly the unrolled per-group shapes."""
    x = _x()
    m_u, m_s = _models(HAT, HAT_KW)
    p_u = m_u.init(jax.random.PRNGKey(0), x)["params"]
    p_s = m_s.init(jax.random.PRNGKey(0), x)["params"]
    expect = stack_layer_params(p_u)
    fa = jax.tree_util.tree_flatten_with_path(expect)[0]
    fb = jax.tree_util.tree_flatten_with_path(p_s)[0]
    assert [kp for kp, _ in fa] == [kp for kp, _ in fb]
    for (kp, a), (_, b) in zip(fa, fb):
        assert a.shape == b.shape, kp


def test_nonuniform_groups_rejected():
    with pytest.raises(ValueError, match="uniform"):
        HAT(
            **{**HAT_KW, "num_heads": (2, 4, 2)}, scan_layers=True
        ).init(jax.random.PRNGKey(0), _x())


def test_registry_builds_scanned_models():
    from xmm_superres_denoise_tpu.config.schema import (
        ModelCfg,
        OptimizerCfg,
        TransformerCfg,
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    for base in ("drct", "hat"):
        mc = ModelCfg(
            name=base, batch_size=1, scan_layers=True,
            model=TransformerCfg(
                base_model=base, img_size=16, patch_size=1, window_size=4,
                embed_dim=8 if base == "drct" else 32,
                num_heads=[2, 2], depths=[2, 2],
            ),
            optimizer=OptimizerCfg(learning_rate=2e-4),
        )
        m = build_model(mc, (16, 16), (32, 32))
        assert m.scan_layers is True


def test_onnx_roundtrip_through_scanned_layout(tmp_path):
    """Scanned checkpoints export/import through the torch-named ONNX
    format transparently (auto unstack on export, re-stack on import)."""
    from xmm_superres_denoise_tpu.infer.onnx_import import (
        export_onnx_params,
        import_onnx_params,
    )

    x = _x()
    m_s = DRCT(**DRCT_KW, scan_layers=True)
    p_s = m_s.init(jax.random.PRNGKey(5), x)["params"]
    path = export_onnx_params({"params": p_s}, tmp_path / "scan.onnx")

    # names must be the unrolled/torch contract
    from xmm_superres_denoise_tpu.infer.onnx_import import (
        read_onnx_initializers,
    )

    names = set(read_onnx_initializers(path))
    assert any(n.startswith("layers.0.") for n in names)
    assert not any("layers_scan" in n for n in names)

    back = import_onnx_params(path, p_s, allow_shape_fallback=False)
    fa = jax.tree_util.tree_flatten_with_path(p_s)[0]
    fb = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(fa) == len(fb)
    for (kp_a, a), (kp_b, b) in zip(fa, fb):
        assert kp_a == kp_b
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swinir_scan_matches_unrolled():
    """SwinIR/SwinFIR RSTB stacks scan-compress with the same contract."""
    from xmm_superres_denoise_tpu.models.swinir import SwinFIR, SwinIR

    for mk in (SwinIR, SwinFIR):
        kw = dict(
            img_size=16, patch_size=1, in_chans=1, embed_dim=8,
            depths=(2, 2, 2), num_heads=(2, 2, 2), window_size=4,
            mlp_ratio=2.0, upscale=2, upsampler="pixelshuffle",
        )
        x = _x()
        m_u = mk(**kw)
        m_s = mk(**kw, scan_layers=True)
        p_u = m_u.init(jax.random.PRNGKey(0), x)
        p_s = {"params": stack_layer_params(p_u["params"])}
        np.testing.assert_allclose(
            np.asarray(m_s.apply(p_s, x)), np.asarray(m_u.apply(p_u, x)),
            rtol=2e-6, atol=2e-6,
        )
        g_u = jax.grad(
            lambda p: jnp.sum(m_u.apply({"params": p}, x) ** 2)
        )(p_u["params"])
        g_s = unstack_layer_params(
            jax.grad(lambda p: jnp.sum(m_s.apply({"params": p}, x) ** 2))(
                p_s["params"]
            )
        )
        for (kp_u, a), (kp_s, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_u)[0],
            jax.tree_util.tree_flatten_with_path(g_s)[0],
        ):
            assert kp_u == kp_s
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
                err_msg=str(kp_u),
            )


def test_scan_layers_rejected_for_non_swin():
    """Round-4 review: scan_layers on a model with no scanned form must
    fail loudly, not silently no-op."""
    from xmm_superres_denoise_tpu.config.schema import (
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    mc = ModelCfg(
        name="rrdb_denoise", batch_size=1, scan_layers=True,
        model=RrdbCfg(base_model="rrdb_denoise", filters=8,
                      residual_blocks=2),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    with pytest.raises(ValueError, match="scan_layers"):
        build_model(mc, (16, 16), (16, 16))


def test_drct_unrolled_remat_matches_plain():
    """Round-4 review: DRCT's unrolled path silently dropped
    use_checkpoint — it now remats its Swin blocks (reference
    model.py:41-46) with identical outputs."""
    x = _x(4)
    m_plain = DRCT(**DRCT_KW)
    m_remat = DRCT(**DRCT_KW, use_checkpoint=True)
    p = m_plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_remat.apply(p, x)), np.asarray(m_plain.apply(p, x)),
        rtol=1e-6, atol=1e-6,
    )
    g_a = jax.grad(lambda q: jnp.sum(m_plain.apply({"params": q}, x) ** 2))(
        p["params"]
    )
    g_b = jax.grad(lambda q: jnp.sum(m_remat.apply({"params": q}, x) ** 2))(
        p["params"]
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_a)[0],
        jax.tree_util.tree_flatten_with_path(g_b)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=str(kp),
        )

"""Swin building blocks: geometry roundtrips + torch numerical cross-check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from xmm_superres_denoise_tpu.models.swin_common import (
    SwinTransformerBlock,
    effective_window,
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 5)), jnp.float32)
    w = window_partition(x, 4)
    assert w.shape == (2 * 16, 4, 4, 5)
    back = window_reverse(w, 4, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_effective_window_clamps():
    # production SwinFIR/DRCT case: input_resolution 13 < window 16
    assert effective_window((13, 13), 16, 8) == (13, 0)
    # HAT case: 26 > 16 keeps window/shift
    assert effective_window((26, 26), 16, 8) == (16, 8)


def test_relative_position_index_properties():
    rpi = relative_position_index(4, 4)
    assert rpi.shape == (16, 16)
    assert rpi.min() >= 0 and rpi.max() < 7 * 7
    # diagonal = center index (relative offset 0,0)
    center = (4 - 1) * (2 * 4 - 1) + (4 - 1)
    assert np.all(np.diag(rpi) == center)


def test_shifted_window_mask():
    assert shifted_window_mask(16, 16, 4, 0) is None
    m = shifted_window_mask(16, 16, 4, 2)
    assert m.shape == (16, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # interior windows (no boundary wrap) are fully visible
    assert np.all(m[0] == 0)


def _torch_swin_block(params, x_np, h, w, dim, heads, ws, shift):
    """Independent torch statement of the Swin block forward
    (modules.py:299-351 semantics) using the Flax parameters."""
    p = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}
    x = torch.from_numpy(x_np)  # (B, L, C)
    b = x.shape[0]

    shortcut = x
    x = F.layer_norm(x, (dim,), p["norm1_scale"], p["norm1_bias"], eps=1e-5)
    x = x.view(b, h, w, dim)
    if shift > 0:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    # partition
    x = x.view(b, h // ws, ws, w // ws, ws, dim).permute(0, 1, 3, 2, 4, 5)
    xw = x.reshape(-1, ws * ws, dim)
    # attention
    qkv = xw @ p["qkv_kernel"] + p["qkv_bias"]
    b_, n, _ = qkv.shape
    d = dim // heads
    qkv = qkv.reshape(b_, n, 3, heads, d).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * d**-0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    rpi = torch.from_numpy(relative_position_index(ws, ws).astype(np.int64))
    bias = p["bias_table"][rpi.view(-1)].view(n, n, heads).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    mask_np = shifted_window_mask(h, w, ws, shift)
    if mask_np is not None:
        mask = torch.from_numpy(mask_np)
        nw = mask.shape[0]
        attn = attn.view(b_ // nw, nw, heads, n, n) + mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, n, n)
    attn = attn.softmax(-1)
    xw = (attn @ v).transpose(1, 2).reshape(b_, n, dim)
    xw = xw @ p["proj_kernel"] + p["proj_bias"]
    # reverse
    xw = xw.view(b, h // ws, w // ws, ws, ws, dim).permute(0, 1, 3, 2, 4, 5)
    x = xw.reshape(b, h, w, dim)
    if shift > 0:
        x = torch.roll(x, (shift, shift), dims=(1, 2))
    x = x.reshape(b, h * w, dim)
    x = shortcut + x
    y = F.layer_norm(x, (dim,), p["norm2_scale"], p["norm2_bias"], eps=1e-5)
    y = y @ p["fc1_kernel"] + p["fc1_bias"]
    y = F.gelu(y)  # exact erf gelu
    y = y @ p["fc2_kernel"] + p["fc2_bias"]
    return (x + y).numpy()


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_matches_torch(shift):
    dim, heads, ws, h, w = 8, 2, 4, 8, 8
    block = SwinTransformerBlock(
        dim=dim, input_resolution=(h, w), num_heads=heads, window_size=ws,
        shift_size=shift, mlp_ratio=2.0,
    )
    x = np.random.default_rng(0).normal(size=(2, h * w, dim)).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), (h, w))
    ours = np.asarray(block.apply(variables, jnp.asarray(x), (h, w)))

    pr = variables["params"]
    flat = {
        "norm1_scale": pr["norm1"]["scale"],
        "norm1_bias": pr["norm1"]["bias"],
        "qkv_kernel": pr["attn"]["qkv"]["kernel"],
        "qkv_bias": pr["attn"]["qkv"]["bias"],
        "bias_table": pr["attn"]["relative_position_bias_table"],
        "proj_kernel": pr["attn"]["proj"]["kernel"],
        "proj_bias": pr["attn"]["proj"]["bias"],
        "norm2_scale": pr["norm2"]["scale"],
        "norm2_bias": pr["norm2"]["bias"],
        "fc1_kernel": pr["mlp"]["fc1"]["kernel"],
        "fc1_bias": pr["mlp"]["fc1"]["bias"],
        "fc2_kernel": pr["mlp"]["fc2"]["kernel"],
        "fc2_bias": pr["mlp"]["fc2"]["bias"],
    }
    ref = _torch_swin_block(flat, x, h, w, dim, heads, ws, shift)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_zoo_rejects_unsupported_upsampler():
    """DRCT/HAT only implement pixelshuffle reconstruction: requesting the
    schema-legal '' (the SwinIR denoise-head selector) or
    'pixelshuffledirect' must fail at build/trace time instead of silently
    returning the un-upsampled embed-dim feature map (reference defect)."""
    import pytest

    from xmm_superres_denoise_tpu.config import (
        ModelCfg, OptimizerCfg, TransformerCfg,
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    def cfg(name, upsampler):
        return ModelCfg(
            name=name, memory_efficient=False, batch_size=1,
            model=TransformerCfg(
                base_model=name, img_size=32, window_size=8, patch_size=8,
                embed_dim=16, depths=[2], num_heads=[2], mlp_ratio=1.0,
                upsampler=upsampler, in_channels=1,
            ),
            optimizer=OptimizerCfg(learning_rate=2e-4),
        )

    with pytest.raises(ValueError, match="pixelshuffle"):
        build_model(cfg("drct", ""), (32, 32), (64, 64))


def test_trunc_normal_matches_timm_std():
    """timm trunc_normal_(std=0.02) truncates at ABSOLUTE +-2 (+-100
    sigma), effectively untruncated; truncating at +-2*std shrinks the
    sample std ~12% (regression)."""
    import jax
    import numpy as np

    from xmm_superres_denoise_tpu.models.swin_common import trunc_normal_init

    s = np.asarray(
        trunc_normal_init(0.02)(jax.random.PRNGKey(0), (200_000,))
    )
    np.testing.assert_allclose(s.std(), 0.02, rtol=0.02)
    assert np.abs(s).max() > 2.5 * 0.02  # tails beyond 2 sigma exist

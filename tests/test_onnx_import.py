"""ONNX weight import + RRDB torch-parity gate.

Builds a torch-convention state dict, serializes it into a real ONNX file
(wire-format writer), imports it onto the Flax RRDB models, and asserts
pixel-wise agreement against an independent functional torch forward — the
correctness anchor standing in for the reference's shipped ONNX checkpoints
(BASELINE.md fidelity gate; blobs stripped from the checkout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from xmm_superres_denoise_tpu.infer.onnx_import import (
    import_onnx_params,
    read_onnx_initializers,
    write_onnx_initializers,
)
from xmm_superres_denoise_tpu.models import GeneratorRRDB_DN, GeneratorRRDB_SR

NF, NB = 8, 2  # filters, rrdb blocks (tiny but structurally complete)


def _torch_state(sr: bool, seed=0):
    g = np.random.default_rng(seed)

    def w(o, i):
        return g.normal(0, 0.05, (o, i, 3, 3)).astype(np.float32)

    def b(o):
        return g.normal(0, 0.05, (o,)).astype(np.float32)

    sd = {"conv_first.weight": w(NF, 1), "conv_first.bias": b(NF)}
    for n in range(NB):
        for k in (1, 2, 3):
            for j in range(1, 6):
                cin = NF + (j - 1) * NF  # dense concats grow by gc == NF
                sd[f"rrdb.{n}.RDB{k}.conv{j}.weight"] = w(NF, cin)
                sd[f"rrdb.{n}.RDB{k}.conv{j}.bias"] = b(NF)
    sd["trunk_conv.weight"] = w(NF, NF)
    sd["trunk_conv.bias"] = b(NF)
    if sr:
        sd["upsampling.0.weight"] = w(NF * 4, NF)
        sd["upsampling.0.bias"] = b(NF * 4)
        sd["HRconv.weight"] = w(NF, NF)
        sd["HRconv.bias"] = b(NF)
    sd["conv_last.weight"] = w(1, NF)
    sd["conv_last.bias"] = b(1)
    return sd


def _t(sd, key):
    return torch.from_numpy(sd[key])


def _conv(x, sd, name):
    return F.conv2d(x, _t(sd, f"{name}.weight"), _t(sd, f"{name}.bias"), padding=1)


def _dense_block(x, sd, prefix):
    lr = lambda t: F.leaky_relu(t, 0.2)
    x1 = lr(_conv(x, sd, f"{prefix}.conv1"))
    x2 = lr(_conv(torch.cat([x, x1], 1), sd, f"{prefix}.conv2"))
    x3 = lr(_conv(torch.cat([x, x1, x2], 1), sd, f"{prefix}.conv3"))
    x4 = lr(_conv(torch.cat([x, x1, x2, x3], 1), sd, f"{prefix}.conv4"))
    x5 = _conv(torch.cat([x, x1, x2, x3, x4], 1), sd, f"{prefix}.conv5")
    return x5 * 0.2 + x


def _torch_forward(sd, x, sr: bool):
    """Functional statement of the reference RRDB forward
    (generator_rrdb.py:66-137) from a state dict."""
    fea = _conv(x, sd, "conv_first")
    t = fea
    for n in range(NB):
        inner = t
        for k in (1, 2, 3):
            inner = _dense_block(inner, sd, f"rrdb.{n}.RDB{k}")
        t = inner * 0.2 + t
    fea = fea + _conv(t, sd, "trunk_conv")
    if sr:
        up = F.leaky_relu(_conv(fea, sd, "upsampling.0"), 0.01)
        up = F.pixel_shuffle(up, 2)
        hr = F.leaky_relu(_conv(up, sd, "HRconv"), 0.2)
        out = _conv(hr, sd, "conv_last")
    else:
        out = _conv(fea, sd, "conv_last") + x
    return torch.clamp(out, 0.0, 1.0)


def test_onnx_roundtrip_reader(tmp_path):
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "conv.weight": np.random.default_rng(0).normal(size=(4, 2, 3, 3)).astype(
            np.float32
        ),
    }
    p = write_onnx_initializers(tmp_path / "m.onnx", tensors)
    back = read_onnx_initializers(p)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


@pytest.mark.parametrize("sr", [False, True])
def test_rrdb_matches_torch_via_onnx(tmp_path, sr):
    sd = _torch_state(sr, seed=3 if sr else 4)
    onnx_path = write_onnx_initializers(tmp_path / "model.onnx", sd)

    model = (
        GeneratorRRDB_SR(num_filters=NF, num_res_blocks=NB, num_upsample=1)
        if sr
        else GeneratorRRDB_DN(num_filters=NF, num_res_blocks=NB)
    )
    x_np = np.random.default_rng(5).uniform(0, 1, (1, 1, 40, 40)).astype(np.float32)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 40, 40, 1))
    )
    params = {"params": import_onnx_params(onnx_path, template["params"])}

    ours = np.asarray(
        model.apply(params, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    ref = _torch_forward(sd, torch.from_numpy(x_np), sr).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_export_import_roundtrip(tmp_path):
    """Flax params -> ONNX (torch-named) -> Flax params is the identity."""
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.infer.onnx_import import export_onnx_params

    model = GeneratorRRDB_SR(num_filters=NF, num_res_blocks=NB, num_upsample=1)
    template = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 1)))
    path = export_onnx_params(template, tmp_path / "export.onnx")

    back = import_onnx_params(path, template["params"])
    for (kp1, a), (kp2, b) in zip(
        jax.tree_util.tree_flatten_with_path(template["params"])[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------------------- #
# Round 2: transformer-zoo name mapping + strict round-trips
# --------------------------------------------------------------------------- #


def test_flax_to_torch_name_contract():
    """Pin the torch state-dict naming contract for the zoo (names derived
    from the reference module attribute structure, cited in the function)."""
    from xmm_superres_denoise_tpu.infer.onnx_import import flax_to_torch_name as f

    # RRDB (generator_rrdb.py)
    assert f("trunk/conv_first/kernel") == "conv_first.weight"
    assert f("trunk/rrdb_2/RDB1/conv3/bias") == "rrdb.2.RDB1.conv3.bias"
    assert f("upconv_1/kernel") == "upsampling.3.weight"
    # SwinIR (swinir.py / modules.py)
    assert (
        f("layers_0/residual_group/blocks_1/attn/qkv/kernel")
        == "layers.0.residual_group.blocks.1.attn.qkv.weight"
    )
    assert (
        f("layers_0/residual_group/blocks_0/norm1/scale")
        == "layers.0.residual_group.blocks.0.norm1.weight"
    )
    assert (
        f("layers_0/residual_group/blocks_0/attn/relative_position_bias_table")
        == "layers.0.residual_group.blocks.0.attn.relative_position_bias_table"
    )
    assert f("patch_embed_norm/scale") == "patch_embed.norm.weight"
    assert f("conv_before_upsample/kernel") == "conv_before_upsample.0.weight"
    assert f("upsample/conv_0/kernel") == "upsample.0.weight"
    assert f("upsample/conv_1/bias") == "upsample.2.bias"
    # SwinFIR SFB (swinfir.py:64-117)
    assert f("layers_0/conv/S/body_2/kernel") == "layers.0.conv.S.body.2.weight"
    assert f("layers_0/conv/F/conv1/kernel") == "layers.0.conv.F.conv1.0.weight"
    assert (
        f("layers_0/conv/F/fu/conv_layer/bias")
        == "layers.0.conv.F.fu.conv_layer.bias"
    )
    assert f("layers_0/conv/fusion/kernel") == "layers.0.conv.fusion.weight"
    # HAT (hat.py:19-41, 510-563): flax flattens residual_group
    assert (
        f("layers_1/blocks_0/conv_block/cab_2/kernel")
        == "layers.1.residual_group.blocks.0.conv_block.cab.2.weight"
    )
    assert (
        f("layers_1/blocks_0/conv_block/ca/attention_3/bias")
        == "layers.1.residual_group.blocks.0.conv_block.cab.3.attention.3.bias"
    )
    assert (
        f("layers_0/overlap_attn/qkv/kernel")
        == "layers.0.residual_group.overlap_attn.qkv.weight"
    )
    # DRCT (drct.py:33-124)
    assert f("layers_3/swin4/attn/proj/kernel") == "layers.3.swin4.attn.proj.weight"
    assert f("layers_3/adjust5/bias") == "layers.3.adjust5.bias"
    # Restormer (restormer.py:60-71, 173-212, 233-290)
    assert f("patch_embed/kernel") == "patch_embed.proj.weight"
    assert (
        f("encoder_level2_1/attn/qkv_dwconv/kernel")
        == "encoder_level2.1.attn.qkv_dwconv.weight"
    )
    assert f("encoder_level1_0/norm1/weight") == "encoder_level1.0.norm1.body.weight"
    assert f("latent_0/norm2/bias") == "latent.0.norm2.body.bias"
    assert f("down1_2/body/kernel") == "down1_2.body.0.weight"
    assert f("up4_3/body/kernel") == "up4_3.body.0.weight"
    assert f("encoder_level1_0/attn/temperature") == "encoder_level1.0.attn.temperature"
    assert f("reduce_chan_level2/kernel") == "reduce_chan_level2.weight"


def _roundtrip(model, x, **init_kw):
    """params -> torch-named ONNX -> import (NO shape fallback) -> exact."""
    import jax
    from pathlib import Path

    from xmm_superres_denoise_tpu.infer.onnx_import import (
        export_onnx_params,
        import_onnx_params,
    )

    params = model.init(jax.random.PRNGKey(0), x, **init_kw)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "m.onnx"
        export_onnx_params(params, p)
        got = import_onnx_params(p, params["params"], allow_shape_fallback=False)
    flat_a, _ = jax.tree_util.tree_flatten(params["params"])
    flat_b, _ = jax.tree_util.tree_flatten(got)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_zoo_onnx_roundtrip_swinir():
    from xmm_superres_denoise_tpu.models.swinir import SwinIR

    m = SwinIR(img_size=16, patch_size=1, in_chans=1, embed_dim=8, depths=(2,),
               num_heads=(2,), window_size=4, mlp_ratio=2.0, upscale=2,
               upsampler="pixelshuffle")
    _roundtrip(m, jnp.zeros((1, 16, 16, 1)))


@pytest.mark.slow
def test_zoo_onnx_roundtrip_swinfir():
    from xmm_superres_denoise_tpu.models.swinir import SwinFIR

    m = SwinFIR(img_size=16, patch_size=1, in_chans=1, embed_dim=8, depths=(1,),
                num_heads=(2,), window_size=4, mlp_ratio=2.0, upscale=2,
                upsampler="pixelshuffle")
    _roundtrip(m, jnp.zeros((1, 16, 16, 1)))


@pytest.mark.slow
def test_zoo_onnx_roundtrip_drct():
    from xmm_superres_denoise_tpu.models.drct import DRCT

    m = DRCT(img_size=16, patch_size=1, in_chans=1, embed_dim=8, depths=(2,),
             num_heads=(2,), window_size=4, gc=8, mlp_ratio=2.0, upscale=2,
             upsampler="pixelshuffle")
    _roundtrip(m, jnp.zeros((1, 16, 16, 1)))


@pytest.mark.slow
def test_zoo_onnx_roundtrip_hat():
    from xmm_superres_denoise_tpu.models.hat import HAT

    m = HAT(img_size=16, patch_size=1, in_chans=1, embed_dim=32, depths=(2,),
            num_heads=(2,), window_size=4, mlp_ratio=2.0, upscale=2,
            upsampler="pixelshuffle")
    _roundtrip(m, jnp.zeros((1, 16, 16, 1)))


@pytest.mark.slow
def test_zoo_onnx_roundtrip_restormer():
    from xmm_superres_denoise_tpu.models.restormer import Restormer

    m = Restormer(inp_channels=1, out_channels=1, dim=8, num_blocks=(1, 1, 1, 1),
                  num_refinement_blocks=1, heads=(1, 1, 1, 1),
                  ffn_expansion_factor=1.5)
    _roundtrip(m, jnp.zeros((1, 16, 16, 1)))


def test_shape_fallback_rejects_ambiguous_swin():
    """Nameless initializers + repeated same-shape blocks must ERROR, not
    silently scramble (round-1 weakness)."""
    import jax

    from xmm_superres_denoise_tpu.infer.onnx_import import (
        import_onnx_params,
        write_onnx_initializers,
    )
    from xmm_superres_denoise_tpu.models.swinir import SwinIR

    m = SwinIR(img_size=16, patch_size=1, in_chans=1, embed_dim=8, depths=(2,),
               num_heads=(2,), window_size=4, mlp_ratio=2.0, upscale=2,
               upsampler="pixelshuffle")
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    flat, _ = jax.tree_util.tree_flatten_with_path(params["params"])
    # strip ALL names (exporter-renamed graph)
    import tempfile
    from pathlib import Path

    tensors = {}
    for i, (kp, leaf) in enumerate(flat):
        arr = np.asarray(leaf)
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        tensors[f"onnx::Conv_{i}"] = arr
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "anon.onnx"
        write_onnx_initializers(p, tensors)
        with pytest.raises(ValueError, match="ambiguous|could not match"):
            import_onnx_params(p, params["params"])

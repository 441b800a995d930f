"""Runnable ONNX graph export: executed by the independent lite runtime,
it must reproduce the Flax forward (the deployment-artifact fidelity check
standing in for onnxruntime, run_inference_on_file.py:42-48)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.infer.onnx_export import export_rrdb_onnx_model
from xmm_superres_denoise_tpu.infer.onnx_import import import_onnx_params
from xmm_superres_denoise_tpu.infer.onnx_runtime_lite import (
    read_onnx_model,
    run_graph,
)
from xmm_superres_denoise_tpu.models import GeneratorRRDB_DN, GeneratorRRDB_SR


@pytest.mark.parametrize("sr", [True, False])
def test_exported_graph_runs_and_matches_flax(tmp_path, sr):
    model = (
        GeneratorRRDB_SR(num_filters=8, num_res_blocks=2, num_upsample=1)
        if sr
        else GeneratorRRDB_DN(num_filters=8, num_res_blocks=2)
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 24, 24, 1)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))  # NHWC, clamped by the model

    p = export_rrdb_onnx_model(model, params, tmp_path / "m.onnx")
    graph = read_onnx_model(p)
    assert graph.inputs == ["input"] and graph.outputs == ["output"]
    feed = np.asarray(x).transpose(0, 3, 1, 2)  # NHWC -> NCHW
    out = run_graph(graph, {"input": feed})["output"]
    got = out.transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_exported_graph_weights_reimport(tmp_path):
    """The full-graph file doubles as a weight checkpoint: import_onnx_params
    reads its torch-named initializers back onto the Flax tree."""
    model = GeneratorRRDB_SR(num_filters=8, num_res_blocks=1, num_upsample=1)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 1)))
    p = export_rrdb_onnx_model(model, params, tmp_path / "full.onnx")
    back = import_onnx_params(p, params["params"], allow_shape_fallback=False)
    for a, b in zip(
        jax.tree_util.tree_leaves(params["params"]),
        jax.tree_util.tree_leaves(back),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_graph_structure_opset_and_ops(tmp_path):
    model = GeneratorRRDB_DN(num_filters=8, num_res_blocks=1)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 1)))
    p = export_rrdb_onnx_model(model, params, tmp_path / "dn.onnx")
    g = read_onnx_model(p)
    ops = {n.op_type for n in g.nodes}
    assert ops == {"Conv", "LeakyRelu", "Concat", "Mul", "Add", "Clip"}
    convs = [n for n in g.nodes if n.op_type == "Conv"]
    # conv_first + 3 RDB x 5 + trunk_conv + conv_last = 18
    assert len(convs) == 18
    for n in convs:
        assert n.attrs["pads"] == [1, 1, 1, 1]
        assert n.attrs["kernel_shape"] == [3, 3]

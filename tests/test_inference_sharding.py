"""Multi-chip INFERENCE sharding: batch-parallel serving over a device mesh.

The training-side DP/FSDP paths are covered by tests/test_sharding.py; this
exercises the serving claim (docs/PERFORMANCE.md: "inference sharding over
`data` is linear in chips"): the S2D and int8 pipelines jit'd with a
batch-sharded NamedSharding over the 8-device CPU mesh, producing the same
result as the single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR
from xmm_superres_denoise_tpu.ops.int8_forward import make_int8_s2d_forward
from xmm_superres_denoise_tpu.ops.s2d_forward import make_s2d_sr_forward
from xmm_superres_denoise_tpu.parallel import make_mesh


def _model_and_input():
    model = GeneratorRRDB_SR(in_channels=1, out_channels=1, num_filters=8,
                             num_res_blocks=1, num_upsample=1)
    g = np.random.default_rng(0)
    x = jnp.asarray(g.uniform(0, 1, (8, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    return model, params, x


def test_s2d_forward_batch_sharded():
    model, params, x = _model_and_input()
    fwd = make_s2d_sr_forward(model, params, dtype=jnp.float32)
    ref = np.asarray(jax.jit(fwd)(x))

    mesh = make_mesh(data=8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(fwd)(xs)
    # the batch axis sharding must survive to the output
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_int8_forward_batch_sharded():
    model, params, x = _model_and_input()
    fwd = make_int8_s2d_forward(model, params, calib=x, dtype=jnp.float32)
    ref = np.asarray(jax.jit(fwd)(x))

    mesh = make_mesh(data=8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(fwd)(xs)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

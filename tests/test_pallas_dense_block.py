"""Fused dense-block kernel v2 (tap-scheme) vs the gather-form XLA graph."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # interpret-mode kernels; default path skips

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from xmm_superres_denoise_tpu.ops.pallas_dense_block import (
    dense_block_s2d_pallas,
)


def _ref_dense_block(x, weights, biases):
    """Gather-form XLA dense block (models/rrdb.py semantics in S2D space)."""

    def conv(t, w, b):
        dn = lax.conv_dimension_numbers(t.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            t, w, (1, 1), "SAME", dimension_numbers=dn
        ) + b

    feats = [x]
    for lvl in range(4):
        h = conv(jnp.concatenate(feats, -1) if lvl else x,
                 weights[lvl], biases[lvl])
        feats.append(jnp.where(h >= 0, h, 0.2 * h))
    x5 = conv(jnp.concatenate(feats, -1), weights[4], biases[4])
    return x5 * 0.2 + x


@pytest.mark.parametrize("shape,h_strip,w_tile", [
    ((1, 16, 16, 8), 8, 8),
    ((2, 24, 16, 8), 8, 16),
])
def test_fused_dense_block_matches_xla(shape, h_strip, w_tile):
    g = np.random.default_rng(0)
    b, h, w, c = shape
    x = jnp.asarray(g.normal(size=shape) * 0.3, jnp.float32)
    # weights in HWIO for the XLA reference; kernel wants the same layout
    ws = tuple(
        jnp.asarray(g.normal(size=(3, 3, k * c, c)) * 0.1, jnp.float32)
        for k in range(1, 6)
    )
    bs = tuple(
        jnp.asarray(g.normal(size=(c,)) * 0.05, jnp.float32) for _ in range(5)
    )
    ref = _ref_dense_block(x, ws, bs)
    got = dense_block_s2d_pallas(
        x, ws, bs, h_strip=h_strip, w_tile=w_tile, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

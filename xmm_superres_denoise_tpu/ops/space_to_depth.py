"""Space-to-depth conv transformation: 3x3 convs at full lane utilization.

TPU MXU lanes are 128 wide; the RRDB models' 32-channel 3x3 convs waste 3/4
of them (and Mosaic DMA slices must be 128-lane aligned). A 2x2
space-to-depth transform fixes both *exactly*:

    conv3x3(x, w)  ==  D2S( conv3x3_s2d( S2D(x), T(w) ) )

where S2D packs each 2x2 pixel block into 4x channels (torch
pixel-unshuffle order, models/rrdb.py:pixel_unshuffle) and T maps the
(3, 3, Cin, Cout) kernel onto a (3, 3, 4*Cin, 4*Cout) kernel with
structural zeros:

    y[co, 2i+di, 2j+dj] = sum_{ky,kx} w[ky,kx,ci,co] x[ci, 2i+di+ky, 2j+dj+kx]
    with di+ky = 2*bi + ri  =>  T(w)[bi+1, bj+1, ci*4+ri*2+rj, co*4+di*2+dj]
                                  = w[2bi+ri-di+1, 2bj+rj-dj+1, ci, co]

The S2D conv runs at half resolution with 4x channels: 4x the (padded)
FLOPs of the nominal op, but on full 128-wide MXU tiles instead of 32 —
net-neutral on paper and strictly better in practice because every
matmul/DMA is layout-aligned. Residual adds, LeakyReLU, and channel concats
all commute with S2D, so whole RRDB trunks can run in S2D domain with a
single S2D/D2S pair at the ends.
"""

from __future__ import annotations

import numpy as np

from ..models.rrdb import pixel_shuffle, pixel_unshuffle


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order c*4 + ri*2 + rj."""
    return pixel_unshuffle(x, 2)


def d2s(x):
    """Inverse of :func:`s2d`."""
    return pixel_shuffle(x, 2)


def s2d_conv_weights(w: np.ndarray, b: np.ndarray | None = None):
    """Transform (3, 3, Cin, Cout) SAME-conv weights to the S2D domain.

    Returns (w2, b2): w2 (3, 3, 4*Cin, 4*Cout), b2 (4*Cout,).
    """
    w = np.asarray(w)
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "s2d transform implemented for 3x3 kernels"
    w2 = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            for ri in range(2):
                for rj in range(2):
                    for bi in (-1, 0, 1):
                        ky = 2 * bi + ri - di
                        if not -1 <= ky <= 1:
                            continue
                        for bj in (-1, 0, 1):
                            kx = 2 * bj + rj - dj
                            if not -1 <= kx <= 1:
                                continue
                            w2[
                                bi + 1,
                                bj + 1,
                                ri * 2 + rj :: 4,
                                di * 2 + dj :: 4,
                            ] = w[ky + 1, kx + 1]
    b2 = None
    if b is not None:
        b2 = np.repeat(np.asarray(b), 4)  # b2[co*4 + p] = b[co]
    return w2, b2


def _s2d_transform_tensor() -> np.ndarray:
    """Constant 0/1 tensor M with
    T(w)[a, b, ci*4 + r, co*4 + d] = sum_{ky,kx} M[a,b,r,d,ky,kx] w[ky,kx,ci,co]
    — the einsum form of :func:`s2d_conv_weights`, usable under jit/grad."""
    M = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for di in range(2):
        for dj in range(2):
            for ri in range(2):
                for rj in range(2):
                    for bi in (-1, 0, 1):
                        ky = 2 * bi + ri - di
                        if not -1 <= ky <= 1:
                            continue
                        for bj in (-1, 0, 1):
                            kx = 2 * bj + rj - dj
                            if not -1 <= kx <= 1:
                                continue
                            M[bi + 1, bj + 1, ri * 2 + rj, di * 2 + dj,
                              ky + 1, kx + 1] = 1.0
    return M


_S2D_M = _s2d_transform_tensor()


def s2d_conv_weights_jnp(w, b=None):
    """Traceable (jit/grad-compatible) version of :func:`s2d_conv_weights`.

    The transform is a fixed linear scatter, so expressing it as an einsum
    against the constant pattern tensor makes it differentiable: autodiff
    through it yields EXACT gradients w.r.t. the original (3,3,Cin,Cout)
    weights — the basis of the S2D training fast path
    (`ops/s2d_forward.make_s2d_train_apply`)."""
    import jax.numpy as jnp

    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "s2d transform implemented for 3x3 kernels"
    M = jnp.asarray(_S2D_M, w.dtype)
    # (3,3,cin,4,cout,4) -> (3,3,4cin,4cout) with ci*4+r / co*4+d flattening
    t = jnp.einsum("abrdyx,yxio->abirod", M, w)
    w2 = t.reshape(3, 3, 4 * cin, 4 * cout)
    b2 = None
    if b is not None:
        b2 = jnp.repeat(b, 4)
    return w2, b2

"""Perf probes for the two formulations VERDICT r2 #5 asked to measure:

  (a) GRAPH-LEVEL Winograd F(2x2, 3x3) in the S2D domain — transforms as
      XLA elementwise/strided-slice combos, the 16 per-point contractions
      as GEMMs; no Pallas, no halo recompute. 2.25x multiply reduction vs
      direct conv; the open question is whether transform HBM traffic and
      lost conv-emitter fusion eat the win at batch 32.
  (b) Batch-into-lanes packing — 4 images x 32 ch = 128 lanes via
      feature_group_count=4 grouped conv at the NATIVE 416^2 geometry
      (exactly nominal FLOPs, no S2D 4x inflation). The open question is
      whether the TPU conv emitter runs grouped (block-diagonal) convs at
      full MXU utilization.

Timing per the axon measurement rules (docs/PERFORMANCE.md): fori-chained
with a data dependency, one full-reduction scalar readback.

Usage: python scripts/device_probe_winograd.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
C = 128          # S2D trunk width
H = W = 208      # S2D spatial
CHAIN = 10

# Winograd F(2x2, 3x3) transform matrices
G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd_weights(w):  # w: (3, 3, Cin, Cout) -> (4, 4, Cin, Cout)
    return jnp.einsum("ai,bj,ijcd->abcd", G, G, w)


def winograd_conv(x, u, dtype=jnp.bfloat16):
    """SAME 3x3 conv via F(2x2,3x3): x (B,H,W,C) with H,W even; u
    pre-transformed (4,4,Cin,Cout)."""
    n, h, w, c = x.shape
    th, tw = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    # 16 strided slices: d[a,b][n,i,j,c] = xp[n, 2i+a, 2j+b, c]
    d = [[xp[:, a : a + 2 * th : 2, b : b + 2 * tw : 2, :] for b in range(4)]
         for a in range(4)]
    # V = BT @ d @ B per tile point (elementwise linear combos)
    v = [[None] * 4 for _ in range(4)]
    for a in range(4):
        for b in range(4):
            acc = None
            for i in range(4):
                for j in range(4):
                    coef = float(BT[a, i] * BT[b, j])
                    if coef == 0.0:
                        continue
                    term = d[i][j] if coef == 1.0 else d[i][j] * coef
                    acc = term if acc is None else acc + term
            v[a][b] = acc.astype(dtype)
    # M[a,b] = V[a,b] @ U[a,b]  (16 GEMMs over Cin)
    m = [[jnp.einsum("nhwc,cd->nhwd", v[a][b], u[a, b].astype(dtype),
                     preferred_element_type=jnp.float32)
          for b in range(4)] for a in range(4)]
    # Y = AT @ M @ A -> 2x2 output quadrants
    y = [[None] * 2 for _ in range(2)]
    for p in range(2):
        for q in range(2):
            acc = None
            for a in range(4):
                for b in range(4):
                    coef = float(AT[p, a] * AT[q, b])
                    if coef == 0.0:
                        continue
                    term = m[a][b] if coef == 1.0 else m[a][b] * coef
                    acc = term if acc is None else acc + term
            y[p][q] = acc
    # interleave quadrants back to (B, H, W, Cout)
    out = jnp.stack([jnp.stack([y[0][0], y[0][1]], axis=3),
                     jnp.stack([y[1][0], y[1][1]], axis=3)], axis=2)
    # axes: n, th, 2, tw, 2, c -> n, th*2, tw*2, c
    return out.reshape(n, h, w, -1)


def _time_chain(fn, x, label):
    def chain(x):
        def body(i, acc):
            y = fn(x + acc.astype(x.dtype) * 1e-8)
            return acc + jnp.sum(y.astype(jnp.float32)) * 1e-24

        return lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    f = jax.jit(chain)
    t0 = time.perf_counter()
    float(f(x))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    per_op_ms = best / CHAIN * 1000
    print(f"{label:34s} {per_op_ms:8.2f} ms/op  (compile {compile_s:.0f}s)",
          flush=True)
    return per_op_ms


def main() -> None:
    print("devices:", jax.devices(), "batch", B, flush=True)
    g = np.random.default_rng(0)

    # ---- (a) direct vs graph-level Winograd at the S2D trunk shape ----
    x = jnp.asarray(g.uniform(-1, 1, (B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(g.normal(0, 0.05, (3, 3, C, C)), jnp.float32)
    u = winograd_weights(w)

    def direct(x):
        return lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    def wino(x):
        return winograd_conv(x, u)

    # exactness first (f32, small). TPU's default f32 conv/einsum rounds
    # operands through bf16, so force HIGHEST precision for this check —
    # otherwise both paths carry ~1e-2 rounding and the bound is meaningless.
    xs = jnp.asarray(g.uniform(-1, 1, (2, 16, 16, 8)), jnp.float32)
    ws = jnp.asarray(g.normal(0, 0.1, (3, 3, 8, 8)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = lax.conv_general_dilated(
            xs, ws, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST)
        got = winograd_conv(xs, winograd_weights(ws), dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"winograd exactness (f32, HIGHEST): max|diff| = {err:.2e}",
          flush=True)
    assert err < 1e-4, err

    t_direct = _time_chain(direct, x, f"direct conv {C}->{C} @{H}^2 b{B}")
    t_wino = _time_chain(wino, x, f"winograd F(2x2,3x3) same shape")
    print(f"winograd/direct wall ratio: {t_wino / t_direct:.2f} "
          f"(multiply ratio would be 0.44)", flush=True)

    # ---- (b) batch-into-lanes grouped conv at native 416^2 ----
    Cn, Hn = 32, 416
    xb = jnp.asarray(g.uniform(-1, 1, (B, Hn, Hn, Cn)), jnp.bfloat16)
    wn = jnp.asarray(g.normal(0, 0.05, (3, 3, Cn, Cn)), jnp.bfloat16)

    def plain(x):
        return lax.conv_general_dilated(
            x, wn, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    packed = xb.reshape(B // 4, 4, Hn, Hn, Cn).transpose(0, 2, 3, 1, 4)
    packed = packed.reshape(B // 4, Hn, Hn, 4 * Cn)
    wg = jnp.tile(wn, (1, 1, 1, 4))  # grouped kernel: (3,3,32,128), groups=4

    def grouped(x):
        return lax.conv_general_dilated(
            x, wg, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4,
            preferred_element_type=jnp.float32,
        )

    t_plain = _time_chain(plain, xb, f"plain conv {Cn}->{Cn} @{Hn}^2 b{B}")
    t_grp = _time_chain(grouped, packed,
                        f"grouped 4x packed (b{B // 4}, {4 * Cn}ch)")
    print(f"grouped/plain wall ratio: {t_grp / t_plain:.2f} "
          f"(same nominal FLOPs)", flush=True)


if __name__ == "__main__":
    main()

"""True-f32 tracing for the parity-class forward paths.

On TPU, `lax.conv_general_dilated` / `dot_general` at the DEFAULT
precision truncate f32 operands to bf16 on the MXU — so a "f32" forward
is NOT true float32 on the serving hardware. Measured on trained weights
and real example inputs (scripts/device_fidelity_classes.py): two
default-precision f32 programs (plain XLA vs the S2D rearrangement of
the same math) disagree by up to 6.6e-3 — both sit OUTSIDE the ≤1e-3
parity bar (BASELINE.md "pixel-wise within 1e-3 of ONNX") that f32 is
supposed to clear, because each is effectively a bf16-multiply program
with f32 accumulation.

The parity configuration therefore traces under
`jax.default_matmul_precision("float32")`, which lowers MXU contractions
to the bf16x3 (exact-f32) decomposition. ~3x the bf16 matmul cost — the
parity class buys fidelity with throughput, which is why serving
defaults to bf16/int8 and their HONEST measured dB classes
(docs/fidelity_classes.json). On CPU f32 is already exact and the
context is a no-op, so the ≤1e-3 verify gate means the same thing on
every backend.
"""

from __future__ import annotations

import functools

import jax


def true_f32(fn):
    """Wrap `fn` so it traces under matmul precision "float32" (HIGHEST).

    Apply BEFORE `jax.jit`: the precision config is read at trace time,
    and tracing happens inside the wrapped call."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped

"""Pallas TPU kernel: fused stencil roll-distribution for anchor deposits.

The deposit pipeline scatters all (S*C) weighted channels onto each
particle's anchor cell, transposes the buffer to offset-major, then
distributes offset o's channels to cell+o — logically

    out[c] = sum_o jnp.roll(bufT[o, c], offsets[o])

As 19 sequential XLA roll+add passes this costs ~5 GB of HBM round-trips
(measured 15.6 ms at the 100k/128^3 benchmark). This kernel does it in ONE
pass: each x-plane/y-block of the buffer is read once, the dz shifts happen
in VMEM (lane rotations), and the dx/dy shifts are deferred by writing one
output stack per distinct (dx, dy) pair — a cheap 9-stack roll/add epilogue
in XLA. HBM traffic drops to bufT (read once) + 9C planes (write + read) +
C planes (write).

Reference hot-path parity: this distributes `setCellVolFraction` /
`calcHydroForce` deposits (`/root/reference/FoamYade/FoamYade.C:318-328,
354-389`); the math is identical to the jnp.roll loop in
`coupling.deposit_stack` (equivalence-tested in interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _roll_kernel(buf_ref, out_ref, *, plan, C):
    """buf_ref: (S, C, 1, yblk, nz); out_ref: (n_combo, C, 1, yblk, nz).

    plan[ci] = list of (offset_row, dz) whose (dx, dy) equal combo ci."""
    for ci, taps in enumerate(plan):
        for c in range(C):
            acc = None
            for oi, dz in taps:
                v = buf_ref[oi, c, 0]
                if dz:
                    v = jnp.roll(v, dz, axis=-1)
                acc = v if acc is None else acc + v
            out_ref[ci, c, 0] = acc


def _pick_yblk(ny: int, s: int, c: int, nz: int) -> int:
    """Largest divisor of ny keeping the input block under ~2.5 MB."""
    budget = int(2.5e6)
    yblk = ny
    while yblk > 8 and s * c * yblk * max(nz, 128) * 4 > budget and ny % (yblk // 2) == 0:
        yblk //= 2
    return yblk


def distribute_rolls_pallas(
    bufT: jnp.ndarray,          # (S, C, nx, ny, nz)
    offsets: np.ndarray,        # (S, 3) static ints
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[c] = sum_o roll(bufT[o, c], offsets[o]) in one buffer pass."""
    S, C, nx, ny, nz = bufT.shape
    combos = sorted({(int(o[0]), int(o[1])) for o in offsets})
    plan = [
        [(oi, int(offsets[oi][2])) for oi in range(S)
         if (int(offsets[oi][0]), int(offsets[oi][1])) == combo]
        for combo in combos
    ]
    n_combo = len(combos)
    yblk = _pick_yblk(ny, S, C, nz)

    kernel = partial(_roll_kernel, plan=plan, C=C)
    stks = pl.pallas_call(
        kernel,
        grid=(nx, ny // yblk),
        in_specs=[
            pl.BlockSpec((S, C, 1, yblk, nz), lambda i, j: (0, 0, i, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (n_combo, C, 1, yblk, nz), lambda i, j: (0, 0, i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n_combo, C, nx, ny, nz), bufT.dtype),
        interpret=interpret,
    )(bufT)

    out = None
    for ci, (dx, dy) in enumerate(combos):
        v = stks[ci]
        if dx or dy:
            v = jnp.roll(v, (dx, dy), axis=(1, 2))
        out = v if out is None else out + v
    return out

"""Pallas TPU kernel: fused variable-coefficient 7-point Laplacian apply.

The pressure matvec `div(gamma_f grad p)` is the innermost op of the CG
loop — the rebuilt equivalent of the reference's hottest path, the sparse
matrix apply inside `pEqn.solve` (`/root/reference/icoFoamYade/icoFoamYade.C:118-125`).
The pure-JAX version (`stencil.laplacian_facegamma_padded`) issues one
slice/multiply/diff chain per axis which XLA mostly fuses; this kernel
guarantees the fusion: one pass over p and the three face-coefficient
arrays, one write of the result.

Layout: the kernel grids over x-planes. The sliding 3-plane window of the
padded p is expressed as three 1-plane block specs offset by 0/1/2 (Pallas
blocks tile disjointly, so overlap is encoded as multiple views); plane
shapes are VPU-friendly (last dim nz, second-to-last ny).

Falls back to interpret mode off-TPU (used by the CPU test suite).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; import is safe everywhere
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

from .grid import Grid
from .stencil import Flux


def _lap_kernel(plo_ref, pmid_ref, phi_ref, gx_ref, gy_ref, gz_ref, out_ref,
                *, hx2, hy2, hz2):
    """One x-plane of out = div(gamma_f grad p).

    plo/pmid/phi: (1, ny+2, nz+2) — padded p planes i, i+1, i+2 (i.e. the
                  x-neighbourhood of interior plane i)
    gx_ref:       (1, 2, ny, nz)  — x-face gammas at i-1/2, i+1/2
    gy_ref:       (1, ny+1, nz)   — y-face gammas
    gz_ref:       (1, ny, nz+1)   — z-face gammas
    out_ref:      (1, ny, nz)
    """
    lo = plo_ref[0, 1:-1, 1:-1]
    mid_full = pmid_ref[0]
    mid = mid_full[1:-1, 1:-1]
    hi = phi_ref[0, 1:-1, 1:-1]

    out = (gx_ref[0, 1] * (hi - mid) - gx_ref[0, 0] * (mid - lo)) * hx2

    ym = mid_full[0:-2, 1:-1]
    yp = mid_full[2:, 1:-1]
    out += (gy_ref[0, 1:, :] * (yp - mid) - gy_ref[0, :-1, :] * (mid - ym)) * hy2

    zm = mid_full[1:-1, 0:-2]
    zp = mid_full[1:-1, 2:]
    out += (gz_ref[0, :, 1:] * (zp - mid) - gz_ref[0, :, :-1] * (mid - zm)) * hz2

    out_ref[0, :, :] = out


def laplacian_facegamma_pallas(
    gamma_f: Flux,
    pp: jnp.ndarray,
    grid: Grid,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused div(gamma_f grad p) from a padded scalar pp (nx+2,ny+2,nz+2).

    Drop-in replacement for `stencil.laplacian_facegamma_padded`."""
    nx, ny, nz = (s - 2 for s in pp.shape)
    gx, gy, gz = gamma_f
    hx2 = 1.0 / grid.spacing[0] ** 2
    hy2 = 1.0 / grid.spacing[1] ** 2
    hz2 = 1.0 / grid.spacing[2] ** 2

    # per-plane gx pairs: (nx, 2, ny, nz)
    gx_pairs = jnp.stack([gx[:-1], gx[1:]], axis=1)

    kernel = partial(_lap_kernel, hx2=hx2, hy2=hy2, hz2=hz2)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams()

    def spec(blk, idx):
        if _HAS_PLTPU and not interpret:
            return pl.BlockSpec(blk, idx, memory_space=pltpu.ANY
                                if False else pltpu.VMEM)
        return pl.BlockSpec(blk, idx)

    return pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=[
            spec((1, ny + 2, nz + 2), lambda i: (i, 0, 0)),
            spec((1, ny + 2, nz + 2), lambda i: (i + 1, 0, 0)),
            spec((1, ny + 2, nz + 2), lambda i: (i + 2, 0, 0)),
            spec((1, 2, ny, nz), lambda i: (i, 0, 0, 0)),
            spec((1, ny + 1, nz), lambda i: (i, 0, 0)),
            spec((1, ny, nz + 1), lambda i: (i, 0, 0)),
        ],
        out_specs=spec((1, ny, nz), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), pp.dtype),
        interpret=interpret,
        **kwargs,
    )(pp, pp, pp, gx_pairs, gy, gz)

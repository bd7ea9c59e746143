"""Step diagnostics: Courant number, continuity errors, adaptive dt.

Rebuilds the reference's per-step observability:

* Courant mean/max — `/root/reference/pimpleFoamYade/CourantNo.H:38-49`
  (also included by icoFoamYade at `icoFoamYade.C:68`)
* adaptive time step — OpenFOAM's `setDeltaT.H` used at
  `pimpleFoamYade.C:64` (dt scaled by maxCo/Co with a 1.2x growth damper)
* continuity errors — `continuityErrs.H:33-45` (alpha-aware in the PIMPLE
  solver)

All of it is traced arithmetic inside the jitted step; host-side printing
is in `utils/logging.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..ops import stencil as st
from ..ops.grid import Grid


@dataclasses.dataclass(frozen=True)
class TimeControls:
    """Maps the controlDict time controls (`readTimeControls.H`)."""

    adjust_time_step: bool = False
    max_co: float = 0.5
    max_dt: float = 1.0
    min_dt: float = 1e-12


def courant(phi, grid: Grid, dt, ctx=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, max) Courant number — `CourantNo.H:42-45`:
    Co = 0.5 * sum_f |phi_f| A / V * dt. The reductions are the analog of
    OpenFOAM's gMax/gSum (global under sharding via psum/pmax)."""
    s = st.surface_sum_abs_over_V(phi, grid)
    co = 0.5 * s * dt
    if ctx is None:
        return jnp.mean(co), jnp.max(co)
    return ctx.mean_of_sum(jnp.sum(co), co.size), ctx.max(jnp.max(co))


def new_dt(co_max, dt, tc: TimeControls, dt_diff=None):
    """`setDeltaT.H` logic: grow at most 1.2x toward maxCo, shrink as
    needed, clamp to [min_dt, max_dt].

    ``dt_diff`` is the explicit-diffusion stability bound h²/(6 ν_eff).
    The reference never needs it — `fvm::laplacian` is implicit
    (`icoFoamYade.C:83`) — but our momentum diffusion is explicit, so with
    kEqn/kEpsilon active ν_eff can push the diffusive limit below the
    Courant-chosen dt; cap to it."""
    if not tc.adjust_time_step:
        return dt
    factor = tc.max_co / jnp.maximum(co_max, 1e-12)
    # OpenFOAM damps growth: min(factor, 1 + 0.1*factor), capped at 1.2
    factor = jnp.minimum(jnp.minimum(factor, 1.0 + 0.1 * factor), 1.2)
    out = dt * factor
    if dt_diff is not None:
        out = jnp.minimum(out, dt_diff)
    return jnp.clip(out, tc.min_dt, tc.max_dt)


def diffusive_dt_bound(grid: Grid, nu: float, nut_max, safety: float = 0.9):
    """Explicit-diffusion stable dt: safety * h_min² / (6 ν_eff_max)."""
    h2 = min(grid.spacing) ** 2
    return safety * h2 / (6.0 * (nu + jnp.maximum(nut_max, 0.0)))


def continuity_errors(phi, alpha, alpha_old, grid: Grid, dt, ctx=None):
    """(local, global) continuity error — the alpha-aware check of
    `continuityErrs.H:33-40`: contErr = ddt(alpha) + div(alpha_f phi)."""
    from ..ops.grid import FieldBC
    if ctx is None:
        from ..parallel.ctx import LOCAL
        ctx = LOCAL
    alpha_f = st.face_interp_all_padded(
        ctx.pad_s(alpha, FieldBC.uniform("neumann"))
    )
    cont = (alpha - alpha_old) / dt + st.div_flux(
        tuple(alpha_f[a] * phi[a] for a in range(3)), grid
    )
    local = ctx.mean_of_sum(jnp.sum(jnp.abs(cont)), cont.size) * dt
    glob = ctx.mean_of_sum(jnp.sum(cont), cont.size) * dt
    return local, glob

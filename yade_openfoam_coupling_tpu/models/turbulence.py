"""Turbulence closures for the phase-weighted PIMPLE solver.

Rebuilds the capability of the reference's `libDPMTurbulenceModels`
instantiation unit (`/root/reference/pimpleFoamYade/DPMTurbulenceModels/
DPMTurbulenceModels.C:37-77`), which registers for the continuous phase:

* laminar `Stokes`
* RAS `kEpsilon`
* LES `Smagorinsky` and `kEqn`

selected at run time from `turbulenceProperties` — here via
`TurbulenceConfig.model` (same four names). Transport equations are
integrated explicitly in time with semi-implicit (Patankar) sink
linearization; production uses the alpha-unweighted strain rate (the
alpha-weighted Reff refinement is documented future work in pimple.py).
Standard model constants follow the OpenFOAM defaults.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil as st
from ..ops.grid import FieldBC, Grid
from .fields import FluidState, TurbulenceState
from .piso import FluidBCs

_NEU = FieldBC.uniform("neumann")


@dataclasses.dataclass(frozen=True)
class TurbulenceConfig:
    """Maps the `turbulenceProperties` dictionary (simulationType +
    RAS/LES model selection) of an OpenFOAM case."""

    model: str = "laminar"      # 'laminar' | 'kEpsilon' | 'Smagorinsky' | 'kEqn'
    # kEpsilon constants (OpenFOAM defaults)
    c_mu: float = 0.09
    c1: float = 1.44
    c2: float = 1.92
    sigma_k: float = 1.0
    sigma_eps: float = 1.3
    # LES constants
    ck: float = 0.094           # kEqn / Smagorinsky Ck
    ce: float = 1.048           # kEqn Ce
    k_min: float = 1e-10
    eps_min: float = 1e-12
    nut_max: float = 1e2


def strain_rate_sq(u: jnp.ndarray, bcs: FluidBCs, grid: Grid, ctx=None) -> jnp.ndarray:
    """2 S:S where S = 0.5 (grad U + grad U^T) — the production kernel."""
    from ..parallel.ctx import LOCAL
    ctx = ctx if ctx is not None else LOCAL
    G = st.grad_vector_padded(ctx.pad_v(u, bcs.u), grid)
    S = 0.5 * (G + jnp.swapaxes(G, 0, 1))
    return 2.0 * jnp.sum(S * S, axis=(0, 1))


def les_delta(grid: Grid) -> float:
    """Cube-root-volume filter width (OpenFOAM `cubeRootVol`)."""
    return float(np.cbrt(grid.cell_volume))


def correct(
    turb: TurbulenceState,
    fs: FluidState,
    grid: Grid,
    bcs: FluidBCs,
    nu: float,
    dt,
    cfg: TurbulenceConfig,
    ctx=None,
) -> TurbulenceState:
    """One `continuousPhaseTurbulence->correct()` equivalent
    (`pimpleFoamYade.C:103`)."""
    from ..parallel.ctx import LOCAL
    ctx = ctx if ctx is not None else LOCAL
    if cfg.model == "laminar":
        return turb._replace(nut=jnp.zeros(fs.u.shape[1:], fs.u.dtype))

    S2 = strain_rate_sq(fs.u, bcs, grid, ctx)

    if cfg.model == "Smagorinsky":
        # nut = (Ck^1.5/Ce ~ Cs^2) Delta^2 |S|; using OpenFOAM's
        # Smagorinsky-via-k formulation constants reduces to
        # nut = Ck * Delta * sqrt(k_sgs), k_sgs = (Ck/Ce) Delta^2 S2
        d = les_delta(grid)
        k_sgs = (cfg.ck / cfg.ce) * d * d * S2
        nut = cfg.ck * d * jnp.sqrt(k_sgs)
        return turb._replace(nut=jnp.clip(nut, 0.0, cfg.nut_max),
                             k=k_sgs)

    if cfg.model == "kEqn":
        # LES one-equation: dk/dt + div(phi k) = P - Ce k^1.5/Delta
        #                   + div((nu+nut) grad k)
        d = les_delta(grid)
        k = jnp.maximum(turb.k, cfg.k_min)
        nut = turb.nut
        prod = nut * S2
        kp = ctx.pad_s(k, _NEU)
        conv = st.div_phi_scalar_padded(fs.phi, kp, grid, "upwind")
        gamma = st.face_interp_all_padded(ctx.pad_s(nu + nut, _NEU))
        diff = st.laplacian_facegamma_padded(gamma, kp, grid)
        # Patankar: sink eps = Ce k^{3/2}/Delta handled semi-implicitly
        sink_coeff = cfg.ce * jnp.sqrt(k) / d
        k_new = (k + dt * (prod - conv + diff)) / (1.0 + dt * sink_coeff)
        k_new = jnp.maximum(k_new, cfg.k_min)
        nut_new = cfg.ck * d * jnp.sqrt(k_new)
        return turb._replace(k=k_new, nut=jnp.clip(nut_new, 0.0, cfg.nut_max))

    if cfg.model == "kEpsilon":
        k = jnp.maximum(turb.k, cfg.k_min)
        eps = jnp.maximum(turb.epsilon, cfg.eps_min)
        nut = turb.nut
        prod = nut * S2

        kp = ctx.pad_s(k, _NEU)
        ep = ctx.pad_s(eps, _NEU)
        conv_k = st.div_phi_scalar_padded(fs.phi, kp, grid, "upwind")
        conv_e = st.div_phi_scalar_padded(fs.phi, ep, grid, "upwind")
        gam_k = st.face_interp_all_padded(ctx.pad_s(nu + nut / cfg.sigma_k, _NEU))
        gam_e = st.face_interp_all_padded(ctx.pad_s(nu + nut / cfg.sigma_eps, _NEU))
        diff_k = st.laplacian_facegamma_padded(gam_k, kp, grid)
        diff_e = st.laplacian_facegamma_padded(gam_e, ep, grid)

        # semi-implicit sinks: eps in k-eq, C2 eps^2/k in eps-eq
        k_new = (k + dt * (prod - conv_k + diff_k)) / (1.0 + dt * eps / k)
        e_new = (eps + dt * (cfg.c1 * prod * eps / k - conv_e + diff_e)) / (
            1.0 + dt * cfg.c2 * eps / k
        )
        k_new = jnp.maximum(k_new, cfg.k_min)
        e_new = jnp.maximum(e_new, cfg.eps_min)
        nut_new = cfg.c_mu * k_new * k_new / e_new
        return turb._replace(
            k=k_new, epsilon=e_new, nut=jnp.clip(nut_new, 0.0, cfg.nut_max)
        )

    raise ValueError(f"unknown turbulence model {cfg.model!r}")

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
linearization, PHASE-WEIGHTED like OpenFOAM's
PhaseIncompressibleTurbulenceModel: ddt(alpha k) + div(alphaPhi k)
- laplacian(alpha (nu+nut/sigma), k) = alpha (G - eps), so transport and
production vanish with the fluid fraction in dense regions (identical to
the unweighted form when alpha == 1). Standard model constants follow the
OpenFOAM defaults.
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
    # standard high-Re wall treatment for kEpsilon at wall-adjacent cells
    # (nutkWallFunction + epsilonWallFunction equivalents); OpenFOAM cases
    # for this solver family always select wall functions at walls
    wall_functions: bool = True
    kappa: float = 0.41
    e_wall: float = 9.8         # log-law E


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


def _wall_layers(grid: Grid, bcs: FluidBCs):
    """Static (mask, y) of wall-adjacent cells: mask (nx,ny,nz) bool and the
    wall distance (half the cell size on the wall axis, minimum where a
    cell touches several walls). Walls = non-periodic u-Dirichlet/SLIP
    faces, matching OpenFOAM's wall patch type."""
    from ..ops.grid import DIRICHLET, SLIP
    mask = np.zeros(grid.shape, bool)
    y = np.full(grid.shape, np.inf)
    for a in range(3):
        if bcs.u.is_periodic(a):
            continue
        lo, hi = bcs.u.faces[a]
        half = 0.5 * grid.spacing[a]
        for side, face in ((0, lo), (-1, hi)):
            if face.kind in (DIRICHLET, SLIP):
                idx = [slice(None)] * 3
                idx[a] = side
                mask[tuple(idx)] = True
                y[tuple(idx)] = np.minimum(y[tuple(idx)], half)
    y = np.where(mask, y, 1.0)
    return jnp.asarray(mask), jnp.asarray(y, jnp.float32)


def _apply_wall_functions(k, eps, nut, nu, grid, bcs, cfg: TurbulenceConfig):
    """Standard high-Re wall treatment at wall-adjacent cells:

    * epsilonWallFunction: eps_w = C_mu^{3/4} k^{3/2} / (kappa y)
    * nutkWallFunction:    u_tau = C_mu^{1/4} sqrt(k); y+ = u_tau y / nu;
                           nut_w = nu (y+ kappa / ln(E y+) - 1) for y+ above
                           the laminar sublayer, else 0.
    The reference gets these from OpenFOAM's wall-function BCs on nut/eps."""
    mask, y = _wall_layers(grid, bcs)
    cmu34 = cfg.c_mu ** 0.75
    cmu14 = cfg.c_mu ** 0.25
    k_w = jnp.maximum(k, cfg.k_min)
    eps_wall = cmu34 * k_w ** 1.5 / (cfg.kappa * y)
    u_tau = cmu14 * jnp.sqrt(k_w)
    y_plus = u_tau * y / nu
    y_lam = 11.0   # OpenFOAM yPlusLam(kappa=0.41, E=9.8) ~ 11.53
    nut_wall = nu * jnp.maximum(
        y_plus * cfg.kappa / jnp.log(jnp.maximum(cfg.e_wall * y_plus, 1.001)) - 1.0,
        0.0,
    )
    nut_wall = jnp.where(y_plus > y_lam, nut_wall, 0.0)
    return (
        jnp.where(mask, eps_wall, eps),
        jnp.where(mask, nut_wall, nut),
    )


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
        # derive the zeros from state data (not a fresh constant) so the
        # value carries the same varying-manual-axes as the rest of the
        # TurbulenceState under shard_map scans (a fresh constant is
        # device-invariant and breaks the scan carry's vma typing)
        return turb._replace(nut=fs.alpha * 0.0)

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

    # phase weighting: alpha-weighted ddt/convection/diffusion/production
    # (PhaseIncompressibleTurbulenceModel); alpha == 1 reduces exactly to
    # the single-phase forms.
    alpha = fs.alpha
    alpha_old = fs.alpha_old
    alpha_f = st.face_interp_all_padded(ctx.pad_s(alpha, _NEU))
    phi_alpha = tuple(alpha_f[a] * fs.phi[a] for a in range(3))
    a_new = jnp.maximum(alpha, 1e-3)

    if cfg.model == "kEqn":
        # LES one-equation: ddt(alpha k) + div(alphaPhi k) =
        #   alpha(P - Ce k^1.5/Delta) + div(alpha (nu+nut) grad k)
        d = les_delta(grid)
        k = jnp.maximum(turb.k, cfg.k_min)
        nut = turb.nut
        prod = alpha * nut * S2
        kp = ctx.pad_s(k, _NEU)
        conv = st.div_phi_scalar_padded(phi_alpha, kp, grid, "upwind")
        gamma = st.face_interp_all_padded(ctx.pad_s(alpha * (nu + nut), _NEU))
        diff = st.laplacian_facegamma_padded(gamma, kp, grid)
        # Patankar: sink eps = Ce k^{3/2}/Delta handled semi-implicitly
        sink_coeff = cfg.ce * jnp.sqrt(k) / d
        k_new = (alpha_old * k + dt * (prod - conv + diff)) / (
            a_new * (1.0 + dt * sink_coeff)
        )
        k_new = jnp.maximum(k_new, cfg.k_min)
        nut_new = cfg.ck * d * jnp.sqrt(k_new)
        return turb._replace(k=k_new, nut=jnp.clip(nut_new, 0.0, cfg.nut_max))

    if cfg.model == "kEpsilon":
        k = jnp.maximum(turb.k, cfg.k_min)
        eps = jnp.maximum(turb.epsilon, cfg.eps_min)
        nut = turb.nut
        prod = alpha * nut * S2

        kp = ctx.pad_s(k, _NEU)
        ep = ctx.pad_s(eps, _NEU)
        conv_k = st.div_phi_scalar_padded(phi_alpha, kp, grid, "upwind")
        conv_e = st.div_phi_scalar_padded(phi_alpha, ep, grid, "upwind")
        gam_k = st.face_interp_all_padded(
            ctx.pad_s(alpha * (nu + nut / cfg.sigma_k), _NEU))
        gam_e = st.face_interp_all_padded(
            ctx.pad_s(alpha * (nu + nut / cfg.sigma_eps), _NEU))
        diff_k = st.laplacian_facegamma_padded(gam_k, kp, grid)
        diff_e = st.laplacian_facegamma_padded(gam_e, ep, grid)

        # semi-implicit sinks: eps in k-eq, C2 eps^2/k in eps-eq
        k_new = (alpha_old * k + dt * (prod - conv_k + diff_k)) / (
            a_new * (1.0 + dt * eps / k)
        )
        e_new = (alpha_old * eps + dt * (cfg.c1 * prod * eps / k - conv_e + diff_e)) / (
            a_new * (1.0 + dt * cfg.c2 * eps / k)
        )
        k_new = jnp.maximum(k_new, cfg.k_min)
        e_new = jnp.maximum(e_new, cfg.eps_min)
        nut_new = cfg.c_mu * k_new * k_new / e_new
        if cfg.wall_functions:
            e_new, nut_new = _apply_wall_functions(
                k_new, e_new, nut_new, nu, grid, bcs, cfg
            )
            e_new = jnp.maximum(e_new, cfg.eps_min)
        return turb._replace(
            k=k_new, epsilon=e_new, nut=jnp.clip(nut_new, 0.0, cfg.nut_max)
        )

    raise ValueError(f"unknown turbulence model {cfg.model!r}")

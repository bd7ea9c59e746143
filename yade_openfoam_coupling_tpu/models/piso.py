"""PISO pressure-velocity solver: the icoFoamYade-equivalent fluid step.

Re-derives the algorithm of `/root/reference/icoFoamYade/icoFoamYade.C:77-140`
in a TPU-native form:

* momentum: implicit Euler in time with the coupling drag semi-implicit in
  the diagonal; convection and diffusion are explicit deferred terms. The
  OpenFOAM A/H operator split (`UEqn.A()`, `UEqn.H()`,
  `icoFoamYade.C:99-100`) then reduces to A = 1/dt - uSourceDrag and
  H = U_n/dt - div(phi,U) + nu lap(U) + uSource, which keeps the Rhie-Chow
  HbyA flux machinery intact on the collocated grid while avoiding an
  implicit momentum solve per component (an explicit-convection step is
  CFL-limited either way under the adaptive-dt control).
* corrector: each PISO corrector recomputes H from the latest corrected U
  (Picard), mirrors `while piso.correct()` (`icoFoamYade.C:97-140`), and
  solves div(rAU_f grad p) = div(phiHbyA) matrix-free with MG-PCG.
* non-orthogonal correctors (`icoFoamYade.C:114`) are intentionally absent:
  the grid is orthogonal, so one pressure solve per corrector is exact
  (SURVEY.md §7 hard part (e) — documented divergence).
* `fvc::ddtCorr` (`icoFoamYade.C:105`) and `adjustPhi` (`:108`) are
  omitted/unnecessary: the flux is rebuilt from HbyA each corrector, and
  closed/periodic domains satisfy global solvability exactly.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import pressure as pr
from ..ops import stencil as st
from ..ops.grid import FieldBC, Grid
from .fields import FluidState


@dataclasses.dataclass(frozen=True)
class FluidBCs:
    """BCs for the primary fields (the role of the 0/ time directory in an
    OpenFOAM case)."""

    u: FieldBC
    p: FieldBC

    @staticmethod
    def periodic() -> "FluidBCs":
        return FluidBCs(FieldBC.periodic(), FieldBC.periodic())

    @staticmethod
    def box_noslip() -> "FluidBCs":
        from ..ops.grid import DIRICHLET, NEUMANN
        return FluidBCs(FieldBC.box(DIRICHLET, 0.0), FieldBC.box(NEUMANN))

    @staticmethod
    def channel_z() -> "FluidBCs":
        from ..ops.grid import DIRICHLET, NEUMANN
        from ..ops.grid import FaceBC, PERIODIC
        p = FaceBC(PERIODIC)
        return FluidBCs(
            FieldBC(((p, p), (p, p), (FaceBC(DIRICHLET, 0.0), FaceBC(DIRICHLET, 0.0)))),
            FieldBC(((p, p), (p, p), (FaceBC(NEUMANN), FaceBC(NEUMANN)))),
        )

    def periodic_axes(self) -> Tuple[bool, bool, bool]:
        return tuple(self.u.is_periodic(a) for a in range(3))


@dataclasses.dataclass(frozen=True)
class PISOConfig:
    """Maps the reference's PISO controls (fvSolution `PISO` dict read by
    `pisoControl`, plus the pressure solver sub-dict)."""

    n_correctors: int = 2
    momentum_predictor: bool = True
    convection_scheme: str = "linear"   # fvSchemes div(phi,U)
    pressure: pr.PressureSolverConfig = pr.PressureSolverConfig()
    # fvc::ddtCorr(U, phi) (`icoFoamYade.C:105`): Rhie-Chow temporal flux
    # history — phiHbyA gains rAU_f * c_f * (phi^n - flux(U^n))/dt with
    # the OpenFOAM Euler-scheme limiter
    # c_f = 1 - min(|phi^n - flux(U^n)| / (|phi^n| + eps), 1), making the
    # face flux carry its own old-time term instead of interp(U^n).
    # MEASURED (tests/test_ddtcorr.py, VERDICT r3 item 9): our phiHbyA is
    # rebuilt from HbyA every corrector, so a face/cell inconsistency
    # vanishes in one step WITHOUT the term (mismatch 245 -> 1e-3 in 10
    # steps), while WITH it the history is deliberately retained
    # (-> 14.4) and Taylor-Green rms error at Co~0.8 grows 1.6e-3 ->
    # 1.5e-2 (the retained O(h^2) Rhie-Chow offset feeds back). Decision:
    # available for reference-exact assembly, default OFF — the rebuilt
    # flux subsumes the consistency role, measurably better.
    ddt_corr: bool = False


class PressureSolveInfo(NamedTuple):
    iters: jnp.ndarray
    initial_residual: jnp.ndarray
    final_residual: jnp.ndarray


_NEU = FieldBC.uniform("neumann")


def momentum_AH(
    fs: FluidState,
    grid: Grid,
    bcs: FluidBCs,
    nu_eff: jnp.ndarray,
    dt,
    cfg: PISOConfig,
    u_latest: Optional[jnp.ndarray] = None,
    g: Optional[jnp.ndarray] = None,
    ctx=None,
):
    """A (diagonal, scalar field) and H (explicit operator value) of the
    momentum equation ddt(U) + div(phi,U) - lap(nu,U) == uSource
    (`icoFoamYade.C:79-85`), with drag folded implicitly via
    A -= uSourceDrag (the `fvm::Sp(uSourceDrag, Uc)` trick of `UcEqn.H:9`
    also applies in 2-way mode where uSourceDrag == 0)."""
    from ..parallel.ctx import LOCAL
    ctx = ctx if ctx is not None else LOCAL
    u_expl = fs.u if u_latest is None else u_latest
    up = ctx.pad_v(u_expl, bcs.u)
    conv = st.div_phi_vector_padded(fs.phi, up, grid, cfg.convection_scheme)
    if jnp.ndim(nu_eff) == 0:
        diff = nu_eff * st.laplacian_vector_padded(up, grid)
    else:
        nu_f = st.face_interp_all_padded(ctx.pad_s(nu_eff, _NEU))
        diff = st.laplacian_gamma_vector_padded(nu_f, up, grid)

    A = 1.0 / dt - fs.u_source_drag              # (grid,) scalar field
    H = fs.u / dt - conv + diff + fs.u_source
    if g is not None:
        H = H + g[:, None, None, None]
    return A, H


def piso_step(
    fs: FluidState,
    grid: Grid,
    bcs: FluidBCs,
    nu: jnp.ndarray | float,
    dt,
    cfg: PISOConfig = PISOConfig(),
    ctx=None,
    masks=None,
) -> Tuple[FluidState, PressureSolveInfo]:
    """One PISO time step (the fluid half of the icoFoamYade loop body,
    `icoFoamYade.C:77-140`). Coupling fields in `fs` are inputs; call
    the coupling engine first (as the reference calls `setParticleAction`
    before the momentum predictor, `icoFoamYade.C:74`).

    `ctx` selects single-device BC ghosts (default) or shard halos.
    `masks` (an `ops.obstacle.ObstacleMasks`) activates the masked-cell
    immersed-boundary treatment: velocity pinned in solid cells, fluxes
    blocked at solid faces, solid pressure rows handled by
    `solve_pressure(solid=...)` — the role of OpenFOAM's body-fitted
    meshing of internal geometry (single-device only)."""
    from ..parallel.ctx import LOCAL, LocalCtx
    ctx = ctx if ctx is not None else LOCAL
    if masks is not None:
        from ..ops import obstacle as ob
        assert isinstance(ctx, LocalCtx), (
            "masked-cell obstacles: single-device only (masks are not "
            "sliced per shard yet)")
    A, H = momentum_AH(fs, grid, bcs, nu, dt, cfg, ctx=ctx)
    rAU = 1.0 / A
    HbyA = rAU[None] * H

    u = fs.u
    if cfg.momentum_predictor:
        gp = st.grad_scalar_padded(ctx.pad_s(fs.p, bcs.p), grid)
        u = HbyA - rAU[None] * gp
        if masks is not None:
            u = ob.mask_u(u, masks)

    p = fs.p
    phi = fs.phi
    info = None
    pcfg = cfg.pressure
    precond_bc = None
    if not isinstance(ctx, LocalCtx):
        # block-local (additive-Schwarz) preconditioning: homogeneous BCs
        # with Dirichlet-0 on sharded-axis faces (shard-internal edges)
        precond_bc = _precond_bc_for(bcs.p, ctx)
    if cfg.ddt_corr:
        # old-time face/cell flux inconsistency + OpenFOAM's limiter
        # (PISOConfig.ddt_corr; both at time level n, fixed across
        # correctors as in EulerDdtScheme::fvcDdtPhiCorr)
        flux_uo = st.flux_padded(ctx.pad_v(fs.u, bcs.u), grid)
        dphi = tuple(fs.phi[a] - flux_uo[a] for a in range(3))
        ddtc = tuple(
            (1.0 - jnp.minimum(
                jnp.abs(dphi[a]) / (jnp.abs(fs.phi[a]) + 1e-30), 1.0))
            * dphi[a] / dt
            for a in range(3)
        )
    for _ in range(cfg.n_correctors):
        # recompute H with the latest U (Picard step, plays the role of
        # OpenFOAM's updated UEqn.H() between correctors)
        A, H = momentum_AH(fs, grid, bcs, nu, dt, cfg, u_latest=u, ctx=ctx)
        rAU = 1.0 / A
        HbyA = rAU[None] * H

        phiHbyA = st.flux_padded(ctx.pad_v(HbyA, bcs.u), grid)
        if cfg.ddt_corr:
            rAU_f = st.face_interp_all_padded(ctx.pad_s(rAU, _NEU))
            phiHbyA = tuple(
                phiHbyA[a] + rAU_f[a] * ddtc[a] for a in range(3))
        phiHbyA = st.constrain_flux(phiHbyA, bcs.u, ctx)
        if masks is not None:
            # blocked-face flux pin (the obstacle's fixedFluxPressure role)
            phiHbyA = ob.mask_flux(phiHbyA, masks)
        if _needs_adjust_phi(bcs):
            # inlet/outflow global mass balance (adjustPhi, icoFoamYade.C:108)
            phiHbyA = st.adjust_phi(phiHbyA, bcs.u, grid, ctx, ctx.sum)
        gamma_f = st.face_interp_all_padded(ctx.pad_s(rAU, _NEU))
        if masks is not None:
            gamma_f = ob.mask_flux(gamma_f, masks)
        rhs = st.div_flux(phiHbyA, grid)
        res = pr.solve_pressure(
            gamma_f, rhs, p, grid, bcs.p, pcfg,
            pad=lambda f: ctx.pad_s(f, bcs.p), reduce_sum=ctx.sum,
            precond_bc=precond_bc, solid=masks,
        )
        p = res.x
        # step-level info: first solve's initial residual, last solve's
        # final residual, total iterations (see pimple_step — a warm-started
        # later corrector converges at entry, so per-solve info is not a
        # meaningful step convergence record)
        info = PressureSolveInfo(
            res.iters if info is None else info.iters + res.iters,
            res.initial_residual if info is None else info.initial_residual,
            res.residual)

        pp = ctx.pad_s(p, bcs.p)
        snp = st.face_grad_padded(pp, grid)
        phi = tuple(phiHbyA[a] - gamma_f[a] * snp[a] for a in range(3))
        gp = st.grad_scalar_padded(pp, grid)
        u = HbyA - rAU[None] * gp
        if masks is not None:
            u = ob.mask_u(u, masks)

    new = fs._replace(u=u, p=p, phi=phi)
    return new, info


def _needs_adjust_phi(bcs: FluidBCs) -> bool:
    """adjustPhi applies when the pressure equation is singular (no fixed-
    pressure outlet) AND adjustable (Neumann-u) outflow faces exist."""
    from ..ops.grid import DIRICHLET, NEUMANN
    p_fixed = any(f.kind == DIRICHLET for pair in bcs.p.faces for f in pair)
    u_adjustable = any(f.kind == NEUMANN for pair in bcs.u.faces for f in pair)
    return (not p_fixed) and u_adjustable


def _precond_bc_for(p_bc: FieldBC, ctx) -> FieldBC:
    """Homogenized pressure BC for block-local preconditioning under
    sharding: sharded-axis faces become Dirichlet-0 (shard-internal edges),
    which keeps each local block non-singular (additive Schwarz)."""
    from ..ops.grid import DIRICHLET, FaceBC
    faces = []
    h = p_bc.homogeneous()
    for a in range(3):
        if ctx.mesh_axes[a] is not None:
            faces.append((FaceBC(DIRICHLET, 0.0), FaceBC(DIRICHLET, 0.0)))
        else:
            faces.append(h.faces[a])
    return FieldBC(tuple(faces))

"""PIMPLE 4-way pressure-velocity solver: the pimpleFoamYade equivalent.

Re-derives `/root/reference/pimpleFoamYade/{pimpleFoamYade.C,UcEqn.H,pEqn.H}`
(the DPMFoam-family phase-fraction-weighted PIMPLE loop) TPU-natively:

* phase momentum (`UcEqn.H:3-10`):
      ddt(alphac,Uc) + div(alphaPhic,Uc)
    - Sp(ddt(alphac)+div(alphaPhic), Uc)
    + divDevRhoReff(Uc)  ==  Sp(uSourceDrag, Uc)
  Implicit Euler diagonal with the two Sp terms (phase-continuity
  correction and the semi-implicit drag) folded into A; convection and the
  alpha-weighted viscous stress are explicit deferred terms recomputed each
  outer iteration (Picard), playing the role of OpenFOAM's updated
  UEqn.A()/H().
* body forces enter through the face flux `phicForces = flux(rAUc*uSource)
  + rAUcf*(g & Sf)` (`UcEqn.H:17-20`) — never as a cell-centred source —
  which is what keeps hydrostatic balance discretely exact.
* pressure (`pEqn.H:26-35`):
      laplacian(alphacf*rAUcf, p) == ddt(alphac) + div(alphacf*phiHbyA)
  solved matrix-free by MG-PCG; flux and velocity reconstruction follow
  `pEqn.H:39-45`.
* the FULL phase-incompressible stress `divDevRhoReff(Uc)` (`UcEqn.H:6`):
  the alpha-weighted Laplacian PLUS the explicit deviatoric transpose term
  div(alpha nu_eff dev2(grad(U)^T)) — a pure gradient absorbed by p for
  incompressible single-phase flow, but a real force where grad(alpha) is
  large (dense beds). Disable with `full_stress=False` for speed in dilute
  cases.
* equation under-relaxation (`UcEqn.relax()`, `UcEqn.H:12`, driven by
  fvSolution `relaxationFactors`): the implicit diagonal is inflated to
  A/lambda with the source anchored at the previous outer iterate so fixed
  points are unchanged; p is relaxed between (non-final) outer iterations.
  OpenFOAM skips relaxation on the final PIMPLE iteration; so do we.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import pressure as pr
from ..ops import stencil as st
from ..ops.grid import FieldBC, Grid
from .fields import FluidState
from .piso import FluidBCs, PressureSolveInfo, _needs_adjust_phi, _precond_bc_for


@dataclasses.dataclass(frozen=True)
class PIMPLEConfig:
    """Maps the reference's PIMPLE controls (fvSolution `PIMPLE` dict)."""

    n_outer: int = 2            # pimple.loop() outer correctors
    n_correctors: int = 1       # pimple.correct() pressure correctors
    momentum_predictor: bool = False
    convection_scheme: str = "linear"
    pressure: pr.PressureSolverConfig = pr.PressureSolverConfig()
    # full divDevRhoReff: include the explicit dev2-transpose stress term
    full_stress: bool = True
    # fvSolution relaxationFactors: equations "U.*" / fields "p"
    # (1.0 = no relaxation; applied on non-final outer iterations only,
    # matching OpenFOAM's finalIter behavior)
    relax_u: float = 1.0
    relax_p: float = 1.0
    # warm-start extrapolation: the FIRST pressure solve of the step
    # starts from p + c*(p - p_prev) (requires FluidState.p_prev, carried
    # by coupled_step). 0 = start from p, the OpenFOAM behavior. Only the
    # initial guess changes; the converged solution does not.
    p_extrapolate: float = 0.0
    # IMPLICIT momentum diffusion (the reference's `fvm::laplacian(nuEff,U)`
    # inside an implicit momentum solve, UcEqn.H:6): solve a per-component
    # Helmholtz system  (alpha/dt - Sp)*u - div(alpha*nu_eff grad u) = H
    # instead of deferring the viscous Laplacian explicitly. Removes the
    # explicit-diffusion dt cap h^2/(6 nu_eff) (`coupled_step` skips
    # `diffusive_dt_bound`), so high-nu / strongly turbulent cases step at
    # the Courant limit like the reference. Requires full_stress=False:
    # the dev2-transpose term is itself a nu_eff-scaled EXPLICIT operator
    # (OpenFOAM keeps it explicit too) and measured unstable beyond ~2-3x
    # the explicit bound on this collocated discretization — even under
    # over-implicit deferred correction (doubled implicit Laplacian;
    # tried, the wide-stencil grad∘div spectrum defeats it) — so running
    # it would silently re-impose the cap this feature removes.
    # Documented divergence: dev2 matters where grad(alpha nu_eff) is
    # strong (dense beds); those cases keep the explicit path. HbyA
    # becomes u* - rAU*F_old (the matrix-free H()/A() identity, with the
    # reconstructed force on the predictor RHS as in OpenFOAM's
    # `solve(UcEqn == fvc::reconstruct(...))`). Costs 3 Jacobi-PCG solves
    # per outer iteration; off by default (the bench's explicit path is
    # cheaper at its nu).
    implicit_diffusion: bool = False
    # solver controls for the Helmholtz momentum solves (`solver` ignored:
    # always Jacobi-PCG — see ops.pressure.solve_helmholtz)
    momentum: pr.PressureSolverConfig = pr.PressureSolverConfig(
        solver="pcg", tol=1e-6, maxiter=100)


_NEU = FieldBC.uniform("neumann")


def pimple_step(
    fs: FluidState,
    grid: Grid,
    bcs: FluidBCs,
    nu: float,
    nut: jnp.ndarray,
    g: jnp.ndarray,
    dt,
    cfg: PIMPLEConfig = PIMPLEConfig(),
    ctx=None,
    masks=None,
) -> Tuple[FluidState, PressureSolveInfo]:
    """One PIMPLE step. `fs.alpha/u_source/u_source_drag/u_particle` must
    already hold this step's coupling output (the reference calls
    `setParticleAction` before the corrector loop,
    `pimpleFoamYade.C:78-91`).

    `masks` activates the masked-cell obstacle treatment (see
    `piso.piso_step` / `ops.obstacle`); single-device, explicit
    diffusion only."""
    from ..parallel.ctx import LOCAL, LocalCtx
    ctx = ctx if ctx is not None else LOCAL
    assert not (cfg.implicit_diffusion and cfg.full_stress), (
        "implicit_diffusion requires full_stress=False: the explicit "
        "dev2-transpose term re-imposes the diffusion dt cap "
        "(PIMPLEConfig.implicit_diffusion docs)")
    if masks is not None:
        from ..ops import obstacle as ob
        assert isinstance(ctx, LocalCtx), (
            "masked-cell obstacles: single-device only")
        assert not cfg.implicit_diffusion, (
            "masked-cell obstacles: the Helmholtz momentum solves do not "
            "carry the solid rows yet — use explicit diffusion")
    alpha = fs.alpha
    alpha_old = fs.alpha_old
    alpha_f = st.face_interp_all_padded(ctx.pad_s(alpha, _NEU))  # alphacf
    phi_alpha = tuple(alpha_f[a] * fs.phi[a] for a in range(3))  # alphaPhic

    ddt_alpha = (alpha - alpha_old) / dt
    div_phi_alpha = st.div_flux(phi_alpha, grid)
    sp_cont = ddt_alpha + div_phi_alpha

    nu_eff = nu + nut
    gamma_visc = st.face_interp_all_padded(ctx.pad_s(alpha * nu_eff, _NEU))

    u = fs.u
    p = fs.p
    phi = fs.phi
    info = None
    pcfg = cfg.pressure
    precond_bc = None
    if not isinstance(ctx, LocalCtx):
        precond_bc = _precond_bc_for(bcs.p, ctx)

    for _outer in range(cfg.n_outer):
        final = _outer == cfg.n_outer - 1
        up = ctx.pad_v(u, bcs.u)
        conv = st.div_phi_vector_padded(phi_alpha, up, grid, cfg.convection_scheme)
        if cfg.implicit_diffusion:
            visc = jnp.zeros_like(u)   # the Laplacian moves into the matrix
        else:
            visc = st.laplacian_gamma_vector_padded(gamma_visc, up, grid)
        if cfg.full_stress:
            # the dev2(T(grad U)) half of divDevRhoReff (UcEqn.H:6) —
            # explicit in OpenFOAM too
            G = st.grad_vector_padded(up, grid)
            C = st.dev2_transpose_stress(G, alpha * nu_eff)
            visc = visc + st.div_tensor(C, grid, lambda f: ctx.pad_s(f, _NEU))

        # fvm::ddt(alphac, Uc): (alpha^{n+1} u^{n+1} - alpha^n u^n)/dt ->
        # diagonal alpha^{n+1}/dt, source alpha^n u^n/dt. The source MUST
        # anchor at u^n (= fs.u, the pre-step velocity): anchoring one
        # level further back (u^{n-1}) while the deferred convection/
        # diffusion use u^n makes the scheme leapfrog — unconditionally
        # unstable for diffusion.
        A = alpha / dt - sp_cont - fs.u_source_drag
        H = alpha_old * fs.u / dt - conv + visc
        if cfg.implicit_diffusion:
            # full diagonal incl. the (interior-stencil) Laplacian rows
            mgrid_u = Grid(tuple(alpha.shape), grid.spacing, grid.origin)
            D = A - pr.poisson_diag(gamma_visc, mgrid_u, None)
            if cfg.relax_u < 1.0 and not final:
                lam = cfg.relax_u
                H = H + ((1.0 - lam) / lam) * D[None] * u
                A = A + ((1.0 - lam) / lam) * D
                D = D / lam
            rAU = 1.0 / D
        else:
            if cfg.relax_u < 1.0 and not final:
                # UcEqn.relax(): inflate the diagonal, anchor the extra
                # source at the current outer iterate (fixed points
                # unchanged)
                lam = cfg.relax_u
                H = H + ((1.0 - lam) / lam) * A[None] * u
                A = A / lam
            rAU = 1.0 / A
        rAU_f = st.face_interp_all_padded(ctx.pad_s(rAU, _NEU))  # rAUcf ("Dp")

        # phicForces (UcEqn.H:17-20): body-force face flux
        force_flux = st.flux_padded(ctx.pad_v(rAU[None] * fs.u_source, _NEU), grid)
        phic_forces = tuple(
            force_flux[a] + rAU_f[a] * g[a] for a in range(3)
        )
        if masks is not None:
            # body forces cannot push flux through blocked faces
            phic_forces = ob.mask_flux(phic_forces, masks)

        if cfg.implicit_diffusion:
            # The predictor must SEE the current pressure/body forces
            # (OpenFOAM solves `UcEqn == fvc::reconstruct(phicForces/rAUcf
            # - snGrad(p))`, UcEqn.H:23-31): with rAU = 1/D and diffusion
            # inside the matrix, a force-free predictor would leave the
            # steady balance scaled by A/D. Solve with the reconstructed
            # force at the CURRENT p on the RHS, then subtract its rAU
            # image from HbyA — the corrector re-adds it at the NEW p, so
            # the force telescopes exactly (HbyA = u* - rAU*F_old, the
            # matrix-free H()/A() identity).
            snp0 = st.face_grad_padded(ctx.pad_s(p, bcs.p), grid)
            rec_F = st.reconstruct(tuple(
                phic_forces[a] / rAU_f[a] - snp0[a] for a in range(3)))
            comps = []
            for c in range(3):
                bc_c = bcs.u.component(c)
                pbc_c = None
                if not isinstance(ctx, LocalCtx):
                    pbc_c = _precond_bc_for(bc_c, ctx)
                res_c = pr.solve_helmholtz(
                    A, gamma_visc, H[c] + rec_F[c], u[c], grid, bc_c,
                    cfg.momentum,
                    pad=lambda f, _bc=bc_c: ctx.pad_s(f, _bc),
                    reduce_sum=ctx.sum,
                    precond_bc=pbc_c,
                )
                comps.append(res_c.x)
            u = jnp.stack(comps)                   # the momentum predictor
            HbyA = u - rAU[None] * rec_F
        else:
            HbyA = rAU[None] * H

        if cfg.momentum_predictor:
            snp = st.face_grad_padded(ctx.pad_s(p, bcs.p), grid)
            u = HbyA + rAU[None] * st.reconstruct(
                tuple(phic_forces[a] / rAU_f[a] - snp[a] for a in range(3))
            )
            if masks is not None:
                u = ob.mask_u(u, masks)

        p_outer = p
        if (_outer == 0 and cfg.p_extrapolate != 0.0
                and fs.p_prev is not None):
            p = p + cfg.p_extrapolate * (p - fs.p_prev)
        for _corr in range(cfg.n_correctors):
            phiHbyA = st.flux_padded(ctx.pad_v(HbyA, bcs.u), grid)
            phiHbyA = tuple(phiHbyA[a] + phic_forces[a] for a in range(3))
            # prescribe wall fluxes (constrainHbyA + fixedFluxPressure role)
            phiHbyA = st.constrain_flux(phiHbyA, bcs.u, ctx)
            if masks is not None:
                phiHbyA = ob.mask_flux(phiHbyA, masks)
            if _needs_adjust_phi(bcs):
                # `if (p.needReference()) adjustPhi(...)`, pEqn.H:20-23
                phiHbyA = st.adjust_phi(phiHbyA, bcs.u, grid, ctx, ctx.sum)

            gamma_p = tuple(alpha_f[a] * rAU_f[a] for a in range(3))
            if masks is not None:
                gamma_p = ob.mask_flux(gamma_p, masks)
            rhs = ddt_alpha + st.div_flux(
                tuple(alpha_f[a] * phiHbyA[a] for a in range(3)), grid
            )
            if masks is not None:
                # solid cells carry no continuity equation (ddt_alpha may be
                # nonzero there only if particles overlap the obstacle —
                # masked out with the row)
                rhs = rhs * masks.fluid
            res = pr.solve_pressure(
                gamma_p, rhs, p, grid, bcs.p, pcfg,
                pad=lambda f: ctx.pad_s(f, bcs.p), reduce_sum=ctx.sum,
                precond_bc=precond_bc, solid=masks,
            )
            p = res.x
            # step-level solve info: the FIRST solve's initial residual,
            # the LAST solve's final residual, and the TOTAL iterations —
            # under multiple correctors the last solve alone is warm-started
            # and converges at entry (final == initial), which would make a
            # "did the step converge" assertion vacuous or falsely failing
            info = PressureSolveInfo(
                res.iters if info is None else info.iters + res.iters,
                res.initial_residual if info is None else info.initial_residual,
                res.residual)

            snp = st.face_grad_padded(ctx.pad_s(p, bcs.p), grid)
            # pEqn.flux()/alphacf = rAU_f * snGrad(p)
            if masks is not None:
                # the pressure flux rides the MASKED coefficient (gamma_p /
                # alpha_f): an unmasked rAU_f would reopen blocked faces —
                # snGrad(p) across a solid face is nonzero by construction
                snp = ob.mask_flux(snp, masks)
            pflux_over_alpha = tuple(rAU_f[a] * snp[a] for a in range(3))
            phi = tuple(phiHbyA[a] - pflux_over_alpha[a] for a in range(3))
            u = HbyA + rAU[None] * st.reconstruct(
                tuple((phic_forces[a] - pflux_over_alpha[a]) / rAU_f[a] for a in range(3))
            )
            if masks is not None:
                u = ob.mask_u(u, masks)
        if cfg.relax_p < 1.0 and not final:
            # p.relax(): blend toward the previous outer iterate (flux and
            # velocity above already used the unrelaxed solve, as OpenFOAM
            # does before relaxing)
            p = p_outer + cfg.relax_p * (p - p_outer)
        # refresh the alpha-weighted convective flux for the next outer pass
        phi_alpha = tuple(alpha_f[a] * phi[a] for a in range(3))
        div_phi_alpha = st.div_flux(phi_alpha, grid)
        sp_cont = ddt_alpha + div_phi_alpha

    new = fs._replace(u=u, p=p, phi=phi)
    return new, info

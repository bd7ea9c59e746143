"""Matrix-free pressure solvers: Jacobi-PCG and geometric-multigrid PCG.

Replaces the reference's hottest path — the OpenFOAM sparse linear solve of
the pressure-correction equation (`/root/reference/icoFoamYade/icoFoamYade.C:118-125`
``fvm::laplacian(rAU, p) == fvc::div(phiHbyA)`` and
`/root/reference/pimpleFoamYade/pEqn.H:26-35`
``fvm::laplacian(alphacf*rAUcf, p) == ddt(alphac)+div(alphacf*phiHbyA)``),
where OpenFOAM dispatches to PCG/GAMG via the fvSolution dictionary.

TPU-first design choices:

* the operator is never assembled — each CG matvec is one fused 7-point
  stencil sweep (`laplacian_facegamma_padded`), which XLA fuses with the
  surrounding axpys; a Pallas kernel variant lives in ``pallas_stencil.py``.
* iteration happens inside ``lax.while_loop`` with static shapes, so the
  entire PISO/PIMPLE step stays inside one jitted program.
* reductions (dot products) go through a caller-supplied ``reduce_sum`` so
  the identical solver code runs per-shard under ``shard_map`` with
  ``lax.psum`` over ICI (the analog of OpenFOAM's Pstream global reductions
  inside PCG).
* GAMG's role is played by a geometric V-cycle used as a CG preconditioner
  (the grid is uniform, so geometric coarsening beats algebraic).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .grid import FieldBC, Grid, pad_scalar
from .stencil import Flux, laplacian_facegamma_padded

PadFn = Callable[[jnp.ndarray], jnp.ndarray]
ReduceFn = Callable[[jnp.ndarray], jnp.ndarray]


def default_pad(bc: FieldBC) -> PadFn:
    return lambda f: pad_scalar(f, bc)


def _ident(x):
    return x


# ---------------------------------------------------------------------------
# Operator and diagonal
# ---------------------------------------------------------------------------

def _pallas_mode() -> str:
    """'tpu' (compiled kernel), 'interpret' (CPU test coverage) — resolved
    once at trace time."""
    import jax
    return "tpu" if jax.default_backend() == "tpu" else "interpret"


def poisson_apply(p: jnp.ndarray, gamma_f: Flux, grid: Grid, pad: PadFn,
                  use_pallas: bool = False) -> jnp.ndarray:
    """A(p) = div(gamma_f grad p).

    With ``use_pallas`` the matvec runs as the fused Pallas kernel
    (`pallas_stencil.laplacian_facegamma_pallas`) — one VMEM pass over p
    and the three face-coefficient arrays instead of XLA's per-axis
    slice/multiply/diff chains. Off-TPU it runs in interpret mode so the
    flag is exercised by the CPU suite."""
    pp = pad(p)
    if use_pallas and min(p.shape) >= 8:
        from .pallas_stencil import laplacian_facegamma_pallas
        return laplacian_facegamma_pallas(
            gamma_f, pp, grid, interpret=_pallas_mode() == "interpret"
        )
    return laplacian_facegamma_padded(gamma_f, pp, grid)


def poisson_diag(gamma_f: Flux, grid: Grid, bc: Optional[FieldBC] = None) -> jnp.ndarray:
    """Diagonal of the variable-coefficient Laplacian.

    Interior: -(g_lo + g_hi)/h^2 per axis. At physical boundaries the ghost
    convention shifts the diagonal: Neumann removes the face (factor 0),
    Dirichlet doubles it (ghost = 2v - p). `bc=None` uses the interior
    formula everywhere (adequate as a preconditioner under halo sharding,
    where physical faces may live on another shard).
    """
    nx, ny, nz = gamma_f[0].shape[0] - 1, gamma_f[1].shape[1] - 1, gamma_f[2].shape[2] - 1
    diag = jnp.zeros((nx, ny, nz), gamma_f[0].dtype)
    for axis in range(3):
        g = gamma_f[axis]
        n = g.shape[axis]
        g_hi = jax.lax.slice_in_dim(g, 1, n, axis=axis)
        g_lo = jax.lax.slice_in_dim(g, 0, n - 1, axis=axis)
        c_lo = jnp.ones_like(g_lo)
        c_hi = jnp.ones_like(g_hi)
        if bc is not None and not bc.is_periodic(axis):
            from .grid import DIRICHLET, NEUMANN
            lo_bc, hi_bc = bc.faces[axis]
            def edge_factor(kind):
                return {NEUMANN: 0.0, DIRICHLET: 2.0}.get(kind, 1.0)
            # first/last face along the axis
            idx_lo = [slice(None)] * 3
            idx_lo[axis] = slice(0, 1)
            idx_hi = [slice(None)] * 3
            idx_hi[axis] = slice(-1, None)
            c_lo = c_lo.at[tuple(idx_lo)].set(edge_factor(lo_bc.kind))
            c_hi = c_hi.at[tuple(idx_hi)].set(edge_factor(hi_bc.kind))
        diag = diag - (c_lo * g_lo + c_hi * g_hi) / (grid.spacing[axis] ** 2)
    return diag


# ---------------------------------------------------------------------------
# Preconditioned conjugate gradient
# ---------------------------------------------------------------------------

class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray          # int32
    residual: jnp.ndarray       # final |r|_2 (global)
    initial_residual: jnp.ndarray


def pcg(
    apply_A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    reduce_sum: ReduceFn = _ident,
    tol: float = 1e-6,
    atol: float = 1e-30,
    rel_tol: float = 0.0,
    maxiter: int = 500,
    fixed_iters: int = 0,
) -> CGResult:
    """Preconditioned CG with static shapes, jit/shard_map-safe.

    Convergence tests, mirroring OpenFOAM's PCG trio:
    * |r| <= tol * max(|r0|, |b|) — our native relative test (the max guards
      warm starts where |r0| is already tiny);
    * |r| <= atol — absolute, maps fvSolution `tolerance` (OpenFOAM applies
      it to a normFactor-scaled residual; we use the plain 2-norm —
      documented divergence);
    * |r| <= rel_tol * |r0| — OpenFOAM `relTol` per-solve early exit
      (`fvSolution` relTol; 0 disables, as in OpenFOAM).
    `reduce_sum` must produce the *global* sum when running per-shard
    (pass `lambda s: lax.psum(s, axes)`).

    ``fixed_iters > 0`` runs exactly that many iterations under a static
    `lax.fori_loop`, FREEZING the state once converged (alpha/beta masked
    to 0) instead of exiting — identical x whenever convergence happens
    within the budget, but no data-dependent loop condition (lax control
    flow carries material per-evaluation overhead on v5e: one lax.cond
    measured 15.6 ms/step in the coupled step, PERF.md round 3). The
    reported iteration count still reflects the live iterations only, so
    convergence assertions keep working.
    """
    M = precond if precond is not None else (lambda r: r)

    def gdot(a, bb):
        return reduce_sum(jnp.sum(a * bb))

    r0 = b - apply_A(x0)
    z0 = M(r0)
    rz0 = gdot(r0, z0)
    rnorm0 = jnp.sqrt(gdot(r0, r0))
    # Residual scale: guard warm starts — when x0 is already (nearly) the
    # solution, |r0| is tiny and a purely relative test would over-iterate
    # into f32 breakdown on the (semi-definite) operator.
    bnorm = jnp.sqrt(gdot(b, b))
    ref = jnp.maximum(rnorm0, bnorm)
    # f32 can't realize relative residuals much below machine epsilon; a
    # tighter request makes CG iterate past stagnation into instability
    tol = max(tol, 3e-7) if b.dtype == jnp.float32 else tol

    def converged(rnorm):
        ok = jnp.logical_or(rnorm <= tol * ref, rnorm <= atol)
        if rel_tol > 0.0:
            ok = jnp.logical_or(ok, rnorm <= rel_tol * rnorm0)
        return ok

    def cond(state):
        x, r, z, p, rz, rnorm, best, it, done = state
        return jnp.logical_and(it < maxiter, jnp.logical_not(done))

    def body(state):
        x, r, z, p, rz, rnorm, best, it, done = state
        Ap = apply_A(p)
        pAp = gdot(p, Ap)
        # Breakdown guard: the Poisson operator is negative semi-definite,
        # so a well-posed direction has pAp < 0. |pAp| ~ 0 (nullspace) or a
        # sign flip means further iteration is numerical noise — stop.
        breakdown = pAp >= -1e-30 * jnp.maximum(gdot(p, p), 1e-30)
        live = jnp.logical_not(done)
        alpha = jnp.where(breakdown | done, 0.0,
                          rz / jnp.where(pAp == 0.0, 1.0, pAp))
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = gdot(r, z)
        beta = jnp.where(breakdown | done, 0.0,
                         rz_new / jnp.where(rz == 0.0, 1.0, rz))
        p = jnp.where(done, p, z + beta * p)
        rz_new = jnp.where(done, rz, rz_new)
        rnorm = jnp.where(done, rnorm, jnp.sqrt(gdot(r, r)))
        # Divergence guard: in f32 the residual can grow after stagnating
        # (loss of orthogonality); 4x above the best seen means further
        # iterations only amplify noise.
        diverging = rnorm > 4.0 * best
        best = jnp.minimum(best, rnorm)
        done = done | converged(rnorm) | breakdown | diverging
        return (x, r, z, p, rz_new, rnorm, best,
                it + live.astype(jnp.int32), done)

    state = (x0, r0, z0, z0, rz0, rnorm0, rnorm0, jnp.int32(0), converged(rnorm0))
    if fixed_iters > 0:
        x, r, z, p, rz, rnorm, best, it, done = jax.lax.fori_loop(
            0, fixed_iters, lambda _, s: body(s), state)
    else:
        x, r, z, p, rz, rnorm, best, it, done = jax.lax.while_loop(
            cond, body, state)
    return CGResult(x, it, rnorm, rnorm0)


# ---------------------------------------------------------------------------
# Geometric multigrid V-cycle (preconditioner)
# ---------------------------------------------------------------------------

def _restrict(f: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting restriction: average 2x2x2 fine cells."""
    nx, ny, nz = f.shape
    return f.reshape(nx // 2, 2, ny // 2, 2, nz // 2, 2).mean(axis=(1, 3, 5))


def _prolong(c: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-constant prolongation (each coarse cell -> 2x2x2 fine)."""
    return jnp.repeat(jnp.repeat(jnp.repeat(c, 2, 0), 2, 1), 2, 2)


def _coarsen_gamma_faces(gamma_f: Flux) -> Flux:
    """Average the 4 fine faces lying on each coarse face; keep every other
    face plane along the normal direction."""
    out = []
    for axis in range(3):
        g = gamma_f[axis]
        # subsample face planes along the normal axis (every 2nd plane incl. ends)
        idx = [slice(None)] * 3
        idx[axis] = slice(None, None, 2)
        g = g[tuple(idx)]
        # average 2x2 in the transverse axes
        for t in range(3):
            if t == axis:
                continue
            n = g.shape[t]
            a = jax.lax.slice_in_dim(g, 0, n, 2, axis=t)
            b = jax.lax.slice_in_dim(g, 1, n, 2, axis=t)
            g = 0.5 * (a + b)
        out.append(g)
    return tuple(out)


def _coarsen_grid(grid: Grid) -> Grid:
    return Grid(
        tuple(n // 2 for n in grid.shape),
        tuple(2.0 * h for h in grid.spacing),
        grid.origin,
    )


def mg_levels_for(grid: Grid, min_size: int = 4) -> int:
    """How many coarsening levels the grid admits (incl. the fine level)."""
    lv = 1
    shape = list(grid.shape)
    while all(n % 2 == 0 and n // 2 >= min_size for n in shape):
        shape = [n // 2 for n in shape]
        lv += 1
    return lv


@dataclasses.dataclass(frozen=True)
class MGConfig:
    levels: int = 0            # 0 = auto (as deep as the grid allows)
    pre_smooth: int = 2
    post_smooth: int = 2
    coarse_iters: int = 20
    omega: float = 0.8         # damped-Jacobi weight
    # 'jacobi' (omega-damped) or 'chebyshev' (same per-iteration cost —
    # one matvec + axpys — but polynomially-optimal damping on the upper
    # spectrum of D^-1 A, targeting [lambda_max/cheby_frac, lambda_max]
    # with the rigorous Gershgorin bound lambda_max <= 2; the hypre-style
    # AMG default smoother)
    smoother: str = "jacobi"
    cheby_frac: float = 4.0
    # run the V-cycle in bfloat16 (residual cast in, correction cast out).
    # The preconditioner is HBM-bound; halving its bytes costs only CG
    # iteration count (a preconditioner may be inexact), not correctness —
    # the outer CG's residuals/dots stay f32. Off by default.
    bf16: bool = False


def make_mg_preconditioner(
    gamma_f: Flux,
    grid: Grid,
    bc: FieldBC,
    cfg: MGConfig = MGConfig(),
    use_pallas: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build a V-cycle preconditioner M^{-1} r for the face-gamma Poisson op.

    Plays the role of OpenFOAM's GAMG (selected through fvSolution in the
    reference cases). Under shard_map this acts on the local block with
    physical BCs only — i.e. a block-Jacobi/additive-Schwarz preconditioner —
    while the outer CG handles global coupling via psum'd dot products.
    """
    # Precompute per-level operators (static Python loop — levels are static).
    levels = cfg.levels if cfg.levels > 0 else mg_levels_for(grid)
    gammas = [gamma_f]
    grids = [grid]
    for _ in range(levels - 1):
        gammas.append(_coarsen_gamma_faces(gammas[-1]))
        grids.append(_coarsen_grid(grids[-1]))

    pads = [default_pad(bc)] * levels
    diags = [poisson_diag(g, gr, bc) for g, gr in zip(gammas, grids)]
    inv_diags = [1.0 / jnp.where(jnp.abs(d) < 1e-30, -1.0, d) for d in diags]
    if cfg.bf16:
        bf = jnp.bfloat16
        gammas = [tuple(g.astype(bf) for g in gf) for gf in gammas]
        inv_diags = [d.astype(bf) for d in inv_diags]

    def smooth_jacobi(lv: int, x: jnp.ndarray, b: jnp.ndarray,
                      iters: int) -> jnp.ndarray:
        def body(_, x):
            r = b - poisson_apply(x, gammas[lv], grids[lv], pads[lv],
                                  use_pallas=use_pallas)
            return x + cfg.omega * inv_diags[lv] * r
        return jax.lax.fori_loop(0, iters, body, x)

    def smooth_cheby(lv: int, x: jnp.ndarray, b: jnp.ndarray,
                     iters: int) -> jnp.ndarray:
        """Chebyshev(iters) smoothing of B = D^-1 A on [L/frac, L], L = 2
        (Gershgorin: row sums of |offdiag|/|diag| <= 1 for the
        face-gamma Laplacian — equality interior, < 1 at Dirichlet rows).
        Standard 3-term d-recurrence (Saad §12.3 / hypre); one matvec per
        iteration, same cost as a Jacobi sweep. Static small `iters` —
        unrolled Python loop (the rho_k scalars are compile-time)."""
        if iters <= 0:
            return x
        L = 2.0
        lo = L / cfg.cheby_frac
        theta, delta = 0.5 * (L + lo), 0.5 * (L - lo)
        sigma = theta / delta
        apply_lv = lambda v: poisson_apply(v, gammas[lv], grids[lv],
                                           pads[lv], use_pallas=use_pallas)
        r = b - apply_lv(x)
        z = inv_diags[lv] * r
        d = z / theta
        x = x + d
        rho_old = 1.0 / sigma
        for _ in range(iters - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            r = r - apply_lv(d)
            z = inv_diags[lv] * r
            d = (rho * rho_old) * d + (2.0 * rho / delta) * z
            x = x + d
            rho_old = rho
        return x

    if cfg.smoother == "chebyshev":
        smooth = smooth_cheby
    elif cfg.smoother == "jacobi":
        smooth = smooth_jacobi
    else:
        raise ValueError(f"unknown MG smoother {cfg.smoother!r}")

    def vcycle(lv: int, b: jnp.ndarray) -> jnp.ndarray:
        x = smooth(lv, jnp.zeros_like(b), b, cfg.pre_smooth)
        if lv == levels - 1:
            return smooth(lv, x, b, cfg.coarse_iters)
        r = b - poisson_apply(x, gammas[lv], grids[lv], pads[lv],
                              use_pallas=use_pallas)
        e = vcycle(lv + 1, _restrict(r))
        x = x + _prolong(e)
        return smooth(lv, x, b, cfg.post_smooth)

    if cfg.bf16:
        return lambda r: vcycle(0, r.astype(jnp.bfloat16)).astype(r.dtype)
    return lambda r: vcycle(0, r)


# ---------------------------------------------------------------------------
# Spectral (matmul-transform) preconditioner
# ---------------------------------------------------------------------------

def _spectral_axis_basis(n: int, lo_kind: str, hi_kind: str, h: float):
    """Orthonormal eigenbasis Q (n, n) and eigenvalues lam (n,) of the 1-D
    cell-centred second difference (1/h^2)[1, -2, 1] under the ghost-cell
    BC convention used by `pad_scalar` (periodic wrap; Neumann ghost =
    interior; homogeneous Dirichlet ghost = -interior).

    All five BC pairs admit closed-form trigonometric bases (the classic
    DCT/DST family on half-integer nodes):
      periodic      cos/sin(2*pi*k*j/n)            lam_k = (2cos(2 pi k/n)-2)/h^2
      Neumann-Neu.  cos(pi*k*(j+.5)/n)   (DCT-II)  lam_k = (2cos(pi k/n)-2)/h^2
      Dir.-Dir.     sin(pi*(k+1)*(j+.5)/n) (DST-II) lam  = (2cos(pi(k+1)/n)-2)/h^2
      Neu.-Dir.     cos(pi*(k+.5)*(j+.5)/n)         lam  = (2cos(pi(k+.5)/n)-2)/h^2
      Dir.-Neu.     sin(pi*(k+.5)*(j+.5)/n)         lam  = same as Neu.-Dir.
    Built in float64 on the host; returned as float32 arrays."""
    import numpy as np
    from .grid import DIRICHLET, NEUMANN, PERIODIC
    j = np.arange(n, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)
    periodic = lo_kind == PERIODIC and hi_kind == PERIODIC
    neu = (NEUMANN,)
    if periodic:
        cols = [np.full(n, 1.0 / np.sqrt(n))]
        lams = [0.0]
        for kk in range(1, (n - 1) // 2 + 1):
            t = 2.0 * np.pi * kk * j / n
            cols.append(np.cos(t) * np.sqrt(2.0 / n))
            cols.append(np.sin(t) * np.sqrt(2.0 / n))
            lams += [(2.0 * np.cos(2.0 * np.pi * kk / n) - 2.0) / h**2] * 2
        if n % 2 == 0:
            cols.append(np.cos(np.pi * j) / np.sqrt(n))
            lams.append(-4.0 / h**2)
        Q = np.stack(cols, axis=1)
        lam = np.asarray(lams)
    elif lo_kind in neu and hi_kind in neu:
        Q = np.cos(np.pi * k[None, :] * (j[:, None] + 0.5) / n)
        lam = (2.0 * np.cos(np.pi * k / n) - 2.0) / h**2
    elif lo_kind == DIRICHLET and hi_kind == DIRICHLET:
        Q = np.sin(np.pi * (k[None, :] + 1.0) * (j[:, None] + 0.5) / n)
        lam = (2.0 * np.cos(np.pi * (k + 1.0) / n) - 2.0) / h**2
    elif lo_kind in neu and hi_kind == DIRICHLET:
        Q = np.cos(np.pi * (k[None, :] + 0.5) * (j[:, None] + 0.5) / n)
        lam = (2.0 * np.cos(np.pi * (k + 0.5) / n) - 2.0) / h**2
    elif lo_kind == DIRICHLET and hi_kind in neu:
        Q = np.sin(np.pi * (k[None, :] + 0.5) * (j[:, None] + 0.5) / n)
        lam = (2.0 * np.cos(np.pi * (k + 0.5) / n) - 2.0) / h**2
    else:
        return None
    Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)
    return Q.astype(np.float32), lam.astype(np.float32)


def make_spectral_preconditioner(
    gamma_f: Flux,
    grid: Grid,
    bc: FieldBC,
    nullspace_eps: float = 1e-12,
) -> Optional[Callable[[jnp.ndarray], jnp.ndarray]]:
    """EXACT inverse of the mean-coefficient Poisson operator as six dense
    transform matmuls + one eigenvalue divide — the TPU-native answer to
    the reference's GAMG (`fvSolution` in the reference cases): on a
    uniform grid the eigenbasis of each 1-D second difference is a known
    trig transform, and at n<=256 a dense (n, n) matmul per axis IS the
    fast transform on the MXU (6 x ncells*n MACs ~ 3 GFLOP at 128^3 —
    microseconds of systolic-array time vs the V-cycle's dozen
    memory-bound smoothing sweeps).

    The pEqn coefficient alpha_f*rAU_f varies a few percent around its
    mean in dilute suspensions, so M^-1 A = I + O(dgamma/gamma) and PCG
    converges in a handful of iterations. Returns None when any axis BC
    pair has no trig eigenbasis (falls back to MG at the call site).
    """
    bases = []
    for axis in range(3):
        lo, hi = bc.faces[axis]
        qa = _spectral_axis_basis(grid.shape[axis], lo.kind, hi.kind,
                                  grid.spacing[axis])
        if qa is None:
            return None
        bases.append(qa)

    gbar = [jnp.mean(gamma_f[a]) for a in range(3)]
    Qs = [jnp.asarray(Q) for Q, _ in bases]
    lams = [jnp.asarray(l) for _, l in bases]

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        lam = (gbar[0] * lams[0][:, None, None]
               + gbar[1] * lams[1][None, :, None]
               + gbar[2] * lams[2][None, None, :])
        inv = jnp.where(jnp.abs(lam) < nullspace_eps, 0.0, 1.0 / jnp.where(
            jnp.abs(lam) < nullspace_eps, 1.0, lam))
        # forward: coefficients c = Q^T r applied per axis. HIGHEST keeps
        # the TPU MXU from rounding the transform to bf16 (the cost is a
        # handful of extra systolic passes over ~3 GFLOP — noise); with
        # bf16 rounding the "exact" inverse is only ~1e-2 accurate and CG
        # pays extra iterations.
        hi = jax.lax.Precision.HIGHEST
        t = jnp.einsum("ia,iyz->ayz", Qs[0], r, precision=hi)
        t = jnp.einsum("jb,ajz->abz", Qs[1], t, precision=hi)
        t = jnp.einsum("kc,abk->abc", Qs[2], t, precision=hi)
        t = t * inv
        # inverse: x = Q c
        t = jnp.einsum("kc,abc->abk", Qs[2], t, precision=hi)
        t = jnp.einsum("jb,abz->ajz", Qs[1], t, precision=hi)
        return jnp.einsum("ia,ayz->iyz", Qs[0], t, precision=hi)

    return apply


# ---------------------------------------------------------------------------
# High-level pressure solve
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PressureSolverConfig:
    """Maps the fvSolution `p` sub-dictionary of the reference cases."""

    solver: str = "mgpcg"      # 'pcg' | 'mgpcg' | 'fftpcg'
    tol: float = 1e-6          # native relative tolerance (|r| vs max(|r0|,|b|))
    rel_tol: float = 0.0       # OpenFOAM relTol: |r| <= rel_tol*|r0| early exit
    abs_tol: float = 1e-30     # OpenFOAM 'tolerance' (absolute; normFactor
    #                            scaling is a documented divergence)
    maxiter: int = 200
    # run exactly this many CG iterations under a static fori_loop (state
    # frozen once converged) instead of a data-dependent while_loop — see
    # `pcg` fixed_iters. 0 = while_loop.
    fixed_iters: int = 0
    mg: MGConfig = MGConfig()
    # fused Pallas matvec for the CG/MG stencil applies (interpret mode
    # off-TPU so CPU tests exercise the same path)
    use_pallas: bool = False


def solve_helmholtz(
    a_diag: jnp.ndarray,
    gamma_f: Flux,
    rhs: jnp.ndarray,
    x0: jnp.ndarray,
    grid: Grid,
    bc: FieldBC,
    cfg: "PressureSolverConfig" = None,
    *,
    pad: Optional[PadFn] = None,
    reduce_sum: ReduceFn = _ident,
    precond_bc: Optional[FieldBC] = None,
) -> CGResult:
    """Solve  a_diag * x - div(gamma_f grad x) = rhs  (a_diag > 0).

    The implicit momentum-diffusion system: the TPU-native counterpart of
    the reference's `fvm::laplacian(nuEff, U)` inside an implicit momentum
    solve (`/root/reference/icoFoamYade/icoFoamYade.C:83,91-94`,
    `/root/reference/pimpleFoamYade/UcEqn.H:6`), which is what frees
    OpenFOAM from the explicit-diffusion dt bound. Positive definite (no
    nullspace, no reference pin) — internally negated so `pcg`'s
    negative-definite breakdown/divergence guards apply unchanged.
    Jacobi-preconditioned: the a_diag (~alpha/dt) shift keeps the
    condition number ~ 1 + O(nu_eff dt / h^2), so CG converges in tens of
    iterations even deep in the stiff-diffusion regime the feature exists
    for; `cfg.solver` is ignored here.
    """
    cfg = cfg if cfg is not None else PressureSolverConfig(solver="pcg")
    pad = pad if pad is not None else default_pad(bc)

    def op_affine(x):
        return a_diag * x - poisson_apply(x, gamma_f, grid, pad,
                                          use_pallas=cfg.use_pallas)

    # fold nonzero-Dirichlet ghost constants into the RHS (linear op for CG)
    bc_const = op_affine(jnp.zeros_like(rhs))
    apply_A = lambda x: bc_const - op_affine(x)          # negated: neg. def.
    b = bc_const - rhs

    mgrid = Grid(tuple(rhs.shape), grid.spacing, grid.origin)
    pbc = precond_bc if precond_bc is not None else bc.homogeneous()
    d = poisson_diag(gamma_f, mgrid, pbc) - a_diag       # diag of -op < 0
    inv_diag = 1.0 / jnp.where(jnp.abs(d) < 1e-30, -1.0, d)

    res = pcg(
        apply_A, b, x0,
        precond=lambda r: inv_diag * r, reduce_sum=reduce_sum,
        tol=cfg.tol, atol=cfg.abs_tol, rel_tol=cfg.rel_tol,
        maxiter=cfg.maxiter, fixed_iters=cfg.fixed_iters,
    )
    return res


def solve_pressure(
    gamma_f: Flux,
    rhs: jnp.ndarray,
    p0: jnp.ndarray,
    grid: Grid,
    bc: FieldBC,
    cfg: PressureSolverConfig = PressureSolverConfig(),
    *,
    pad: Optional[PadFn] = None,
    reduce_sum: ReduceFn = _ident,
    nullspace: Optional[bool] = None,
    precond_bc: Optional[FieldBC] = None,
    solid=None,
) -> CGResult:
    """Solve div(gamma_f grad p) = rhs.

    ``nullspace=True`` (auto-detected from the BCs: no Dirichlet face means
    the operator has the constant nullspace) subtracts the mean of rhs and
    pins the mean of p — the TPU-native equivalent of OpenFOAM's
    ``pEqn.setReference(pRefCell, pRefValue)`` (`icoFoamYade.C:123`).

    ``solid`` (an `ops.obstacle.ObstacleMasks`) activates the masked-cell
    obstacle treatment: the caller passes gamma_f already face-masked
    (solid-touching faces carry zero coefficient), which makes solid rows
    of the Laplacian identically zero; here those rows are replaced by a
    scaled identity -s*p (s ~ the interior diagonal magnitude, keeping the
    operator negative definite on the solid subspace and uniformly
    conditioned), the RHS is zeroed on solid cells (so p_solid -> 0), the
    preconditioner is restricted to the fluid subspace, and the nullspace
    mean-pinning runs over FLUID cells only (the constant-on-fluid vector
    is the actual nullspace of the masked operator).
    """
    pad = pad if pad is not None else default_pad(bc)
    if nullspace is None:
        from .grid import DIRICHLET
        has_dirichlet = any(
            f.kind == DIRICHLET for pair in bc.faces for f in pair
        )
        nullspace = not has_dirichlet

    fluid_m = None
    s_scale = None
    if solid is not None:
        fluid_m = solid.fluid
        # interior diagonal magnitude of the unmasked operator: sum_a
        # 2*mean(gamma)/h_a^2 — keeps solid rows conditioned like fluid rows
        s_scale = sum(
            2.0 * jnp.mean(gamma_f[a]) / grid.spacing[a] ** 2
            for a in range(3)
        )
        rhs = rhs * fluid_m
        p0 = p0 * fluid_m

    # The ghost-cell operator is affine when Dirichlet values are nonzero;
    # CG needs a linear operator, so fold the constant A(0) into the RHS
    # (the matrix-free analog of OpenFOAM's boundary-coefficient source).
    bc_const = poisson_apply(jnp.zeros_like(rhs), gamma_f, grid, pad,
                             use_pallas=cfg.use_pallas)
    rhs = rhs - bc_const
    hbc = bc.homogeneous()

    ncells_local = rhs.size
    if solid is not None:
        ncells = reduce_sum(jnp.asarray(
            float(ncells_local - solid.n_solid), rhs.dtype))
    else:
        ncells = reduce_sum(jnp.asarray(float(ncells_local), rhs.dtype))

    def _fluid_mean(f):
        s = jnp.sum(f if fluid_m is None else f * fluid_m)
        return reduce_sum(s) / ncells

    if nullspace:
        rhs = rhs - _fluid_mean(rhs) * (1.0 if fluid_m is None else fluid_m)
        p0 = p0 - _fluid_mean(p0) * (1.0 if fluid_m is None else fluid_m)

    if solid is None:
        apply_A = lambda p: poisson_apply(
            p, gamma_f, grid, pad, use_pallas=cfg.use_pallas
        ) - bc_const
    else:
        apply_A = lambda p: poisson_apply(
            p, gamma_f, grid, pad, use_pallas=cfg.use_pallas
        ) - bc_const - s_scale * (solid.solid * p)

    # Preconditioners act on the LOCAL block: under shard_map `rhs` is the
    # per-shard slab, so derive the preconditioner's grid from it (the MG
    # V-cycle then runs block-locally = additive-Schwarz; the outer CG's
    # psum'd dot products carry the global coupling). `precond_bc` lets the
    # sharded caller homogenize shard-internal edges to Dirichlet-0.
    mg_grid = Grid(tuple(rhs.shape), grid.spacing, grid.origin)
    pbc = precond_bc if precond_bc is not None else hbc
    if cfg.solver == "fftpcg":
        M = make_spectral_preconditioner(gamma_f, mg_grid, pbc)
        if M is None:       # no trig eigenbasis for these BCs: V-cycle
            M = make_mg_preconditioner(gamma_f, mg_grid, pbc, cfg.mg,
                                       use_pallas=cfg.use_pallas)
    elif cfg.solver == "mgpcg":
        M = make_mg_preconditioner(gamma_f, mg_grid, pbc, cfg.mg,
                                   use_pallas=cfg.use_pallas)
    elif cfg.solver == "pcg":
        inv_diag = 1.0 / jnp.where(
            jnp.abs(d := poisson_diag(gamma_f, mg_grid, pbc)) < 1e-30, -1.0, d
        )
        M = lambda r: inv_diag * r
    else:
        raise ValueError(f"unknown pressure solver {cfg.solver!r}")

    if solid is not None:
        # restrict the (unmasked-operator) preconditioner to the fluid
        # subspace and invert the identity rows exactly; keeps every CG
        # iterate fluid-supported up to the preconditioner's approximation
        M_fluid = M
        M = lambda r: (fluid_m * M_fluid(fluid_m * r)
                       - (solid.solid * r) / s_scale)

    res = pcg(
        apply_A, rhs, p0,
        precond=M, reduce_sum=reduce_sum,
        tol=cfg.tol, atol=cfg.abs_tol, rel_tol=cfg.rel_tol,
        maxiter=cfg.maxiter, fixed_iters=cfg.fixed_iters,
    )
    x = res.x
    if nullspace:
        x = x - _fluid_mean(x) * (1.0 if fluid_m is None else fluid_m)
    if fluid_m is not None:
        x = x * fluid_m
    return CGResult(x, res.iters, res.residual, res.initial_residual)

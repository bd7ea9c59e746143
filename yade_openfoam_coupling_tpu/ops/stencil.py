"""Finite-volume stencil operators on the uniform Cartesian grid.

TPU-native replacement for the OpenFOAM ``fvc::``/``fvm::`` operator surface
the reference solvers use:

* ``fvc::grad``       (`/root/reference/icoFoamYade/icoFoamYade.C:71,93,136`)
* ``fvc::div``        (`icoFoamYade.C:120`, `pimpleFoamYade/pEqn.H:31`)
* ``fvm::laplacian``  (`icoFoamYade.C:83,120`, `pEqn.H:28`)
* ``fvc::flux`` / ``fvc::interpolate`` (`icoFoamYade.C:104-105`,
  `pimpleFoamYade/UcEqn.H:17-19`)
* ``fvc::reconstruct`` (`UcEqn.H:27`, `pEqn.H:43`)

All operators come in two forms:

* ``*_padded``: pure interior kernels consuming arrays that already carry a
  one-cell ghost shell. These are the only compute bodies; they contain no
  BC logic, so the ICI-sharded path (`parallel/halo.py`) reuses them after
  filling ghosts via `lax.ppermute`.
* thin wrappers that pad from a `FieldBC` and then call the padded kernel —
  the single-device convenience API.

Shapes: scalars ``(nx,ny,nz)``; vectors ``(3,nx,ny,nz)``; tensors
``(3,3,nx,ny,nz)`` with ``T[i,j] = dU_i/dx_j``; face fluxes are 3-tuples of
face-normal values on x/y/z faces (``(nx+1,ny,nz)`` etc.).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .grid import FieldBC, Grid, pad_scalar, pad_vector

Flux = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _diff(fp: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Forward difference along `axis` of a padded-along-axis array."""
    n = fp.shape[axis]
    a = jax.lax.slice_in_dim(fp, 1, n, axis=axis)
    b = jax.lax.slice_in_dim(fp, 0, n - 1, axis=axis)
    return a - b


def _mean(fp: jnp.ndarray, axis: int) -> jnp.ndarray:
    n = fp.shape[axis]
    a = jax.lax.slice_in_dim(fp, 1, n, axis=axis)
    b = jax.lax.slice_in_dim(fp, 0, n - 1, axis=axis)
    return 0.5 * (a + b)


def _strip_other_axes(fp: jnp.ndarray, axis: int, offset: int = 0) -> jnp.ndarray:
    """Remove ghost shells on all axes except `axis` (last `offset` axes are
    grid axes; offset handles leading component axes)."""
    idx = [slice(None)] * fp.ndim
    for a in range(3):
        if a != axis:
            idx[offset + a] = slice(1, -1)
    return fp[tuple(idx)]


# ---------------------------------------------------------------------------
# Gradient
# ---------------------------------------------------------------------------

def grad_scalar_padded(fp: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Central-difference cell gradient from a padded scalar: (3,nx,ny,nz)."""
    comps = []
    for axis in range(3):
        f = _strip_other_axes(fp, axis)
        n = f.shape[axis]
        hi = jax.lax.slice_in_dim(f, 2, n, axis=axis)
        lo = jax.lax.slice_in_dim(f, 0, n - 2, axis=axis)
        comps.append((hi - lo) / (2.0 * grid.spacing[axis]))
    return jnp.stack(comps)


def grad_scalar(f: jnp.ndarray, bc: FieldBC, grid: Grid) -> jnp.ndarray:
    return grad_scalar_padded(pad_scalar(f, bc), grid)


def grad_vector_padded(up: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Velocity-gradient tensor G[i,j] = dU_i/dx_j: (3,3,nx,ny,nz)."""
    rows = []
    for c in range(3):
        rows.append(grad_scalar_padded(up[c], grid))
    return jnp.stack(rows)  # [i, j, ...] = d u_i / d x_j


def grad_vector(u: jnp.ndarray, bc: FieldBC, grid: Grid) -> jnp.ndarray:
    return grad_vector_padded(pad_vector(u, bc), grid)


def curl_from_grad(G: jnp.ndarray) -> jnp.ndarray:
    """curl(U) from the gradient tensor G[i,j]=dU_i/dx_j.

    Replaces the vorticity extraction in the reference's torque models
    (`/root/reference/FoamYade/FoamYade.C:450-452,469-475` — note the two
    reference sites disagree in sign; we use the right-handed curl).
    """
    wx = G[2, 1] - G[1, 2]
    wy = G[0, 2] - G[2, 0]
    wz = G[1, 0] - G[0, 1]
    return jnp.stack([wx, wy, wz])


# ---------------------------------------------------------------------------
# Face interpolation and fluxes
# ---------------------------------------------------------------------------

def face_interp_padded(fp: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Linear face values along `axis` from a padded scalar (other-axis
    ghosts stripped): x-faces -> (nx+1,ny,nz) etc."""
    f = _strip_other_axes(fp, axis)
    return _mean(f, axis)


def face_interp_all_padded(fp: jnp.ndarray) -> Flux:
    return tuple(face_interp_padded(fp, a) for a in range(3))


def face_interp(f: jnp.ndarray, bc: FieldBC, grid: Grid) -> Flux:
    """``fvc::interpolate`` to all faces."""
    return face_interp_all_padded(pad_scalar(f, bc))


def flux_padded(up: jnp.ndarray, grid: Grid) -> Flux:
    """``fvc::flux(U)`` — face-normal velocity from padded vector field."""
    return tuple(face_interp_padded(up[a], a) for a in range(3))


def flux(u: jnp.ndarray, bc: FieldBC, grid: Grid) -> Flux:
    return flux_padded(pad_vector(u, bc), grid)


def face_grad_padded(fp: jnp.ndarray, grid: Grid) -> Flux:
    """``fvc::snGrad`` — normal gradient (f_hi - f_lo)/h at every face."""
    out = []
    for axis in range(3):
        f = _strip_other_axes(fp, axis)
        out.append(_diff(f, axis) / grid.spacing[axis])
    return tuple(out)


def face_grad(f: jnp.ndarray, bc: FieldBC, grid: Grid) -> Flux:
    return face_grad_padded(pad_scalar(f, bc), grid)


# ---------------------------------------------------------------------------
# Divergence
# ---------------------------------------------------------------------------

def div_flux(phi: Flux, grid: Grid) -> jnp.ndarray:
    """``fvc::div(phi)`` of face-normal velocities -> cell scalar (1/s)."""
    out = 0.0
    for axis in range(3):
        out = out + _diff(phi[axis], axis) / grid.spacing[axis]
    return out


def div_vector(u: jnp.ndarray, bc: FieldBC, grid: Grid) -> jnp.ndarray:
    return div_flux(flux(u, bc, grid), grid)


def _face_value(fp_c: jnp.ndarray, axis: int, phi_ax: jnp.ndarray, scheme: str) -> jnp.ndarray:
    """Face value of a (padded-along-axis, others stripped) scalar for
    convection: 'linear' (central) or 'upwind' on the sign of phi."""
    n = fp_c.shape[axis]
    hi = jax.lax.slice_in_dim(fp_c, 1, n, axis=axis)
    lo = jax.lax.slice_in_dim(fp_c, 0, n - 1, axis=axis)
    if scheme == "linear":
        return 0.5 * (hi + lo)
    if scheme == "upwind":
        return jnp.where(phi_ax >= 0.0, lo, hi)
    if scheme == "linearUpwind":  # blended: central with upwind deferred corr.
        return 0.75 * 0.5 * (hi + lo) + 0.25 * jnp.where(phi_ax >= 0.0, lo, hi)
    raise ValueError(f"unknown convection scheme {scheme!r}")


def div_phi_scalar_padded(phi: Flux, fp: jnp.ndarray, grid: Grid, scheme: str = "linear") -> jnp.ndarray:
    """``fvc::div(phi, f)`` — conservative convection of a padded scalar."""
    out = 0.0
    for axis in range(3):
        f = _strip_other_axes(fp, axis)
        face = _face_value(f, axis, phi[axis], scheme)
        out = out + _diff(phi[axis] * face, axis) / grid.spacing[axis]
    return out


def div_phi_vector_padded(phi: Flux, up: jnp.ndarray, grid: Grid, scheme: str = "linear") -> jnp.ndarray:
    """``fvc::div(phi, U)`` per component: (3,nx,ny,nz)."""
    return jnp.stack([div_phi_scalar_padded(phi, up[c], grid, scheme) for c in range(3)])


# ---------------------------------------------------------------------------
# Laplacian
# ---------------------------------------------------------------------------

def laplacian_padded(fp: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Constant-coefficient 7-point Laplacian of a padded scalar."""
    out = 0.0
    for axis in range(3):
        f = _strip_other_axes(fp, axis)
        n = f.shape[axis]
        hi = jax.lax.slice_in_dim(f, 2, n, axis=axis)
        mid = jax.lax.slice_in_dim(f, 1, n - 1, axis=axis)
        lo = jax.lax.slice_in_dim(f, 0, n - 2, axis=axis)
        out = out + (hi - 2.0 * mid + lo) / (grid.spacing[axis] ** 2)
    return out


def laplacian(f: jnp.ndarray, bc: FieldBC, grid: Grid) -> jnp.ndarray:
    return laplacian_padded(pad_scalar(f, bc), grid)


def laplacian_vector_padded(up: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    return jnp.stack([laplacian_padded(up[c], grid) for c in range(3)])


def laplacian_vector(u: jnp.ndarray, bc: FieldBC, grid: Grid) -> jnp.ndarray:
    return laplacian_vector_padded(pad_vector(u, bc), grid)


def laplacian_facegamma_padded(gamma_f: Flux, fp: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """Variable-coefficient ``fvm::laplacian(gamma, p)`` applied matrix-free:
    div( gamma_f * snGrad(p) ).

    This is the operator of the reference's hottest path — the pressure
    equation `fvm::laplacian(rAU, p)` (`icoFoamYade.C:120`) and
    `fvm::laplacian(alphacf*rAUcf, p)` (`pimpleFoamYade/pEqn.H:28`).
    ``gamma_f`` is precomputed on faces so the CG loop pays one pad per
    matvec, not two.
    """
    out = 0.0
    for axis in range(3):
        f = _strip_other_axes(fp, axis)
        g = _diff(f, axis) / grid.spacing[axis]          # snGrad on faces
        out = out + _diff(gamma_f[axis] * g, axis) / grid.spacing[axis]
    return out


def laplacian_facegamma_scalar_padded(gamma_f: Flux, fp: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    return laplacian_facegamma_padded(gamma_f, fp, grid)


def laplacian_gamma(gamma: jnp.ndarray, f: jnp.ndarray, gamma_bc: FieldBC, f_bc: FieldBC, grid: Grid) -> jnp.ndarray:
    gf = face_interp(gamma, gamma_bc, grid)
    return laplacian_facegamma_padded(gf, pad_scalar(f, f_bc), grid)


def laplacian_gamma_vector_padded(gamma_f: Flux, up: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """div(gamma_f grad U) per component — used for `fvc::laplacian(alphac, Uc)`
    (the `divT` coupling input, `pimpleFoamYade/pimpleFoamYade.C:75`)."""
    return jnp.stack([laplacian_facegamma_padded(gamma_f, up[c], grid) for c in range(3)])


def dev2_transpose_stress(G: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """The explicit half of OpenFOAM's `divDevRhoReff` integrand:
    C[i,j] = coeff * dev2(grad(U)^T)[i,j]
           = coeff * (dU_j/dx_i - (2/3) div(U) delta_ij)
    with G[i,j] = dU_i/dx_j and coeff a cell scalar (alpha * nu_eff for the
    phase-incompressible stress, `pimpleFoamYade/UcEqn.H:6`)."""
    div_u = G[0, 0] + G[1, 1] + G[2, 2]
    C = jnp.swapaxes(G, 0, 1) - (2.0 / 3.0) * div_u * jnp.eye(3)[:, :, None, None, None]
    return coeff * C


def div_tensor(C: jnp.ndarray, grid: Grid, pad_s) -> jnp.ndarray:
    """Cell-centred divergence of a cell-centred tensor:
    out[i] = sum_j d C[i,j] / dx_j (central differences; ghost values from
    `pad_s`, typically zero-gradient — standard for explicit deferred
    stress corrections). Completes `divDevRhoReff` (`UcEqn.H:6`) whose
    implicit Laplacian half is `laplacian_gamma_vector_padded`."""
    out = []
    for i in range(3):
        s = 0.0
        for j in range(3):
            fp = _strip_other_axes(pad_s(C[i, j]), j)
            n = fp.shape[j]
            hi = jax.lax.slice_in_dim(fp, 2, n, axis=j)
            lo = jax.lax.slice_in_dim(fp, 0, n - 2, axis=j)
            s = s + (hi - lo) / (2.0 * grid.spacing[j])
        out.append(s)
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# Reconstruction
# ---------------------------------------------------------------------------

def reconstruct(face_vals: Flux) -> jnp.ndarray:
    """``fvc::reconstruct`` — cell-centred vector from face-normal values
    (average of the two faces on each axis). Used for the body-force flux
    in the PIMPLE momentum/pressure coupling (`UcEqn.H:27`, `pEqn.H:43`)."""
    comps = []
    for axis in range(3):
        comps.append(_mean(face_vals[axis], axis))
    return jnp.stack(comps)


def constrain_flux(phi: Flux, u_bc: FieldBC, ctx=None) -> Flux:
    """Pin boundary-face fluxes to the BC normal velocity at Dirichlet-u
    faces — the TPU-native equivalent of OpenFOAM's `constrainHbyA` +
    `fixedFluxPressure` combination (`icoFoamYade.C:100,111`,
    `pimpleFoamYade/pEqn.H:2,24`): a no-slip/moving wall prescribes the
    total face flux, and the pressure equation must see exactly that flux
    or mass leaks through walls whenever body forces act.

    Under sharding only the shards holding a global edge apply the pin."""
    from ..ops.grid import DIRICHLET, SLIP
    def pin_value(face, a):
        return 0.0 if face.kind == SLIP else face.component(a)
    out = list(phi)
    for a in range(3):
        lo, hi = u_bc.faces[a]
        f = out[a]
        n = f.shape[a]
        if lo.kind in (DIRICHLET, SLIP):
            plane = jnp.full_like(jax.lax.slice_in_dim(f, 0, 1, axis=a), pin_value(lo, a))
            if ctx is not None and ctx.mesh_axes[a] is not None:
                at_edge = ctx.shard_index(a) == 0
                plane = jnp.where(at_edge, plane, jax.lax.slice_in_dim(f, 0, 1, axis=a))
            f = jax.lax.concatenate(
                [plane, jax.lax.slice_in_dim(f, 1, n, axis=a)], dimension=a
            )
        if hi.kind in (DIRICHLET, SLIP):
            plane = jnp.full_like(jax.lax.slice_in_dim(f, n - 1, n, axis=a), pin_value(hi, a))
            if ctx is not None and ctx.mesh_axes[a] is not None:
                at_edge = ctx.shard_index(a) == ctx.shard_count(a) - 1
                plane = jnp.where(at_edge, plane, jax.lax.slice_in_dim(f, n - 1, n, axis=a))
            f = jax.lax.concatenate(
                [jax.lax.slice_in_dim(f, 0, n - 1, axis=a), plane], dimension=a
            )
        out[a] = f
    return tuple(out)


def adjust_phi(phi: Flux, u_bc: FieldBC, grid: Grid, ctx=None, reduce_sum=None) -> Flux:
    """Global mass-balance correction for inlet/outflow cases — the role of
    OpenFOAM's `adjustPhi` (`icoFoamYade.C:108`, `pEqn.H:22`): when the
    pressure equation has the constant nullspace (no fixed-pressure outlet),
    the net boundary flux must vanish. Dirichlet-u faces carry prescribed
    flux (inlets/walls); Neumann-u faces are adjustable outflows and get
    scaled so total outflow matches total inflow.

    No-op when there are no Neumann-u faces (closed/periodic domains are
    exactly balanced already)."""
    from ..ops.grid import DIRICHLET, NEUMANN
    reduce_sum = reduce_sum or (lambda x: x)
    has_adjustable = any(
        f.kind == NEUMANN for pair in u_bc.faces for f in pair
    )
    if not has_adjustable:
        return phi

    def face_areas(axis):
        hs = [grid.spacing[a] for a in range(3) if a != axis]
        return hs[0] * hs[1]

    fixed_net = 0.0     # outward flux through non-adjustable faces
    adj_out = 0.0       # outward flux through adjustable faces
    planes = []         # (axis, side, kind)
    for a in range(3):
        lo, hi = u_bc.faces[a]
        if u_bc.is_periodic(a):
            continue
        A = face_areas(a)
        f = phi[a]
        n = f.shape[a]
        lo_plane = jax.lax.slice_in_dim(f, 0, 1, axis=a)
        hi_plane = jax.lax.slice_in_dim(f, n - 1, n, axis=a)
        lo_out = -jnp.sum(lo_plane) * A      # outward at lo = -phi
        hi_out = jnp.sum(hi_plane) * A
        if ctx is not None and ctx.mesh_axes[a] is not None:
            lo_out = jnp.where(ctx.shard_index(a) == 0, lo_out, 0.0)
            hi_out = jnp.where(ctx.shard_index(a) == ctx.shard_count(a) - 1,
                               hi_out, 0.0)
        for side, out in ((0, lo_out), (1, hi_out)):
            kind = (lo if side == 0 else hi).kind
            if kind == NEUMANN:
                adj_out = adj_out + out
                planes.append((a, side))
            else:
                fixed_net = fixed_net + out
    fixed_net = reduce_sum(fixed_net)
    adj_out = reduce_sum(adj_out)

    # additive uniform correction: add the same outward face velocity to
    # every adjustable face so the total outward flux vanishes. (OpenFOAM
    # scales instead, which amplifies noise ~1/adj_out when the current
    # outflow is small — the additive form is smooth and division-free.)
    adj_area = 0.0
    for a, side in planes:
        hs = [grid.spacing[x] for x in range(3) if x != a]
        nfaces = 1
        for x in range(3):
            if x != a:
                nfaces *= grid.shape[x]
        adj_area = adj_area + hs[0] * hs[1] * nfaces
    scale = 1.0
    additive = -(fixed_net + adj_out) / adj_area
    out = list(phi)
    for a, side in planes:
        f = out[a]
        n = f.shape[a]
        if side == 0:
            # outward at the lo face is -phi: additive outward => -additive
            plane = jax.lax.slice_in_dim(f, 0, 1, axis=a) * scale - additive
            if ctx is not None and ctx.mesh_axes[a] is not None:
                plane = jnp.where(ctx.shard_index(a) == 0, plane,
                                  jax.lax.slice_in_dim(f, 0, 1, axis=a))
            f = jax.lax.concatenate(
                [plane, jax.lax.slice_in_dim(f, 1, n, axis=a)], dimension=a)
        else:
            plane = jax.lax.slice_in_dim(f, n - 1, n, axis=a) * scale + additive
            if ctx is not None and ctx.mesh_axes[a] is not None:
                plane = jnp.where(
                    ctx.shard_index(a) == ctx.shard_count(a) - 1, plane,
                    jax.lax.slice_in_dim(f, n - 1, n, axis=a))
            f = jax.lax.concatenate(
                [jax.lax.slice_in_dim(f, 0, n - 1, axis=a), plane], dimension=a)
        out[a] = f
    return tuple(out)


def surface_sum_abs_over_V(phi: Flux, grid: Grid) -> jnp.ndarray:
    """``fvc::surfaceSum(mag(phi))/V`` per cell — the Courant-number kernel
    (`/root/reference/pimpleFoamYade/CourantNo.H:38-42`). With `phi` holding
    face-normal velocities, sum(|u_f| A)/V = sum_axis (|u_lo|+|u_hi|)/h."""
    out = 0.0
    for axis in range(3):
        p = jnp.abs(phi[axis])
        n = p.shape[axis]
        hi = jax.lax.slice_in_dim(p, 1, n, axis=axis)
        lo = jax.lax.slice_in_dim(p, 0, n - 1, axis=axis)
        out = out + (hi + lo) / grid.spacing[axis]
    return out

"""ICI-sharded coupled step: grid slabs over a device mesh.

The multi-chip counterpart of the reference's parallel story. There, the
mesh is decomposed across Foam MPI ranks with Pstream halo exchange, and the
particle<->grid routing is a sparse bbox-intersection all-to-all with per
-rank blocking sends (`FoamYade::sendMeshBbox/recvYadeIntrs`,
`/root/reference/FoamYade/FoamYade.C:77-155`). Here:

* the grid is sharded in x-slabs over a 1-D `jax.sharding.Mesh`; every
  stencil/CG halo is a `lax.ppermute` over ICI (`parallel/ctx.ShardCtx`);
* face fluxes are carried between steps in cell-indexed form (`phi_lo`:
  each cell's low face per axis, shape == grid.shape) so the state shards
  evenly; local (n+1)-face tuples are reconstructed per step with one
  ppermute per axis;
* particles are replicated across shards; each particle is *owned* by the
  shard holding its base cell (the analog of the reference's found-flag
  owner election, `FoamYade.C:222-228`). The owner computes weights/forces
  using its halo-extended block; deposits that land in a neighbour's slab
  travel via a ring "halo reduction" (the reverse of a halo exchange), and
  per-particle forces are completed with one psum — replacing tags
  1002-1005 of the wire protocol (SURVEY.md §2.2). Sharding the particle
  arrays themselves (slab binning + ppermute migration) is the planned
  next refinement; replication is correct and memory-cheap at 1M particles
  (~100 MB/shard of transient weight tensors).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import coupled as cd
from ..models.fields import SimState, StepDiagnostics
from ..ops import coupling as cp
from ..ops.grid import DIRICHLET, FieldBC, Grid, PERIODIC
from .ctx import ShardCtx

AXIS = "x"   # grid axis 0 is sharded over this mesh axis


# ---------------------------------------------------------------------------
# phi representation: (n+1)-face tuples <-> cell-indexed low faces
# ---------------------------------------------------------------------------

def faces_to_lo(phi) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop each axis's last face plane: phi_lo[a][...i...] = face i-1/2."""
    return (phi[0][:-1], phi[1][:, :-1], phi[2][:, :, :-1])


def _bc_face_value(bc: FieldBC, axis: int, hi_face, component: int):
    lo, hi = bc.faces[axis]
    if hi.kind == DIRICHLET:
        return jnp.full_like(hi_face, hi.component(component))
    # NEUMANN: zero-gradient -> copy the adjacent interior face value
    return hi_face


def lo_to_faces_host(phi_lo, u_bc: FieldBC):
    """Global (host-side) inverse of `faces_to_lo` — for checkpoint/compare
    paths that need the (n+1)-face tuples back from a gathered state."""
    faces = []
    for a in range(3):
        f = phi_lo[a]
        first = lax.slice_in_dim(f, 0, 1, axis=a)
        last = lax.slice_in_dim(f, f.shape[a] - 1, f.shape[a], axis=a)
        if u_bc.is_periodic(a):
            top = first
        else:
            top = _bc_face_value(u_bc, a, last, a)
        faces.append(jnp.concatenate([f, top], axis=a))
    return tuple(faces)


def lo_to_faces_local(phi_lo, u_bc: FieldBC, ctx: ShardCtx):
    """Rebuild local (n_loc+1)-face tuples from local low-face arrays.

    The missing top plane per axis is: the next shard's first low face
    (ppermute) on sharded axes; the wrapped first plane on periodic axes;
    the BC face value at a global wall."""
    faces = []
    for a in range(3):
        f = phi_lo[a]
        first = lax.slice_in_dim(f, 0, 1, axis=a)
        last = lax.slice_in_dim(f, f.shape[a] - 1, f.shape[a], axis=a)
        name = ctx.mesh_axes[a]
        periodic = u_bc.is_periodic(a)
        if name is None:
            if periodic:
                top = first
            else:
                top = _bc_face_value(u_bc, a, last, a)
        else:
            n_sh = lax.axis_size(name)
            idx = lax.axis_index(name)
            bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
            from_right = lax.ppermute(first, name, bwd)
            if periodic:
                top = from_right
            else:
                top = jnp.where(
                    idx == n_sh - 1, _bc_face_value(u_bc, a, last, a), from_right
                )
        faces.append(jnp.concatenate([f, top], axis=a))
    return tuple(faces)


# ---------------------------------------------------------------------------
# Sharded particle<->grid plumbing
# ---------------------------------------------------------------------------

def _gather_bc(bcs) -> FieldBC:
    """Halo-pad BC for gathers: ring values where globally periodic,
    (unused) mirror ghosts at walls."""
    from ..ops.grid import FaceBC, NEUMANN
    faces = []
    for a in range(3):
        if bcs.u.is_periodic(a):
            faces.append((FaceBC(PERIODIC), FaceBC(PERIODIC)))
        else:
            faces.append((FaceBC(NEUMANN), FaceBC(NEUMANN)))
    return FieldBC(tuple(faces))


def _sharded_support_ops(
    cells,                     # 3-tuple of (N,S) unwrapped global cell indices
    weights: jnp.ndarray,      # (N,S) normalized, owner-masked
    owner: jnp.ndarray,        # (N,) bool
    base: jnp.ndarray,         # (N,3) anchor cell (global indices)
    offsets,                   # (S,3) static numpy stencil offsets
    grid: Grid,
    bcs,
    ctx: ShardCtx,
    n_loc: int,
):
    """Build SupportOps for owner-shard coupling on a halo-extended slab."""
    nx, ny, nz = grid.shape
    periodic = bcs.periodic_axes()
    start = lax.axis_index(AXIS) * n_loc

    # per-axis validity on the *global* domain (walls mask, periodic wraps)
    ok = owner[:, None]
    for a in range(3):
        if not periodic[a]:
            ok = ok & (cells[a] >= 0) & (cells[a] < grid.shape[a])
    w = jnp.where(ok, weights, 0.0)

    # extended-slab x index in [0, n_loc+2); owner guarantee keeps it in range
    lxe = jnp.clip(cells[0] - start + 1, 0, n_loc + 1)
    wy = jnp.mod(cells[1], ny)
    wz = jnp.mod(cells[2], nz)

    ncell_ext = (n_loc + 2) * ny * nz
    dep_ids = jnp.where(ok, lxe * (ny * nz) + wy * nz + wz, ncell_ext)

    npadyz = (ny + 2) * (nz + 2)
    gat_ids = lxe * npadyz + (wy + 1) * (nz + 2) + (wz + 1)
    gat_ids = jnp.where(ok, gat_ids, 0)   # masked by zero weight anyway

    gbc = _gather_bc(bcs)
    fwd = None  # perms built lazily inside closures

    def _halo_reduce(ext: jnp.ndarray) -> jnp.ndarray:
        """(n_loc+2, ny, nz) extended deposits -> (n_loc, ny, nz) local with
        cross-slab contributions delivered over the ring."""
        n_sh = lax.axis_size(AXIS)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        from_left = lax.ppermute(ext[-1:], AXIS, fwd)   # left nbr's top plane
        from_right = lax.ppermute(ext[:1], AXIS, bwd)   # right nbr's bottom
        interior = ext[1:-1]
        interior = interior.at[0].add(from_left[0])
        interior = interior.at[-1].add(from_right[0])
        return interior

    # Anchor slot on the LOCAL slab, biased by +1 so the trilinear anchor
    # (which may sit one cell left of the slab for an owned particle) fits:
    # lx2 = anchor_x - start + 1 in [0, n_loc]. The buffer plane j
    # distributes to extended-slab plane j + dx. y/z wrapped — masked
    # contributions carry zero values, so wrap placement is harmless.
    base_lx2 = jnp.clip(base[:, 0] - start + 1, 0, n_loc)
    base_wy = jnp.mod(base[:, 1], ny)
    base_wz = jnp.mod(base[:, 2], nz)
    nslab = (n_loc + 1) * ny * nz
    base_loc = base_lx2 * (ny * nz) + base_wy * nz + base_wz
    base_loc = jnp.where(owner, base_loc, nslab)

    def dep_stack(values: jnp.ndarray) -> jnp.ndarray:
        """(N,S,C) -> (C, n_loc, ny, nz): ONE N-row scatter of all (S*C)
        channels onto the anchor slot, static roll/slice distribution into
        the halo-extended slab, ring halo reduction."""
        N, S, C = values.shape
        buf = jax.ops.segment_sum(
            values.reshape(N, S * C), base_loc, num_segments=nslab + 1
        )[:nslab].reshape(n_loc + 1, ny, nz, S, C)
        ext = jnp.zeros((n_loc + 2, ny, nz, C), values.dtype)
        for o in range(S):
            dx, dy, dz = (int(v) for v in offsets[o])
            plane = jnp.roll(buf[..., o, :], (dy, dz), axis=(1, 2))
            # buffer plane j lands on extended plane j+dx; clip to range
            j0 = max(0, -dx)
            j1 = min(n_loc + 1, n_loc + 2 - dx)
            ext = ext.at[j0 + dx: j1 + dx].add(plane[j0:j1])
        ext = jnp.moveaxis(ext, -1, 0)                   # (C, n_loc+2, ny, nz)
        n_sh = lax.axis_size(AXIS)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        from_left = lax.ppermute(ext[:, -1:], AXIS, fwd)
        from_right = lax.ppermute(ext[:, :1], AXIS, bwd)
        interior = ext[:, 1:-1]
        interior = interior.at[:, 0].add(from_left[:, 0])
        interior = interior.at[:, -1].add(from_right[:, 0])
        return interior

    def dep(values: jnp.ndarray) -> jnp.ndarray:
        return dep_stack(values[..., None])[0]

    def dep_vec(values: jnp.ndarray) -> jnp.ndarray:
        return dep_stack(values)

    def gat_stack(fields) -> jnp.ndarray:
        """List of local scalar/vector fields -> (N, C) via ONE row-gather
        of the stacked, halo-padded slab."""
        parts = []
        for f in fields:
            comps = f if f.ndim == 4 else f[None]
            for c in range(comps.shape[0]):
                parts.append(ctx.pad_s(comps[c], gbc))
        fp = jnp.stack(parts)                            # (C, n_loc+2, ny+2, nz+2)
        C = fp.shape[0]
        tbl = fp.reshape(C, -1).T                        # (npad, C)
        vals = tbl[gat_ids]                              # (N,S,C)
        return jnp.sum(vals * w[..., None], axis=1)

    def gat(field_local: jnp.ndarray) -> jnp.ndarray:
        return gat_stack([field_local])[:, 0]

    def gat_vec(field_local: jnp.ndarray) -> jnp.ndarray:
        return gat_stack([field_local])

    return cp.SupportOps(dep, dep_vec, gat, gat_vec, dep_stack, gat_stack), w


def make_sharded_exchange(cfg: cd.CaseConfig, ctx: ShardCtx, n_loc: int):
    """Owner-shard coupling exchange closure for `coupled_step`."""
    grid, bcs, tp = cfg.grid, cfg.bcs, cfg.transport
    ccfg = cfg.coupling

    def ex(fs, ps, dt) -> cp.CouplingResult:
        curl_u, grad_p, div_tau, ddt_u = cd._coupling_inputs(
            fs, grid, bcs, tp.nu, dt, ctx, ccfg
        )
        pf = cp.ParticleFields(ps.pos, ps.vel, ps.angvel, ps.radius, ps.active)

        if ccfg.gaussian:
            cells, w_raw, validp = cp.gaussian_cells_raw_weights(
                pf.pos, pf.active, grid, ccfg
            )
        else:
            cells, w_raw, validp = cp.trilinear_cells_raw_weights(
                pf.pos, pf.active, grid
            )

        # globally-consistent normalization (every shard computes the same)
        periodic = bcs.periodic_axes()
        ok_glob = validp[:, None]
        for a in range(3):
            if not periodic[a]:
                ok_glob = ok_glob & (cells[a] >= 0) & (cells[a] < grid.shape[a])
        w_norm = cp.normalize_weights(w_raw, ok_glob)

        # owner election: the shard holding the base cell
        base, _ = cp.locate(pf.pos, grid)
        start = lax.axis_index(AXIS) * n_loc
        owner = validp & (base[:, 0] >= start) & (base[:, 0] < start + n_loc)
        w_owned = jnp.where(owner[:, None], w_norm, 0.0)

        if ccfg.gaussian:
            import numpy as _np
            offsets = cp.stencil_offsets(ccfg)
            anchor = base
        else:
            import numpy as _np
            offsets = _np.stack(
                _np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
            ).reshape(-1, 3)
            origin = jnp.asarray(grid.origin, pf.pos.dtype)
            h = jnp.asarray(grid.spacing, pf.pos.dtype)
            anchor = jnp.floor((pf.pos - origin) / h - 0.5).astype(jnp.int32)

        ops, w = _sharded_support_ops(
            cells, w_owned, owner, anchor, offsets, grid, bcs, ctx, n_loc
        )
        found_local = owner & (jnp.sum(w, axis=1) > 0.0)

        if ccfg.gaussian:
            res = cp.gaussian_physics(
                pf, fs.u, grad_p, div_tau, ddt_u, curl_u,
                w, found_local, ops, grid.cell_volume, tp.nu, tp.rho_f, ccfg,
                prev_alpha=fs.alpha,
            )
        else:
            res = cp.point_force_physics(
                pf, fs.u, curl_u, w, found_local, ops,
                grid.cell_volume, tp.nu, tp.rho_f,
                dataclasses.replace(ccfg, use_torque=True),
            )

        # complete per-particle results across shards (each particle owned
        # by exactly one shard, so psum == select) — replaces the force
        # return sends of FoamYade.C:487-535
        force = lax.psum(res.force, AXIS)
        torque = lax.psum(res.torque, AXIS)
        found = lax.psum(res.found.astype(jnp.int32), AXIS) > 0
        return res._replace(force=force, torque=torque, found=found)

    return ex


# ---------------------------------------------------------------------------
# Sharded step builder
# ---------------------------------------------------------------------------

def state_specs(cfg: cd.CaseConfig):
    """PartitionSpecs for a SimState whose phi is in lo-face form."""
    fluid = dict(
        u=P(None, AXIS), u_old=P(None, AXIS), p=P(AXIS),
        phi=(P(AXIS), P(AXIS), P(AXIS)),
        alpha=P(AXIS), alpha_old=P(AXIS),
        u_source=P(None, AXIS), u_source_drag=P(AXIS), u_particle=P(None, AXIS),
    )
    from ..models.fields import FluidState, ParticleState, TurbulenceState
    fluid_spec = FluidState(**fluid)
    part_spec = ParticleState(pos=P(), vel=P(), angvel=P(), radius=P(), active=P())
    turb_spec = TurbulenceState(k=P(AXIS), epsilon=P(AXIS), nut=P(AXIS))
    return SimState(
        fluid=fluid_spec, particles=part_spec, turb=turb_spec,
        t=P(), dt=P(), step=P(),
    )


def diag_specs():
    return StepDiagnostics(*([P()] * 9))


def to_sharded_state(state: SimState, cfg: cd.CaseConfig, mesh: Mesh) -> SimState:
    """Convert a single-device SimState (face-tuple phi) into the sharded
    lo-face layout and place it on the mesh."""
    from jax.sharding import NamedSharding
    st_lo = state._replace(
        fluid=state.fluid._replace(phi=faces_to_lo(state.fluid.phi))
    )
    specs = state_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st_lo, specs,
    )


def make_sharded_step(cfg: cd.CaseConfig, mesh: Mesh):
    """Build the jitted per-shard coupled step over `mesh` (1-D, axis 'x').

    Grid requirement: cfg.grid.shape[0] divisible by mesh.shape['x']."""
    n_sh = mesh.shape[AXIS]
    nx = cfg.grid.shape[0]
    assert nx % n_sh == 0, f"nx={nx} not divisible by {n_sh} shards"
    n_loc = nx // n_sh
    ctx = ShardCtx(mesh_axes=(AXIS, None, None))

    def body(state: SimState):
        faces = lo_to_faces_local(state.fluid.phi, cfg.bcs.u, ctx)
        st8 = state._replace(fluid=state.fluid._replace(phi=faces))
        ex = make_sharded_exchange(cfg, ctx, n_loc)
        new, diag = cd.coupled_step(st8, cfg, ctx=ctx, exchange_fn=ex)
        new = new._replace(
            fluid=new.fluid._replace(phi=faces_to_lo(new.fluid.phi))
        )
        return new, diag

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(state_specs(cfg),),
        out_specs=(state_specs(cfg), diag_specs()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_scan(cfg: cd.CaseConfig, mesh: Mesh, n_steps: int):
    """n_steps sharded coupled steps under one jit (scan inside shard_map,
    so per-step halos stay on ICI with no host sync)."""
    n_sh = mesh.shape[AXIS]
    n_loc = cfg.grid.shape[0] // n_sh
    ctx = ShardCtx(mesh_axes=(AXIS, None, None))

    def body(state: SimState):
        ex = make_sharded_exchange(cfg, ctx, n_loc)

        def one(s, _):
            faces = lo_to_faces_local(s.fluid.phi, cfg.bcs.u, ctx)
            st8 = s._replace(fluid=s.fluid._replace(phi=faces))
            new, diag = cd.coupled_step(st8, cfg, ctx=ctx, exchange_fn=ex)
            new = new._replace(
                fluid=new.fluid._replace(phi=faces_to_lo(new.fluid.phi))
            )
            return new, diag

        return lax.scan(one, state, None, length=n_steps)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(state_specs(cfg),),
        out_specs=(state_specs(cfg), diag_specs()),
        check_vma=False,
    )
    return jax.jit(sharded)

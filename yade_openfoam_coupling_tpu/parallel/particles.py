"""Sharded particle arrays: slab ownership, ring migration, DEM ghosts.

The reference routes particles to mesh partitions by bounding-box
intersection and only owners compute (`/root/reference/FoamYade/FoamYade.C:
77-155,222-243`); Yade's own MPI layer migrates bodies between ranks. This
module is the TPU-native equivalent for x-slab grid sharding:

* every shard owns the particles whose base cell lies in its slab, holding
  them in a fixed-capacity slot array (`cap_loc` slots, active-masked);
* after the DEM substeps, particles that crossed a slab boundary ride ONE
  ring hop per step toward their owner (`migrate` — fixed-size ppermute
  buffers, overflow counted, never silently dropped: unsent particles stay
  local and retry next step);
* DEM contact partners within reach of the slab boundary are mirrored as
  ghosts each substep (`GhostPlan` — the ghost SET is fixed per fluid step
  so Verlet-list slots stay valid; ghost VALUES refresh per substep, which
  makes the sharded trajectories exactly equal to the single-device ones).

Everything is fixed-shape: selections are `top_k` compactions, transfers
are `lax.ppermute` of small (K, C) buffers over ICI.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.fields import ParticleState
from ..ops import dem as demod
from ..ops.grid import Grid

_HIGH = 1 << 24   # selection key high bit; per-shard capacity < 16M


def _select_rows(mask: jnp.ndarray, K: int):
    """Up to K set rows of `mask`: (ids (K,), valid (K,), n_unselected).
    Valid entries come first (top_k on a high-bit key)."""
    N = mask.shape[0]
    key = jnp.where(mask, jnp.arange(N, dtype=jnp.int32) + _HIGH, 0)
    top, _ = lax.top_k(key, K)
    valid = top >= _HIGH
    ids = jnp.where(valid, top - _HIGH, N)
    n_over = jnp.sum(mask.astype(jnp.int32)) - jnp.sum(valid.astype(jnp.int32))
    return ids, valid, n_over


def _rows(arr: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather rows with one scrap row appended (ids == len(arr) -> zeros)."""
    pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
    return jnp.concatenate([arr, pad])[ids]


class SlabGeom(NamedTuple):
    """Static geometry of this shard's x-slab (global coordinates)."""

    n_loc: int          # slab width in cells
    name: str           # mesh axis name


def _slab_bounds(grid: Grid, geom: SlabGeom):
    idx = lax.axis_index(geom.name)
    hx = grid.spacing[0]
    x_lo = grid.origin[0] + idx.astype(jnp.float32) * geom.n_loc * hx
    return x_lo, x_lo + geom.n_loc * hx


# ---------------------------------------------------------------------------
# Migration
# ---------------------------------------------------------------------------

def migrate(ps: ParticleState, grid: Grid, geom: SlabGeom, K: int):
    """One ring-migration step. Particles outside their owner slab hop one
    shard per step toward it (multi-hop arrivals take several steps; while
    in transit they are DEM-active but not coupled — the owner test in the
    exchange masks them, like the reference's not-found warning,
    `FoamYade.C:229-231`). Returns (ps_new, n_overflow): n_overflow counts
    buffer-overflow particles that stayed behind to retry (plus arrivals
    that found no free slot and were dropped — surfaced, never silent)."""
    name = geom.name
    n_sh = lax.axis_size(name)
    idx = lax.axis_index(name)
    n_loc = geom.n_loc
    hx = grid.spacing[0]
    nx_glob = n_loc * n_sh

    cellx = jnp.floor((ps.pos[:, 0] - grid.origin[0]) / hx).astype(jnp.int32)
    cellx = jnp.clip(cellx, 0, nx_glob - 1)   # out-of-domain stays at edges
    slab = cellx // n_loc
    d = jnp.mod(slab - idx, n_sh)             # hops to the right to reach owner
    act = ps.active
    go_right = act & (d >= 1) & (d <= n_sh // 2)
    go_left = act & (d > n_sh // 2)

    ids_r, val_r, over_r = _select_rows(go_right, K)
    ids_l, val_l, over_l = _select_rows(go_left, K)

    has_shear = ps.shear_xi is not None
    fparts = [ps.pos, ps.vel, ps.angvel, ps.radius[:, None]]
    if has_shear:
        Np, M = ps.shear_ids.shape
        fparts += [ps.shear_xi.reshape(Np, 3 * M),
                   ps.shear_wall.reshape(Np, 9),
                   ps.shear_ids.astype(ps.pos.dtype)]  # pid keys fit f32 ints
    payload = jnp.concatenate(fparts, axis=-1)  # (N, 10 [+4M+9]) float
    N = payload.shape[0]

    fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
    bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]

    def send(ids, valid, perm):
        buf = _rows(payload, ids)
        pidb = _rows(ps.pid[:, None], ids)[:, 0]
        vb = valid
        return (
            lax.ppermute(buf, name, perm),
            lax.ppermute(pidb, name, perm),
            lax.ppermute(vb, name, perm),
        )

    rbuf, rpid, rval = send(ids_r, val_r, fwd)     # arrivals from the left
    lbuf, lpid, lval = send(ids_l, val_l, bwd)     # arrivals from the right

    # deactivate the rows we actually sent
    sent = jnp.zeros(N, bool)
    sent = sent.at[jnp.where(val_r, ids_r, N)].set(True, mode="drop")
    sent = sent.at[jnp.where(val_l, ids_l, N)].set(True, mode="drop")
    active = act & ~sent

    arr_buf = jnp.concatenate([rbuf, lbuf])        # (2K, 10)
    arr_pid = jnp.concatenate([rpid, lpid])
    arr_val = jnp.concatenate([rval, lval])

    # place arrivals into free slots (valid-first on both sides)
    free_ids, free_ok, _ = _select_rows(~active, 2 * K)
    # sort arrivals valid-first so arrival j pairs with free slot j
    order = jnp.argsort(~arr_val, stable=True)
    arr_buf, arr_pid, arr_val = arr_buf[order], arr_pid[order], arr_val[order]
    place_ok = arr_val & free_ok
    tgt = jnp.where(place_ok, free_ids, N)
    n_dropped = jnp.sum((arr_val & ~free_ok).astype(jnp.int32))

    def put(dst, src):
        return dst.at[tgt].set(src, mode="drop")

    kw = {}
    if has_shear:
        kw = dict(
            shear_xi=put(ps.shear_xi,
                         arr_buf[:, 10:10 + 3 * M].reshape(-1, M, 3)),
            shear_wall=put(ps.shear_wall,
                           arr_buf[:, 10 + 3 * M:19 + 3 * M].reshape(-1, 3, 3)),
            shear_ids=put(ps.shear_ids,
                          arr_buf[:, 19 + 3 * M:].astype(jnp.int32)),
        )
    ps_new = ParticleState(
        pos=put(ps.pos, arr_buf[:, 0:3]),
        vel=put(ps.vel, arr_buf[:, 3:6]),
        angvel=put(ps.angvel, arr_buf[:, 6:9]),
        radius=put(ps.radius, arr_buf[:, 9]),
        active=active.at[tgt].set(place_ok, mode="drop"),
        pid=put(ps.pid, arr_pid),
        **kw,
    )
    return ps_new, over_r + over_l + n_dropped


# ---------------------------------------------------------------------------
# DEM ghosts
# ---------------------------------------------------------------------------

class GhostPlan(NamedTuple):
    """Fixed ghost SET for one fluid step: which local rows mirror to each
    neighbour (ids/valid), and the wrap shift to apply to their x."""

    ids_lo: jnp.ndarray    # (K,) rows sent to the LEFT neighbour
    val_lo: jnp.ndarray
    ids_hi: jnp.ndarray    # rows sent to the RIGHT neighbour
    val_hi: jnp.ndarray
    shift_lo: jnp.ndarray  # scalar x shift applied when sending left
    shift_hi: jnp.ndarray
    n_overflow: jnp.ndarray


def plan_ghosts(pos, active, grid: Grid, geom: SlabGeom, gw: float,
                periodic_x: bool, K: int) -> GhostPlan:
    """Select the boundary-zone particles (width `gw`) once per fluid step."""
    name = geom.name
    n_sh = lax.axis_size(name)
    idx = lax.axis_index(name)
    x_lo, x_hi = _slab_bounds(grid, geom)
    L = grid.lengths[0]

    near_lo = active & (pos[:, 0] < x_lo + gw)
    near_hi = active & (pos[:, 0] >= x_hi - gw)
    if not periodic_x:
        near_lo = near_lo & (idx > 0)
        near_hi = near_hi & (idx < n_sh - 1)
    ids_lo, val_lo, over_lo = _select_rows(near_lo, K)
    ids_hi, val_hi, over_hi = _select_rows(near_hi, K)
    # crossing the periodic wrap: shift so the receiver sees contiguous x
    shift_lo = jnp.where(idx == 0, L, 0.0) if periodic_x else jnp.float32(0.0)
    shift_hi = jnp.where(idx == n_sh - 1, -L, 0.0) if periodic_x else jnp.float32(0.0)
    return GhostPlan(ids_lo, val_lo, ids_hi, val_hi,
                     jnp.asarray(shift_lo, pos.dtype),
                     jnp.asarray(shift_hi, pos.dtype),
                     over_lo + over_hi)


def fetch_ghosts(plan: GhostPlan, pos, vel, angvel, radius, geom: SlabGeom,
                 pid=None):
    """Exchange current values of the planned ghost set: (2K, ...) arrays.
    Called every substep so ghost state tracks the owners exactly. With
    ``pid`` also returns the ghosts' stable pids (shear-history keys)."""
    name = geom.name
    n_sh = lax.axis_size(name)
    fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
    bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]

    def pack(ids, valid, shift):
        parts = [pos, vel, angvel, radius[:, None]]
        if pid is not None:
            # pids < 2^24 carry exactly in f32
            parts.append(pid.astype(pos.dtype)[:, None])
        buf = jnp.concatenate(parts, axis=-1)
        rows = _rows(buf, ids)
        rows = rows.at[:, 0].add(jnp.where(valid, shift, 0.0))
        return rows, valid

    rows_lo, v_lo = pack(plan.ids_lo, plan.val_lo, plan.shift_lo)
    rows_hi, v_hi = pack(plan.ids_hi, plan.val_hi, plan.shift_hi)
    # to the left = bwd; to the right = fwd
    from_right = lax.ppermute(rows_lo, name, bwd), lax.ppermute(v_lo, name, bwd)
    from_left = lax.ppermute(rows_hi, name, fwd), lax.ppermute(v_hi, name, fwd)
    rows = jnp.concatenate([from_left[0], from_right[0]])
    val = jnp.concatenate([from_left[1], from_right[1]])
    out = (rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9], val)
    if pid is not None:
        gpid = jnp.where(val, rows[:, 10].astype(jnp.int32), -1)
        return out + (gpid,)
    return out


# ---------------------------------------------------------------------------
# Prebuilt DEM plan (chunked sharded scan: one build per K-step chunk)
# ---------------------------------------------------------------------------

class DEMPlan(NamedTuple):
    """Ghost plan + neighbor list built once per rebuild chunk and frozen
    across the chunk's fluid steps (the sharded analog of the local
    statically-scheduled Verlet rebuild). Ghost VALUES still refresh per
    substep via `fetch_ghosts`; only the SET and the candidate list are
    frozen. `ref_pos` anchors the same drift-staleness diagnostic the
    local path uses (models/coupled.py frozen_list)."""

    plan: GhostPlan
    nbr: Optional[jnp.ndarray]
    n_list_overflow: jnp.ndarray
    ref_pos: jnp.ndarray


def ghost_width(grid: Grid, cfg, r_max: float) -> float:
    """The farthest a contact partner of a local particle can sit past the
    slab boundary. Cell lists: 2 hash-bin widths (27-bin reach with
    unaligned bin edges; MUST match build_neighbor_list's effective bin
    size incl. the max_bins cap). All-pairs: the contact distance plus the
    Verlet-skin drift margin."""
    import yade_openfoam_coupling_tpu.ops.dem as demod
    if cfg.neighbor == "cells":
        return 2.0 * demod.effective_bin_size(grid, cfg, r_max)
    return 2.0 * r_max * (1.0 + cfg.skin)


def ghost_capacity(n_loc_cap: int, grid: Grid, cfg, r_max: float,
                   geom: SlabGeom) -> int:
    """Per-direction ghost-plan send capacity: the slot capacity scaled by
    the eligible fraction of the slab (particles within `ghost_width` of
    an edge). When gw >= slab width EVERY local particle is eligible both
    ways, so the only safe bound is the full slot capacity; when gw is a
    small fraction of the slab, sizing by that fraction keeps the ppermute
    buffers proportional to the boundary-band population (slot capacity is
    already ~2x the max initial count, so the band inherits the same
    headroom). Overflow is surfaced per step, never silent."""
    import math
    gw = ghost_width(grid, cfg, r_max)
    slab_w = geom.n_loc * grid.spacing[0]
    frac = min(1.0, gw / slab_w)
    return max(16, min(n_loc_cap, int(math.ceil(n_loc_cap * frac))))


def check_slab_geometry(grid: Grid, cfg, r_max: float, geom: SlabGeom,
                        n_sh: int):
    gw = ghost_width(grid, cfg, r_max)
    slab_w = geom.n_loc * grid.spacing[0]
    periodic_x = bool(cfg.periodic[0])
    if n_sh > 1 and slab_w < gw:
        raise ValueError(
            f"slab width {slab_w:.4g} < ghost width {gw:.4g}: contacts "
            f"would reach past the adjacent shard — use fewer shards"
        )
    if n_sh == 2 and periodic_x and slab_w < 2.0 * gw:
        # one particle would ghost to BOTH sides of the same neighbour and
        # min-image would double-count the pair
        raise ValueError(
            f"2 shards + periodic x needs slab width >= 2*ghost width "
            f"({slab_w:.4g} < {2 * gw:.4g})"
        )
    return gw


def build_dem_plan(ps: ParticleState, grid: Grid, cfg, r_max: float,
                   geom: SlabGeom, K_ghost: int) -> DEMPlan:
    """Build the frozen (ghost plan, neighbor list) for one rebuild chunk."""
    import yade_openfoam_coupling_tpu.ops.dem as demod
    n_sh = lax.axis_size(geom.name)
    gw = check_slab_geometry(grid, cfg, r_max, geom, n_sh)
    periodic_x = bool(cfg.periodic[0])
    use_ghosts = n_sh > 1
    plan = plan_ghosts(ps.pos, ps.active, grid, geom, gw, periodic_x,
                       K_ghost if use_ghosts else 1)
    if use_ghosts:
        gpos, _, _, grad, gact = fetch_ghosts(
            plan, ps.pos, ps.vel, ps.angvel, ps.radius, geom)
        apos = jnp.concatenate([ps.pos, gpos])
        aact = jnp.concatenate([ps.active, gact])
    else:
        apos, aact = ps.pos, ps.active
    if cfg.neighbor == "cells":
        nbr, n_over = demod.build_neighbor_list(
            apos, aact, grid, cfg, r_max, return_overflow=True)
    else:
        nbr, n_over = None, jnp.int32(0)
    return DEMPlan(plan, nbr, n_over, ps.pos)


# ---------------------------------------------------------------------------
# Sharded DEM substeps
# ---------------------------------------------------------------------------

def dem_substeps_sharded(
    ps: ParticleState,
    hydro: demod.DEMForces,     # (N_loc, 3) per local particle
    grid: Grid,
    cfg: demod.DEMConfig,
    dt_dem,
    n_sub: int,
    r_max: float,
    geom: SlabGeom,
    K_ghost: int,
    shear=None,                 # Optional[demod.ShearState]: pid-keyed history
    dt_seq=None,                # per-substep dt (DEMConfig.dynamic_substeps)
    dem_plan: "Optional[DEMPlan]" = None,
):
    """Velocity-Verlet substeps on the local slot array with per-substep
    ghost refresh — the sharded counterpart of `dem.dem_substeps` (exactly
    equal trajectories; see module docstring). Returns
    (pos, vel, angvel, n_list_overflow, n_ghost_overflow).

    ``dt_seq`` overrides the scalar ``dt_dem`` with a (n_sub,) per-substep
    dt — zero entries are exact velocity-Verlet no-ops (the masked tail of
    the dynamic-substep path). Must be REPLICATED across shards (it is
    derived from a ctx.min-reduced critical dt in `coupled_step`).

    ``dem_plan``: a frozen (ghost plan, neighbor list) from
    `build_dem_plan` — the chunked sharded scan's analog of the local
    statically-scheduled Verlet rebuild. Ghost VALUES still refresh per
    substep; only the ghost SET and the candidate list are reused (a
    stale-but-valid plan is a candidate superset, so forces are
    identical; staleness is diagnosed by the caller against
    `DEMPlan.ref_pos`)."""
    pos, vel, angvel = ps.pos, ps.vel, ps.angvel
    radius, active = ps.radius, ps.active
    N = pos.shape[0]
    p = cfg.params
    m = demod.particle_mass(radius, p.rho_p)
    inertia = demod.particle_inertia(radius, p.rho_p)
    g = jnp.asarray(cfg.gravity, pos.dtype)
    vol = (4.0 / 3.0) * jnp.pi * radius ** 3
    f_grav = m[:, None] * g[None, :]
    if cfg.buoyancy:
        f_grav = f_grav - cfg.rho_f * vol[:, None] * g[None, :]
    inv_m = jnp.where(active, 1.0 / m, 0.0)[:, None]
    inv_I = jnp.where(active, 1.0 / inertia, 0.0)[:, None]

    use_list = cfg.neighbor == "cells"
    n_sh = lax.axis_size(geom.name)
    use_ghosts = n_sh > 1   # n_sh == 1: min-image already sees everyone
    if dem_plan is None:
        gw = check_slab_geometry(grid, cfg, r_max, geom, n_sh)
        plan = plan_ghosts(pos, active, grid, geom, gw,
                           bool(cfg.periodic[0]),
                           K_ghost if use_ghosts else 1)
    else:
        plan = dem_plan.plan

    def all_state(pos, vel, angvel):
        if not use_ghosts:
            return pos, vel, angvel, radius, active
        gpos, gvel, gang, grad, gact = fetch_ghosts(
            plan, pos, vel, angvel, radius, geom
        )
        return (
            jnp.concatenate([pos, gpos]),
            jnp.concatenate([vel, gvel]),
            jnp.concatenate([angvel, gang]),
            jnp.concatenate([radius, grad]),
            jnp.concatenate([active, gact]),
        )

    # combined-array pids for shear-history keys (ghost slots carry their
    # owners' stable pids; single-shard: locals only)
    if shear is not None:
        assert use_list and cfg.contact_mode == "substep", (
            "sharded shear_history requires neighbor='cells', "
            "contact_mode='substep'")
        if use_ghosts:
            *_, gpid = fetch_ghosts(plan, pos, vel, angvel, radius, geom,
                                    pid=ps.pid)
            apid = jnp.concatenate([ps.pid, gpid])
        else:
            apid = ps.pid

    apos, avel, aang, arad, aact = all_state(pos, vel, angvel)
    if dem_plan is not None:
        nbr, n_list_over = dem_plan.nbr, jnp.int32(0)
    elif use_list:
        nbr, n_list_over = demod.build_neighbor_list(
            apos, aact, grid, cfg, r_max, return_overflow=True
        )
    else:
        nbr, n_list_over = None, jnp.int32(0)

    def damp(f, v):
        d = cfg.cundall_damping
        if d == 0.0:
            return f
        return f * (1.0 - d * jnp.sign(f * v))

    if shear is not None:
        Nc = apos.shape[0]
        keys = demod.shear_keys(nbr[:N], Nc, apid)
        xi0 = demod.carry_shear(shear, keys)
        xw0 = shear.xi_wall

        def eval_h(apos, avel, aang, xi, xw, dt_):
            xi_full = jnp.zeros((Nc,) + xi.shape[1:], xi.dtype).at[:N].set(xi)
            xw_full = jnp.zeros((Nc, 3, 3), xw.dtype).at[:N].set(xw)
            fc, tc, xi_full2 = demod.neighbor_contact_forces(
                nbr, apos, avel, aang, arad, aact, grid, cfg, xi_full, dt_
            )
            fw, tw, xw_full2 = demod.wall_contact_forces(
                apos, avel, aang, arad, aact, grid, cfg, xw_full, dt_
            )
            vl, al = avel[:N], aang[:N]
            f = damp((fc + fw)[:N] + f_grav + hydro.force, vl)
            t = damp((tc + tw)[:N] + hydro.torque, al)
            return f * inv_m, t * inv_I, xi_full2[:N], xw_full2[:N]

        a0, aw0, xi0, xw0 = eval_h(apos, avel, aang, xi0, xw0, 0.0)

        def body_h(state, dt_x):
            dt_ = dt_dem if dt_x is None else dt_x
            pos, vel, angvel, a, aw, xi, xw = state
            vel_h = vel + 0.5 * dt_ * a
            angvel_h = angvel + 0.5 * dt_ * aw
            pos_n = pos + dt_ * vel_h
            lo = jnp.asarray(grid.origin, pos.dtype)
            L = jnp.asarray(grid.lengths, pos.dtype)
            per = jnp.asarray(cfg.periodic)
            pos_n = jnp.where(per, lo + jnp.mod(pos_n - lo, L), pos_n)
            apos, avel, aang, _, _ = all_state(pos_n, vel_h, angvel_h)
            a2, aw2, xi2, xw2 = eval_h(apos, avel, aang, xi, xw, dt_)
            if dt_x is not None:
                # masked substep: freeze the shear springs (see
                # ops/dem.py dt_seq handling)
                live = dt_ > 0
                xi2 = jnp.where(live, xi2, xi)
                xw2 = jnp.where(live, xw2, xw)
            vel_n = vel_h + 0.5 * dt_ * a2
            angvel_n = angvel_h + 0.5 * dt_ * aw2
            return (pos_n, vel_n, angvel_n, a2, aw2, xi2, xw2), None

        (pos, vel, angvel, _, _, xi, xw), _ = lax.scan(
            body_h, (pos, vel, angvel, a0, aw0, xi0, xw0), dt_seq,
            length=n_sub
        )
        n_ghost_over = (jnp.int32(0) if dem_plan is not None else
                        plan.n_overflow if use_ghosts else jnp.int32(0))
        return (pos, vel, angvel, n_list_over, n_ghost_over,
                demod.ShearState(xi, keys, xw))

    def accel(apos, avel, aang):
        if nbr is not None:
            fc, tc = demod.neighbor_contact_forces(
                nbr, apos, avel, aang, arad, aact, grid, cfg
            )
        else:
            fc, tc = demod.allpairs_contact_forces(
                apos, avel, aang, arad, aact, grid, cfg
            )
        fw, tw = demod.wall_contact_forces(
            apos, avel, aang, arad, aact, grid, cfg
        )
        f = damp((fc + fw)[:N] + f_grav + hydro.force, avel[:N])
        t = damp((tc + tw)[:N] + hydro.torque, aang[:N])
        return f * inv_m, t * inv_I

    a0, aw0 = accel(apos, avel, aang)

    def body(state, dt_x):
        dt_ = dt_dem if dt_x is None else dt_x
        pos, vel, angvel, a, aw = state
        vel_h = vel + 0.5 * dt_ * a
        angvel_h = angvel + 0.5 * dt_ * aw
        pos_n = pos + dt_ * vel_h
        lo = jnp.asarray(grid.origin, pos.dtype)
        L = jnp.asarray(grid.lengths, pos.dtype)
        per = jnp.asarray(cfg.periodic)
        pos_n = jnp.where(per, lo + jnp.mod(pos_n - lo, L), pos_n)
        apos, avel, aang, _, _ = all_state(pos_n, vel_h, angvel_h)
        a2, aw2 = accel(apos, avel, aang)
        vel_n = vel_h + 0.5 * dt_ * a2
        angvel_n = angvel_h + 0.5 * dt_ * aw2
        return (pos_n, vel_n, angvel_n, a2, aw2), None

    (pos, vel, angvel, _, _), _ = lax.scan(
        body, (pos, vel, angvel, a0, aw0), dt_seq, length=n_sub
    )
    n_ghost_over = (jnp.int32(0) if dem_plan is not None else
                    plan.n_overflow if use_ghosts else jnp.int32(0))
    return pos, vel, angvel, n_list_over, n_ghost_over

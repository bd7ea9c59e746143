"""Plane-dense coupling exchange: slot planes + fused Pallas stencil kernels.

Third-generation plumbing for the Gaussian 4-way exchange (after the sparse
per-particle row path, `ops/coupling.py`, and the row-major slot table,
`ops/coupling_slots.py`). Measured costs at the 100k/128^3 tracked
benchmark drove every choice (PERF.md):

* per-index-row costs dominate the sparse path: (N*S)-row input gather
  ~14 ms, anchor-buffer deposit ~35 ms;
* ANY row-major per-slot table costs 512 B of HBM per row (lane padding),
  so slot state must live CHANNEL-MAJOR: (channels, cap, ncells) planes;
* scatter rows cost ~60 ns vs ~7 ns for gather rows — the pipeline does
  exactly ONE N-row scatter (the bin) and two N-row gathers (sort reorder,
  unbin).

Pipeline:
  1. bin: sort particles by cell (argsort + cummax rank), one-hot place
     each particle's 7 data channels into the channel-major staging
     table with sorted indices -> D (7[+3], cap, ncells); activity is
     rad > 0 (non-kept rows scatter zeros).
  2. interp (Pallas kernel A): for each x-plane, read the halo-padded
     fluid stack (3 plane views) and the slot positions; recompute the
     normalized Gaussian weights in VMEM (exp is cheap, HBM is not) and
     emit G (C_in, cap, ncells) slot-interpolated inputs + the weight norm.
  3. physics (XLA, channel-major): the unchanged force laws
     (`coupling.drag_coefficient`, Archimedes, torque) evaluated
     elementwise on (cap, ncells) planes -> per-slot force/torque and the
     8 deposit-value channels V.
  4. deposit (Pallas kernel B): recompute weights, accumulate w*V into
     one output stack per distinct (dx, dy) offset pair (dz shifts are
     in-VMEM lane rotations); a 9-stack roll epilogue in XLA lands the
     contributions (same scheme as `ops/pallas_rolls.py`).
  5. unbin: transpose per-slot results to (ncells, cap*7) and fetch each
     sorted particle's row by cell id; select its rank block with a dense
     one-hot; invert the sort with a gather.

Physics parity: identical formulas to `gaussian_coupling`
(`/root/reference/FoamYade/FoamYade.C:293-483`); requires ``lag_alpha``
(the alpha gather rides the main input stack — same O(dt) lag documented
on `CouplingConfig.lag_alpha`). Wall-axis stencil cells are masked out of
the weight normalization exactly like `_flat_cell_ids`; periodic axes use
wrap-padded ghosts.

Overflow contract: particles beyond ``slot_capacity`` in one cell are
counted (`CouplingResult.n_overflow`), reported found=False, and receive
no hydro force that step — identical to the slots path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    # the kernels hold C-channel accumulators plus 3 halo plane views per
    # grid step (~25-30 MB at 128^3, ~108 MB at 256^2 planes of the 1M
    # chunked config); Mosaic's default 16 MB scoped-VMEM budget is a soft
    # limit well under the v5e's 128 MiB physical VMEM
    _COMPILER_KW = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=120 * 1024 * 1024))
except Exception:  # pragma: no cover
    _COMPILER_KW = {}

from . import coupling as cp
from .dem import rank_in_sorted_segments
from .grid import Grid


# ---------------------------------------------------------------------------
# Binning: particles -> channel-major slot planes
# ---------------------------------------------------------------------------

class PlaneBins(NamedTuple):
    D: jnp.ndarray            # (7[+3], cap, ncells): px py pz vx vy vz rad
    #                           [+ angvel xyz in torque mode]; activity is
    #                           rad > 0 (non-kept rows scatter zeros)
    order: jnp.ndarray        # (N,) sorted-by-cell particle order
    inv_order: jnp.ndarray    # (N,) inverse permutation
    cell_sorted: jnp.ndarray  # (N,) flat cell per sorted particle (ncells=invalid)
    rank: jnp.ndarray         # (N,) rank within cell (sorted order)
    keep: jnp.ndarray         # (N,) bool: binned (valid & rank < cap)
    n_overflow: jnp.ndarray   # int32


def _staging_scatter(dat, oh, cell_sorted, keep, C, cap, ncells, nz,
                     packed=False):
    """Scatter sorted per-particle channel rows into the channel-major slot
    planes D (C, cap, ncells).

    Packed layout (the round-3 win, measured 12.9 -> 2.2 ms at 100k/128^3,
    scripts/micro_pack.py): a staging row of `(ncells, C*cap)` lane-pads
    its minor dim to 128 — a 1.1 GB table at 128^3 that the zeros-init,
    scatter, and transpose all traverse. Packing `zp = 128 // (C*cap)`
    z-consecutive cells per row gives a (ncells/zp, zp*C*cap<=128) table
    with no padding waste; the channel-major planes are reconstructed from
    zp contiguous column-block transposes + one stack/reshape interleave
    (cheap — XLA fuses it into one relayout). Falls back to the monolithic
    row layout when zp doesn't divide nz."""
    N = dat.shape[0]
    if packed == "col":
        # column scatter: updates land as (C*cap, 1) columns of a
        # channel-major table — no transpose afterwards and the table
        # traverses at its true 268 MB (vs 1.1 GB lane-padded rows at
        # 128^3); measured 13.0 -> 10.0 ms isolated (micro_pack.py).
        # Non-keep rows carry all-zero vals (callers zero `dat` under
        # keep; rank>=cap zeroes `oh`), so instead of an overflow column
        # (whose removal costs a full-table slice copy) they land
        # harmlessly in their clipped cell — jnp.clip is monotone on the
        # sorted cell ids, so indices_are_sorted stays truthful.
        vals = (dat[:, :, None] * oh[:, None, :]).reshape(N, C * cap)
        rows = jnp.clip(cell_sorted, 0, ncells - 1)
        tbl = jnp.zeros((C * cap, ncells), dat.dtype).at[:, rows].add(
            vals.T, indices_are_sorted=True)
        return tbl.reshape(C, cap, ncells)
    zp = max(1, 128 // (C * cap)) if packed else 1
    if zp > 1 and nz % zp == 0 and ncells % zp == 0:
        ncp = ncells // zp
        m = jnp.mod(cell_sorted, zp)
        moh = (m[:, None] == jnp.arange(zp)[None, :]).astype(dat.dtype)
        # vals layout [m][c][k]
        sel = (moh[:, :, None, None] * oh[:, None, None, :])  # (N, zp, 1, cap)
        vals = (dat[:, None, :, None] * sel).reshape(N, zp * C * cap)
        rows = jnp.where(keep, cell_sorted // zp, ncp)
        tbl = jnp.zeros((ncp + 1, zp * C * cap), dat.dtype).at[rows].add(
            vals, indices_are_sorted=True)
        blocks = [tbl[:ncp, mm * C * cap:(mm + 1) * C * cap].T
                  for mm in range(zp)]                     # zp x (C*cap, ncp)
        return jnp.stack(blocks, axis=-1).reshape(C, cap, ncells)
    vals = (dat[:, :, None] * oh[:, None, :]).reshape(N, C * cap)
    rows = jnp.where(keep, cell_sorted, ncells)
    tbl = jnp.zeros((ncells + 1, C * cap), dat.dtype).at[rows].add(
        vals, indices_are_sorted=True)
    return tbl[:ncells].T.reshape(C, cap, ncells)


def bin_particles_planes(pf: cp.ParticleFields, grid: Grid, cap: int,
                         x_start=None, n_loc: Optional[int] = None,
                         with_angvel: bool = False,
                         packed_bin: bool = False,
                         wrap_x: bool = False) -> PlaneBins:
    """Bin into the full grid, or — given ``x_start`` (traced shard slab
    origin plane) and ``n_loc`` — into this shard's x-slab; particles
    outside the slab are invalid (the owner-shard mask of the sparse
    sharded exchange). ``wrap_x``: interpret the slab window modulo the
    global nx (the extended-slab window of the chunked sharded exchange
    can start at plane -1, which is plane nx-1 under periodic x).
    ``with_angvel`` appends the 3 angular-velocity channels (torque mode).
    There is NO explicit activity channel: non-kept rows scatter zeros, so
    slot activity is exactly rad > 0 (channel 6) — one fewer staging
    channel through the scatter/table."""
    N = pf.pos.shape[0]
    nx, ny, nz = grid.shape
    nx_global = nx
    if n_loc is not None:
        nx = n_loc
    ncells = nx * ny * nz
    C = 10 if with_angvel else 7

    base, inside = cp.locate(pf.pos, grid)
    valid = pf.active & inside
    bx = base[:, 0]
    px_shift = None
    if x_start is not None:
        bx = bx - x_start
        if wrap_x:
            bx_raw = bx
            bx = jnp.mod(bx, nx_global)
            # a wrapped particle (e.g. global plane nx-1 binned into the
            # extended window's plane -1) must carry its x coordinate in
            # the WINDOW frame, or the plane kernels' Gaussian x factors
            # (cx from the global plane index) see it a full box away
            px_shift = ((bx_raw - bx) // nx_global).astype(pf.pos.dtype) \
                * grid.lengths[0]
        valid = valid & (bx >= 0) & (bx < nx)
    cell = bx * (ny * nz) + base[:, 1] * nz + base[:, 2]
    cell = jnp.where(valid, cell, ncells)

    order = jnp.argsort(cell)
    inv_order = jnp.argsort(order)
    cell_sorted = cell[order]
    rank = rank_in_sorted_segments(cell_sorted)
    keep = (rank < cap) & (cell_sorted < ncells)

    pos_staged = pf.pos
    if px_shift is not None:
        pos_staged = pos_staged.at[:, 0].add(-px_shift)
    cols = [pos_staged, pf.vel, pf.radius[:, None]]
    if with_angvel:
        cols.append(pf.angvel)
    dat = jnp.concatenate(cols, axis=-1)[order]            # (N, C) sorted
    dat = jnp.where(keep[:, None], dat, 0.0)
    oh = (rank[:, None] == jnp.arange(cap)[None, :]).astype(dat.dtype)
    D = _staging_scatter(dat, oh, cell_sorted, keep, C, cap, ncells, nz,
                         packed=packed_bin)

    n_overflow = jnp.sum(((rank >= cap) & (cell_sorted < ncells)).astype(jnp.int32))
    return PlaneBins(D, order, inv_order, cell_sorted, rank, keep, n_overflow)


# ---------------------------------------------------------------------------
# Weight helper shared by both kernels (traced inside Pallas)
# ---------------------------------------------------------------------------

def _axis_factors_plane(pos, i, grid: Grid, periodic, offsets, ny, nz,
                        dtype, x_off=None):
    """Per-axis separable Gaussian factors for one x-plane:
    exp(-(dx^2+dy^2+dz^2)/2s^2) = fx[dx]*fy[dy]*fz[dz]. Computing the 3x3
    factors once costs 9*cap exps per plane instead of 19*cap, and the wall
    masks (and the activity gate) fold into the factors once per axis
    value. `pos` = [px, py, pz, act] as (cap, ny, nz) arrays; ``x_off``
    (traced scalar) maps the local plane index to the global x plane for
    slab (sharded) execution. Returns (fx, fy, fz) dicts keyed by delta."""
    h_mean = float(np.cbrt(grid.cell_volume))
    sigma = cp.SIGMA_OVER_RANGE * cp.INTERP_RANGE_CELLS * h_mean
    inv2s2 = float(1.0 / (2.0 * sigma * sigma))
    hx, hy, hz = (float(s) for s in grid.spacing)
    ox, oy, oz = (float(o) for o in grid.origin)
    nx = grid.shape[0]                        # GLOBAL plane count

    iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    iz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
    if x_off is not None:
        i = i + x_off
    xi = i.astype(dtype)

    px, py, pz = pos[0], pos[1], pos[2]
    act = pos[3] > 0.5

    deltas = sorted({int(v) for o in offsets for v in o})
    fx, fy, fz = {}, {}, {}
    for d in deltas:
        cx = ox + (xi + (d + 0.5)) * hx
        e = jnp.exp(-((px - cx) ** 2) * inv2s2)
        if not periodic[0] and d != 0:
            okX = jnp.logical_and(i + d >= 0, i + d < nx)
            e = e * okX.astype(dtype)
        fx[d] = jnp.where(act, e, 0.0)                 # activity gate once
    for d in deltas:
        cy = oy + ((iy + d).astype(dtype) + 0.5) * hy
        e = jnp.exp(-((py - cy[None]) ** 2) * inv2s2)
        if not periodic[1] and d != 0:
            okY = (iy + d >= 0) & (iy + d < ny)
            e = jnp.where(okY[None], e, 0.0)
        fy[d] = e
    for d in deltas:
        cz = oz + ((iz + d).astype(dtype) + 0.5) * hz
        e = jnp.exp(-((pz - cz[None]) ** 2) * inv2s2)
        if not periodic[2] and d != 0:
            okZ = (iz + d >= 0) & (iz + d < nz)
            e = jnp.where(okZ[None], e, 0.0)
        fz[d] = e
    return fx, fy, fz


def _iter_weights_plane(pos, i, grid: Grid, periodic, offsets, ny, nz,
                        dtype, x_off=None):
    """Yield (raw Gaussian weight (cap, ny, nz), offset) one offset at a
    time for one x-plane, with wall-axis domain masks. Generator so kernels
    keep a single weight array live (all S at once overflows scoped
    VMEM)."""
    fx, fy, fz = _axis_factors_plane(pos, i, grid, periodic, offsets,
                                     ny, nz, dtype, x_off=x_off)
    for o in offsets:
        dx, dy, dz = (int(v) for v in o)
        yield fx[dx] * fy[dy] * fz[dz], o


# ---------------------------------------------------------------------------
# Kernel A: slot interpolation (gather side)
# ---------------------------------------------------------------------------

def _interp_kernel(xoff_ref, fm_ref, f0_ref, fp_ref, pos_ref, out_ref, *,
                   grid: Grid, periodic, offsets, cap, C_in):
    # xoff_ref: (1,) int32 — global plane offset of this slab (0 unsharded)
    # fm/f0/fp: (C_in, 1, ny+2, nz+2) padded planes i, i+1, i+2
    # pos_ref:  (4, cap, 1, ny, nz)  [px py pz act]
    # out_ref:  (C_in+1, cap, 1, ny, nz): interpolated inputs + weight norm
    ny, nz = out_ref.shape[3], out_ref.shape[4]
    i = pl.program_id(0)
    dtype = out_ref.dtype

    pos = [pos_ref[c, :, 0] for c in range(4)]
    views = {-1: fm_ref, 0: f0_ref, 1: fp_ref}

    # Single pass over offsets holding ONE weight array live at a time
    # (holding all S weights live overflows scoped VMEM at 128^3): the
    # per-slot normalization factor is uniform across channels, so
    # accumulate unnormalized and scale at the end.
    acc = [None] * C_in
    norm = None
    for w, o in _iter_weights_plane(pos, i, grid, periodic, offsets,
                                    ny, nz, dtype, x_off=xoff_ref[0]):
        dx, dy, dz = (int(v) for v in o)
        norm = w if norm is None else norm + w
        for c in range(C_in):
            F = views[dx][c, 0, 1 + dy: 1 + dy + ny, 1 + dz: 1 + dz + nz]
            t = w * F[None]
            acc[c] = t if acc[c] is None else acc[c] + t
    inv_norm = jnp.where(norm > 0.0, 1.0 / jnp.where(norm > 0.0, norm, 1.0), 0.0)
    for c in range(C_in):
        out_ref[c, :, 0] = acc[c] * inv_norm
    out_ref[C_in, :, 0] = norm


def interp_planes_padded(
    Fp: jnp.ndarray,           # (C_in, nxl+2, ny+2, nz+2) ghost-padded stack
    D: jnp.ndarray,            # (7[+3], cap, nxl*ny*nz) slot planes
    grid: Grid,                # GLOBAL grid (coordinates / wall masks)
    periodic: Tuple[bool, bool, bool],
    cfg: cp.CouplingConfig,
    x_off,                     # traced/int global plane offset of this slab
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> G (C_in, cap, nloc_cells) normalized slot interpolants, norm."""
    C_in = Fp.shape[0]
    nxl, ny, nz = Fp.shape[1] - 2, Fp.shape[2] - 2, Fp.shape[3] - 2
    cap = cfg.slot_capacity
    offsets = cp.stencil_offsets(cfg)

    posact = jnp.concatenate([D[0:3], (D[6:7] > 0).astype(D.dtype)]).reshape(4, cap, nxl, ny, nz)
    xoff_arr = jnp.asarray([x_off], jnp.int32)

    kernel = partial(_interp_kernel, grid=grid, periodic=periodic,
                     offsets=offsets, cap=cap, C_in=C_in)
    smem = ({"memory_space": pltpu.SMEM} if (_COMPILER_KW and not interpret)
            else {})
    out = pl.pallas_call(
        kernel,
        grid=(nxl,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), **smem),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i + 1, 0, 0)),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i + 2, 0, 0)),
            pl.BlockSpec((4, cap, 1, ny, nz), lambda i: (0, 0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((C_in + 1, cap, 1, ny, nz),
                               lambda i: (0, 0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C_in + 1, cap, nxl, ny, nz), Fp.dtype),
        interpret=interpret,
        **({} if interpret else _COMPILER_KW),
    )(xoff_arr, Fp, Fp, Fp, posact)
    out = out.reshape(C_in + 1, cap, nxl * ny * nz)
    return out[:C_in], out[C_in]


def pad_wrap_zero(F: jnp.ndarray, periodic) -> jnp.ndarray:
    """Single-device ghost ring: wrap on periodic axes (real wrapped
    values), zero on wall axes (never read — wall-offset weights are
    masked)."""
    Fp = F
    for a in range(3):
        pads = [(0, 0)] * 4
        pads[a + 1] = (1, 1)
        Fp = jnp.pad(Fp, pads, mode="wrap" if periodic[a] else "constant")
    return Fp


def interp_planes(
    F: jnp.ndarray,            # (C_in, nx, ny, nz) stacked input fields
    D: jnp.ndarray,            # (7[+3], cap, ncells) slot planes
    grid: Grid,
    periodic: Tuple[bool, bool, bool],
    cfg: cp.CouplingConfig,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> G (C_in, cap, ncells) normalized slot interpolants, norm (cap, ncells)."""
    return interp_planes_padded(pad_wrap_zero(F, periodic), D, grid,
                                periodic, cfg, 0, interpret=interpret)


# ---------------------------------------------------------------------------
# Kernel B: slot deposit (scatter side)
# ---------------------------------------------------------------------------

def _combo_of(o, dy_in_kernel):
    """Output-stack key of one offset: (dx, dy), or (dx, 0) when the dy
    shift is applied in-kernel (CouplingConfig.dy_in_kernel)."""
    return (int(o[0]), 0 if dy_in_kernel else int(o[1]))


def _roll_contrib(contrib, o, dy_in_kernel):
    """In-kernel shifts of one (ny, nz) deposit contribution: dz always
    (lane roll), dy too under dy_in_kernel (sublane roll)."""
    dy = int(o[1]) if dy_in_kernel else 0
    dz = int(o[2])
    if dy and dz:
        return jnp.roll(contrib, (dy, dz), axis=(0, 1))
    if dz:
        return jnp.roll(contrib, dz, axis=-1)
    if dy:
        return jnp.roll(contrib, dy, axis=0)
    return contrib


def _deposit_kernel(xoff_ref, pos_ref, v_ref, out_ref, *, grid: Grid,
                    periodic, offsets, combos, cap, C_out,
                    dy_in_kernel=False):
    # xoff_ref: (1,) int32 slab offset; pos_ref: (4, cap, 1, ny, nz);
    # v_ref: (C_out, cap, 1, ny, nz) — v is PRE-normalized (V * inv_norm,
    # computed in XLA from kernel A's norm), so a single raw-weight pass
    # suffices and only one weight array is live at a time (VMEM budget).
    ny, nz = out_ref.shape[3], out_ref.shape[4]
    i = pl.program_id(0)
    dtype = out_ref.dtype

    pos = [pos_ref[c, :, 0] for c in range(4)]
    acc = {}
    for w, o in _iter_weights_plane(pos, i, grid, periodic, offsets,
                                    ny, nz, dtype, x_off=xoff_ref[0]):
        combo = _combo_of(o, dy_in_kernel)
        for c in range(C_out):
            contrib = jnp.sum(w * v_ref[c, :, 0], axis=0)       # (ny, nz)
            contrib = _roll_contrib(contrib, o, dy_in_kernel)
            key = (combo, c)
            acc[key] = contrib if key not in acc else acc[key] + contrib
    for ci, combo in enumerate(combos):
        for c in range(C_out):
            out_ref[ci, c, 0] = acc[(combo, c)]


def deposit_stacks(
    V: jnp.ndarray,            # (C_out, cap, nloc_cells) per-slot values
    D: jnp.ndarray,            # (7[+3], cap, nloc_cells)
    nxl: int,
    grid: Grid,
    periodic: Tuple[bool, bool, bool],
    cfg: cp.CouplingConfig,
    x_off,
    *,
    interpret: bool = False,
):
    """Kernel half of the deposit: per-(dx,dy) output stacks (dz applied
    in-kernel). Returns (stks (n_combo, C_out, nxl, ny, nz), combos)."""
    C_out = V.shape[0]
    ny, nz = grid.shape[1], grid.shape[2]
    cap = cfg.slot_capacity
    offsets = cp.stencil_offsets(cfg)
    combos = sorted({_combo_of(o, cfg.dy_in_kernel) for o in offsets})
    n_combo = len(combos)

    posact = jnp.concatenate([D[0:3], (D[6:7] > 0).astype(D.dtype)]).reshape(4, cap, nxl, ny, nz)
    Vp = V.reshape(C_out, cap, nxl, ny, nz)
    xoff_arr = jnp.asarray([x_off], jnp.int32)

    kernel = partial(_deposit_kernel, grid=grid, periodic=periodic,
                     offsets=offsets, combos=combos, cap=cap, C_out=C_out,
                     dy_in_kernel=cfg.dy_in_kernel)
    smem = ({"memory_space": pltpu.SMEM} if (_COMPILER_KW and not interpret)
            else {})
    stks = pl.pallas_call(
        kernel,
        grid=(nxl,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), **smem),
            pl.BlockSpec((4, cap, 1, ny, nz), lambda i: (0, 0, i, 0, 0)),
            pl.BlockSpec((C_out, cap, 1, ny, nz), lambda i: (0, 0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_combo, C_out, 1, ny, nz),
                               lambda i: (0, 0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_combo, C_out, nxl, ny, nz), V.dtype),
        interpret=interpret,
        **({} if interpret else _COMPILER_KW),
    )(xoff_arr, posact, Vp)
    return stks, combos


def deposit_planes(
    V: jnp.ndarray,            # (C_out, cap, ncells) per-slot deposit values
    D: jnp.ndarray,            # (7[+3], cap, ncells)
    grid: Grid,
    periodic: Tuple[bool, bool, bool],
    cfg: cp.CouplingConfig,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (C_out, nx, ny, nz) deposited fields (weights applied inside)."""
    nx = grid.shape[0]
    stks, combos = deposit_stacks(V, D, nx, grid, periodic, cfg, 0,
                                  interpret=interpret)
    return _stack_epilogue(stks, combos)


def _stack_epilogue(stks: jnp.ndarray, combos) -> jnp.ndarray:
    """Land the per-(dx,dy) output stacks: roll and sum (XLA fuses the 9
    shifted adds into one pass)."""
    out = None
    for ci, (dx, dy) in enumerate(combos):
        v = stks[ci]
        if dx or dy:
            v = jnp.roll(v, (dx, dy), axis=(1, 2))
        out = v if out is None else out + v
    return out


# ---------------------------------------------------------------------------
# Fused kernel: interp + physics + deposit in ONE pallas pass
# ---------------------------------------------------------------------------

def _fused_kernel(xoff_ref, fm_ref, f0_ref, fp_ref, d_ref, stk_ref, pres_ref,
                  *, grid: Grid, periodic, offsets, combos, cap, C_in,
                  cell_volume, nu, rho_f, cfg):
    """One pass per x-plane: interpolate the input stack to the slots,
    evaluate the force laws in VMEM, and accumulate the deposit stacks —
    the fusion of `_interp_kernel` + `_physics_planes` + `_deposit_kernel`.
    Beyond one kernel launch saved, this kills the HBM round-trips of the
    intermediates (G ~370 MB, V ~270 MB at 128^3) and computes the 9
    separable Gaussian factors ONCE for both the gather and scatter halves
    (the two-kernel pipeline exponentiates twice)."""
    ny, nz = stk_ref.shape[3], stk_ref.shape[4]
    i = pl.program_id(0)
    dtype = stk_ref.dtype

    D = d_ref[:, :, 0]                                  # (7[+3], cap, ny, nz)
    pos = [D[0], D[1], D[2], (D[6] > 0).astype(dtype)]
    fxd, fyd, fzd = _axis_factors_plane(pos, i, grid, periodic, offsets,
                                        ny, nz, dtype, x_off=xoff_ref[0])
    views = {-1: fm_ref, 0: f0_ref, 1: fp_ref}

    # interp: one weight live at a time; normalize at the end
    acc = [None] * C_in
    norm = None
    for o in offsets:
        dx, dy, dz = (int(v) for v in o)
        w = fxd[dx] * fyd[dy] * fzd[dz]
        norm = w if norm is None else norm + w
        for c in range(C_in):
            F = views[dx][c, 0, 1 + dy: 1 + dy + ny, 1 + dz: 1 + dz + nz]
            t = w * F[None]
            acc[c] = t if acc[c] is None else acc[c] + t
    inv_norm = jnp.where(norm > 0.0, 1.0 / jnp.where(norm > 0.0, norm, 1.0), 0.0)
    G = jnp.stack([a * inv_norm for a in acc])             # (C_in, cap, ny, nz)

    # physics (identical formulas; _physics_planes is shape-agnostic over
    # the trailing dims)
    V, force, torque, found = _physics_planes(
        D, G, norm, cell_volume, nu, rho_f, cfg
    )
    Vn = V * inv_norm[None]                                # pre-normalized

    # deposit: reuse the cached factors (no second exp pass)
    accd = {}
    for o in offsets:
        dx, dy, dz = (int(v) for v in o)
        w = fxd[dx] * fyd[dy] * fzd[dz]
        combo = _combo_of(o, cfg.dy_in_kernel)
        for c in range(Vn.shape[0]):
            contrib = jnp.sum(w * Vn[c], axis=0)           # (ny, nz)
            contrib = _roll_contrib(contrib, o, cfg.dy_in_kernel)
            key = (combo, c)
            accd[key] = contrib if key not in accd else accd[key] + contrib
    for ci, combo in enumerate(combos):
        for c in range(Vn.shape[0]):
            stk_ref[ci, c, 0] = accd[(combo, c)]

    # per-slot particle results: force [+ torque] + found
    for c in range(3):
        pres_ref[c, :, 0] = force[c]
    if cfg.use_torque:
        for c in range(3):
            pres_ref[3 + c, :, 0] = torque[c]
    pres_ref[pres_ref.shape[0] - 1, :, 0] = found.astype(dtype)


def fused_exchange_padded(
    Fp: jnp.ndarray,           # (C_in, nxl+2, ny+2, nz+2) ghost-padded stack
    D: jnp.ndarray,            # (7[+3], cap, nxl*ny*nz) slot planes
    grid: Grid,
    periodic: Tuple[bool, bool, bool],
    cfg: cp.CouplingConfig,
    x_off,
    nu: float,
    rho_f: float,
    *,
    interpret: bool = False,
):
    """-> (stks (n_combo, 8, nxl, ny, nz), combos, pres) where pres is
    (4, cap, ncl) [fx fy fz found] or (7, ...) with torque channels 3:6 in
    torque mode, for a (possibly slab-local) padded input stack."""
    C_in = Fp.shape[0]
    nxl, ny, nz = Fp.shape[1] - 2, Fp.shape[2] - 2, Fp.shape[3] - 2
    cap = cfg.slot_capacity
    offsets = cp.stencil_offsets(cfg)
    combos = sorted({_combo_of(o, cfg.dy_in_kernel) for o in offsets})
    n_combo = len(combos)
    C_out = 8
    C_d = D.shape[0]
    n_pres = 7 if cfg.use_torque else 4

    Dp = D.reshape(C_d, cap, nxl, ny, nz)
    xoff_arr = jnp.asarray([x_off], jnp.int32)

    kernel = partial(_fused_kernel, grid=grid, periodic=periodic,
                     offsets=offsets, combos=combos, cap=cap, C_in=C_in,
                     cell_volume=grid.cell_volume, nu=nu, rho_f=rho_f,
                     cfg=cfg)
    smem = ({"memory_space": pltpu.SMEM} if (_COMPILER_KW and not interpret)
            else {})
    stks, pres = pl.pallas_call(
        kernel,
        grid=(nxl,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), **smem),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i + 1, 0, 0)),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i + 2, 0, 0)),
            pl.BlockSpec((C_d, cap, 1, ny, nz), lambda i: (0, 0, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_combo, C_out, 1, ny, nz),
                         lambda i: (0, 0, i, 0, 0)),
            pl.BlockSpec((n_pres, cap, 1, ny, nz), lambda i: (0, 0, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_combo, C_out, nxl, ny, nz), Fp.dtype),
            jax.ShapeDtypeStruct((n_pres, cap, nxl, ny, nz), Fp.dtype),
        ],
        interpret=interpret,
        **({} if interpret else _COMPILER_KW),
    )(xoff_arr, Fp, Fp, Fp, Dp)
    return stks, combos, pres.reshape(n_pres, cap, nxl * ny * nz)


# ---------------------------------------------------------------------------
# Channel-major physics (same formulas as coupling.gaussian_physics)
# ---------------------------------------------------------------------------

def _physics_planes(
    D: jnp.ndarray,            # (8, cap, ncells)
    G: jnp.ndarray,            # (C_in, cap, ncells) normalized interpolants
    norm: jnp.ndarray,         # (cap, ncells) weight norms
    cell_volume: float,
    nu: float,
    rho_f: float,
    cfg: cp.CouplingConfig,
):
    """-> V (8, cap, ncells) deposit values, force (3, cap, ncells),
    torque (3, cap, ncells), found (cap, ncells)."""
    vel = D[3:6]
    radius = D[6]
    act = D[6] > 0.0
    found = (norm > 0.0) & act

    uf = G[0:3]
    pg = G[3:6]
    dtau = G[6:9]
    c = 9
    if cfg.use_torque:
        curl = G[c:c + 3]
        c += 3
    if cfg.use_added_mass:
        ddtu = G[c:c + 3]
        c += 3
    alpha_f = G[c]

    dia = 2.0 * radius
    vol = cp.particle_volume(radius)

    alpha_p = jnp.clip(1.0 - alpha_f, 1e-6, 1.0)
    ur = uf - vel
    mag_ur = jnp.sqrt(jnp.sum(ur * ur, axis=0))
    coeff = cp.drag_coefficient(alpha_f, alpha_p, mag_ur, dia, nu, rho_f)
    coeff = jnp.where(found, coeff, 0.0)
    f_drag = (vol * coeff / alpha_p)[None] * ur

    f_arch = vol[None] * rho_f * (-pg + dtau)
    f_arch = jnp.where(found[None], f_arch, 0.0)
    force = f_drag + f_arch

    if cfg.use_added_mass:
        f_am = cfg.added_mass_coeff * rho_f * vol[None] * ddtu
        f_am = jnp.where(found[None], f_am, 0.0)
        force = force + f_am
        src_part = -(f_arch + f_am)
    else:
        src_part = -f_arch

    ooVrho = 1.0 / (cell_volume * rho_f)
    V = jnp.concatenate([
        vol[None],
        vol[None] * vel,
        (-(coeff / rho_f))[None],
        src_part * ooVrho,
    ])                                                     # (8, cap, ncells)

    if cfg.use_torque:
        # rotational Stokes drag pi d^3 nu rho (curl/2 - omega) — same
        # formula as the sparse path (module-docstring divergence note on
        # the reference's sign inconsistency, FoamYade.C:446-483); angvel
        # rides as binned channels 7:10 (bin_particles_planes with_angvel)
        angvel = D[7:10]
        wf = 0.5 * curl
        torque = jnp.pi * (dia ** 3)[None] * (wf - angvel) * nu * rho_f
        torque = jnp.where(found[None], torque, 0.0)
    else:
        torque = jnp.zeros_like(force)
    force = jnp.where(found[None], force, 0.0)
    return V, force, torque, found


# ---------------------------------------------------------------------------
# Unbin: per-slot results -> per-particle rows (sorted order)
# ---------------------------------------------------------------------------

def _unbin_rows(per, cell_sorted, rank, keep, ncells, cfg: cp.CouplingConfig):
    """Fetch each (sorted) particle's slot-result row from the per-slot
    table `per` (n_res, cap, ncells) and select its rank block.

    Default layout: one (ncells, n_res*cap) row per cell — the minor dim
    (16 at cap=4) lane-pads 8x, so the materialized transpose costs ~1 GB
    at 128^3. `cfg.packed_unbin` packs zp = 128/(n_res*cap) z-consecutive
    cells per row — a (ncells/zp, 128) table at its true size — and
    selects the cell's block with a fused (z-position x rank) one-hot."""
    n_res, cap = per.shape[0], per.shape[1]
    N = cell_sorted.shape[0]
    P = n_res * cap
    cell_c = jnp.minimum(cell_sorted, ncells - 1)
    if cfg.unbin_gather:
        # flat per-channel element gathers: no repack, no temps
        flat = (jnp.minimum(rank, cap - 1).astype(jnp.int32) * ncells
                + cell_c.astype(jnp.int32))
        keep_f = keep.astype(per.dtype)
        cols = [per[c].reshape(cap * ncells)[flat] * keep_f
                for c in range(n_res)]
        return jnp.stack(cols, axis=-1)                    # (N, n_res)
    sel = ((rank[:, None] == jnp.arange(cap)[None, :])
           & keep[:, None]).astype(per.dtype)
    zp = max(1, 128 // P)
    if cfg.packed_unbin and zp > 1 and ncells % zp == 0:
        # Pack tr[m, j*P+q] = per[q, m*zp+j] WITHOUT the transpose: the
        # transpose route materializes a (P, ncells/zp, zp) temp whose
        # zp-lane minor pads 16x — 16.0 GB at 256^3, the round-5 1M OOM.
        # Instead place each q-channel's zp columns into their lanes with
        # a (zp, zp*P) one-hot matmul (HIGHEST: the values are f32 physics
        # results; each output element is a single val*1 product, exact at
        # f32 pass precision). One (m2, zp) 16x-padded temp (~1 GB at
        # 256^3) lives per term instead of all P at once.
        m2 = ncells // zp
        per2 = per.reshape(P, ncells)
        tr = None
        for q in range(P):
            colq = per2[q].reshape(m2, zp)
            E_q = np.zeros((zp, zp * P), np.float32)
            E_q[np.arange(zp), np.arange(zp) * P + q] = 1.0
            t = jnp.dot(colq, jnp.asarray(E_q, per.dtype),
                        precision=jax.lax.Precision.HIGHEST)
            tr = t if tr is None else tr + t
        g = tr[cell_c // zp].reshape(N, zp, n_res, cap)
        zoh = (jnp.mod(cell_c, zp)[:, None]
               == jnp.arange(zp)[None, :]).astype(per.dtype)
        return jnp.einsum("nmck,nm,nk->nc", g, zoh, sel)   # (N, n_res)
    tr = per.reshape(P, ncells).T                          # (ncells, cap*n_res)
    g = tr[cell_c].reshape(N, n_res, cap)                  # channel-major cols
    return jnp.einsum("nck,nk->nc", g, sel)                # (N, n_res)


# ---------------------------------------------------------------------------
# Full exchange
# ---------------------------------------------------------------------------

def gaussian_coupling_planes(
    pf: cp.ParticleFields,
    fluid_u: jnp.ndarray,
    grad_p: jnp.ndarray,
    div_tau: jnp.ndarray,
    ddt_u: jnp.ndarray,
    curl_u: jnp.ndarray,
    grid: Grid,
    periodic: Tuple[bool, bool, bool],
    nu: float,
    rho_f: float,
    dt,
    cfg: cp.CouplingConfig,
    prev_alpha=None,
    *,
    interpret: Optional[bool] = None,
) -> cp.CouplingResult:
    assert cfg.lag_alpha, "exchange='planes' requires lag_alpha=True"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = pf.pos.shape[0]
    cap = cfg.slot_capacity
    ncells = grid.ncells
    Vc = grid.cell_volume

    bins = bin_particles_planes(pf, grid, cap, with_angvel=cfg.use_torque,
                                packed_bin=cfg.packed_bin)

    in_fields = [fluid_u, grad_p, div_tau]
    if cfg.use_torque:
        in_fields.append(curl_u)
    if cfg.use_added_mass:
        in_fields.append(ddt_u)
    in_fields.append(prev_alpha)
    F = cp._stack_channels(in_fields)                      # (C_in, grid)

    if cfg.fused_planes:
        stks, combos, pres = fused_exchange_padded(
            pad_wrap_zero(F, periodic), bins.D, grid, periodic, cfg, 0,
            nu, rho_f, interpret=interpret,
        )
        fields = _stack_epilogue(stks, combos)
        n_res = pres.shape[0]
        per = pres
    else:
        G, norm = interp_planes(F, bins.D, grid, periodic, cfg,
                                interpret=interpret)
        V, force, torque, found = _physics_planes(
            bins.D, G, norm, Vc, nu, rho_f, cfg
        )
        # fold the per-slot weight normalization into V so the deposit
        # kernel runs a single raw-weight pass (see _deposit_kernel)
        inv_norm = jnp.where(norm > 0.0,
                             1.0 / jnp.where(norm > 0.0, norm, 1.0), 0.0)
        fields = deposit_planes(V * inv_norm[None], bins.D, grid, periodic,
                                cfg, interpret=interpret)
        n_res = 7
        per = jnp.concatenate([force, torque,
                               found.astype(force.dtype)[None]])

    pvol, up = fields[0], fields[1:4]
    alpha = jnp.maximum(1.0 - pvol / Vc, cfg.alpha_min)
    u_particle = up / Vc
    u_source_drag = fields[4]
    u_source = u_source_drag[None] * u_particle + fields[5:8]

    res_sorted = _unbin_rows(per, bins.cell_sorted, bins.rank, bins.keep,
                             ncells, cfg)
    res = res_sorted[bins.inv_order]

    if n_res == 4:
        res_force, res_torque, res_found = (
            res[:, 0:3], jnp.zeros_like(res[:, 0:3]), res[:, 3])
    else:
        res_force, res_torque, res_found = res[:, 0:3], res[:, 3:6], res[:, 6]

    return cp.CouplingResult(
        force=res_force,
        torque=res_torque,
        alpha=alpha.reshape(grid.shape),
        u_particle=u_particle.reshape((3,) + grid.shape),
        u_source=u_source.reshape((3,) + grid.shape),
        u_source_drag=u_source_drag.reshape(grid.shape),
        found=res_found > 0.5,
        n_overflow=bins.n_overflow,
    )


# ---------------------------------------------------------------------------
# Slab-chunked exchange: the flagship pipeline at 256^3 scale
# ---------------------------------------------------------------------------

def gaussian_coupling_planes_chunked(
    pf: cp.ParticleFields,
    fluid_u: jnp.ndarray,
    grad_p: jnp.ndarray,
    div_tau: jnp.ndarray,
    ddt_u: jnp.ndarray,
    curl_u: jnp.ndarray,
    grid: Grid,
    periodic: Tuple[bool, bool, bool],
    nu: float,
    rho_f: float,
    dt,
    cfg: cp.CouplingConfig,
    prev_alpha=None,
    *,
    interpret: Optional[bool] = None,
) -> cp.CouplingResult:
    """The planes exchange processed in `cfg.planes_chunks` x-slabs.

    At 256^3 the monolithic staging/unbin tables lane-pad to ~8.6 GB
    (minor dim 8*cap pads to 128), which forced the 1M north-star config
    onto the slow sparse path (PERF.md item 6). Chunking bounds every
    lane-padded transient at 1/n_chunks of that while keeping the SAME
    fused kernel (its `x_off` slab support was built for the sharded
    exchange, `parallel/sharded._make_planes_exchange`):

      * ONE global argsort orders particles by (x-major) flat cell id, so
        each slab's population is a contiguous window — fetched with a
        traced `dynamic_slice` at the searchsorted chunk boundary, masked
        to the true count (fixed shapes, no host round-trips);
      * per slab: windowed staging scatter -> fused kernel (x_off = slab
        origin) -> halo-extended epilogue accumulated into the global
        fields with wrap (the single-device analog of the sharded ring
        add) -> windowed unbin written back through the same window.

    The body runs under `lax.fori_loop`, so it compiles ONCE regardless of
    n_chunks. Overflow contract: slot-capacity drops are counted globally
    (identical semantics to the unchunked path); a slab population larger
    than the window capacity (2N/n_chunks by default) adds to the count.
    """
    assert cfg.lag_alpha, "planes exchange requires lag_alpha=True"
    assert cfg.fused_planes, "chunked planes: fused kernel only"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_chunks = cfg.planes_chunks
    nx, ny, nz = grid.shape
    assert nx % n_chunks == 0, (nx, n_chunks)
    nxc = nx // n_chunks
    ncl = nxc * ny * nz
    ncells = grid.ncells
    cap = cfg.slot_capacity
    C_d = 10 if cfg.use_torque else 7
    n_res = 7 if cfg.use_torque else 4
    N = pf.pos.shape[0]
    Vc = grid.cell_volume
    # window capacity: ceil to a multiple of 8 lanes-friendly size
    N_w = min(N, max(1024, int(2 * N / n_chunks + 1023) // 1024 * 1024))

    # --- global locate + single sort -----------------------------------
    base, inside = cp.locate(pf.pos, grid)
    valid = pf.active & inside
    cell = base[:, 0] * (ny * nz) + base[:, 1] * nz + base[:, 2]
    cell = jnp.where(valid, cell, ncells)
    order = jnp.argsort(cell)
    inv_order = jnp.argsort(order)
    cell_s = cell[order]
    rank_s = rank_in_sorted_segments(cell_s)

    cols = [pf.pos, pf.vel, pf.radius[:, None]]
    if cfg.use_torque:
        cols.append(pf.angvel)
    dat_s = jnp.concatenate(cols, axis=-1)[order]          # (N, C_d)

    bounds = jnp.searchsorted(
        cell_s, jnp.arange(n_chunks + 1, dtype=jnp.int32) * (nxc * ny * nz)
    ).astype(jnp.int32)
    counts = bounds[1:] - bounds[:-1]
    window_over = jnp.sum(jnp.maximum(counts - N_w, 0))
    slot_over = jnp.sum(((rank_s >= cap) & (cell_s < ncells)).astype(jnp.int32))

    # --- global padded input stack --------------------------------------
    in_fields = [fluid_u, grad_p, div_tau]
    if cfg.use_torque:
        in_fields.append(curl_u)
    if cfg.use_added_mass:
        in_fields.append(ddt_u)
    in_fields.append(prev_alpha)
    Fpg = pad_wrap_zero(cp._stack_channels(in_fields), periodic)
    C_in = Fpg.shape[0]

    oh_k = jnp.arange(cap, dtype=jnp.int32)

    def chunk_body(c, carry):
        fields_acc, res_s = carry
        x0 = c * nxc
        s = bounds[c]
        e = bounds[c + 1]
        start = jnp.clip(jnp.minimum(s, N - N_w), 0, None)
        dat_w = jax.lax.dynamic_slice(dat_s, (start, 0), (N_w, C_d))
        cell_w = jax.lax.dynamic_slice(cell_s, (start,), (N_w,))
        rank_w = jax.lax.dynamic_slice(rank_s, (start,), (N_w,))
        idx_w = start + jnp.arange(N_w, dtype=jnp.int32)
        in_chunk = (idx_w >= s) & (idx_w < e)
        cell_loc = cell_w - x0 * (ny * nz)
        keep = in_chunk & (rank_w < cap) & (cell_w < ncells)

        # staging scatter into the slab table (packed layout)
        dat_m = jnp.where(keep[:, None], dat_w, 0.0)
        oh = (rank_w[:, None] == oh_k[None, :]).astype(dat_m.dtype)
        D = _staging_scatter(dat_m, oh, cell_loc, keep, C_d, cap, ncl, nz,
                             packed=cfg.packed_bin)

        # slab fluid stack: padded-global plane x0 is global plane x0-1
        Fp_c = jax.lax.dynamic_slice(
            Fpg, (0, x0, 0, 0), (C_in, nxc + 2, ny + 2, nz + 2))
        stks, combos, pres = fused_exchange_padded(
            Fp_c, D, grid, periodic, cfg, x0, nu, rho_f, interpret=interpret)

        # epilogue: dy rolls slab-local, dx into a halo-extended slab
        ext = jnp.zeros((8, nxc + 2, ny, nz), stks.dtype)
        for ci, (dx, dy) in enumerate(combos):
            v = stks[ci]
            if dy:
                v = jnp.roll(v, dy, axis=2)
            ext = ext.at[:, 1 + dx: 1 + dx + nxc].add(v)

        # accumulate: interior slab + two wrapped halo planes (non-periodic
        # x edges receive zeros by the kernel's wall masks — harmless adds)
        cur = jax.lax.dynamic_slice(
            fields_acc, (0, x0, 0, 0), (8, nxc, ny, nz))
        fields_acc = jax.lax.dynamic_update_slice(
            fields_acc, cur + ext[:, 1:-1], (0, x0, 0, 0))
        for plane, src in ((jnp.mod(x0 - 1, nx), ext[:, 0]),
                           (jnp.mod(x0 + nxc, nx), ext[:, -1])):
            curp = jax.lax.dynamic_slice(
                fields_acc, (0, plane, 0, 0), (8, 1, ny, nz))
            fields_acc = jax.lax.dynamic_update_slice(
                fields_acc, curp + src[:, None], (0, plane, 0, 0))

        # windowed unbin
        res_w = _unbin_rows(pres, jnp.clip(cell_loc, 0, ncl - 1), rank_w,
                            keep, ncl, cfg)
        cur_r = jax.lax.dynamic_slice(res_s, (start, 0), (N_w, n_res))
        res_s = jax.lax.dynamic_update_slice(
            res_s, jnp.where(in_chunk[:, None], res_w, cur_r), (start, 0))
        return fields_acc, res_s

    fields_acc = jnp.zeros((8,) + grid.shape, pf.pos.dtype)
    res_s0 = jnp.zeros((N, n_res), pf.pos.dtype)
    fields_acc, res_s = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (fields_acc, res_s0))

    fields = fields_acc.reshape(8, ncells)
    pvol, up = fields[0], fields[1:4]
    alpha = jnp.maximum(1.0 - pvol / Vc, cfg.alpha_min)
    u_particle = up / Vc
    u_source_drag = fields[4]
    u_source = u_source_drag[None] * u_particle + fields[5:8]

    res = res_s[inv_order]
    if n_res == 4:
        res_force, res_torque, res_found = (
            res[:, 0:3], jnp.zeros_like(res[:, 0:3]), res[:, 3])
    else:
        res_force, res_torque, res_found = res[:, 0:3], res[:, 3:6], res[:, 6]

    return cp.CouplingResult(
        force=res_force,
        torque=res_torque,
        alpha=alpha.reshape(grid.shape),
        u_particle=u_particle.reshape((3,) + grid.shape),
        u_source=u_source.reshape((3,) + grid.shape),
        u_source_drag=u_source_drag.reshape(grid.shape),
        found=res_found > 0.5,
        n_overflow=slot_over + window_over,
    )

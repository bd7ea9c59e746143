"""Window-staged coupling exchange: sorted per-plane particle windows with
in-kernel MXU staging (fourth-generation plumbing, after `coupling.py`
sparse rows, `coupling_slots.py` row-major slots, `coupling_planes.py`
channel-major slot planes).

Why: the planes pipeline's remaining fixed cost is the HBM staging
round-trip — zeros-init + one N-row scatter into the (C, cap, ncells) slot
table + the kernel's read of it (measured 14.9 ms of the 47.9 ms tracked
step; PERF.md round 3, scatter rows cost ~60 ns vs ~7 ns for gather rows).
This variant never materializes the staging table. Particles are sorted by
flat cell id exactly as before, but each x-plane's population is then a
CONTIGUOUS WINDOW of the sorted arrays; XLA gathers a fixed-size
(C_w, nx, W) window tensor (one cheap N-row gather) and the fused Pallas
kernel builds its plane's (C, cap, ny, nz) slot block IN VMEM with one-hot
matmuls:

    D[c,k][y,z] = sum_w dat[c,w] * [rank_w = k] * [y_w = y] * [z_w = z]
                = ohy^T @ ((dat_c * sel_k)[:, None] * ohz)

i.e. (ny, W) @ (W, nz) systolic-array work — the MXU (idle in the planes
kernel, which is all VPU) replaces the HBM scatter. Exactness: one-hot
matrices are exact in bf16; the value operand is split hi/lo
(x = bf16(x) + bf16(x - bf16(x)), two bf16 matmuls accumulated in f32,
~2^-18 relative error). Positions ride RELATIVE to their anchor cell
centre (px - cx ~ O(h), computed once in f32 in XLA), so the Gaussian
factor exp(-(px - cx - d*h)^2/2s^2) = exp(-(rel - d*h)^2/2s^2) loses
nothing to the split.

Everything downstream of staging — separable-factor weights, the
interp/physics/deposit fusion, the per-slot result layout, the unbin —
reuses `coupling_planes` verbatim (same formulas, same overflow contract:
rank >= slot_capacity is counted and uncoupled; additionally a plane
population beyond the static window W is counted and uncoupled).

Physics parity: identical formulas to `gaussian_coupling`
(`/root/reference/FoamYade/FoamYade.C:293-483`); requires ``lag_alpha``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import coupling as cp
from .coupling_planes import (
    _COMPILER_KW,
    _combo_of,
    _physics_planes,
    _roll_contrib,
    _stack_epilogue,
    _unbin_rows,
    pad_wrap_zero,
)
from .dem import rank_in_sorted_segments
from .grid import Grid

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_TPU_PALLAS = False


def window_size(n_particles: int, nx: int, requested: int = 0) -> int:
    """Static per-plane window capacity. Auto (=0): 2.5x the uniform mean,
    rounded up to 512 lanes — overflow beyond it is counted and those
    particles are uncoupled for the step (same contract as slot_capacity)."""
    if requested > 0:
        if requested > 2048:
            # chunked staging engages above 2048: round up to 512 lanes
            # for the chunk divisibility
            return int(np.ceil(requested / 512.0)) * 512
        return int(requested)
    mean = max(1.0, n_particles / max(1, nx))
    return max(512, int(np.ceil(2.5 * mean / 512.0)) * 512)


def _hi_lo(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split f32 into two bf16-exact f32 parts (x ~ hi + lo to ~2^-18)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _axis_factors_rel(relx, rely, relz, act, i, grid: Grid, periodic,
                      offsets, ny, nz, dtype, x_off):
    """Separable Gaussian factors from anchor-relative positions:
    px - cx(i+d) = rel_x - d*hx (the `_axis_factors_plane` quantities,
    computed without reconstructing absolute coordinates). Wall masks and
    the activity gate are identical."""
    h_mean = float(np.cbrt(grid.cell_volume))
    sigma = cp.SIGMA_OVER_RANGE * cp.INTERP_RANGE_CELLS * h_mean
    inv2s2 = float(1.0 / (2.0 * sigma * sigma))
    hx, hy, hz = (float(s) for s in grid.spacing)
    nx = grid.shape[0]

    iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    iz = jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1)
    i = i + x_off

    deltas = sorted({int(v) for o in offsets for v in o})
    fx, fy, fz = {}, {}, {}
    for d in deltas:
        e = jnp.exp(-((relx - d * hx) ** 2) * inv2s2)
        if not periodic[0] and d != 0:
            okX = jnp.logical_and(i + d >= 0, i + d < nx)
            e = e * okX.astype(dtype)
        fx[d] = jnp.where(act, e, 0.0)
    for d in deltas:
        e = jnp.exp(-((rely - d * hy) ** 2) * inv2s2)
        if not periodic[1] and d != 0:
            okY = (iy + d >= 0) & (iy + d < ny)
            e = jnp.where(okY[None], e, 0.0)
        fy[d] = e
    for d in deltas:
        e = jnp.exp(-((relz - d * hz) ** 2) * inv2s2)
        if not periodic[2] and d != 0:
            okZ = (iz + d >= 0) & (iz + d < nz)
            e = jnp.where(okZ[None], e, 0.0)
        fz[d] = e
    return fx, fy, fz


def _stage_mxu(dw, cap, C_d, ny, nz, dtype):
    """One-hot MXU staging of a (C_w, Wc) window slice into (C_d, cap,
    ny, nz) slot planes: D[c,k] = ohy^T @ ((dat_c * sel_k) ohz), hi + lo
    exact bf16 split. One-hot placement matrices (0/1: exact in bf16);
    invalid rows carry y = -1 and match nothing. Mosaic's tpu.iota is
    integer-only, so the iotas are int32 and the (exactly integer-valued)
    f32 coordinate channels are cast for the comparison."""
    Wc = dw.shape[1]
    y = dw[2 * C_d]
    z = dw[2 * C_d + 1]
    rank = dw[2 * C_d + 2]
    yi = y.astype(jnp.int32)
    zi = z.astype(jnp.int32)
    ohyT = (jax.lax.broadcasted_iota(jnp.int32, (ny, Wc), 0)
            == yi[None, :]).astype(jnp.bfloat16)        # (ny, Wc)
    ohz = (jax.lax.broadcasted_iota(jnp.int32, (Wc, nz), 1)
           == zi[:, None]).astype(dtype)                # (Wc, nz)
    D = []
    for c in range(C_d):
        rows = []
        for k in range(cap):
            selk = (rank == float(k)).astype(dtype)
            acc = None
            for part in (dw[c], dw[C_d + c]):           # hi, lo channel
                E = ((part * selk)[:, None] * ohz).astype(jnp.bfloat16)
                t = jax.lax.dot_general(
                    ohyT, E, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            rows.append(acc)
        D.append(jnp.stack(rows))                       # (cap, ny, nz)
    return jnp.stack(D)                                 # (C_d, cap, ny, nz)


def _window_kernel(xoff_ref, nch_ref, fm_ref, f0_ref, fp_ref, dat_ref,
                   stk_ref, pres_ref, *, grid: Grid, periodic, offsets,
                   combos, cap, C_in, C_d, cell_volume, nu, rho_f, cfg,
                   w_chunk=0, dynamic=False):
    """One pass per x-plane: MXU-stage the window into slot planes, then
    interpolate + force laws + deposit (the `_fused_kernel` body).

    ``w_chunk`` > 0 stages the window in chunks of that many rows under a
    `lax.fori_loop`, accumulating into the (C_d, cap, ny, nz) slot planes:
    at 256^3 the W=10240 one-hot intermediates otherwise blow Mosaic's
    register allocator (measured: 119 MB of spill slots, VMEM OOM at
    164/128 MB) — chunking bounds the live set at the 128^3-proven
    Wc-sized shapes while keeping the op count constant.

    ``dynamic``: the trip count is this plane's ceil(count/w_chunk) read
    from SMEM (``nch_ref``) instead of the static W/w_chunk — a plane pays
    staging only for its actual population (rows past the count carry
    y = -1 inside their chunk, whole empty chunks are skipped). Exact by
    construction; Mosaic lowers dynamic fori_loop bounds fine
    (scripts/proto_dynwin.py)."""
    ny, nz = stk_ref.shape[3], stk_ref.shape[4]
    i = pl.program_id(0)
    dtype = stk_ref.dtype
    W = dat_ref.shape[2]
    C_w = dat_ref.shape[1]

    if w_chunk and (dynamic or w_chunk < W):
        n_ch = nch_ref[i] if dynamic else W // w_chunk

        def body(k, D):
            # slice the REF (Mosaic lowers pl.ds ref windows, not value
            # dynamic_slice); w_chunk is 512-aligned so the lane offset is
            dwc = dat_ref[0, :, pl.ds(k * w_chunk, w_chunk)]
            return D + _stage_mxu(dwc, cap, C_d, ny, nz, dtype)

        D = jax.lax.fori_loop(
            0, n_ch, body,
            jnp.zeros((C_d, cap, ny, nz), jnp.float32),
            unroll=False)
    else:
        D = _stage_mxu(dat_ref[0], cap, C_d, ny, nz, dtype)

    act = D[6] > 0.0
    fxd, fyd, fzd = _axis_factors_rel(
        D[0], D[1], D[2], act, i, grid, periodic, offsets, ny, nz, dtype,
        x_off=xoff_ref[0])
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
    inv_norm = jnp.where(norm > 0.0, 1.0 / jnp.where(norm > 0.0, norm, 1.0),
                         0.0)
    G = jnp.stack([a * inv_norm for a in acc])

    V, force, torque, found = _physics_planes(
        D, G, norm, cell_volume, nu, rho_f, cfg)
    Vn = V * inv_norm[None]

    accd = {}
    for o in offsets:
        dx, dy, dz = (int(v) for v in o)
        w = fxd[dx] * fyd[dy] * fzd[dz]
        combo = _combo_of(o, cfg.dy_in_kernel)
        for c in range(Vn.shape[0]):
            contrib = jnp.sum(w * Vn[c], axis=0)
            contrib = _roll_contrib(contrib, o, cfg.dy_in_kernel)
            key = (combo, c)
            accd[key] = contrib if key not in accd else accd[key] + contrib
    for ci, combo in enumerate(combos):
        for c in range(Vn.shape[0]):
            stk_ref[ci, c, 0] = accd[(combo, c)]

    for c in range(3):
        pres_ref[c, :, 0] = force[c]
    if cfg.use_torque:
        for c in range(3):
            pres_ref[3 + c, :, 0] = torque[c]
    pres_ref[pres_ref.shape[0] - 1, :, 0] = found.astype(dtype)


def window_exchange_padded(
    Fp: jnp.ndarray,           # (C_in, nxl+2, ny+2, nz+2) ghost-padded stack
    dat_win: jnp.ndarray,      # (nxl, C_w, W) plane-MAJOR window channels
                               # (Mosaic: the grid-blocked dim must not sit
                               # in the trailing two; (C_w, W) block == the
                               # full array dims is the allowed shape)
    grid: Grid,
    periodic: Tuple[bool, bool, bool],
    cfg: cp.CouplingConfig,
    x_off,
    nu: float,
    rho_f: float,
    *,
    interpret: bool = False,
    w_chunk: Optional[int] = None,    # None = auto; tests force small chunks
    counts=None,                      # (nxl,) per-plane populations -> the
                                      # dynamic trip-count staging loop
):
    """-> (stks, combos, pres) exactly like
    `coupling_planes.fused_exchange_padded`, staging from windows."""
    C_in = Fp.shape[0]
    nxl, ny, nz = Fp.shape[1] - 2, Fp.shape[2] - 2, Fp.shape[3] - 2
    cap = cfg.slot_capacity
    offsets = cp.stencil_offsets(cfg)
    combos = sorted({_combo_of(o, cfg.dy_in_kernel) for o in offsets})
    n_combo = len(combos)
    C_out = 8
    C_d = 10 if cfg.use_torque else 7
    C_w = dat_win.shape[1]
    W = dat_win.shape[2]
    n_pres = 7 if cfg.use_torque else 4

    xoff_arr = jnp.asarray([x_off], jnp.int32)
    # chunked staging above the 128^3-proven window size (see
    # _window_kernel.w_chunk); W is always a multiple of 512
    if w_chunk is None:
        w_chunk = 0
        if W > 2048:
            w_chunk = next(c for c in (2048, 1536, 1024, 512) if W % c == 0)
        elif counts is not None and W % 512 == 0:
            # dynamic mode chunks every window (512 grain) so empty planes
            # skip staging entirely
            w_chunk = 512
    dynamic = counts is not None and w_chunk > 0
    if dynamic:
        nch_arr = jnp.ceil(
            jnp.clip(counts, 0, W).astype(jnp.float32) / float(w_chunk)
        ).astype(jnp.int32)
    else:
        nch_arr = jnp.zeros((nxl,), jnp.int32)  # unread
    kernel = partial(_window_kernel, grid=grid, periodic=periodic,
                     offsets=offsets, combos=combos, cap=cap, C_in=C_in,
                     C_d=C_d, cell_volume=grid.cell_volume, nu=nu,
                     rho_f=rho_f, cfg=cfg, w_chunk=w_chunk, dynamic=dynamic)
    smem = ({"memory_space": pltpu.SMEM} if (_COMPILER_KW and not interpret)
            else {})
    stks, pres = pl.pallas_call(
        kernel,
        grid=(nxl,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), **smem),
            pl.BlockSpec((nxl,), lambda i: (0,), **smem),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i + 1, 0, 0)),
            pl.BlockSpec((C_in, 1, ny + 2, nz + 2), lambda i: (0, i + 2, 0, 0)),
            pl.BlockSpec((1, C_w, W), lambda i: (i, 0, 0)),
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
    )(xoff_arr, nch_arr, Fp, Fp, Fp, dat_win)
    return stks, combos, pres.reshape(n_pres, cap, nxl * ny * nz)


class WindowBins(NamedTuple):
    """Sorted per-plane window staging data (the window analog of
    `coupling_planes.PlaneBins`)."""
    dat_win: jnp.ndarray        # (nxl, C_w, W) plane-major window channels
    order: jnp.ndarray
    inv_order: jnp.ndarray
    cell_sorted: jnp.ndarray    # local flat cell ids (ncells_loc = invalid)
    rank: jnp.ndarray
    keep: jnp.ndarray           # slot-kept AND inside the window
    n_overflow: jnp.ndarray     # slot overflow + window overflow
    counts: jnp.ndarray         # (nx,) per-plane populations (pre-clip)


def window_bins(pf: cp.ParticleFields, grid: Grid, cap: int, W: int,
                with_angvel: bool = False,
                x_start=None, n_loc: Optional[int] = None,
                wrap_x: bool = False) -> WindowBins:
    """Build the per-plane window staging tensor. Full grid by default, or
    — given ``x_start`` (traced shard window origin plane) and ``n_loc`` —
    this shard's x-window of n_loc planes (`wrap_x` interprets the window
    modulo the global nx, for the extended slab of the chunked sharded
    scan). Positions ride RELATIVE to their anchor cell centre, so the
    staged coordinates are frame-independent — a wrapped particle needs no
    coordinate shift (unlike `bin_particles_planes`'s px_shift)."""
    N = pf.pos.shape[0]
    nx, ny, nz = grid.shape
    nx_global = nx
    if n_loc is not None:
        nx = n_loc
    ncells = nx * ny * nz
    C_d = 10 if with_angvel else 7

    base, inside = cp.locate(pf.pos, grid)
    valid = pf.active & inside
    bx = base[:, 0]
    if x_start is not None:
        bx = bx - x_start
        if wrap_x:
            bx = jnp.mod(bx, nx_global)
        valid = valid & (bx >= 0) & (bx < nx)
    cell = bx * (ny * nz) + base[:, 1] * nz + base[:, 2]
    cell = jnp.where(valid, cell, ncells)
    order = jnp.argsort(cell)
    inv_order = jnp.argsort(order)
    cell_s = cell[order]
    rank_s = rank_in_sorted_segments(cell_s)
    keep = (rank_s < cap) & (cell_s < ncells)

    # --- per-plane windows -------------------------------------------------
    starts = jnp.searchsorted(
        cell_s, jnp.arange(nx + 1, dtype=jnp.int32) * (ny * nz)
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    window_over = jnp.sum(jnp.maximum(counts - W, 0))
    slot_over = jnp.sum(((rank_s >= cap) & (cell_s < ncells))
                        .astype(jnp.int32))

    # ONE row-gather for all per-particle channels (pos, vel, radius,
    # [angvel], base-as-f32): payload channels are ~free, index rows are
    # the cost (~7 ns/row) — vs 4-5 separate gathers of the same N rows
    src_cols = [pf.pos, pf.vel, pf.radius[:, None]]
    if with_angvel:
        src_cols.append(pf.angvel)
    src_cols.append(base.astype(pf.pos.dtype))
    gath = jnp.concatenate(src_cols, axis=-1)[order]    # (N, C_d + 3)
    base_s = gath[:, -3:].astype(jnp.int32)
    centre = jnp.asarray(grid.origin, pf.pos.dtype) + (
        gath[:, -3:] + 0.5
    ) * jnp.asarray(grid.spacing, pf.pos.dtype)
    rel_s = gath[:, 0:3] - centre                       # (N, 3) anchor-rel
    dat = jnp.concatenate([rel_s, gath[:, 3:-3]], axis=-1)  # (N, C_d)
    hi, lo = _hi_lo(dat)
    yv = jnp.where(keep, base_s[:, 1], -1).astype(pf.pos.dtype)
    zv = base_s[:, 2].astype(pf.pos.dtype)
    rv = rank_s.astype(pf.pos.dtype)
    dat_all = jnp.concatenate(
        [hi, lo, yv[:, None], zv[:, None], rv[:, None]], axis=-1
    ).T                                                 # (C_w, N)

    idx = jnp.minimum(starts[:-1, None]
                      + jnp.arange(W, dtype=jnp.int32)[None, :], N - 1)
    in_w = (jnp.arange(W, dtype=jnp.int32)[None, :]
            < jnp.minimum(counts, W)[:, None])          # (nx, W)
    dat_win = dat_all[:, idx]                           # (C_w, nx, W)
    # clip-duplicated / beyond-count rows match nothing (y = -1)
    ych = 2 * C_d
    dat_win = dat_win.at[ych].set(jnp.where(in_w, dat_win[ych], -1.0))
    # plane-major layout for the kernel's per-plane block specs
    dat_win = jnp.transpose(dat_win, (1, 0, 2))         # (nx, C_w, W)

    # window-dropped rows must read found=False downstream: the unbin keep
    # also requires the row's window position to fit in W
    w_pos = jnp.arange(N, dtype=jnp.int32) - starts[
        jnp.minimum(cell_s // (ny * nz), nx - 1)]
    keep_u = keep & (w_pos < W)
    return WindowBins(dat_win, order, inv_order, cell_s, rank_s, keep_u,
                       slot_over + window_over, counts)


def gaussian_coupling_window(
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
    w_chunk: Optional[int] = None,    # forwarded to window_exchange_padded
) -> cp.CouplingResult:
    assert cfg.lag_alpha, "exchange='window' requires lag_alpha=True"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = pf.pos.shape[0]
    nx, ny, nz = grid.shape
    cap = cfg.slot_capacity
    ncells = grid.ncells
    Vc = grid.cell_volume
    W = window_size(N, nx, cfg.planes_window)
    bins = window_bins(pf, grid, cap, W, with_angvel=cfg.use_torque)

    # --- fused kernel + epilogue (planes machinery) ------------------------
    in_fields = [fluid_u, grad_p, div_tau]
    if cfg.use_torque:
        in_fields.append(curl_u)
    if cfg.use_added_mass:
        in_fields.append(ddt_u)
    in_fields.append(prev_alpha)
    F = cp._stack_channels(in_fields)

    stks, combos, pres = window_exchange_padded(
        pad_wrap_zero(F, periodic), bins.dat_win, grid, periodic, cfg, 0,
        nu, rho_f, interpret=interpret, w_chunk=w_chunk,
        counts=bins.counts if cfg.window_dynamic else None)
    fields = _stack_epilogue(stks, combos).reshape(8, ncells)

    pvol, up = fields[0], fields[1:4]
    alpha = jnp.maximum(1.0 - pvol / Vc, cfg.alpha_min)
    u_particle = up / Vc
    u_source_drag = fields[4]
    u_source = u_source_drag[None] * u_particle + fields[5:8]

    # window-dropped rows read found=False (bins.keep excludes them)
    res_sorted = _unbin_rows(pres, bins.cell_sorted, bins.rank, bins.keep,
                             ncells, cfg)
    res = res_sorted[bins.inv_order]

    n_res = pres.shape[0]
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

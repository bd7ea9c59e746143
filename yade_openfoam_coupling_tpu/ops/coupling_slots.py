"""Slot-table dense coupling exchange: gathers/scatters become matmuls.

The sparse exchange (`ops/coupling.py`) pays the TPU's per-index-row cost
on an (N, S) row-gather and an N-row payload scatter every step (~90 ms at
the 100k/128^3 benchmark; see PERF.md). This module replaces almost every
indexed access with dense, compiler-friendly array math:

1. **bin** particles into a fixed-capacity per-cell slot table — ONE N-row
   scatter (the only scatter in the pipeline);
2. build the per-slot stencil weights densely: W[cell, slot, o] from the
   slot positions and the (statically shifted) stencil cell centres — pure
   elementwise math, domain masks from broadcasted iotas;
3. **interpolate** fluid quantities to the slots with a batched matmul
   against the S stencil-rolled field stacks: G = W @ F_rolled — MXU work,
   zero gather rows;
4. run the UNCHANGED force physics (`coupling.gaussian_physics`) on the
   slot layout (slots are just a padded particle array of size
   ncells*cap);
5. **deposit** sources densely: D = W^T @ V per cell, then S static
   `jnp.roll` adds — zero scatter rows;
6. **unbin** per-particle force/torque with ONE N-row gather.

Total indexed rows: 2*N (vs ~N*S + N). Everything else is HBM streaming
and small batched matmuls, which is what the hardware wants.

Overflow (more than `slot_capacity` particles in one fluid cell) is
counted and surfaced (`CouplingResult.n_overflow`); overflowed particles
are reported found=False and receive no hydro force that step — the same
observability contract as the DEM neighbor-list overflow counter.

Reference parity: the physics is `FoamYade::setParticleAction`'s Gaussian
branch (`/root/reference/FoamYade/FoamYade.C:605-632`) exactly as in
`ops/coupling.py`; only the plumbing differs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import coupling as cp
from .grid import Grid


class SlotTable(NamedTuple):
    data: jnp.ndarray        # (ncells*cap + 1, 11): pos3 vel3 angvel3 radius act
    slot_of: jnp.ndarray     # (N,) int32 slot id; ncells*cap = overflow/invalid
    n_overflow: jnp.ndarray  # int32 scalar
    cap: int


def bin_particles(pf: cp.ParticleFields, grid: Grid, cap: int) -> SlotTable:
    """One N-row scatter of the particle data into (ncells, cap) slots."""
    N = pf.pos.shape[0]
    ncells = grid.ncells
    nslots = ncells * cap

    base, inside = cp.locate(pf.pos, grid)
    valid = pf.active & inside
    nx, ny, nz = grid.shape
    cell = base[:, 0] * (ny * nz) + base[:, 1] * nz + base[:, 2]
    cell = jnp.where(valid, cell, ncells)

    order = jnp.argsort(cell)
    cell_sorted = cell[order]
    from .dem import rank_in_sorted_segments
    rank = rank_in_sorted_segments(cell_sorted)
    keep = (rank < cap) & (cell_sorted < ncells)
    slot_sorted = jnp.where(
        keep, jnp.clip(cell_sorted, 0, ncells - 1) * cap + jnp.minimum(rank, cap - 1),
        nslots,
    )
    slot_of = jnp.zeros(N, jnp.int32).at[order].set(slot_sorted.astype(jnp.int32))

    dat = jnp.concatenate(
        [pf.pos, pf.vel, pf.angvel, pf.radius[:, None],
         valid.astype(pf.pos.dtype)[:, None]], axis=-1,
    )
    table = jnp.zeros((nslots + 1, 11), pf.pos.dtype).at[slot_of].set(dat)
    # scrap row may hold an arbitrary overflow particle; zero it
    table = table.at[nslots].set(0.0)

    n_overflow = jnp.sum((~keep & (cell_sorted < ncells)).astype(jnp.int32))
    return SlotTable(table, slot_of, n_overflow, cap)


def _domain_mask(grid: Grid, off, periodic, dtype) -> Optional[jnp.ndarray]:
    """(nx,ny,nz) 0/1 mask of cells whose stencil cell (c+off) lies inside
    the domain on every non-periodic axis. None = all valid."""
    masks = []
    for a in range(3):
        if periodic[a] or off[a] == 0:
            continue
        n = grid.shape[a]
        idx = jnp.arange(n)
        ok = (idx + int(off[a]) >= 0) & (idx + int(off[a]) < n)
        shape = [1, 1, 1]
        shape[a] = n
        masks.append(ok.reshape(shape))
    if not masks:
        return None
    m = masks[0]
    for x in masks[1:]:
        m = m & x
    return jnp.broadcast_to(m, grid.shape).astype(dtype)


def build_slot_weights(
    tbl: SlotTable, grid: Grid, periodic, cfg: cp.CouplingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
    """W (ncells, cap, S) normalized Gaussian weights per slot; found mask
    (ncells*cap,); static offsets (S,3). Matches `gaussian_cells_raw_weights`
    + `normalize_weights` of the sparse path exactly."""
    offsets = cp.stencil_offsets(cfg)                         # (S,3)
    S = len(offsets)
    ncells = grid.ncells
    cap = tbl.cap
    dtype = tbl.data.dtype

    pos_t = tbl.data[:-1, 0:3].reshape(grid.shape + (cap, 3))
    act_t = tbl.data[:-1, 10].reshape(grid.shape + (cap,)) > 0.5

    h_mean = float(np.cbrt(grid.cell_volume))
    sigma = cp.SIGMA_OVER_RANGE * cp.INTERP_RANGE_CELLS * h_mean
    inv2s2 = 1.0 / (2.0 * sigma * sigma)

    # cell-centre coordinates along each axis (broadcast iotas — no (3,grid)
    # materialization)
    ax = [
        (grid.origin[a] + (jnp.arange(grid.shape[a], dtype=dtype) + 0.5)
         * grid.spacing[a]).reshape([-1 if i == a else 1 for i in range(3)])
        for a in range(3)
    ]

    cols = []
    for o in offsets:
        d2 = 0.0
        for a in range(3):
            ca = ax[a] + float(o[a]) * grid.spacing[a]        # centre of c+o
            d2 = d2 + (pos_t[..., a] - ca[..., None]) ** 2    # (grid..., cap)
        w = jnp.exp(-d2 * inv2s2)
        m = _domain_mask(grid, o, periodic, dtype)
        if m is not None:
            w = w * m[..., None]
        cols.append(jnp.where(act_t, w, 0.0))
    W = jnp.stack(cols, axis=-1).reshape(ncells, cap, S)
    wsum = jnp.sum(W, axis=-1, keepdims=True)
    W = W / jnp.where(wsum > 0.0, wsum, 1.0)
    found = (wsum[..., 0] > 0.0).reshape(ncells * cap)
    return W, found, offsets


def slot_support_ops(
    W: jnp.ndarray,            # (ncells, cap, S) normalized
    offsets: np.ndarray,       # (S,3)
    grid: Grid,
) -> cp.SupportOps:
    """SupportOps over the slot layout: matmul gathers/deposits + rolls."""
    ncells = grid.ncells
    cap = W.shape[1]
    S = W.shape[2]
    shape = grid.shape

    def _rolled_stack(F: jnp.ndarray) -> jnp.ndarray:
        """(C, grid) -> (S, C, ncells): F at cell+o for each offset."""
        parts = [
            jnp.roll(F, (-int(o[0]), -int(o[1]), -int(o[2])), axis=(1, 2, 3))
            .reshape(F.shape[0], ncells)
            for o in offsets
        ]
        return jnp.stack(parts)

    def gather_stack(fields) -> jnp.ndarray:
        F = cp._stack_channels(fields)                         # (C, grid)
        FoS = _rolled_stack(F)                                 # (S, C, n)
        # G[n,k,c] = sum_s W[n,k,s] * FoS[s,c,n]  — batched matmul over n
        G = jnp.einsum("nks,scn->nkc", W, FoS)
        return G.reshape(ncells * cap, -1)

    def gather(field: jnp.ndarray) -> jnp.ndarray:
        return gather_stack([field])[:, 0]

    def gather_vec(field: jnp.ndarray) -> jnp.ndarray:
        return gather_stack([field])

    def _unroll_deposit(D: jnp.ndarray) -> jnp.ndarray:
        """(S, ncells, C) per-offset anchor deposits -> (C, grid) rolled out."""
        C = D.shape[-1]
        out = jnp.zeros((C,) + shape, D.dtype)
        for i, o in enumerate(offsets):
            plane = D[i].T.reshape((C,) + shape)
            out = out + jnp.roll(
                plane, (int(o[0]), int(o[1]), int(o[2])), axis=(1, 2, 3)
            )
        return out

    def deposit_outer(vals: jnp.ndarray) -> jnp.ndarray:
        V = vals.reshape(ncells, cap, -1)
        # D[s,n,c] = sum_k W[n,k,s] * V[n,k,c]
        D = jnp.einsum("nks,nkc->snc", W, V)
        return _unroll_deposit(D)

    def deposit_stack(values: jnp.ndarray) -> jnp.ndarray:
        # values already weighted: (n', S, C) -> sum slots per cell
        C = values.shape[-1]
        D = values.reshape(ncells, cap, S, C).sum(axis=1)      # (n, S, C)
        return _unroll_deposit(jnp.moveaxis(D, 1, 0))

    def deposit(values: jnp.ndarray) -> jnp.ndarray:
        return deposit_stack(values[..., None])[0]

    def deposit_vec(values: jnp.ndarray) -> jnp.ndarray:
        return deposit_stack(values)

    return cp.SupportOps(deposit, deposit_vec, gather, gather_vec,
                         deposit_stack, gather_stack, deposit_outer)


def gaussian_coupling_slots(
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
) -> cp.CouplingResult:
    """Full 4-way Gaussian coupling via the slot-table dense pipeline.
    Identical physics to `gaussian_coupling`; measured ~4-6x cheaper at the
    tracked benchmark (per-row costs removed)."""
    N = pf.pos.shape[0]
    cap = cfg.slot_capacity
    tbl = bin_particles(pf, grid, cap)
    W, found_v, offsets = build_slot_weights(tbl, grid, periodic, cfg)
    ops = slot_support_ops(W, offsets, grid)

    d = tbl.data[:-1]
    pf_v = cp.ParticleFields(
        pos=d[:, 0:3], vel=d[:, 3:6], angvel=d[:, 6:9],
        radius=d[:, 9], active=d[:, 10] > 0.5,
    )
    res_v = cp.gaussian_physics(
        pf_v, fluid_u, grad_p, div_tau, ddt_u, curl_u,
        W.reshape(-1, W.shape[-1]), found_v, ops,
        grid.cell_volume, nu, rho_f, cfg, prev_alpha=prev_alpha,
    )

    # unbin per-particle outputs: one N-row gather (scrap row = zeros/False)
    per = jnp.concatenate(
        [res_v.force, res_v.torque,
         res_v.found.astype(res_v.force.dtype)[:, None]], axis=-1,
    )
    per = jnp.concatenate([per, jnp.zeros((1, 7), per.dtype)])
    out = per[tbl.slot_of]
    return cp.CouplingResult(
        force=out[:, 0:3],
        torque=out[:, 3:6],
        alpha=res_v.alpha,
        u_particle=res_v.u_particle,
        u_source=res_v.u_source,
        u_source_drag=res_v.u_source_drag,
        found=out[:, 6] > 0.5,
        n_overflow=tbl.n_overflow,
    )

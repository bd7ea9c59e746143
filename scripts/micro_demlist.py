"""Staged microbenchmark of the DEM Verlet-list build on real TPU.

Cumulative stages of `dem.build_neighbor_list` (v2 dense rolls), timed with
the k-vs-1 chained-scan protocol. Identifies which of sort / rank /
table-scatter / roll-table / transpose / cap-gather / top_k dominates the
~33 ms list build at the tracked benchmark.
"""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from yade_openfoam_coupling_tpu.ops import dem
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx, N = 128, 100_000
    grid = Grid.cube(nx, 1e-3 * nx)
    radius = 4e-4
    cfg = dem.DEMConfig(
        params=dem.ContactParams(kn=100.0, rho_p=2500.0),
        periodic=(True, True, False), wall_axes=(False, False, True),
        neighbor="cells", cell_capacity=4, max_neighbors=8,
    )
    r_max = radius

    rng = np.random.RandomState(0)
    pos0 = jnp.asarray(
        rng.uniform(0.1 * grid.lengths[0], 0.9 * grid.lengths[0], (N, 3)),
        jnp.float32)
    act = jnp.ones((N,), bool)

    bin_size = dem.effective_bin_size(grid, cfg, r_max)
    dims, sizes = [], []
    for a in range(3):
        L = grid.lengths[a]
        n = max(1, int(np.floor(L / max(bin_size, 1e-12))))
        dims.append(n)
        sizes.append(L / n)
    bx, by, bz = dims
    nbin = bx * by * bz
    cap = cfg.cell_capacity
    M = cfg.max_neighbors
    offs_np = np.stack(
        np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), -1
    ).reshape(-1, 3)
    print(f"bins {bx}x{by}x{bz} = {nbin}, cap {cap}, M {M}", flush=True)

    def stage(pos, upto):
        origin = jnp.asarray(grid.origin, pos.dtype)
        csz = jnp.asarray(sizes, pos.dtype)
        nvec = jnp.asarray(dims, jnp.int32)
        ijk = jnp.clip(jnp.floor((pos - origin) / csz).astype(jnp.int32), 0, nvec - 1)
        bin_of = ijk[:, 0] * (by * bz) + ijk[:, 1] * bz + ijk[:, 2]
        bin_of = jnp.where(act, bin_of, nbin)
        if upto == "hash":
            return bin_of.astype(jnp.float32)

        order = jnp.argsort(bin_of)
        bin_sorted = bin_of[order]
        if upto == "sort":
            return bin_sorted.astype(jnp.float32) + order.astype(jnp.float32)

        rank = dem.rank_in_sorted_segments(bin_sorted)
        if upto == "rank":
            return rank.astype(jnp.float32) + bin_sorted.astype(jnp.float32)

        keep = rank < cap
        slot = jnp.clip(bin_sorted, 0, nbin) * cap + jnp.minimum(rank, cap - 1)
        table_flat = jnp.full((nbin + 1) * cap, N, jnp.int32)
        table_flat = table_flat.at[
            jnp.where(keep, slot, (nbin + 1) * cap - 1)
        ].set(jnp.where(keep, order.astype(jnp.int32), N))
        if upto == "table":
            return table_flat[::97].astype(jnp.float32)

        tbl_fused = table_flat[: nbin * cap].reshape(bx, by, bz * cap)
        parts = [
            jnp.roll(tbl_fused, (-int(o[0]), -int(o[1]), -int(o[2]) * cap),
                     axis=(0, 1, 2)).reshape(-1)
            for o in offs_np
        ]
        stacked = jnp.stack(parts)
        if upto == "rolls":
            return stacked[:, ::1013].astype(jnp.float32)

        candT = stacked.T
        if upto == "transpose":
            return candT[::1013].astype(jnp.float32)

        if upto in ("reshapeN", "gatherN"):
            # variant: relayout the table to (nbin, cap*27) rows and fetch
            # ONE row per particle instead of cap consecutive rows
            tblN = candT.reshape(nbin, cap * 27)
            if upto == "reshapeN":
                return tblN[::1013, ::7].astype(jnp.float32)
            cand = tblN[jnp.minimum(bin_of, nbin - 1)]
            return cand[:, ::7].astype(jnp.float32)

        rows = (jnp.minimum(bin_of, nbin - 1)[:, None] * cap
                + jnp.arange(cap, dtype=jnp.int32)[None, :])
        cand = candT[rows.reshape(-1)].reshape(N, cap * 27)
        if upto == "gather":
            return cand[:, ::7].astype(jnp.float32)

        self_idx = jnp.arange(N, dtype=jnp.int32)[:, None]
        valid = (cand != N) & (cand != self_idx) & act[:, None]
        HIGH = jnp.int32(1 << 21)
        key = jnp.where(valid, cand + HIGH, 0)
        topk, _ = jax.lax.top_k(key, M)
        nbr = jnp.where(topk >= HIGH, topk - HIGH, N)
        return nbr.astype(jnp.float32)

    def timeit(name, upto, k=8):
        def make(n):
            def go():
                def body(pos, _):
                    out = stage(pos, upto)
                    pos2 = pos + jnp.sum(out) * 1e-30
                    return pos2, None
                pos, _ = jax.lax.scan(body, pos0, None, length=n)
                return jnp.sum(pos)
            return jax.jit(go)
        f1, fk = make(1), make(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{name:24s} {best:9.2f} ms/iter", flush=True)

    sel = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            sel = a.split("=", 1)[1].split(",")
    stages = ["hash", "sort", "rank", "table", "rolls", "transpose",
              "gather", "reshapeN", "gatherN", "full"]
    for s in stages:
        if sel is None or s in sel:
            timeit(f"upto {s}", s)


if __name__ == "__main__":
    main()

"""Measure packed-staging variants for the planes bin/unbin on real TPU.

The round-2 ledger (PERF.md) attributes ~5 ms of the 14.3 ms planes bin to
the (ncells+1, 32) staging table: minor dim 32 lane-pads to 128, so the
zeros-init + scatter + transpose all touch a 1.1 GB array at 128^3. The
z4-packed variant stores 4 z-consecutive cells per 128-wide row (zero
padding waste) and reconstructs the channel-major planes from 4 contiguous
column blocks. Same question for the unbin row table. This script measures
the variants head-to-head; the winner gets wired into coupling_planes.
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    nx = 128
    ncells = nx ** 3
    N = 100_000
    cap = 4
    C = 8

    rng = np.random.RandomState(0)
    cell_sorted = jnp.asarray(
        np.sort(rng.randint(0, ncells, N)).astype(np.int32))
    rank = jnp.zeros((N,), jnp.int32)
    keep = jnp.ones((N,), bool)
    dat = jnp.asarray(rng.randn(N, C).astype(np.float32))

    def timeit(name, make, k=6):
        f1, fk = make(1), make(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{name:32s} {best:9.2f} ms/iter", flush=True)

    oh = (rank[:, None] == jnp.arange(cap)[None, :]).astype(jnp.float32)

    # --- staging v0: (ncells+1, C*cap) scatter + .T --------------------
    def stage_v0(n):
        def go():
            def body(d, _):
                vals = (d[:, :, None] * oh[:, None, :]).reshape(N, C * cap)
                rows = jnp.where(keep, cell_sorted, ncells)
                tbl = jnp.zeros((ncells + 1, C * cap), jnp.float32).at[rows].add(
                    vals, indices_are_sorted=True)
                D = tbl[:ncells].T.reshape(C, cap, ncells)
                return d + jnp.sum(D) * 1e-30, None
            d, _ = jax.lax.scan(body, dat, None, length=n)
            return jnp.sum(d)
        return jax.jit(go)

    # --- staging z4: (ncells/4+1, 4*C*cap=128) scatter + block transpose
    def stage_z4(n):
        nc4 = ncells // 4
        m_oh = None

        def go():
            def body(d, _):
                m = cell_sorted % 4
                moh = (m[:, None] == jnp.arange(4)[None, :]).astype(jnp.float32)
                # one-hot over (m, rank): (N, 4*cap)
                sel = (moh[:, :, None] * oh[:, None, :]).reshape(N, 4 * cap)
                vals = (d[:, None, :, None] * sel[:, :, None].reshape(
                    N, 4, 1, cap)).reshape(N, 4 * C * cap)
                rows = jnp.where(keep, cell_sorted // 4, nc4)
                tbl = jnp.zeros((nc4 + 1, 4 * C * cap), jnp.float32).at[rows].add(
                    vals, indices_are_sorted=True)
                # reconstruct channel-major: 4 contiguous column blocks,
                # transpose each, interleave along minor
                blocks = [tbl[:nc4, mm * C * cap:(mm + 1) * C * cap].T
                          for mm in range(4)]          # 4 x (C*cap, nc4)
                D = jnp.stack(blocks, axis=-1).reshape(C * cap, ncells)
                return d + jnp.sum(D) * 1e-30, None
            d, _ = jax.lax.scan(body, dat, None, length=n)
            return jnp.sum(d)
        return jax.jit(go)

    # --- unbin v0: (R*cap, ncells).T + N-row gather --------------------
    R = 4
    per = jnp.asarray(rng.randn(R * cap, ncells).astype(np.float32))
    selk = (rank[:, None] == jnp.arange(cap)[None, :]).astype(jnp.float32)

    def unbin_v0(n):
        def go():
            def body(p, _):
                tr = p.T                                  # (ncells, R*cap)
                rows = jnp.minimum(cell_sorted, ncells - 1)
                g = tr[rows].reshape(N, R, cap)
                res = jnp.einsum("nck,nk->nc", g, selk)
                return p + jnp.sum(res) * 1e-30, None
            p, _ = jax.lax.scan(body, per, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    # --- unbin packed: strided slices -> (nc4, 4*R*cap=64) -> gather ---
    def unbin_pack(n):
        nc4 = ncells // 4

        def go():
            def body(p, _):
                parts = [p[:, mm::4] for mm in range(4)]  # 4 x (R*cap, nc4)
                fullt = jnp.concatenate(parts, axis=0)    # (4*R*cap, nc4)
                tr = fullt.T                              # (nc4, 64)
                rows = jnp.minimum(cell_sorted // 4, nc4 - 1)
                g = tr[rows].reshape(N, 4, R, cap)
                m = cell_sorted % 4
                moh = (m[:, None] == jnp.arange(4)[None, :]).astype(jnp.float32)
                res = jnp.einsum("nmck,nm,nk->nc", g, moh, selk)
                return p + jnp.sum(res) * 1e-30, None
            p, _ = jax.lax.scan(body, per, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    # --- staging colscatter: (C*cap, ncells+1) column scatter, no .T ---
    def stage_col(n):
        def go():
            def body(d, _):
                vals = (d[:, :, None] * oh[:, None, :]).reshape(N, C * cap)
                rows = jnp.where(keep, cell_sorted, ncells)
                tbl = jnp.zeros((C * cap, ncells + 1), jnp.float32).at[
                    :, rows].add(vals.T, indices_are_sorted=True)
                D = tbl[:, :ncells].reshape(C, cap, ncells)
                return d + jnp.sum(D) * 1e-30, None
            d, _ = jax.lax.scan(body, dat, None, length=n)
            return jnp.sum(d)
        return jax.jit(go)

    import sys
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    def sel(name):
        return only is None or any(s in name for s in only)

    if sel("staging v0"):
        timeit("staging v0 (ncells,32)", stage_v0)
    if sel("staging z4"):
        timeit("staging z4 (ncells/4,128)", stage_z4)
    if sel("staging col"):
        timeit("staging col (32,ncells) no-T", stage_col)
    if sel("unbin v0"):
        timeit("unbin v0 (ncells,16)", unbin_v0)
    if sel("unbin z4"):
        timeit("unbin z4 (ncells/4,64)", unbin_pack)


if __name__ == "__main__":
    main()

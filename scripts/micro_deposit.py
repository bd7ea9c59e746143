"""Microbenchmark: sub-pieces of the 8-channel deposit_outer on real TPU.

Cumulative stages, each timed with the k-vs-1 scan protocol (CLAUDE.md):
  outer    : values = w[:,:,None] * v[:,None,:]  -> reshape (N, S*C)
  scatter  : + segment_sum onto (ncells+1, S*C) anchor buffer
  transpose: + buf.T reshape (S, C, grid)
  rolls    : + 19 roll-adds into (C, grid)        == full deposit_outer
Also times the *old* layout (rolls reading (grid, S, C) slices) for
comparison, and a variant without the transpose that feeds the rolls from
per-offset strided slices of the flat buffer.
"""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx, N = 128, 100_000
    grid = Grid.cube(nx, 1e-3 * nx)
    ncells = grid.ncells
    cfg = cp.CouplingConfig(gaussian=True, stencil_shape="sphere2")
    offsets = cp.stencil_offsets(cfg)
    S, C = len(offsets), 8

    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(0.05, 0.95 * grid.lengths[0], (N, 3)), jnp.float32)
    act = jnp.ones((N,), bool)
    sup = cp.gaussian_support(pos, act, grid, (True, True, False), cfg)
    w = sup.weights
    base = sup.base_flat
    v0 = jnp.asarray(rng.normal(0, 1, (N, C)), jnp.float32)

    def timeit(name, make, k=8):
        f1, fk = make(1), make(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{name:28s} {best:9.2f} ms/iter", flush=True)

    def chain(v, out):
        # real value dependency back into the (N, C) carry
        return v + out.reshape(-1)[0] * 0.0 + out.reshape(-1)[-1] * 1e-30

    def outer_only(n):
        def go():
            def body(v, _):
                vals = (w[..., None] * v[:, None, :]).reshape(N, S * C)
                return chain(v, vals), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def scatter(n):
        def go():
            def body(v, _):
                vals = (w[..., None] * v[:, None, :]).reshape(N, S * C)
                buf = jax.ops.segment_sum(vals, base, num_segments=ncells + 1)
                return chain(v, buf), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def transpose(n):
        def go():
            def body(v, _):
                vals = (w[..., None] * v[:, None, :]).reshape(N, S * C)
                buf = jax.ops.segment_sum(vals, base, num_segments=ncells + 1)[:ncells]
                bufT = buf.T.reshape((S, C) + grid.shape)
                return chain(v, bufT), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def full_new(n):
        def go():
            def body(v, _):
                out = cp.deposit_stack(w[..., None] * v[:, None, :], sup, grid, offsets)
                return chain(v, out), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def full_old(n):
        def go():
            def body(v, _):
                vals = (w[..., None] * v[:, None, :]).reshape(N, S * C)
                buf = jax.ops.segment_sum(vals, base, num_segments=ncells + 1)[
                    :ncells].reshape(grid.shape + (S, C))
                out = jnp.zeros(grid.shape + (C,), jnp.float32)
                for o in range(S):
                    dx, dy, dz = (int(x) for x in offsets[o])
                    out = out + jnp.roll(buf[..., o, :], (dx, dy, dz), axis=(0, 1, 2))
                out = jnp.moveaxis(out, -1, 0)
                return chain(v, out), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def full_direct(n):
        """(N*S)-row scatter with C-channel payload, no anchor buffer."""
        def go():
            def body(v, _):
                vals = (w[..., None] * v[:, None, :]).reshape(N * S, C)
                flat = jax.ops.segment_sum(
                    vals, sup.flat_ids.reshape(-1), num_segments=ncells + 1
                )[:ncells]
                out = jnp.moveaxis(flat.reshape(grid.shape + (C,)), -1, 0)
                return chain(v, out), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def gather12(n):
        """12-channel input gather (the exchange's gather side)."""
        F = jnp.asarray(rng.normal(0, 1, (12, ncells)), jnp.float32)
        tbl = jnp.concatenate([F.T, jnp.zeros((1, 12), jnp.float32)])
        def go():
            def body(v, _):
                vals = tbl[sup.flat_ids]                       # (N,S,12)
                g = jnp.sum(vals * w[..., None], axis=1)       # (N,12)
                return v + g[:, :C] * 1e-30, None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    sel = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            sel = a.split("=", 1)[1].split(",")
    def want(s):
        return sel is None or any(x in s for x in sel)

    if want("outer"): timeit("outer+reshape", outer_only)
    if want("scatter"): timeit("+ segment_sum", scatter)
    if want("transpose"): timeit("+ transpose", transpose)
    if want("new"): timeit("full deposit (transposed)", full_new)
    if want("old"): timeit("full deposit (old layout)", full_old)
    def full_conv(n):
        """Distribute the anchor buffer with a 0/1-kernel 3D convolution:
        out[c, cell] = sum_o buf[cell - o, o*C + c] is exactly a 3x3x3 conv
        with in-feature (o,c) -> out-feature c taps at -o. XLA owns the
        layout choice and runs the contraction on the MXU."""
        ker = np.zeros((3, 3, 3, S * C, C), np.float32)
        for o in range(S):
            dx, dy, dz = (int(x) for x in offsets[o])
            for c in range(C):
                ker[1 - dx, 1 - dy, 1 - dz, o * C + c, c] = 1.0
        kerj = jnp.asarray(ker)
        dn = jax.lax.conv_dimension_numbers(
            (1, nx + 2, nx + 2, nx + 2, S * C), ker.shape,
            ("NXYZC", "XYZIO", "NXYZC"))
        def go():
            def body(v, _):
                vals = (w[..., None] * v[:, None, :]).reshape(N, S * C)
                buf = jax.ops.segment_sum(vals, base, num_segments=ncells + 1)[
                    :ncells].reshape((1,) + grid.shape + (S * C,))
                # wrap-pad = roll semantics (wall-axis wraps deposit zeros)
                buf = jnp.pad(buf, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                              mode="wrap")
                out = jax.lax.conv_general_dilated(
                    buf, kerj, (1, 1, 1), "VALID", dimension_numbers=dn)
                out = jnp.moveaxis(out[0], -1, 0)
                return chain(v, out), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def scatter_sorted(n):
        """Anchor scatter with pre-sorted segment ids (cost probe for
        keeping the particle arrays cell-sorted across steps)."""
        base_sorted = jnp.sort(base)
        def go():
            def body(v, _):
                vals = (w[..., None] * v[:, None, :]).reshape(N, S * C)
                buf = jax.ops.segment_sum(
                    vals, base_sorted, num_segments=ncells + 1,
                    indices_are_sorted=True)
                return chain(v, buf), None
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return jnp.sum(v)
        return jax.jit(go)

    def argsort_probe(n):
        """Cost of argsort over N int32 bin ids (DEM list build stage 1)."""
        ids0 = jnp.asarray(rng.randint(0, ncells, N), jnp.int32)
        def go():
            def body(ids, _):
                order = jnp.argsort(ids)
                return ids ^ order.astype(jnp.int32), None
            ids, _ = jax.lax.scan(body, ids0, None, length=n)
            return jnp.sum(ids)
        return jax.jit(go)

    def topk_probe(n):
        """Cost of the (N, 108) -> M=8 top_k compaction (list build last
        stage)."""
        keys0 = jnp.asarray(rng.randint(0, 1 << 21, (N, 108)), jnp.int32)
        def go():
            def body(keys, _):
                topk, _ = jax.lax.top_k(keys, 8)
                return keys ^ topk[:, :1], None
            keys, _ = jax.lax.scan(body, keys0, None, length=n)
            return jnp.sum(keys)
        return jax.jit(go)

    def gather_order(sort_first):
        """(N,S)-row 12-ch gather with original vs cell-sorted particle
        order — probes HBM locality of the gather rows."""
        ids = sup.flat_ids
        if sort_first:
            ids = ids[jnp.argsort(sup.base_flat)]
        F0 = jnp.asarray(rng.normal(0, 1, (ncells + 1, 12)), jnp.float32)
        def make(n):
            def go():
                def body(F, _):
                    vals = F[ids]                              # (N,S,12)
                    g = jnp.sum(vals * w[..., None], axis=1)
                    F = F.at[0, 0].add(jnp.sum(g) * 1e-30)
                    return F, None
                F, _ = jax.lax.scan(body, F0, None, length=n)
                return jnp.sum(F[0])
            return jax.jit(go)
        return make

    if want("gunsorted"): timeit("gather 12ch unsorted order", gather_order(False))
    if want("gsorted"): timeit("gather 12ch sorted order", gather_order(True))
    if want("argsort"): timeit("argsort N int32", argsort_probe)
    if want("topk"): timeit("top_k (N,108)->8", topk_probe)
    if want("sorted"): timeit("+ segment_sum (sorted ids)", scatter_sorted)
    if want("direct"): timeit("full deposit (direct N*S)", full_direct)
    if want("gather12"): timeit("gather 12ch (N*S rows)", gather12)
    if want("conv"): timeit("full deposit (conv)", full_conv)


if __name__ == "__main__":
    main()

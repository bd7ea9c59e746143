"""Staged microbenchmark of the plane-dense exchange on real TPU.

Cumulative stages of `coupling_planes.gaussian_coupling_planes` at the
tracked benchmark config (100k / 128^3, sphere2, cap=4)."""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import coupling_planes as cpp
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx, N = 128, 100_000
    grid = Grid.cube(nx, 1e-3 * nx)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2",
                            exchange="planes", slot_capacity=4)
    periodic = (True, True, False)
    rng = np.random.RandomState(0)
    L = grid.lengths[0]
    pos = jnp.asarray(rng.uniform(0.1 * L, 0.9 * L, (N, 3)), jnp.float32)
    pf = cp.ParticleFields(
        pos, jnp.asarray(rng.randn(N, 3) * 1e-3, jnp.float32),
        jnp.zeros((N, 3), jnp.float32),
        jnp.full((N,), 4e-4, jnp.float32), jnp.ones((N,), bool))
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 1e-2)
    u, gp, dtau = f(3, *grid.shape), f(3, *grid.shape), f(3, *grid.shape)
    alpha = jnp.ones(grid.shape, jnp.float32) * 0.98

    def timeit(name, make, k=6):
        f1, fk = make(1), make(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{name:28s} {best:9.2f} ms/iter", flush=True)

    def chain_pf(p, out):
        return cp.ParticleFields(p.pos + out * 1e-30, p.vel, p.angvel,
                                 p.radius, p.active)

    def bin_only(n):
        def go():
            def body(p, _):
                bins = cpp.bin_particles_planes(p, grid, cfg.slot_capacity)
                return chain_pf(p, jnp.sum(bins.D)), None
            p, _ = jax.lax.scan(body, pf, None, length=n)
            return jnp.sum(p.pos)
        return jax.jit(go)

    bins0 = jax.jit(lambda p: cpp.bin_particles_planes(
        p, grid, cfg.slot_capacity))(pf)
    F0 = cp._stack_channels([u, gp, dtau, alpha])

    def interp_only(n):
        f = jax.jit(lambda D, F: jnp.sum(jax.lax.scan(
            lambda D, _: (D + sum(jnp.sum(x) for x in cpp.interp_planes(
                F, D, grid, periodic, cfg, interpret=False)) * 1e-30, None),
            D, None, length=n)[0]))
        return lambda: f(bins0.D, F0)

    def deposit_only(n):
        V0 = jnp.asarray(
            rng.randn(8, cfg.slot_capacity, grid.ncells).astype(np.float32))
        f = jax.jit(lambda V, D: jnp.sum(jax.lax.scan(
            lambda V, _: (V + jnp.sum(cpp.deposit_planes(
                V, D, grid, periodic, cfg, interpret=False)) * 1e-30, None),
            V, None, length=n)[0]))
        return lambda: f(V0, bins0.D)

    def full(n, fused=False):
        import dataclasses
        c = dataclasses.replace(cfg, fused_planes=fused)

        def go():
            def body(p, _):
                res = cpp.gaussian_coupling_planes(
                    p, u, gp, dtau, u, u, grid, periodic, 1e-6, 1000.0,
                    1e-4, c, prev_alpha=alpha, interpret=False)
                return chain_pf(p, jnp.sum(res.force) + jnp.sum(res.alpha)), None
            p, _ = jax.lax.scan(body, pf, None, length=n)
            return jnp.sum(p.pos)
        return jax.jit(go)

    def fused_kernel_only(n):
        Fp0 = jax.jit(lambda F: cpp.pad_wrap_zero(F, periodic))(F0)

        f = jax.jit(lambda D0, Fp: jnp.sum(jax.lax.scan(
            lambda D, _: (D + (lambda r: (jnp.sum(r[0]) + jnp.sum(r[2])))(
                cpp.fused_exchange_padded(
                    Fp, D, grid, periodic, cfg, 0, 1e-6, 1000.0,
                    interpret=False)) * 1e-30, None),
            D0, None, length=n)[0]))
        return lambda: f(bins0.D, Fp0)

    sel = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            sel = a.split("=", 1)[1].split(",")
    def want(s):
        return sel is None or any(x in s for x in sel)
    if want("bin"): timeit("bin_particles_planes", bin_only)
    if want("interp"): timeit("interp kernel", interp_only)
    if want("deposit"): timeit("deposit kernel + epilogue", deposit_only)
    if want("fusedk"): timeit("fused kernel only", fused_kernel_only)
    if want("full"): timeit("full planes exchange", full)
    if want("fullfused"): timeit("full planes (fused)",
                                 lambda n: full(n, fused=True))


if __name__ == "__main__":
    main()

"""Stage microbenchmark of the 1M-particle DEM substeps (the 940 ms/step
whale of the 1M/256^3 north star; scripts/profile_1m.py round 5).

Times, with the 1-vs-k chained-scan protocol:
  gather      : the (N, M, 11) candidate row gather alone
  pairforce   : gather + _pair_force math (no sum/integration)
  contact     : full neighbor_contact_forces (chunked as configured)
  contact_k1  : same with force_chunks=1 (is lax.map the problem?)
  wall        : wall_contact_forces
  onesub      : one velocity-Verlet substep (contact + wall + integrate)
  foursub     : dem_substeps n_sub=4 (the bench config unit)

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_dem1m.py [--small]
"""

import sys
import time

import numpy as np


def main():
    small = "--small" in sys.argv
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from jax import lax

    from yade_openfoam_coupling_tpu.ops import dem
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx, N = (64, 16_000) if small else (256, 1_000_000)
    grid = Grid.cube(nx, 1e-3 * nx)
    radius = 4e-4
    cfg = dem.DEMConfig(
        params=dem.ContactParams(kn=100.0, rho_p=2500.0),
        gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
        periodic=(True, True, False), wall_axes=(False, False, True),
        neighbor="cells", cell_capacity=4, max_neighbors=8,
        force_chunks=8, list_reuse=True, list_rebuild_steps=5,
        refined_neighbors=4, carry_contact=True,
    )
    r_max = radius

    rng = np.random.RandomState(0)

    def lattice(n, lo, hi, jitter):
        k = int(np.ceil(n ** (1.0 / 3.0)))
        g = np.stack(np.meshgrid(*[np.linspace(lo, hi, k)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)[:n]
        return g + rng.uniform(-jitter, jitter, g.shape)

    L = grid.lengths[0]
    pos = jnp.asarray(
        lattice(N, 0.1 * L, 0.9 * L, 0.2 * L / int(np.ceil(N ** (1 / 3.)))),
        jnp.float32)
    vel = jnp.asarray(rng.randn(N, 3) * 1e-3, jnp.float32)
    ang = jnp.zeros((N, 3), jnp.float32)
    rad = jnp.full((N,), radius, jnp.float32)
    act = jnp.ones((N,), bool)

    nbr = jax.jit(lambda p: dem.build_neighbor_list(p, act, grid, cfg,
                                                    r_max))(pos)
    nbr.block_until_ready()
    M = nbr.shape[1]
    print(f"list built: M={M}", flush=True)
    hydro = dem.DEMForces(jnp.zeros_like(pos), jnp.zeros_like(pos))
    dtv = 5e-5 / 4

    def timeit(name, scan_fn, k=4):
        f1, fk = scan_fn(1), scan_fn(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{name:28s} {best:10.2f} ms/iter", flush=True)
        return best

    data0 = jnp.concatenate(
        [pos, vel, ang, rad[:, None], act.astype(pos.dtype)[:, None]], -1)
    data0 = jnp.concatenate([data0, jnp.zeros((1, 11), data0.dtype)])

    def mk_gather(n):
        def go():
            def body(p, _):
                d = jnp.concatenate(
                    [p, vel, ang, rad[:, None],
                     act.astype(p.dtype)[:, None]], -1)
                d = jnp.concatenate([d, jnp.zeros((1, 11), d.dtype)])
                dj = d[nbr]                     # (N, M, 11)
                s = jnp.sum(dj[..., 0])
                return p + s * 0, None
            p, _ = lax.scan(body, pos, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    def mk_contact(k_chunks):
        import dataclasses
        cfgk = dataclasses.replace(cfg, force_chunks=k_chunks)

        def mk(n):
            def go():
                def body(p, _):
                    f, t = dem.neighbor_contact_forces(
                        nbr, p, vel, ang, rad, act, grid, cfgk)
                    return p + jnp.sum(f) * 0, None
                p, _ = lax.scan(body, pos, None, length=n)
                return jnp.sum(p)
            return jax.jit(go)
        return mk

    def mk_wall(n):
        def go():
            def body(p, _):
                f, t = dem.wall_contact_forces(p, vel, ang, rad, act, grid,
                                               cfg)
                return p + jnp.sum(f) * 0, None
            p, _ = lax.scan(body, pos, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    def mk_sub(n_sub):
        def mk(n):
            def go():
                def body(p, _):
                    p2, v2, a2, ov, fc, tc = dem.dem_substeps(
                        p, vel, ang, rad, act, hydro, grid, cfg,
                        dtv, n_sub, r_max, nbr=nbr, carried=None)
                    return p + jnp.sum(p2) * 0, None
                p, _ = lax.scan(body, pos, None, length=n)
                return jnp.sum(p)
            return jax.jit(go)
        return mk

    timeit("gather (N,M,11)", mk_gather)
    timeit("contact (chunks=8)", mk_contact(8))
    timeit("contact (chunks=1)", mk_contact(1))
    timeit("wall", mk_wall)
    timeit("one substep", mk_sub(1))
    timeit("four substeps", mk_sub(4))


if __name__ == "__main__":
    main()

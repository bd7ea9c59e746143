"""Follow-up to micro_dem1m.py: WHY does the 4-substep lax.scan cost
974 ms when one substep costs 35 ms (7x per-substep blowup)?

Variants timed (1-vs-k protocol):
  scan4      : dem_substeps n_sub=4 (control; carry_contact path)
  nocarry4   : same with carry_contact=False (plain substep_body scan)
  unroll4    : hand-unrolled python loop over 4 velocity-Verlet substeps
               (same math as the carry_contact scan body, no lax.scan)

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_dem1m_b.py
"""

import dataclasses
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

    def mk_sub(cfg_x):
        def mk(n):
            def go():
                def body(p, _):
                    out = dem.dem_substeps(
                        p, vel, ang, rad, act, hydro, grid, cfg_x,
                        dtv, 4, r_max, nbr=nbr, carried=None)
                    return p + jnp.sum(out[0]) * 0, None
                p, _ = lax.scan(body, pos, None, length=n)
                return jnp.sum(p)
            return jax.jit(go)
        return mk

    def mk_unroll(n):
        p_ = cfg.params
        m = dem.particle_mass(rad, p_.rho_p)
        inertia = dem.particle_inertia(rad, p_.rho_p)
        g = jnp.asarray(cfg.gravity, jnp.float32)
        vol = (4.0 / 3.0) * jnp.pi * rad ** 3
        f_grav = m[:, None] * g[None, :] - cfg.rho_f * vol[:, None] * g[None, :]
        inv_m = jnp.where(act, 1.0 / m, 0.0)[:, None]
        inv_I = jnp.where(act, 1.0 / inertia, 0.0)[:, None]
        lo = jnp.asarray(grid.origin, jnp.float32)
        Lv = jnp.asarray(grid.lengths, jnp.float32)
        per = jnp.asarray(cfg.periodic)

        def go_body(p0, v0, w0):
            fc, tc = dem.neighbor_contact_forces(nbr, p0, v0, w0, rad, act,
                                                 grid, cfg)
            a = (fc + f_grav) * inv_m
            aw = tc * inv_I
            p, v, w = p0, v0, w0
            for _ in range(4):
                v_h = v + 0.5 * dtv * a
                w_h = w + 0.5 * dtv * aw
                p = p + dtv * v_h
                p = jnp.where(per, lo + jnp.mod(p - lo, Lv), p)
                fc, tc = dem.neighbor_contact_forces(nbr, p, v_h, w_h, rad,
                                                     act, grid, cfg)
                a = (fc + f_grav) * inv_m
                aw = tc * inv_I
                v = v_h + 0.5 * dtv * a
                w = w_h + 0.5 * dtv * aw
            return p, v, w

        def go():
            def body(p, _):
                p2, v2, w2 = go_body(p, vel, ang)
                return p + jnp.sum(p2) * 0, None
            p, _ = lax.scan(body, pos, None, length=n)
            return jnp.sum(p)
        return jax.jit(go)

    timeit("scan4 (carry_contact)", mk_sub(cfg))
    timeit("nocarry4 (plain scan)",
           mk_sub(dataclasses.replace(cfg, carry_contact=False)))
    timeit("unroll4 (python loop)", mk_unroll)


if __name__ == "__main__":
    main()

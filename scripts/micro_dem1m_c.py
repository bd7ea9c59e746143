"""Bisect the 1M chained-substep blowup (round 5).

micro_dem1m_b measured: 4 unrolled substeps = 690 ms while the isolated
pieces sum to ~160 (gather 41.5 + contact 35 per eval). This times
chained-4 variants with pieces REPLACED to attribute the ~500 ms gap:

  integ4   : 4 velocity-Verlet substeps with a CONSTANT acceleration
             (no contact eval at all) — integration + carry cost alone
  gath4    : 4 substeps whose force is a raw M-row gather-sum of the
             updated (pos, vel) (no pair math, no chunking)
  full4    : 4 substeps with the real chunked contact eval (control,
             = micro_dem1m_b unroll4)
  full2    : 2 substeps, same structure (linearity check: pressure vs
             per-substep cost)
  full4_k1 : full4 with force_chunks=1 (is lax.map chunking hostile in
             a chained graph?)

All variants use the 1-vs-k outer-scan protocol (CLAUDE.md timing rules).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_dem1m_c.py [--small] [--only=a,b]
"""

import dataclasses
import sys
import time

import numpy as np


def main():
    small = "--small" in sys.argv
    only = None
    for a in sys.argv:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
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
    dtv = 5e-5 / 4
    lo = jnp.asarray(grid.origin, jnp.float32)
    Lv = jnp.asarray(grid.lengths, jnp.float32)
    per = jnp.asarray(cfg.periodic)

    p_ = cfg.params
    m = dem.particle_mass(rad, p_.rho_p)
    inertia = dem.particle_inertia(rad, p_.rho_p)
    g = jnp.asarray(cfg.gravity, jnp.float32)
    vol = (4.0 / 3.0) * jnp.pi * rad ** 3
    f_grav = m[:, None] * g[None, :] - cfg.rho_f * vol[:, None] * g[None, :]
    inv_m = jnp.where(act, 1.0 / m, 0.0)[:, None]
    inv_I = jnp.where(act, 1.0 / inertia, 0.0)[:, None]

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

    def chained(force_fn, n_sub):
        """n_sub velocity-Verlet substeps with force_fn(pos, vel, ang)."""
        def go_body(p0, v0, w0):
            fc, tc = force_fn(p0, v0, w0)
            a = (fc + f_grav) * inv_m
            aw = tc * inv_I
            p, v, w = p0, v0, w0
            for _ in range(n_sub):
                v_h = v + 0.5 * dtv * a
                w_h = w + 0.5 * dtv * aw
                p = p + dtv * v_h
                p = jnp.where(per, lo + jnp.mod(p - lo, Lv), p)
                fc, tc = force_fn(p, v_h, w_h)
                a = (fc + f_grav) * inv_m
                aw = tc * inv_I
                v = v_h + 0.5 * dtv * a
                w = w_h + 0.5 * dtv * aw
            return p, v, w

        def mk(n):
            def go():
                def body(st, _):
                    p, v, w = st
                    p2, v2, w2 = go_body(p, v, w)
                    return (p2, v2, w2), None
                (p, v, w), _ = lax.scan(body, (pos, vel, ang), None,
                                        length=n)
                return jnp.sum(p) + jnp.sum(v)
            return jax.jit(go)
        return mk

    def f_const(p, v, w):
        z = jnp.zeros_like(p)
        return z, z

    def f_gather(p, v, w):
        d = jnp.concatenate([p, v], -1)
        d = jnp.concatenate([d, jnp.zeros((1, 6), d.dtype)])
        dj = d[nbr]                                   # (N, M, 6)
        s = jnp.sum(dj, axis=1)                       # (N, 6)
        return s[:, 0:3] * 1e-9, s[:, 3:6] * 1e-9

    def f_full(cfgx):
        def f(p, v, w):
            return dem.neighbor_contact_forces(nbr, p, v, w, rad, act,
                                               grid, cfgx)
        return f

    cases = {
        "integ4": lambda: timeit("integ4 (const accel)",
                                 chained(f_const, 4)),
        "gath4": lambda: timeit("gath4 (gather-sum force)",
                                chained(f_gather, 4)),
        "full4": lambda: timeit("full4 (control)",
                                chained(f_full(cfg), 4)),
        "full2": lambda: timeit("full2 (2 substeps)",
                                chained(f_full(cfg), 2)),
        "full4_k1": lambda: timeit(
            "full4_k1 (force_chunks=1)",
            chained(f_full(dataclasses.replace(cfg, force_chunks=1)), 4)),
    }
    for name, fn in cases.items():
        if only is None or name in only:
            fn()


if __name__ == "__main__":
    main()

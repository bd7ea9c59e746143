"""Bisect INSIDE the chained 1M contact eval (round 5, follow-up to
micro_dem1m_c).

micro_dem1m_c attributed the DEM whale to the contact evaluation itself:
~235 ms per chained eval vs ~56 ms for the raw chained gather-sum
(gath4/4). integ4 ~ 0 killed the carry hypothesis; full4_k1 > full4
killed the lax.map hypothesis. Remaining suspects, tested here with
chained-4 variants (protocol and state identical to micro_dem1m_c):

  g11_4    : gather the REAL 11-channel data table + plain sum (channel
             count / table-build control — gath4 used 6 channels)
  geo4     : g11 + geometry math only (min-image dx, dist, overlap,
             normal spring force; no velocities, no cross, no friction)
  full4    : control (= micro_dem1m_c full4, force_chunks=8)
  full4_ob : full4 + DEMConfig.gather_barrier (optimization_barrier after
             the gather -> XLA cannot duplicate the row-gather into each
             consumer fusion)
  full4_obk1 : gather_barrier with force_chunks=1

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/micro_dem1m_d.py [--small] [--only=a,b]
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

        def factory(n):
            def go():
                def body(st, _):
                    p, v, w = st
                    p2, v2, w2 = go_body(p, v, w)
                    return (p2, v2, w2), None
                (p, v, w), _ = lax.scan(body, (pos, vel, ang), None,
                                        length=n)
                return jnp.sum(p) + jnp.sum(v)
            return jax.jit(go)
        return factory

    def make_data(p, v, w):
        data = jnp.concatenate(
            [p, v, w, rad[:, None], act.astype(p.dtype)[:, None]], axis=-1)
        return jnp.concatenate([data, jnp.zeros((1, 11), data.dtype)])

    def f_g11(p, v, w):
        d = make_data(p, v, w)
        dj = d[nbr]                                    # (N, M, 11)
        s = jnp.sum(dj, axis=(1, 2))
        z = jnp.zeros((N, 3), jnp.float32)
        return s[:, None] * 1e-9 + z, z

    def f_geo(p, v, w):
        d = make_data(p, v, w)
        dj = d[nbr]
        pos_j = dj[..., 0:3]
        rad_j, act_j = dj[..., 9], dj[..., 10] > 0.5
        valid = act_j & act[:, None] & (nbr != N)
        dx = p[:, None, :] - pos_j
        dx = dem._min_image(dx, grid, cfg.periodic)
        dist = jnp.linalg.norm(dx, axis=-1)
        overlap = rad[:, None] + rad_j - dist
        touching = valid & (overlap > 0.0) & (dist > 1e-12)
        n_ = dx / jnp.where(dist > 1e-12, dist, 1.0)[..., None]
        f = jnp.where(touching[..., None],
                      (p_.kn * overlap)[..., None] * n_, 0.0)
        return jnp.sum(f, axis=1), jnp.zeros((N, 3), jnp.float32)

    def f_full(cfgx):
        def f(p, v, w):
            return dem.neighbor_contact_forces(nbr, p, v, w, rad, act,
                                               grid, cfgx)
        return f

    cfg_ob = dataclasses.replace(cfg, gather_barrier=True)
    cfg_obk1 = dataclasses.replace(cfg, gather_barrier=True, force_chunks=1)
    cfg_cm = dataclasses.replace(cfg, pair_layout="channels")
    cfg_cmk1 = dataclasses.replace(cfg, pair_layout="channels",
                                   force_chunks=1)

    cases = {
        "g11_4": lambda: timeit("g11_4 (11ch gather-sum)",
                                chained(f_g11, 4)),
        "geo4": lambda: timeit("geo4 (geometry only)",
                               chained(f_geo, 4)),
        "full4": lambda: timeit("full4 (control)",
                                chained(f_full(cfg), 4)),
        "full4_ob": lambda: timeit("full4_ob (gather_barrier)",
                                   chained(f_full(cfg_ob), 4)),
        "full4_obk1": lambda: timeit("full4_obk1 (barrier, k=1)",
                                     chained(f_full(cfg_obk1), 4)),
        "full4_cm": lambda: timeit("full4_cm (channel-major)",
                                   chained(f_full(cfg_cm), 4)),
        "full4_cmk1": lambda: timeit("full4_cmk1 (channels, k=1)",
                                     chained(f_full(cfg_cmk1), 4)),
    }
    for name, fn in cases.items():
        if only is None or name in only:
            fn()


if __name__ == "__main__":
    main()

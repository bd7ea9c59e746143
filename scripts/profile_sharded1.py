"""Stage profile of the SHARDED program on a 1-shard mesh (real TPU).

bench_sharded1.py measured the full sharded step at 213.9 ms vs 47.9 local
(round 4); ~140 ms of that was attributed to "program structure" by
subtraction. This script measures the structure directly: each component
of `parallel/sharded._one_sharded_step` is timed as its own shard_map
program with the 1-vs-k scan protocol (data dependencies carried through
the scan with the float `x + s*0` chain that survives this backend's
early-returning block_until_ready — see CLAUDE.md).

Components:
  faces    : lo_to_faces_local + faces_to_lo_local roundtrip
  exchange : sharded planes exchange (owner interp/deposit + halo reduction)
  dem      : dem_substeps_sharded (ghost plan + per-substep fetch + list)
  migrate  : one ring migration hop
  full     : the complete sharded step (control, candidate round-4 config)

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_sharded1.py
"""

import json
import sys
import time

import numpy as np


def main():
    small = "--small" in sys.argv   # CPU smoke: 32^3 / 2k
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from jax import lax

    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem
    from yade_openfoam_coupling_tpu.ops import pressure as pr
    from yade_openfoam_coupling_tpu.ops.grid import Grid
    from yade_openfoam_coupling_tpu.parallel import make_mesh
    from yade_openfoam_coupling_tpu.parallel import particles as pp
    from yade_openfoam_coupling_tpu.parallel import sharded as sh
    from yade_openfoam_coupling_tpu.parallel.ctx import ShardCtx
    from yade_openfoam_coupling_tpu.parallel.particles import SlabGeom
    from yade_openfoam_coupling_tpu.ops import dem as demod

    nx, n_particles = (32, 2_000) if small else (128, 100_000)
    length = 1e-3 * nx
    radius = 4e-4
    grid = Grid.cube(nx, length)
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        # candidate round-4 sharded config: no packed_unbin (measured
        # regression, PERF round-4 batch 1), fftpcg (batch-2 winner)
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange=("planes" if "--exchange=planes"
                                             in sys.argv else "window"),
                                   slot_capacity=4,
                                   packed_bin="col", dy_in_kernel=True),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=4, max_neighbors=8,
            refined_neighbors=4,
        ),
        pimple=PIMPLEConfig(
            n_outer=1, n_correctors=1,
            pressure=pr.PressureSolverConfig(
                solver="fftpcg", tol=1e-5, maxiter=40,
                mg=pr.MGConfig(pre_smooth=4, post_smooth=4))),
        turbulence=TurbulenceConfig(model="kEqn"),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=4, r_max=radius,
    )
    rng = np.random.RandomState(0)
    pos = rng.uniform(0.1 * length, 0.9 * length, (n_particles, 3))
    state = cd.initialize_state(
        make_fluid_state(grid), make_particle_state(pos=pos, radius=radius),
        make_turbulence_state(grid, k0=1e-6), cfg, dt=5e-5)

    mesh = make_mesh(1)
    sstate = sh.to_sharded_state(state, cfg, mesh)
    n_loc = nx // mesh.shape[sh.AXIS]
    ctx = ShardCtx(mesh_axes=(sh.AXIS, None, None))
    geom = SlabGeom(n_loc=n_loc, name=sh.AXIS)

    def timed(name, make_body, k=6):
        """make_body(n) -> shard_map-able body(state) running n iterations
        and returning a scalar-reducible pytree."""
        def prog(n):
            body = make_body(n)
            f = jax.shard_map(body, mesh=mesh,
                              in_specs=(sh.state_specs(cfg),),
                              out_specs=jax.sharding.PartitionSpec(),
                              check_vma=False)
            g = jax.jit(f)
            return lambda: float(g(sstate))
        f1, fk = prog(1), prog(k)
        f1(); fk()
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); f1(); t1 = time.perf_counter()
            t2 = time.perf_counter(); fk(); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(json.dumps({"stage": name, "ms": round(best, 2)}), flush=True)
        return best

    dtv = 5e-5

    # --- faces roundtrip --------------------------------------------------
    def mk_faces(n):
        def body(st):
            def one(phi_lo, _):
                faces = sh.lo_to_faces_local(phi_lo, cfg.bcs.u, ctx)
                phi2 = sh.faces_to_lo_local(faces, ctx)
                # float chain: next iteration's input depends on this one
                s = sum(jnp.sum(f) for f in phi2.lo)
                phi2 = phi2._replace(lo=tuple(l + s * 0 for l in phi2.lo))
                return phi2, None
            out, _ = lax.scan(one, st.fluid.phi, None, length=n)
            return lax.psum(sum(jnp.sum(l) for l in out.lo), sh.AXIS)
        return body
    t_faces = timed("faces roundtrip", mk_faces)

    # --- exchange ----------------------------------------------------------
    ex = sh.make_sharded_exchange(cfg, ctx, n_loc)

    def mk_ex(n):
        def body(st):
            faces = sh.lo_to_faces_local(st.fluid.phi, cfg.bcs.u, ctx)
            fs = st.fluid._replace(phi=faces)
            ps = st.particles

            def one(carry, _):
                fs_c, ps_c = carry
                cres = ex(fs_c, ps_c, jnp.asarray(dtv))
                s = jnp.sum(cres.force) + jnp.sum(cres.alpha)
                return (fs_c._replace(u=fs_c.u + s * 0),
                        ps_c._replace(pos=ps_c.pos + s * 0)), s
            (_, _), ss = lax.scan(one, (fs, ps), None, length=n)
            return lax.psum(jnp.sum(ss), sh.AXIS)
        return body
    t_ex = timed("sharded exchange", mk_ex)

    # --- DEM ---------------------------------------------------------------
    dem_fn = sh._make_dem_fn(cfg, geom)

    def mk_dem(n):
        def body(st):
            ps = st.particles
            zero = jnp.zeros_like(ps.pos)
            hydro = demod.DEMForces(zero, zero)

            def one(ps_c, _):
                p2, v2, a2, nov = dem_fn(ps_c, hydro, jnp.asarray(dtv / 4))
                return ps_c._replace(pos=p2, vel=v2, angvel=a2), jnp.sum(p2)
            _, ss = lax.scan(one, ps, None, length=n)
            return lax.psum(jnp.sum(ss), sh.AXIS)
        return body
    t_dem = timed("sharded dem (plan+ghosts+list+4 substeps)", mk_dem)

    # --- migrate -----------------------------------------------------------
    def mk_mig(n):
        def body(st):
            ps = st.particles
            K_m = max(8, ps.pos.shape[0] // 4)

            def one(ps_c, _):
                ps2, nm = pp.migrate(ps_c, cfg.grid, geom, K_m)
                return ps2._replace(pos=ps2.pos + jnp.sum(ps2.vel) * 0), nm
            out, _ = lax.scan(one, ps, None, length=n)
            return lax.psum(jnp.sum(out.pos), sh.AXIS)
        return body
    t_mig = timed("migrate hop", mk_mig)

    # --- full step (control) -------------------------------------------------
    def runner(n):
        run = sh.make_sharded_scan(cfg, mesh, n)
        def go():
            out, _ = run(sstate)
            return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
        g = jax.jit(go)
        return lambda: float(g())
    f1, fk = runner(1), runner(6)
    f1(); fk()
    best = None
    for _ in range(2):
        t0 = time.perf_counter(); f1(); t1 = time.perf_counter()
        t2 = time.perf_counter(); fk(); t3 = time.perf_counter()
        ms = ((t3 - t2) - (t1 - t0)) / 5 * 1e3
        best = ms if best is None else min(best, ms)
    print(json.dumps({"stage": "FULL sharded step (round-4 cfg)",
                      "ms": round(best, 2)}), flush=True)
    print(json.dumps({
        "summary": {
            "faces": round(t_faces, 2), "exchange": round(t_ex, 2),
            "dem": round(t_dem, 2), "migrate": round(t_mig, 2),
            "full": round(best, 2),
            "unattributed (fluid+glue)": round(
                best - t_ex - t_dem - t_mig - t_faces, 2),
        }}), flush=True)


if __name__ == "__main__":
    main()

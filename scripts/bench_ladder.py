"""Graduated benchmark ladder (BASELINE.md configs #2 and #3) on real TPU.

#2: 500-sphere sedimentation cloud (PISO point-force + contacts, 32^3)
#3: 10k-particle inlet-driven fluidized bed (PIMPLE 4-way + kEqn, 24x24x48)

(#1 is a validation case; #4 is bench.py; #5 is scripts/bench_1m.py.)
Prints one JSON line per config.
"""

import json
import time


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from yade_openfoam_coupling_tpu.cases import builders as cb
    from yade_openfoam_coupling_tpu.models import coupled as cd

    def run(name, cfg, state, n_steps=50, reps=3):
        runf = cd.make_scan_fn(cfg, n_steps)
        state2, _ = runf(state)
        float(jnp.sum(state2.fluid.p) + jnp.sum(state2.particles.pos))
        t0 = time.perf_counter()
        s = state2
        for _ in range(reps):
            s, _ = runf(s)
        float(jnp.sum(s.fluid.p) + jnp.sum(s.particles.pos))
        dt_wall = (time.perf_counter() - t0) / (reps * n_steps)
        print(json.dumps({
            "metric": name, "value": round(1.0 / dt_wall, 2),
            "unit": "steps/sec",
        }), flush=True)

    cfg, state, _ = cb.sedimentation_cloud()
    run("ladder #2: 500-sphere sedimentation (PISO, 32^3)", cfg, state)

    # flagship round-3 exchange overlays (builders keep the plain configs
    # the CPU test suite exercises); re-initialize so the persistent-list
    # and carried-contact leaves exist in the scan carry
    import dataclasses as dc
    import numpy as np
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )
    cfg, state, dt0 = cb.fluidized_bed()
    cfg = dc.replace(
        cfg,
        # cap=6: the settled bed packs up to ~5 particles/cell at this
        # radius/cell ratio (the tracked 128^3 config is dilute, cap=4).
        # round 4: window exchange (in-kernel one-hot staging, no HBM
        # slot table) — the flipped bench.py flagship config
        coupling=dc.replace(cfg.coupling, lag_alpha=True, exchange="window",
                            stencil_shape="sphere2", slot_capacity=6,
                            dy_in_kernel=True),
        dem=dc.replace(cfg.dem, list_reuse=True, list_rebuild_steps=10,
                       refined_neighbors=4, carry_contact=True),
        pimple=dc.replace(
            cfg.pimple,
            pressure=dc.replace(cfg.pimple.pressure, solver="fftpcg")),
    )
    state = cd.initialize_state(
        make_fluid_state(cfg.grid),
        make_particle_state(pos=np.asarray(state.particles.pos),
                            radius=np.asarray(state.particles.radius)),
        make_turbulence_state(cfg.grid, k0=1e-6), cfg, dt=dt0)
    run("ladder #3: 10k fluidized bed (PIMPLE 4-way + kEqn)", cfg, state)


if __name__ == "__main__":
    main()

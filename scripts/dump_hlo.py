"""Dump the optimized HLO of the tracked full-step executable (TPU).

Looks for the cross-stage overhead the stage sums don't predict: large
copies/transposes/rematerialized fusions inserted when exchange + DEM +
fluid coexist in one program. Writes the post-optimization HLO text to
/tmp/yofc_hlo_step.txt and prints a size histogram of copy/transpose ops.
"""

import re
import sys
from collections import defaultdict

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from scripts.abl_r3 import __name__ as _  # noqa: F401  (path check)
    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state, make_particle_state, make_turbulence_state,
    )

    import importlib
    abl = importlib.import_module("scripts.abl_r3")
    # rebuild config A inline (mirror abl_r3)
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem
    from yade_openfoam_coupling_tpu.ops import pressure as pr
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx, n_particles = 128, 100_000
    length = 1e-3 * nx
    radius = 4e-4
    grid = Grid.cube(nx, length)
    cfg = cd.CaseConfig(
        grid=grid, bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        # mirror the tracked bench.py (round-4 WF) configuration
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange="window", slot_capacity=4,
                                   dy_in_kernel=True),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
            periodic=(True, True, False), wall_axes=(False, False, True),
            neighbor="cells", cell_capacity=4, max_neighbors=8,
            list_reuse=True, list_rebuild_steps=10, refined_neighbors=4,
            sorted_fetch=True, carry_contact=True,
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

    step = jax.jit(lambda s: cd.coupled_step(s, cfg)[0])
    lowered = step.lower(state)
    compiled = lowered.compile()
    txt = compiled.as_text()
    open("/tmp/yofc_hlo_step.txt", "w").write(txt)
    print(f"HLO text: {len(txt)/1e6:.1f} MB -> /tmp/yofc_hlo_step.txt")

    # histogram big copies / transposes / bitcast-converts
    def shape_bytes(shape_str):
        m = re.match(r"(f32|s32|u32|pred|bf16|f16|s8|u8)\[([0-9,]*)\]",
                     shape_str)
        if not m:
            return 0
        sz = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2,
              "f16": 2, "s8": 1, "u8": 1}[m.group(1)]
        dims = [int(x) for x in m.group(2).split(",") if x]
        n = 1
        for d in dims:
            n *= d
        return n * sz

    tot = defaultdict(int)
    cnt = defaultdict(int)
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\S+) (copy|transpose|"
                     r"bitcast-convert|reshape|all-reduce)\(", ls)
        if m:
            b = shape_bytes(m.group(1))
            if b >= 16 * 1024 * 1024:
                tot[m.group(2)] += b
                cnt[m.group(2)] += 1
    for k in sorted(tot, key=lambda k: -tot[k]):
        print(f"{k:18s} {cnt[k]:4d} ops >=16MB, {tot[k]/1e9:.2f} GB total")


if __name__ == "__main__":
    main()

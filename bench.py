"""Headline benchmark: coupled steps/sec, 100k 4-way particles on a 128^3 grid.

Tracked metric from BASELINE.json ("coupled steps/sec at 100k particles on
128^3 grid"). The reference publishes no numbers (BASELINE.md), so
`vs_baseline` reports progress against the north-star target rate of
50 coupled steps/sec (the 1M-particle/256^3/v5e-8 goal, applied to this
single-chip tracked config): vs_baseline = steps_per_sec / 50.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

Usage: python bench.py [--small] (small = 64^3 / 10k for quick checks)
"""

import json
import sys
import time

import numpy as np


def main():
    small = "--small" in sys.argv
    # Yade-parity physics honesty row (VERDICT r4 item 6): the tracked
    # metric keeps the cheap linear-spring law; this flag runs the SAME
    # scale with shear_history (tangential springs, Yade's default
    # ScGeom/MindlinPhys family) + dynamic_substeps (true exchangeDT
    # semantics) so the parity cost stays visible in PERF.md.
    # carry_contact is incompatible with shear history; the static substep
    # max rises to 8 so ceil(dt/dt_crit) never clamps.
    yade_physics = "--yade-physics" in sys.argv
    import jax

    # persistent compilation cache: the coupled-step executable is large and
    # the (remote) TPU compile can take minutes — cache it across runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from yade_openfoam_coupling_tpu.models import coupled as cd
    from yade_openfoam_coupling_tpu.models.fields import (
        make_fluid_state,
        make_particle_state,
        make_turbulence_state,
    )
    from yade_openfoam_coupling_tpu.models.pimple import PIMPLEConfig
    from yade_openfoam_coupling_tpu.models.piso import FluidBCs
    from yade_openfoam_coupling_tpu.models.turbulence import TurbulenceConfig
    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import dem
    from yade_openfoam_coupling_tpu.ops import pressure as pr
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx = 64 if small else 128
    n_particles = 10_000 if small else 100_000
    length = 1e-3 * nx           # h = 1 mm
    radius = 4e-4                # d = 0.8 mm

    grid = Grid.cube(nx, length)
    cfg = cd.CaseConfig(
        grid=grid,
        bcs=FluidBCs.channel_z(),
        transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0, rho_p=2500.0),
        solver="pimple",
        # lag_alpha: one-step-lagged alpha_f gather (documented O(dt)
        # approximation) folds the drag's alpha gather into the main pass.
        # exchange='window': sorted per-plane particle windows staged into
        # slot planes IN VMEM by one-hot MXU matmuls — no HBM staging
        # table (ops/coupling_window.py). Measured same-process 32.1 vs
        # 35.0 ms/step for the planes exchange under fftpcg (PERF.md
        # round-4 batch 3, abl WF vs FS; equivalence-tested in
        # tests/test_coupling_window.py).
        # dy_in_kernel: 3 per-dx deposit stacks instead of 9 per-(dx,dy),
        # worth ~5.4 ms in the round-3 combo (abl ND vs AL)
        # planes_window auto (=2048): the 47^3 jittered lattice below packs
        # up to 2043 particles into one occupied x-plane (measured host-side
        # on this exact seed), so the 1536 window tuned on abl_r3's uniform
        # cloud dropped 7,419 particles and tripped the overflow assertion
        # (round-4 official bench crash, VERDICT r4 item 1). x-plane
        # membership is stable in this settling config (no x-forcing), and
        # the zero-overflow assertion below keeps the number honest either
        # way. Rule: this config changes only together with a fresh passing
        # end-to-end bench.py log in the same commit.
        # window_dynamic: per-plane trip-count staging loop — each plane's
        # one-hot MXU staging runs ceil(count/128) trips instead of W/128
        # (mean occupancy ~950/plane vs the 2048 auto window here).
        # Measured same-process: 32.82 -> 27.07 ms/step (abl W2 vs DW,
        # PERF.md round-5); ovf=0, p_iters unchanged.
        coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                   stencil_shape="sphere2",
                                   exchange="window", slot_capacity=4,
                                   dy_in_kernel=True, planes_window=0,
                                   window_dynamic=True),
        dem=dem.DEMConfig(
            params=dem.ContactParams(kn=100.0, rho_p=2500.0),
            gravity=(0.0, 0.0, -9.81),
            rho_f=1000.0,
            periodic=(True, True, False),
            wall_axes=(False, False, True),
            neighbor="cells",
            # dilute benchmark (mean bin occupancy ~0.1): small capacity
            # and neighbor count keep the gather row counts minimal
            cell_capacity=4,
            max_neighbors=8,
            # distance-refined compaction: per-substep force gathers run
            # over 4 candidate rows instead of 8 (63.4 -> 60.3 ms/step,
            # abl R); in-cutoff drops would assert below via the overflow
            # counter
            refined_neighbors=4,
            # bin-sorted candidate-table walk at rebuild (abl W)
            sorted_fetch=True,
            # persistent Verlet list with statically-scheduled rebuild:
            # one unconditional build per 5-step scan chunk (no lax.cond —
            # 15.6 ms/step of conditional overhead on v5e, abl_r3.py);
            # staleness guarded by the n_contact_overflow assertion below.
            # K=10: halves the amortized rebuild (the 10-step scans timed
            # below include one full rebuild each — honest amortization)
            list_reuse=True,
            list_rebuild_steps=10,
            # carry the last substep's contact force across fluid steps —
            # skips one of the n_sub+1 contact evaluations per step
            carry_contact=not yade_physics,
            shear_history=yade_physics,
            dynamic_substeps=yade_physics,
            # unrolled substep scan: free here (abl UN 32.61 vs W2 32.82),
            # -288 ms/step at the 1M scale (micro_dem1m_b.py carry copies)
            substep_unroll=True,
            # channel-major pair math (round-5): the rows layout's
            # (n, M, 3)/(n, M) transients lane-pad 32-85x; channels runs
            # the identical formulas on (M, n) arrays. Measured 26.74 vs
            # 27.31 ms/step same-process (abl CM vs DU), 7.0x on the 1M
            # contact chain (micro_dem1m_d). Shear-history (yade_physics)
            # keeps rows (history spring state is slot-indexed).
            pair_layout=("rows" if yade_physics else "channels"),
        ),
        pimple=PIMPLEConfig(
            # tracked metric runs the reference-like 2-corrector PIMPLE loop
            # (/root/reference/pimpleFoamYade/pimpleFoamYade.C:91-105);
            # measured ~free under fftpcg (PERF.md round-4 batch 2 F3:
            # 35.33 vs 35.37 ms/step; batch 4 W2: +0.4 ms), so there is no
            # perf reason to keep the 1-corrector asterisk (VERDICT r4
            # item 6). `--correctors=1` retained for ablation.
            n_outer=1,
            n_correctors=1 if "--correctors=1" in sys.argv else 2,
            # fftpcg: spectral (matmul-DCT/Fourier) preconditioner — the
            # exact inverse of the mean-coefficient Laplacian. Measured
            # 35.4 vs 46.3 ms/step against the mgpcg 4+4 control in one
            # process (PERF.md round-4 batch 2, abl FS): fewer CG iters
            # (2-3 vs 4-5) AND each application is 6 small MXU matmuls
            # instead of a V-cycle. mg config kept for the fallback path.
            pressure=pr.PressureSolverConfig(
                solver="fftpcg", tol=1e-5, maxiter=40,
                mg=pr.MGConfig(pre_smooth=4, post_smooth=4)),
        ),
        turbulence=TurbulenceConfig(model="kEqn"),
        gravity_fluid=(0.0, 0.0, -9.81),
        n_dem_substeps=8 if yade_physics else 4,
        r_max=radius,
    )

    rng = np.random.RandomState(0)
    # jittered non-overlapping lattice: a random-uniform cloud at this
    # density contains overlapping pairs whose spring blow-apart creates
    # multi-m/s particles — unphysical for a suspension and hostile to the
    # Verlet-skin schedule (the staleness assertion below would fire)
    def lattice_positions(n, lo, hi, jitter):
        k = int(np.ceil(n ** (1.0 / 3.0)))
        g = np.stack(np.meshgrid(*[np.linspace(lo, hi, k)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)[:n]
        return g + rng.uniform(-jitter, jitter, g.shape)
    pos = lattice_positions(n_particles, 0.1 * length, 0.9 * length,
                            0.2 * length / int(np.ceil(n_particles ** (1/3.))))
    state = cd.initialize_state(
        make_fluid_state(grid),
        make_particle_state(pos=pos, radius=radius),
        make_turbulence_state(grid, k0=1e-6),
        cfg,
        dt=5e-5,
    )

    n_steps = 10
    run = cd.make_scan_fn(cfg, n_steps)

    def materialize(state):
        # the axon backend's block_until_ready can return before execution
        # completes; a host copy of a derived scalar cannot
        return float(jnp.sum(state.fluid.p)) + float(jnp.sum(state.particles.pos))

    # compile + warm up
    state, diags = run(state)
    materialize(state)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        state, diags = run(state)
    materialize(state)
    dt_wall = (time.perf_counter() - t0) / (reps * n_steps)

    # Convergence honesty (VERDICT r2 item 5): the tracked number is only
    # meaningful if the single-corrector solve actually converges the
    # tracked case. Assert the last measured steps' pressure residuals and
    # continuity errors; report them in the JSON line.
    p_final = float(np.max(np.asarray(diags.p_final_residual)))
    p_init = float(np.max(np.asarray(diags.p_initial_residual)))
    cont = float(np.max(np.abs(np.asarray(diags.cont_err_local))))
    n_over = int(np.max(np.asarray(diags.n_contact_overflow)) +
                 np.max(np.asarray(diags.n_coupling_overflow)))
    assert p_final <= max(1e-5 * max(p_init, 1e-30), 5e-6), (
        f"pressure solve not converged: final {p_final:g} vs initial {p_init:g}")
    assert cont < 1e-5, f"continuity error {cont:g}"
    assert n_over == 0, f"capacity overflows: {n_over}"

    steps_per_sec = 1.0 / dt_wall
    tag = " [yade-physics]" if yade_physics else ""
    print(json.dumps({
        "metric": f"coupled steps/sec, {n_particles} 4-way particles, "
                  f"{nx}^3 grid, 1 chip{tag}",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / 50.0, 4),
        "p_residual_final_max": p_final,
        "continuity_err_max": cont,
    }))


if __name__ == "__main__":
    main()

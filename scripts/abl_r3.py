"""2x2 ablation of the round-3 changes on the full tracked step (TPU):
fused_planes x list_reuse. Isolates the in-context cost of each change
(isolated stage sums don't predict the full step — PERF.md interaction)."""

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

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

    nx, n_particles = 128, 100_000
    length = 1e-3 * nx
    radius = 4e-4
    grid = Grid.cube(nx, length)

    def make_cfg(fused, reuse, extrap=0.0, bf16=False, margin=0.5,
                 pre=2, post=2, levels=0, coarse=20, K=0, shear=False,
                 sampled=False, refined=0, sfetch=False, carry=False,
                 pbin="", dyk=False, fixed=0, cap=4, punbin=False,
                 smoother="jacobi", turb="kEqn", psolver="mgpcg",
                 ncorr=1):
        return cd.CaseConfig(
            grid=grid, bcs=FluidBCs.channel_z(),
            transport=cd.TransportProperties(nu=1e-6, rho_f=1000.0,
                                             rho_p=2500.0),
            solver="pimple",
            coupling=cp.CouplingConfig(gaussian=True, lag_alpha=True,
                                       stencil_shape="sphere2",
                                       exchange="planes", slot_capacity=cap,
                                       fused_planes=fused, packed_bin=pbin,
                                       dy_in_kernel=dyk, packed_unbin=punbin),
            dem=dem.DEMConfig(
                params=dem.ContactParams(kn=100.0, rho_p=2500.0),
                gravity=(0.0, 0.0, -9.81), rho_f=1000.0,
                periodic=(True, True, False), wall_axes=(False, False, True),
                neighbor="cells", cell_capacity=4, max_neighbors=8,
                list_reuse=reuse, list_margin_factor=margin,
                list_rebuild_steps=K, shear_history=shear,
                refined_neighbors=refined, sorted_fetch=sfetch,
                carry_contact=carry,
            ),
            pimple=PIMPLEConfig(
                n_outer=1, n_correctors=ncorr, p_extrapolate=extrap,
                pressure=pr.PressureSolverConfig(
                    solver=psolver, tol=1e-5, maxiter=40, fixed_iters=fixed,
                    mg=pr.MGConfig(bf16=bf16, pre_smooth=pre,
                                   post_smooth=post, levels=levels,
                                   coarse_iters=coarse, smoother=smoother)),
            ),
            turbulence=TurbulenceConfig(model=turb),
            gravity_fluid=(0.0, 0.0, -9.81),
            n_dem_substeps=4, r_max=radius,
            sampled_diagnostics=sampled,
        )

    rng = np.random.RandomState(0)
    pos = rng.uniform(0.1 * length, 0.9 * length, (n_particles, 3))

    def measure(name, cfg, k=6):
        state = cd.initialize_state(
            make_fluid_state(grid),
            make_particle_state(pos=pos, radius=radius),
            make_turbulence_state(grid, k0=1e-6),
            cfg, dt=5e-5,
        )

        def runner(n):
            run = cd.make_scan_fn(cfg, n)
            def go():
                out, _ = run(state)
                return jnp.sum(out.fluid.p) + jnp.sum(out.particles.pos)
            return jax.jit(go)

        f1, fk = runner(1), runner(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        run = cd.make_scan_fn(cfg, k)
        _, diags = run(state)
        iters = np.asarray(diags.p_iters)
        ovf = int(np.max(np.asarray(diags.n_coupling_overflow)))
        print(f"{name:44s} {best:9.2f} ms/step   p_iters={iters.tolist()}"
              f" ovf={ovf}", flush=True)

    sel = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            sel = a.split("=", 1)[1].split(",")

    cases = {
        "A fused=1 reuse=1": (True, True, 0.0, False),
        "B fused=1 reuse=0": (True, False, 0.0, False),
        "C fused=0 reuse=1": (False, True, 0.0, False),
        "D fused=0 reuse=0": (False, False, 0.0, False),
        "E fused=1 reuse=1 extrap=1": (True, True, 1.0, False),
        "F fused=1 reuse=1 bf16mg": (True, True, 0.0, True),
        "G fused=1 reuse=1 extrap+bf16": (True, True, 1.0, True),
    }
    for name, (fu, re_, ex, bf) in cases.items():
        if sel is None or any(s in name for s in sel):
            measure(name, make_cfg(fu, re_, ex, bf))
    if sel is None or any(s in "H nocond" for s in sel):
        measure("H fused=1 reuse=1 NO-COND", make_cfg(True, True, margin=-1.0))
    if sel is None or any(s in "I mg11" for s in sel):
        measure("I fused=1 reuse=1 mg 1+1 smooth",
                make_cfg(True, True, pre=1, post=1))
    if sel is None or any(s in "J mglv4" for s in sel):
        measure("J K=5 mg levels=4 coarse=10",
                make_cfg(True, True, levels=4, coarse=10, K=5))
    if sel is None or any(s in "L mg33" for s in sel):
        measure("L K=5 mg 3+3 smooth",
                make_cfg(True, True, pre=3, post=3, K=5))
    if sel is None or any(s in "M base-K5" for s in sel):
        measure("M K=5 baseline mg", make_cfg(True, True, K=5))
    if sel is None or any(s in "N mglv3" for s in sel):
        measure("N K=5 mg levels=3 coarse=12",
                make_cfg(True, True, levels=3, coarse=12, K=5))
    if sel is None or any(s in "S shear" for s in sel):
        # VERDICT r2 item 9: the Yade-default contact law's TPU cost at
        # the tracked scale
        measure("S K=5 shear_history=True", make_cfg(True, True, K=5,
                                                     shear=True))
    if sel is None or any(s in "V colbin" for s in sel):
        cfgv = make_cfg(True, True, pre=3, post=3, K=5)
        cfgv = dataclasses.replace(
            cfgv, coupling=dataclasses.replace(cfgv.coupling,
                                               packed_bin="col"))
        measure("V K=5 mg33 col-bin", cfgv)
    if sel is None or any(s in "R refined" for s in sel):
        # distance-refined candidate list: every per-substep force gather
        # shrinks from M=8 to 4 rows/particle (DEMConfig.refined_neighbors)
        measure("R K=5 mg33 refined=4", make_cfg(True, True, pre=3, post=3,
                                                 K=5, refined=4))
    if sel is None or any(s in "W sorted-fetch" for s in sel):
        measure("W K=5 mg33 refined=4 sorted-fetch",
                make_cfg(True, True, pre=3, post=3, K=5, refined=4,
                         sfetch=True))
    if sel is None or any(s in "X mg44" for s in sel):
        measure("X K=5 mg44 refined=4", make_cfg(True, True, pre=4, post=4,
                                                 K=5, refined=4))
    if sel is None or any(s in "Y K10" for s in sel):
        measure("Y K=10 mg33 refined=4", make_cfg(True, True, pre=3, post=3,
                                                  K=10, refined=4))
    if sel is None or any(s in "Z carry" for s in sel):
        # DEMConfig.carry_contact: skip one contact evaluation per step by
        # re-composing a0 from the carried last-substep force
        measure("Z bench-combo + carry_contact",
                make_cfg(True, True, pre=3, post=3, K=5, refined=4,
                         sfetch=True, pbin="col", carry=True))
    if sel is None or any(s in "Q bench-combo" for s in sel):
        # exactly the tracked bench.py configuration
        measure("Q bench-combo (refined+sfetch+col)",
                make_cfg(True, True, pre=3, post=3, K=5, refined=4,
                         sfetch=True, pbin="col"))
    if sel is None or any(s in "U dyk" for s in sel):
        # CouplingConfig.dy_in_kernel: 3 per-dx deposit stacks instead of
        # 9 per-(dx,dy) — ~800 MB/step less stack traffic at 128^3
        measure("U bench-combo + dy_in_kernel",
                make_cfg(True, True, pre=3, post=3, K=5, refined=4,
                         sfetch=True, pbin="col", dyk=True))
    if sel is None or any(s in "P dyk+carry" for s in sel):
        measure("P bench-combo + dyk + carry",
                make_cfg(True, True, pre=3, post=3, K=5, refined=4,
                         sfetch=True, pbin="col", dyk=True, carry=True))
    if sel is None or "AL" in (sel or []):
        # every round-3 candidate at once (leave-one-outs: NF/NC/ND)
        measure("AL ALL: K10 mg44 carry dyk fixed5 cap3",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         fixed=5, cap=3))
    if sel is None or "NF" in (sel or []):
        measure("NF ALL minus fixed_iters",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         cap=3))
    if sel is None or "NC" in (sel or []):
        measure("NC ALL minus cap3 (cap=4)",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         fixed=5))
    if sel is None or "ND" in (sel or []):
        measure("ND ALL minus dy_in_kernel",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True,
                         fixed=5, cap=3))
    if sel is None or "BW" in (sel or []):
        # the round-3 bench candidate: NC minus fixed_iters (the frozen
        # iterations of the static loop still pay full V-cycle work)
        measure("BW K10 mg44 carry dyk cap4 while-CG",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True))
    if sel is None or "PU" in (sel or []):
        # BW + packed_unbin: z-packed unbin table (true 128 lanes instead
        # of the 8x lane-padded (ncells, 16) transpose)
        measure("PU BW + packed_unbin",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         punbin=True))
    if sel is None or "CH" in (sel or []):
        # Chebyshev(3+3) MG smoothing: 4 CG iters where jacobi 4+4 needs 5
        # (CPU iteration-count scan; tests/test_pressure.py)
        measure("CH BW + cheby 3+3",
                make_cfg(True, True, pre=3, post=3, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         smoother="chebyshev"))
    if sel is None or "CP" in (sel or []):
        # CH + packed_unbin: the full round-3 candidate stack
        measure("CP BW + cheby33 + packed_unbin",
                make_cfg(True, True, pre=3, post=3, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         smoother="chebyshev", punbin=True))
    if sel is None or "FS" in (sel or []):
        # BW + spectral (matmul-DCT/FFT) preconditioner: the exact
        # mean-coefficient inverse as 6 dense MXU matmuls per application
        # (ops/pressure.make_spectral_preconditioner) — expected to cut
        # both iteration count and per-iteration preconditioner cost
        measure("FS BW + fftpcg spectral precond",
                make_cfg(True, True, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         psolver="fftpcg"))
    if sel is None or "F2" in (sel or []):
        # corrector-honesty row (VERDICT r3 item 8): reference-like
        # 2-corrector PIMPLE loop on the BW config
        measure("F2 BW + n_correctors=2",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         ncorr=2))
    if sel is None or "F3" in (sel or []):
        # fftpcg + 2 correctors: does the cheap solve make the honest
        # 2-corrector loop affordable?
        measure("F3 fftpcg + n_correctors=2",
                make_cfg(True, True, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         psolver="fftpcg", ncorr=2))
    if sel is None or "WX" in (sel or []):
        # BW with the window-staged exchange (`ops/coupling_window.py`):
        # no HBM staging table — sorted per-plane windows + in-kernel
        # one-hot MXU staging
        cfgw = make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                        sfetch=True, carry=True, dyk=True)
        cfgw = dataclasses.replace(
            cfgw, coupling=dataclasses.replace(cfgw.coupling,
                                               exchange="window",
                                               packed_bin=False))
        measure("WX BW + window exchange", cfgw)
    if sel is None or "WF" in (sel or []):
        # window exchange + spectral preconditioner: the round-4 candidate
        cfgw = make_cfg(True, True, K=10, refined=4,
                        sfetch=True, carry=True, dyk=True,
                        psolver="fftpcg")
        cfgw = dataclasses.replace(
            cfgw, coupling=dataclasses.replace(cfgw.coupling,
                                               exchange="window",
                                               packed_bin=False))
        measure("WF window + fftpcg", cfgw)
    def _window_cfg(K=10, ncorr=1, W=0):
        c = make_cfg(True, True, K=K, refined=4, sfetch=True, carry=True,
                     dyk=True, psolver="fftpcg", ncorr=ncorr)
        return dataclasses.replace(
            c, coupling=dataclasses.replace(c.coupling, exchange="window",
                                            packed_bin=False,
                                            planes_window=W))
    if sel is None or "WK" in (sel or []):
        # WF + K=20 rebuild cadence: halves the amortized Verlet rebuild
        # (bench.py's 10-step scans pay 22/K ms/step; the 1-vs-k protocol
        # here hides it — compare via bench.py, this case only checks
        # staleness ovf stays 0)
        measure("WK WF + K=20 rebuild", _window_cfg(K=20))
    if sel is None or "W2" in (sel or []):
        # corrector honesty at the flipped (window+fftpcg) bench config
        measure("W2 WF + n_correctors=2", _window_cfg(ncorr=2))
    if sel is None or "DW" in (sel or []):
        # round-5 candidate: the bench (W2) config with the DYNAMIC
        # per-plane trip-count staging loop (cf. static W2 control
        # back-to-back; coupling_window._window_kernel dynamic=True).
        c = _window_cfg(ncorr=2)
        measure("DW W2 + window_dynamic", dataclasses.replace(
            c, coupling=dataclasses.replace(c.coupling,
                                            window_dynamic=True)))
    if sel is None or "DU" in (sel or []):
        # combined round-5 candidate: dynamic window staging + unrolled
        # substep scan on the W2 (tracked bench) config
        c = _window_cfg(ncorr=2)
        measure("DU W2 + dynamic + unroll", dataclasses.replace(
            c, coupling=dataclasses.replace(c.coupling, window_dynamic=True),
            dem=dataclasses.replace(c.dem, substep_unroll=True)))
    if sel is None or "UN" in (sel or []):
        # round-5 candidate: fully unrolled DEM substep scan (no carry
        # round-trip per substep; scripts/micro_dem1m_b.py measured
        # 978 -> 690 ms at 1M/4sub). Cost at 100k unknown — measure.
        c = _window_cfg(ncorr=2)
        measure("UN W2 + substep_unroll", dataclasses.replace(
            c, dem=dataclasses.replace(c.dem, substep_unroll=True)))
    if sel is None or "WW" in (sel or []):
        # static window 1536 (vs auto 2048 = 2.5x mean): 25% less one-hot
        # MXU staging work; ovf must stay 0 for the cut to be honest
        measure("WW WF + window=1536", _window_cfg(W=1536))
    if sel is None or "CM" in (sel or []):
        # round-5: channel-major pair force (DEMConfig.pair_layout) on the
        # current tracked config (DU) — at 1M it cut the contact eval 7x
        # (micro_dem1m_d: 1255.6 -> 179.5 ms); measure the 100k effect
        c = _window_cfg(ncorr=2)
        measure("CM DU + pair_layout=channels", dataclasses.replace(
            c, coupling=dataclasses.replace(c.coupling, window_dynamic=True),
            dem=dataclasses.replace(c.dem, substep_unroll=True,
                                    pair_layout="channels")))
    if sel is None or "UG" in (sel or []):
        # round-5: flat-gather unbin (cfg.unbin_gather) on the CM config —
        # kills the (ncells, 16) transpose table (1.07 GB materialized at
        # 128^3) for n_res 1-D gathers
        c = _window_cfg(ncorr=2)
        measure("UG CM + unbin_gather", dataclasses.replace(
            c, coupling=dataclasses.replace(c.coupling, window_dynamic=True,
                                            unbin_gather=True),
            dem=dataclasses.replace(c.dem, substep_unroll=True,
                                    pair_layout="channels")))
    if sel is None or "NT" in (sel or []):
        # turbulence cost probe: BW config with the laminar closure (the
        # kEqn transport's in-context cost has not been measured since
        # round 1's "overlapped by XLA" claim)
        measure("NT BW laminar (turb cost probe)",
                make_cfg(True, True, pre=4, post=4, K=10, refined=4,
                         sfetch=True, pbin="col", carry=True, dyk=True,
                         turb="laminar"))
    if sel is None or "C3" in (sel or []):
        # slot_capacity 4 -> 3: 25% less D/staging/kernel slot traffic;
        # ovf must print 0 for the cut to be exact at this density
        measure("C3 bench-combo + cap=3",
                make_cfg(True, True, pre=3, post=3, K=5, refined=4,
                         sfetch=True, pbin="col", cap=3))
    if sel is None or any(s in "O fixed-iters" for s in sel):
        # PressureSolverConfig.fixed_iters: static fori_loop CG (no
        # data-dependent while cond — one lax.cond measured 15.6 ms/step)
        measure("O bench-combo + fixed_iters=6",
                make_cfg(True, True, pre=3, post=3, K=5, refined=4,
                         sfetch=True, pbin="col", fixed=6))
    if sel is None or any(s in "T sampled-diag" for s in sel):
        # vs case L (same solver settings, full diag): the cost of the
        # per-step grid-wide diagnostic reductions
        measure("T K=5 mg33 sampled-diag", make_cfg(True, True, pre=3,
                                                    post=3, K=5,
                                                    sampled=True))


if __name__ == "__main__":
    main()

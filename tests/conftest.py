"""Test configuration: run the suite on a virtual 8-device CPU backend.

Multi-chip TPU hardware is not available in CI; sharding tests emulate an
8-device mesh on CPU via `xla_force_host_platform_device_count`, and the
physics tests run fine on CPU.

The container's sitecustomize registers the axon TPU PJRT plugin (with
remote compilation) at interpreter boot — before any conftest runs — which
routes even CPU-backend XLA compiles through a slow RPC (~15s per unique
kernel). We therefore re-exec pytest once with the axon registration
disabled and the CPU backend forced. The re-exec happens in
`pytest_configure`, after stopping pytest's global fd capture so the child
process inherits the real stdout/stderr.
"""

import os
import sys

_MARK = "_YOFC_TEST_REEXEC"


def _needs_reexec() -> bool:
    return os.environ.get(_MARK) != "1" and bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env[_MARK] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips axon registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


# ---------------------------------------------------------------------------
# Slow-test policy (VERDICT r4 item 8): the full suite costs ~66 min on CPU,
# dominated by the bench-scale equivalence and long-scan tests below — at
# that price it stops being run, which is exactly how the round-4 bench
# regression slipped through. Default run: < 10 min (every feature keeps at
# least one fast test). Full suite: `pytest tests/ --runslow` (or RUN_SLOW=1)
# — run it before flipping any official config.
# ---------------------------------------------------------------------------

# (file, test-function prefix) pairs measured >= ~15 s in the round-5 full
# run (/tmp durations, PERF.md); prefixes cover parametrized variants.
_SLOW = {
    ("test_dynamic_substeps.py", "test_dynamic_matches_static_substep_run"),
    ("test_dynamic_substeps.py",
     "test_dynamic_keeps_courant_dt_where_enforce_throttles"),
    ("test_dynamic_substeps.py", "test_masked_tail_is_noop_carry_contact"),
    ("test_dem_verlet.py", "test_chunked_scan_rebuild_matches_per_step"),
    ("test_dem_verlet.py", "test_persistent_list_matches_per_step_rebuild"),
    ("test_dem_verlet.py", "test_carry_contact_matches_uncarried"),
    ("test_dem_verlet.py", "test_persistent_list_rebuild_triggers"),
    ("test_dem_verlet.py", "test_neighbor_list_forces_match_allpairs"),
    ("test_sharding.py", "test_chunked_sharded_matches_single_chunked"),
    ("test_sharding.py", "test_bench_scale_sharded_matches_single"),
    ("test_sharding.py", "test_gaussian_planes_sharded_matches_single"),
    ("test_sharding.py", "test_fftpcg_sharded_matches_single"),
    ("test_sharding.py", "test_gaussian_4way_sharded_matches_single"),
    ("test_sharding.py", "test_point_force_sharded_matches_single"),
    ("test_sharding.py", "test_shear_history_sharded_matches_single"),
    # test_migration_across_slabs_matches_single stays in the default set:
    # the fast sharding sentinel (~32 s, exercises migration + halos)
    ("test_implicit_diffusion.py", "test_kepsilon_holds_courant_dt"),
    ("test_pressure.py", "test_chebyshev_smoother_converges"),
    ("test_pressure.py", "test_fixed_iters_matches_while_loop"),
    ("test_pressure.py", "test_mg_bf16_preconditioner_converges"),
    ("test_coupled.py",
     "test_pressure_warm_start_extrapolation_same_solution"),
    ("test_more_coverage.py", "test_upwind_convection_taylor_green"),
    ("test_more_coverage.py", "test_kepsilon_coupled_smoke"),
    ("test_more_coverage.py", "test_chunked_equals_unchunked_in_full_step"),
    ("test_adaptive_dt.py", "test_adaptive_dt_clamped_to_dem_critical"),
    ("test_adaptive_dt.py", "test_adaptive_dt_in_coupled_loop"),
    ("test_cases_runner.py", "test_runner_writes_and_checkpoints"),
    ("test_cases_runner.py", "test_cli_fast_smoke"),
    ("test_cases_runner.py", "test_fluidized_bed_builder"),
    ("test_coupling_window.py",
     "test_window_chunked_staging_matches_unchunked"),
    ("test_coupling_window.py", "test_window_matches_planes_torque"),
    ("test_coupling_window.py", "test_window_overflow_contract"),
    ("test_coupling_window.py", "test_window_matches_sparse"),
    ("test_round2_fixes.py", "test_sharded_inlet_outflow_slip_matches_single"),
    ("test_round2_fixes.py", "test_overflow_in_step_diagnostics"),
    ("test_round2_fixes.py", "test_relaxation_converges_to_same_fixed_point"),
    ("test_round2_fixes.py", "test_neighbor_overflow_counter"),
    ("test_round2_fixes.py", "test_keqn_high_nut_stable_under_adaptive_dt"),
    ("test_round2_fixes.py", "test_runner_midrun_checkpoint"),
    ("test_coupling_planes.py", "test_chunked_planes_matches_monolithic"),
    ("test_coupling_planes.py", "test_planes_matches_sparse"),
    ("test_coupling_planes.py", "test_deposit_kernel_dy_in_kernel_matches"),
    ("test_coupling_planes.py", "test_planes_torque_matches_sparse"),
    ("test_ddtcorr.py", "test_ddtcorr_history_semantics_on_inconsistent_start"),
    ("test_ddtcorr.py", "test_ddtcorr_large_co_stable_but_less_accurate"),
    ("test_ddtcorr.py", "test_ddtcorr_bounded_in_smooth_flow"),
    ("test_coupling_slots.py", "test_coupled_step_with_slots_runs"),
    ("test_coupling_slots.py", "test_slots_with_torque_matches_sparse"),
    ("test_coupling_slots.py", "test_slots_matches_sparse"),
    ("test_coupling_slots.py", "test_slots_overflow_counted_and_masked"),
    ("test_sharded_checkpoint.py", "test_sharded_run_checkpoint_resume"),
    ("test_dem_shear.py", "test_shear_history_persists_across_rebuilds"),
    ("test_obstacle.py", "test_flow_past_block_mass_and_drag"),
    ("test_obstacle.py", "test_coupled_step_with_solid_config"),
    ("test_more_coverage.py", "test_fluidized_bed_with_inlet"),
    ("test_more_coverage.py", "test_cli_pimplefoam_smoke"),
}


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run the slow (bench-scale / long-scan) tests")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = _pytest.mark.skip(
        reason="slow (run with --runslow or RUN_SLOW=1)")
    for item in items:
        fname = item.fspath.basename
        for f, pref in _SLOW:
            if fname == f and item.name.startswith(pref):
                item.add_marker(skip)
                break

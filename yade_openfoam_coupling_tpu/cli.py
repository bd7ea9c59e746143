"""Command-line entry points: the solver-application layer (L5).

The reference ships two executables — `icoFoamYade` (PISO, point-force
2-way) and `pimpleFoamYade` (PIMPLE, 4-way) — launched against an OpenFOAM
case directory (`README.md:23-29`). Here both are subcommands of one CLI
(no MPMD launch: the DEM engine is built in, so there is no Yade process to
co-schedule):

    python -m yade_openfoam_coupling_tpu icofoam   <case_dir> [options]
    python -m yade_openfoam_coupling_tpu pimplefoam <case_dir> [options]
    python -m yade_openfoam_coupling_tpu bench      [--small]

Particle initial state comes from `<case_dir>/particles.xyz` (one x y z per
line; radius via --radius) or --random-particles N.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _load_particles(args, grid):
    if args.random_particles:
        rng = np.random.RandomState(args.seed)
        lo = np.asarray(grid.origin) + 0.1 * np.asarray(grid.lengths)
        hi = np.asarray(grid.origin) + 0.9 * np.asarray(grid.lengths)
        return rng.uniform(lo, hi, (args.random_particles, 3))
    pfile = Path(args.case) / "particles.xyz"
    if pfile.exists():
        return np.loadtxt(pfile).reshape(-1, 3)
    print("no particles.xyz and no --random-particles; running fluid-only "
          "(1 inert parked particle)", file=sys.stderr)
    return None


def _run_solver(args, solver: str):
    import jax.numpy as jnp

    from .models import coupled as cd
    from .models import runner
    from .models.fields import (
        make_fluid_state,
        make_particle_state,
        make_turbulence_state,
    )
    from .ops import coupling as cp
    from .ops import dem
    from .utils.config import load_case
    from .utils.logging import RunLogger

    dem_cfg = dem.DEMConfig(
        params=dem.ContactParams(
            kn=args.kn, restitution=args.restitution, friction=args.friction,
            rho_p=2500.0,
        ),
        gravity=(0.0, 0.0, -9.81),
        buoyancy=(solver == "piso"),
        neighbor="cells" if (args.random_particles or 0) > 4000 else "allpairs",
    )
    if getattr(args, "fast", False) and solver == "pimple":
        # the flagship TPU exchange (bench.py configuration): plane-dense
        # slots + fused Pallas kernel, persistent Verlet list, carried
        # contact force. lag_alpha is the documented O(dt) divergence.
        coupling_cfg = cp.CouplingConfig(
            gaussian=True, lag_alpha=True, stencil_shape="sphere2",
            exchange="planes", slot_capacity=args.slot_capacity,
            packed_bin="col", dy_in_kernel=True, packed_unbin=True)
        dem_cfg = __import__("dataclasses").replace(
            dem_cfg, neighbor="cells", list_reuse=True,
            list_rebuild_steps=min(10, args.chunk), refined_neighbors=4,
            carry_contact=True)
    else:
        coupling_cfg = cp.CouplingConfig(gaussian=(solver == "pimple"))
    cfg, rc = load_case(
        args.case,
        solver=solver,
        coupling=coupling_cfg,
        dem_cfg=dem_cfg,
        n_dem_substeps=args.dem_substeps,
        r_max=args.radius,
    )
    # DEM material density must track transportProperties
    cfg = __import__("dataclasses").replace(
        cfg, dem=__import__("dataclasses").replace(
            cfg.dem,
            params=__import__("dataclasses").replace(
                cfg.dem.params, rho_p=cfg.transport.rho_p
            ),
            rho_f=cfg.transport.rho_f,
            periodic=cfg.periodic_axes(),
            wall_axes=tuple(not p for p in cfg.periodic_axes()),
        ),
    )

    pos = _load_particles(args, cfg.grid)
    if pos is None:
        pos = [[c - 10 * cfg.grid.lengths[0] for c in cfg.grid.origin]]  # parked outside
    state = cd.initialize_state(
        make_fluid_state(cfg.grid),
        make_particle_state(pos=pos, radius=args.radius),
        make_turbulence_state(cfg.grid, k0=1e-6),
        cfg,
        dt=rc.dt,
    )
    res = runner.run(
        cfg, state, rc,
        chunk=args.chunk,
        case_dir=args.case if args.write else None,
        checkpoint_dir=args.checkpoint_dir,
        logger=RunLogger(every=args.chunk),
        max_steps=args.max_steps,
    )
    print(f"End ({res.steps} steps, t = {float(res.state.t):.6g})")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="yade_openfoam_coupling_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_solver(name):
        s = sub.add_parser(name)
        s.add_argument("case")
        s.add_argument("--radius", type=float, default=4e-4)
        s.add_argument("--kn", type=float, default=1e3)
        s.add_argument("--restitution", type=float, default=0.5)
        s.add_argument("--friction", type=float, default=0.5)
        s.add_argument("--dem-substeps", type=int, default=10)
        s.add_argument("--random-particles", type=int, default=0)
        s.add_argument("--seed", type=int, default=0)
        s.add_argument("--chunk", type=int, default=10)
        s.add_argument("--max-steps", type=int, default=None)
        s.add_argument("--write", action="store_true")
        s.add_argument("--checkpoint-dir", default=None)
        s.add_argument("--fast", action="store_true",
                       help="flagship TPU exchange (planes + fused kernel "
                            "+ persistent Verlet list; pimplefoam only)")
        s.add_argument("--slot-capacity", type=int, default=4,
                       help="--fast: max particles per cell in the slot "
                            "planes (overflowed particles are uncoupled "
                            "for the step and counted)")
        return s

    add_solver("icofoam")
    add_solver("pimplefoam")
    b = sub.add_parser("bench")
    b.add_argument("--small", action="store_true")

    args = ap.parse_args(argv)
    if args.cmd == "icofoam":
        return _run_solver(args, "piso")
    if args.cmd == "pimplefoam":
        return _run_solver(args, "pimple")
    if args.cmd == "bench":
        sys.argv = ["bench.py"] + (["--small"] if args.small else [])
        import bench
        bench.main()
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())

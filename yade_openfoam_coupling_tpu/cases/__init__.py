"""Canonical validation & benchmark cases.

The reference's verification story is physical example cases hosted in the
Yade trunk (`README.md:10`, examples/openfoam): single-sphere settling,
sedimentation, fluidized beds. This package provides the graduated ladder
from BASELINE.md as ready-to-run configs:

1. `settling_sphere`     — 1 sphere, point-force PISO (icoFoamYade mode)
2. `sedimentation_cloud` — 500 spheres, PISO point-force
3. `fluidized_bed`       — 10k particles, PIMPLE 4-way + DPM turbulence
4. `dense_suspension`    — 100k particles, periodic channel, 128^3
5. `fluidized_bed_1m`    — 1M particles, 256^3 (built to shard over 8 chips)

Each builder returns `(CaseConfig, SimState, suggested_dt)`.
"""

from .builders import (  # noqa: F401
    dense_suspension,
    fluidized_bed,
    fluidized_bed_1m,
    sedimentation_cloud,
    settling_sphere,
)

"""TPU-native CFD-DEM coupling framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
dpkn31/Yade-OpenFOAM-coupling (reference: /root/reference): an OpenFOAM
finite-volume incompressible fluid solver two/four-way coupled to a Yade
discrete-element particle engine over MPI.

Here the two programs and their MPI handshake collapse into ONE jitted SPMD
program: a structured finite-volume fluid state and a fixed-capacity particle
state advanced together, sharded over a TPU device mesh with ICI halo
exchange (`jax.shard_map` + `lax.ppermute`) instead of Pstream/MPI.

Sub-packages
------------
ops       Finite-volume stencil operators, pressure solvers (CG/multigrid,
          Pallas kernels), particle<->grid coupling ops, DEM contact ops.
models    Fluid/particle state pytrees, PISO solver (icoFoamYade parity),
          PIMPLE 4-way solver (pimpleFoamYade parity), turbulence closures,
          the coupled CFD-DEM simulation driver.
parallel  Device-mesh construction, halo exchange, sharded step builders.
utils     Typed config (OpenFOAM-dictionary parity), checkpointing,
          diagnostics (Courant/continuity), profiling.
"""

__version__ = "0.1.0"

from . import ops, models, parallel, utils  # noqa: F401

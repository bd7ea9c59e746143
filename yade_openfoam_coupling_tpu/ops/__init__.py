"""TPU-native compute ops: FV stencils, pressure solvers, coupling, DEM."""

from . import grid, stencil, pressure  # noqa: F401
from .grid import (  # noqa: F401
    DIRICHLET,
    NEUMANN,
    PERIODIC,
    FaceBC,
    FieldBC,
    Grid,
    pad_scalar,
    pad_vector,
)

"""Multi-chip execution: device meshes, halo contexts, sharded steps."""

from . import ctx, mesh  # noqa: F401
from .ctx import LOCAL, LocalCtx, ShardCtx  # noqa: F401
from .mesh import make_mesh  # noqa: F401

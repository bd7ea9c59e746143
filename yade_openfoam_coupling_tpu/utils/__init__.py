"""Config, checkpointing, diagnostics, logging, profiling."""

from . import checkpoint, diagnostics, foamdict, logging, profiling  # noqa: F401

"""Solvers and state: PISO, PIMPLE, turbulence closures, coupled driver."""

from . import coupled, fields, pimple, piso, turbulence  # noqa: F401

"""Execution contexts: the seam between single-device and ICI-sharded runs.

The reference's spatial parallelism is OpenFOAM mesh decomposition with
Pstream halo exchange hidden inside every fvc/fvm operator and MPI_Allreduce
inside the linear solvers (SURVEY.md §2.3/§2.4). Here the same seam is a
tiny `Ctx` interface:

* ``pad_s`` / ``pad_v``: produce the one-cell ghost shell every stencil
  kernel consumes. `LocalCtx` fills ghosts from the physical BCs;
  `ShardCtx` (used inside `jax.shard_map`) fills shard-interior ghosts from
  neighbours via `lax.ppermute` over ICI and physical ghosts at the global
  edges.
* ``sum`` / ``max``: global reductions for CG dot products and diagnostics
  (`lax.psum`/`lax.pmax` under sharding — the analog of OpenFOAM's
  gSum/gMax, `CourantNo.H:42-45`).

Every solver (`models/piso.py`, `models/pimple.py`) takes a Ctx, so the
sharded step reuses the exact same numerics code path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.grid import (
    DIRICHLET,
    NEUMANN,
    PERIODIC,
    FaceBC,
    FieldBC,
    Grid,
    pad_axis,
    pad_scalar,
    pad_vector,
)


class LocalCtx:
    """Single-device context: ghost cells purely from physical BCs."""

    mesh_axes: Tuple[Optional[str], Optional[str], Optional[str]] = (None, None, None)

    def pad_s(self, f: jnp.ndarray, bc: FieldBC) -> jnp.ndarray:
        return pad_scalar(f, bc)

    def pad_v(self, u: jnp.ndarray, bc: FieldBC) -> jnp.ndarray:
        return pad_vector(u, bc)

    def sum(self, x):
        return x

    def max(self, x):
        return x

    def min(self, x):
        return x

    def mean_of_sum(self, x, n_local):
        return x / n_local

    def shard_index(self, axis: int):
        return 0

    def shard_count(self, axis: int) -> int:
        return 1


LOCAL = LocalCtx()


def _bc_ghost(face: FaceBC, interior: jnp.ndarray, component: Optional[int],
              axis: int) -> jnp.ndarray:
    from ..ops.grid import SLIP
    if face.kind == DIRICHLET:
        v = face.component(component) if component is not None else face.component(0)
        return 2.0 * v - interior
    if face.kind == SLIP and component is not None and component == axis:
        return -interior
    if face.kind == NEUMANN or face.kind == SLIP:
        return interior
    # PERIODIC at a *global* edge is handled by the ring ppermute itself.
    return interior


@dataclasses.dataclass(frozen=True)
class ShardCtx:
    """Per-shard context for use inside `shard_map`.

    ``mesh_axes[a]`` names the mesh axis the grid axis `a` is sharded over
    (None = unsharded). Ghost slabs along sharded axes come from the ring
    neighbours (`lax.ppermute`); the first/last shard substitutes physical
    BC ghosts on non-periodic axes.
    """

    mesh_axes: Tuple[Optional[str], Optional[str], Optional[str]]

    # -- reductions -------------------------------------------------------
    def _names(self):
        return tuple(n for n in self.mesh_axes if n is not None)

    def sum(self, x):
        for n in self._names():
            x = lax.psum(x, n)
        return x

    def max(self, x):
        for n in self._names():
            x = lax.pmax(x, n)
        return x

    def min(self, x):
        for n in self._names():
            x = lax.pmin(x, n)
        return x

    def mean_of_sum(self, x, n_local):
        return self.sum(x) / self.sum(jnp.asarray(float(n_local), jnp.float32))

    # -- halo pads --------------------------------------------------------
    def _pad_axis_sharded(self, f, axis, lo, hi, name, component):
        n_sh = lax.axis_size(name)
        idx = lax.axis_index(name)
        first = lax.slice_in_dim(f, 0, 1, axis=axis)
        last = lax.slice_in_dim(f, f.shape[axis] - 1, f.shape[axis], axis=axis)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        from_left = lax.ppermute(last, name, fwd)    # left nbr's last slab
        from_right = lax.ppermute(first, name, bwd)  # right nbr's first slab
        periodic = lo.kind == PERIODIC and hi.kind == PERIODIC
        if periodic:
            g_lo, g_hi = from_left, from_right
        else:
            g_lo = jnp.where(idx == 0, _bc_ghost(lo, first, component, axis), from_left)
            g_hi = jnp.where(idx == n_sh - 1, _bc_ghost(hi, last, component, axis), from_right)
        return jnp.concatenate([g_lo, f, g_hi], axis=axis)

    def pad_s(self, f: jnp.ndarray, bc: FieldBC) -> jnp.ndarray:
        for axis in range(3):
            lo, hi = bc.faces[axis]
            name = self.mesh_axes[axis]
            if name is None:
                f = pad_axis(f, axis, lo, hi)
            else:
                f = self._pad_axis_sharded(f, axis, lo, hi, name, None)
        return f

    def _pad_axis_sharded2(self, f, axis, lo, hi, name, component):
        """Depth-2 ghost pad along a sharded axis (one 2-plane ppermute
        each way). Used by the extended-slab exchange: particles that
        drifted <=1 plane past their owner slab between chunked migrations
        still need their full +-1-plane interpolation stencil. At a
        non-periodic global edge the outer ghost plane duplicates the BC
        ghost — it is only ever read by stencils of particles in the
        extended window's edge plane, which is outside the physical domain
        there and therefore empty."""
        n_sh = lax.axis_size(name)
        idx = lax.axis_index(name)
        n = f.shape[axis]
        first2 = lax.slice_in_dim(f, 0, 2, axis=axis)
        last2 = lax.slice_in_dim(f, n - 2, n, axis=axis)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        from_left = lax.ppermute(last2, name, fwd)
        from_right = lax.ppermute(first2, name, bwd)
        periodic = lo.kind == PERIODIC and hi.kind == PERIODIC
        if not periodic:
            first = lax.slice_in_dim(f, 0, 1, axis=axis)
            last = lax.slice_in_dim(f, n - 1, n, axis=axis)
            g_lo_bc = _bc_ghost(lo, first, component, axis)
            g_hi_bc = _bc_ghost(hi, last, component, axis)
            g_lo_bc2 = jnp.concatenate([g_lo_bc, g_lo_bc], axis=axis)
            g_hi_bc2 = jnp.concatenate([g_hi_bc, g_hi_bc], axis=axis)
            from_left = jnp.where(idx == 0, g_lo_bc2, from_left)
            from_right = jnp.where(idx == n_sh - 1, g_hi_bc2, from_right)
        return jnp.concatenate([from_left, f, from_right], axis=axis)

    def pad_s_x2(self, f: jnp.ndarray, bc: FieldBC) -> jnp.ndarray:
        """pad_s with a DEPTH-2 ghost shell on the x (sharded) axis and the
        usual 1-cell shell on y/z -> (nx+4, ny+2, nz+2)."""
        lo, hi = bc.faces[0]
        name = self.mesh_axes[0]
        assert name is not None, "pad_s_x2 is for the sharded x axis"
        f = self._pad_axis_sharded2(f, 0, lo, hi, name, None)
        for axis in (1, 2):
            lo, hi = bc.faces[axis]
            if self.mesh_axes[axis] is None:
                f = pad_axis(f, axis, lo, hi)
            else:
                f = self._pad_axis_sharded(f, axis, lo, hi,
                                           self.mesh_axes[axis], None)
        return f

    def pad_v(self, u: jnp.ndarray, bc: FieldBC) -> jnp.ndarray:
        comps = []
        for c in range(3):
            fc = u[c]
            for axis in range(3):
                lo, hi = bc.faces[axis]
                name = self.mesh_axes[axis]
                if name is None:
                    fc = pad_axis(fc, axis, lo, hi, component=c)
                else:
                    fc = self._pad_axis_sharded(fc, axis, lo, hi, name, c)
            comps.append(fc)
        return jnp.stack(comps)

    # -- shard geometry ---------------------------------------------------
    def shard_index(self, axis: int):
        name = self.mesh_axes[axis]
        return jnp.int32(0) if name is None else lax.axis_index(name)

    def shard_count(self, axis: int) -> int:
        name = self.mesh_axes[axis]
        return 1 if name is None else lax.axis_size(name)

"""Structured finite-volume grid and boundary conditions.

Replaces the *used surface* of OpenFOAM's fvMesh in the reference
(`/root/reference/icoFoamYade/icoFoamYade.C:41-42`, `FoamYade/FoamYade.H:76`):
a uniform Cartesian collocated grid. Uniformity is a deliberate TPU-first
choice — cell location becomes `floor((x-x0)/h)` (O(1)), which collapses the
reference's entire k-d tree subsystem
(`/root/reference/FoamYade/meshtree/meshTree.C`) and `mesh.findCell` octree
usage (`FoamYade.C:251`) into a handful of vector ops.

Fields
------
* scalar field: array of shape ``(nx, ny, nz)``
* vector field: array of shape ``(3, nx, ny, nz)`` (component-major so each
  component is contiguous with the innermost axis last — friendly to TPU
  (8,128) tiling)
* face flux: tuple of 3 arrays shaped ``(nx+1,ny,nz)``, ``(nx,ny+1,nz)``,
  ``(nx,ny,nz+1)`` holding face-normal velocities (the analog of OpenFOAM's
  ``surfaceScalarField phi`` divided by face area).

Boundary conditions are ghost-cell based: every stencil op pads the local
block by one ghost shell filled from the BC spec (or, in sharded mode, from
neighbour shards via `lax.ppermute` — see ``parallel/halo.py``) and then runs
a pure interior kernel. This is the single abstraction that lets one stencil
implementation serve both the single-chip and the ICI-sharded paths.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# BC kinds ------------------------------------------------------------------
PERIODIC = "periodic"
DIRICHLET = "dirichlet"   # fixedValue   (ghost = 2*value - interior)
NEUMANN = "neumann"       # zeroGradient (ghost = interior)
SLIP = "slip"             # vectors: zero normal component, free tangential
#                           (scalars: same as zeroGradient)


@dataclasses.dataclass(frozen=True)
class FaceBC:
    """BC on one boundary face of the box.

    ``value`` is a float for scalar fields or a 3-tuple for vector fields
    (per-component Dirichlet value, e.g. a moving lid).
    """

    kind: str = PERIODIC
    value: float | tuple[float, float, float] = 0.0

    def component(self, c: int) -> float:
        if isinstance(self.value, tuple):
            return float(self.value[c])
        return float(self.value)


@dataclasses.dataclass(frozen=True)
class FieldBC:
    """Six-face BC spec: ((x_lo, x_hi), (y_lo, y_hi), (z_lo, z_hi))."""

    faces: tuple[tuple[FaceBC, FaceBC], tuple[FaceBC, FaceBC], tuple[FaceBC, FaceBC]]

    @staticmethod
    def periodic() -> "FieldBC":
        p = FaceBC(PERIODIC)
        return FieldBC(((p, p), (p, p), (p, p)))

    @staticmethod
    def uniform(kind: str, value=0.0) -> "FieldBC":
        b = FaceBC(kind, value)
        return FieldBC(((b, b), (b, b), (b, b)))

    @staticmethod
    def channel_z(kind_wall: str = DIRICHLET, wall_value=0.0) -> "FieldBC":
        """Periodic in x/y, walls in z (classic channel)."""
        p = FaceBC(PERIODIC)
        w = FaceBC(kind_wall, wall_value)
        return FieldBC(((p, p), (p, p), (w, w)))

    @staticmethod
    def box(kind_wall: str = DIRICHLET, wall_value=0.0) -> "FieldBC":
        w = FaceBC(kind_wall, wall_value)
        return FieldBC(((w, w), (w, w), (w, w)))

    def is_periodic(self, axis: int) -> bool:
        lo, hi = self.faces[axis]
        return lo.kind == PERIODIC and hi.kind == PERIODIC

    def homogeneous(self) -> "FieldBC":
        """Same BC kinds with all Dirichlet values zeroed — the BC of a
        *correction* field (linear-operator form for CG/MG)."""
        return FieldBC(tuple(
            tuple(FaceBC(f.kind, 0.0) for f in pair) for pair in self.faces
        ))

    def component(self, c: int) -> "FieldBC":
        """The SCALAR BC seen by component `c` of a vector field under this
        vector BC — exactly what `pad_vector` applies per component: SLIP
        becomes Dirichlet-0 for the face-normal component and Neumann for
        tangential ones; Dirichlet takes its per-component value. Lets the
        per-component momentum (Helmholtz) solves reuse the scalar
        pad/diag machinery."""
        rows = []
        for axis in range(3):
            pair = []
            for f in self.faces[axis]:
                if f.kind == SLIP:
                    pair.append(FaceBC(DIRICHLET, 0.0) if c == axis
                                else FaceBC(NEUMANN, 0.0))
                elif f.kind == DIRICHLET:
                    pair.append(FaceBC(DIRICHLET, f.component(c)))
                else:
                    pair.append(FaceBC(f.kind, 0.0))
            rows.append(tuple(pair))
        return FieldBC(tuple(rows))


# No-slip box / channel presets used by the solvers.
def noslip_box_U() -> FieldBC:
    return FieldBC.box(DIRICHLET, 0.0)


def zerograd_box_p() -> FieldBC:
    return FieldBC.box(NEUMANN, 0.0)


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static (hashable) description of a uniform Cartesian grid.

    Hashability lets a `Grid` be closed over by jitted functions or passed
    as a static argument; all members are plain Python numbers.
    """

    shape: tuple[int, int, int]
    spacing: tuple[float, float, float]
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0)

    @staticmethod
    def cube(n: int, length: float = 1.0, origin=(0.0, 0.0, 0.0)) -> "Grid":
        h = length / n
        return Grid((n, n, n), (h, h, h), tuple(float(o) for o in origin))

    @staticmethod
    def box(shape: Sequence[int], lengths: Sequence[float], origin=(0.0, 0.0, 0.0)) -> "Grid":
        sp = tuple(float(L) / int(n) for L, n in zip(lengths, shape))
        return Grid(tuple(int(n) for n in shape), sp, tuple(float(o) for o in origin))

    # -- geometry -----------------------------------------------------------
    @property
    def ncells(self) -> int:
        nx, ny, nz = self.shape
        return nx * ny * nz

    @property
    def cell_volume(self) -> float:
        hx, hy, hz = self.spacing
        return hx * hy * hz

    @property
    def lengths(self) -> tuple[float, float, float]:
        return tuple(n * h for n, h in zip(self.shape, self.spacing))

    @property
    def upper(self) -> tuple[float, float, float]:
        return tuple(o + L for o, L in zip(self.origin, self.lengths))

    def cell_centers(self) -> jnp.ndarray:
        """(3, nx, ny, nz) array of cell-centre coordinates."""
        axes = [
            self.origin[a] + (jnp.arange(self.shape[a], dtype=jnp.float32) + 0.5) * self.spacing[a]
            for a in range(3)
        ]
        X, Y, Z = jnp.meshgrid(*axes, indexing="ij")
        return jnp.stack([X, Y, Z])

    def zeros_scalar(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros(self.shape, dtype)

    def zeros_vector(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((3,) + self.shape, dtype)

    def zeros_flux(self, dtype=jnp.float32):
        nx, ny, nz = self.shape
        return (
            jnp.zeros((nx + 1, ny, nz), dtype),
            jnp.zeros((nx, ny + 1, nz), dtype),
            jnp.zeros((nx, ny, nz + 1), dtype),
        )


# ---------------------------------------------------------------------------
# Ghost-cell padding
# ---------------------------------------------------------------------------

def _take_slab(f: jnp.ndarray, axis: int, index: int) -> jnp.ndarray:
    """One-cell slab at `index` along `axis`, keepdims."""
    return jax.lax.slice_in_dim(f, index if index >= 0 else f.shape[axis] + index,
                                (index if index >= 0 else f.shape[axis] + index) + 1, axis=axis)


def pad_axis(f: jnp.ndarray, axis: int, lo: FaceBC, hi: FaceBC, component: int | None = None) -> jnp.ndarray:
    """Append one ghost slab on each side of `axis` according to the BCs."""
    first = _take_slab(f, axis, 0)
    last = _take_slab(f, axis, -1)

    def ghost(face: FaceBC, interior: jnp.ndarray, other_edge: jnp.ndarray) -> jnp.ndarray:
        if face.kind == PERIODIC:
            return other_edge
        if face.kind == DIRICHLET:
            v = face.component(component) if component is not None else face.component(0)
            return 2.0 * v - interior
        if face.kind == NEUMANN:
            return interior
        if face.kind == SLIP:
            # zero normal component at the face, zero-gradient tangential
            if component is not None and component == axis:
                return -interior
            return interior
        raise ValueError(f"unknown BC kind {face.kind!r}")

    g_lo = ghost(lo, first, last)
    g_hi = ghost(hi, last, first)
    return jnp.concatenate([g_lo, f, g_hi], axis=axis)


def pad_scalar(f: jnp.ndarray, bc: FieldBC) -> jnp.ndarray:
    """(nx,ny,nz) -> (nx+2,ny+2,nz+2) with ghost shells from `bc`."""
    for axis in range(3):
        lo, hi = bc.faces[axis]
        f = pad_axis(f, axis, lo, hi)
    return f

def pad_vector(u: jnp.ndarray, bc: FieldBC) -> jnp.ndarray:
    """(3,nx,ny,nz) -> (3,nx+2,ny+2,nz+2), per-component Dirichlet values."""
    comps = []
    for c in range(3):
        fc = u[c]
        for axis in range(3):
            lo, hi = bc.faces[axis]
            fc = pad_axis(fc, axis, lo, hi, component=c)
        comps.append(fc)
    return jnp.stack(comps)


def interior(fp: jnp.ndarray) -> jnp.ndarray:
    """Strip the one-cell ghost shell: inverse of pad_scalar."""
    return fp[..., 1:-1, 1:-1, 1:-1]

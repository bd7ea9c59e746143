"""Masked-cell (immersed-boundary) obstacles on the uniform grid.

The reference inherits OpenFOAM's unstructured fvMesh, so any domain shape
is expressible by meshing (`/root/reference/icoFoamYade/icoFoamYade.C:41-42`;
the k-d tree exists because cell centres are an arbitrary cloud,
`/root/reference/FoamYade/meshtree/meshTree.C:9-37`). The TPU rebuild keeps
the uniform Cartesian grid (O(1) particle location, XLA-friendly static
shapes) and recovers non-box domains with a SOLID-CELL MASK woven into the
existing ``*_padded`` stencil + BC Ctx machinery:

* a static boolean field marks solid cells; faces between a solid cell and
  anything are BLOCKED (zero flux) — the stair-step approximation of the
  immersed surface at cell resolution;
* velocity is pinned to zero in solid cells each stage, so the momentum
  stencils of adjacent fluid cells see a no-slip wall at the solid cell
  centre (first-order immersed boundary — the same order as OpenFOAM's
  stair-stepped hex meshes of a curved wall at equal resolution);
* the pressure equation keeps only fluid-fluid faces (the face-gamma
  coefficients are masked), and solid rows are replaced by a scaled
  identity so the operator stays definite on the solid subspace and CG is
  untouched (`ops/pressure.solve_pressure(solid=...)`);
* boundary-face fluxes at blocked faces are pinned to zero exactly like
  `stencil.constrain_flux` pins wall faces (fixedFluxPressure role), so no
  mass leaks through the obstacle whenever body forces act.

Everything is static: the masks are compile-time constants folded into the
fused stencil HLO — a masked step costs a handful of elementwise
multiplies over what the unmasked step pays.

Scope: single-device and the local path of solver models (piso/pimple).
The sharded path does not slice the masks per shard yet (asserted at the
call site).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class ObstacleMasks(NamedTuple):
    """Static mask set for one solid-cell configuration.

    fluid/solid: (nx,ny,nz) f32 indicator fields (fluid + solid == 1).
    face: flux-shaped f32 masks — 1.0 on faces between two FLUID cells
    (domain-boundary faces follow their adjacent cell; the physical BC
    machinery owns them), 0.0 on any face touching a solid cell.
    n_solid: static int count of solid cells.
    """

    fluid: jnp.ndarray
    solid: jnp.ndarray
    face: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    n_solid: int


def build_masks(solid: np.ndarray,
                periodic: Tuple[bool, bool, bool]) -> ObstacleMasks:
    """Build the ObstacleMasks from a host-side boolean solid field.

    ``periodic`` controls the wrap adjacency of the two outermost face
    planes per axis; on non-periodic axes those planes take the adjacent
    cell's fluid flag (a solid cell touching the domain wall blocks the
    wall face too).
    """
    solid = np.asarray(solid, bool)
    assert solid.ndim == 3, "solid mask must be (nx, ny, nz)"
    fluid = ~solid
    f = fluid.astype(np.float32)
    faces = []
    for a in range(3):
        lo = np.take(f, range(f.shape[a]), axis=a)
        if periodic[a]:
            prev = np.roll(f, 1, axis=a)
            inner = prev * f                             # face i: cells i-1,i
            first = np.take(inner, [0], axis=a)          # wrap face
            m = np.concatenate([inner, first], axis=a)
        else:
            sl_lo = [slice(None)] * 3
            sl_lo[a] = slice(0, f.shape[a] - 1)
            sl_hi = [slice(None)] * 3
            sl_hi[a] = slice(1, f.shape[a])
            inner = f[tuple(sl_lo)] * f[tuple(sl_hi)]    # interior faces
            first = np.take(f, [0], axis=a)
            last = np.take(f, [-1], axis=a)
            m = np.concatenate([first, inner, last], axis=a)
        faces.append(jnp.asarray(m))
    return ObstacleMasks(
        fluid=jnp.asarray(f),
        solid=jnp.asarray(solid.astype(np.float32)),
        face=tuple(faces),
        n_solid=int(solid.sum()),
    )


def box_solid(grid_shape: Tuple[int, int, int],
              lo: Tuple[int, int, int],
              hi: Tuple[int, int, int]) -> np.ndarray:
    """Axis-aligned solid block: cells with lo <= idx < hi per axis."""
    s = np.zeros(grid_shape, bool)
    s[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
    return s


def mask_flux(phi, masks: ObstacleMasks):
    """Zero the flux through blocked faces (the obstacle analog of
    `stencil.constrain_flux`'s wall pinning)."""
    return tuple(phi[a] * masks.face[a] for a in range(3))


def mask_u(u: jnp.ndarray, masks: ObstacleMasks) -> jnp.ndarray:
    """Pin velocity to zero in solid cells (no-slip at cell centres)."""
    return u * masks.fluid[None]

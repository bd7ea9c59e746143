"""Checkpoint / resume: the whole coupled state in one snapshot.

The reference checkpoints only the fluid half — `runTime.write()` dumps the
AUTO_WRITE fields to time directories (`icoFoamYade.C:142`,
`createFields.H:24,58,72,108`) while particle state lives (or dies) with the
Yade process (SURVEY.md §5.4 calls this out as split-brain). Here the
`SimState` pytree — fluid fields AND particle arrays AND turbulence state
AND the time/step scalars — serializes atomically.

Two backends:
* orbax (preferred, async-capable, multi-host aware) when importable,
* a dependency-free msgpack-style .npz fallback.

Plus `write_time_dir`, an OpenFOAM-format ASCII field writer so existing
OpenFOAM post-processing (ParaView via .foam) can read our output — output
parity with the reference's time-directory convention.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fields import SimState

_MANIFEST = "manifest.json"


def _flatten(state: SimState):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def save(path, state: SimState, step: Optional[int] = None) -> str:
    """Save a SimState snapshot. Returns the snapshot directory."""
    base = Path(path)
    step = int(state.step) if step is None else step
    snap = base / f"step_{step:010d}"
    snap.mkdir(parents=True, exist_ok=True)

    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save((snap / "state").absolute(), jax.device_get(state), force=True)
        backend = "orbax"
    except Exception:
        leaves, _ = _flatten(state)
        np.savez_compressed(
            snap / "state.npz",
            **{f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)},
        )
        backend = "npz"

    (snap / _MANIFEST).write_text(json.dumps({
        "backend": backend,
        "step": step,
        "t": float(state.t),
        "dt": float(state.dt),
        "n_particles": int(state.particles.pos.shape[0]),
    }))
    (base / "latest").write_text(snap.name)
    return str(snap)


def latest_step(path) -> Optional[int]:
    base = Path(path)
    marker = base / "latest"
    if not marker.exists():
        return None
    return int(marker.read_text().strip().split("_")[-1])


def restore(path, template: SimState, step: Optional[int] = None) -> SimState:
    """Restore into the shape/dtype structure of `template` (the restart
    analog of OpenFOAM's `startFrom latestTime`)."""
    base = Path(path)
    if step is None:
        name = (base / "latest").read_text().strip()
    else:
        name = f"step_{step:010d}"
    snap = base / name
    manifest = json.loads((snap / _MANIFEST).read_text())

    if manifest["backend"] == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore((snap / "state").absolute(), item=jax.device_get(template))
        return jax.tree.map(jnp.asarray, restored)

    data = np.load(snap / "state.npz")
    leaves, treedef = _flatten(template)
    new_leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


# ---------------------------------------------------------------------------
# OpenFOAM-format time-directory output (ParaView-compatible)
# ---------------------------------------------------------------------------

_FOAM_HEADER = """FoamFile
{{
    version     2.0;
    format      ascii;
    class       {cls};
    object      {obj};
}}
"""


def _xfastest(a: np.ndarray) -> np.ndarray:
    """(nx,ny,nz) C-order array -> flat vector in OpenFOAM/blockMesh cell
    ordering (x-fastest): value order must match `foammesh.cell_ids`."""
    return a.transpose(2, 1, 0).reshape(-1)


def _write_foam_field(path: Path, name: str, arr: np.ndarray, is_vector: bool):
    from .foammesh import PATCH_NAMES
    cls = "volVectorField" if is_vector else "volScalarField"
    with open(path, "w") as f:
        f.write(_FOAM_HEADER.format(cls=cls, obj=name))
        dims = "[0 1 -1 0 0 0 0]" if is_vector else "[0 2 -2 0 0 0 0]"
        f.write(f"dimensions      {dims};\n\n")
        if is_vector:
            vals = np.stack([_xfastest(arr[c]) for c in range(3)], axis=-1)
            f.write(f"internalField   nonuniform List<vector>\n{vals.shape[0]}\n(\n")
            f.write("\n".join(f"({v[0]:.8g} {v[1]:.8g} {v[2]:.8g})" for v in vals))
        else:
            vals = _xfastest(arr)
            f.write(f"internalField   nonuniform List<scalar>\n{vals.shape[0]}\n(\n")
            f.write("\n".join(f"{v:.8g}" for v in vals))
        f.write("\n);\n\nboundaryField\n{\n")
        for p in PATCH_NAMES:
            f.write(f"    {p}\n    {{\n        type            zeroGradient;\n    }}\n")
        f.write("}\n")


_CONTROL_DICT = """FoamFile
{
    version     2.0;
    format      ascii;
    class       dictionary;
    location    "system";
    object      controlDict;
}
application     icoFoamYade;
startFrom       latestTime;
writeControl    timeStep;
writeInterval   1;
"""


def write_case_skeleton(case_dir, grid) -> None:
    """Emit the once-per-case companions the reference inherits from its
    OpenFOAM case layout: constant/polyMesh (via `foammesh`), a minimal
    system/controlDict, and the `case.foam` stub ParaView's reader opens."""
    from .foammesh import write_polymesh
    base = Path(case_dir)
    if not (base / "constant" / "polyMesh" / "points").exists():
        write_polymesh(base, grid)
    sysdir = base / "system"
    sysdir.mkdir(parents=True, exist_ok=True)
    cd = sysdir / "controlDict"
    if not cd.exists():
        cd.write_text(_CONTROL_DICT)
    (base / "case.foam").touch()


def write_time_dir(case_dir, state: SimState, fields=("p", "U", "alpha"),
                   grid=None) -> str:
    """Write fluid fields in OpenFOAM ASCII format under <case>/<time>/ —
    the analog of the reference's `runTime.write()` output layout. Pass
    `grid` to also emit the constant/polyMesh companion (once per case) so
    the output opens directly in ParaView / OpenFOAM post-processing."""
    t = float(state.t)
    if grid is not None:
        write_case_skeleton(case_dir, grid)
    tdir = Path(case_dir) / f"{t:.6g}"
    tdir.mkdir(parents=True, exist_ok=True)
    fs = state.fluid
    if "p" in fields:
        _write_foam_field(tdir / "p", "p", np.asarray(fs.p), False)
    if "U" in fields:
        _write_foam_field(tdir / "U", "U", np.asarray(fs.u), True)
    if "alpha" in fields:
        _write_foam_field(tdir / "alpha", "alpha.air", np.asarray(fs.alpha), False)
    # particle cloud in a simple positions file (Yade-side state, which the
    # reference never writes from the Foam side)
    act = np.asarray(state.particles.active)
    pos = np.asarray(state.particles.pos)[act]
    np.savetxt(tdir / "particles.xyz", pos, fmt="%.8g")
    return str(tdir)

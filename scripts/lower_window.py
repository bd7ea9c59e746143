"""Client-side Mosaic lowering check for the window exchange kernel.

Mosaic verification errors (block rules, tpu.iota types, layout ops) fire
during jit lowering on the CLIENT, before the minutes-long remote compile —
this catches them in seconds. No TPU execution happens.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/lower_window.py
"""

import sys

import numpy as np


def main():
    big = "--big" in sys.argv   # the 256^3/1M north-star shape (W-chunked)
    import jax
    import jax.numpy as jnp

    from yade_openfoam_coupling_tpu.ops import coupling as cp
    from yade_openfoam_coupling_tpu.ops import coupling_window as cw
    from yade_openfoam_coupling_tpu.ops.grid import Grid

    nx, N = (256, 1_000_000) if big else (128, 100_000)
    length = 1e-3 * nx
    grid = Grid.cube(nx, length)
    cfg = cp.CouplingConfig(gaussian=True, lag_alpha=True,
                            stencil_shape="sphere2", exchange="window",
                            slot_capacity=4, dy_in_kernel=True)
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(0.1 * length, 0.9 * length, (N, 3)),
                      jnp.float32)
    pf = cp.ParticleFields(
        pos=pos, vel=jnp.zeros((N, 3), jnp.float32),
        angvel=jnp.zeros((N, 3), jnp.float32),
        radius=jnp.full((N,), 4e-4, jnp.float32),
        active=jnp.ones((N,), bool),
    )
    u = jnp.zeros((3,) + grid.shape, jnp.float32)
    alpha = jnp.ones(grid.shape, jnp.float32)

    def fn(pf, u, alpha):
        return cw.gaussian_coupling_window(
            pf, u, u, u, u, u, grid, (True, True, False),
            1e-6, 1000.0, jnp.float32(5e-5), cfg, prev_alpha=alpha,
            interpret=False,
        )

    lowered = jax.jit(fn).lower(pf, u, alpha)
    _ = lowered.compiler_ir()
    print("LOWER OK (Mosaic verification passed)")


if __name__ == "__main__":
    main()

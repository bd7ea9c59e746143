"""Prototype: dynamic per-plane chunk-count staging loop for the window
kernel. Tests (a) that Mosaic accepts a `lax.fori_loop` whose trip count is
read from an SMEM ref (client-side lowering check), and (b) numerical
equivalence vs the static loop in interpret mode on CPU.

The window staging work currently scales as nx * W (every plane pays the
max-occupancy window); with a dynamic bound each plane pays only
ceil(count_i / w_chunk) chunks — ~2.5x less staging at both the tracked
(47^3 lattice on 128 planes) and 1M (100^3 on 256) benchmark distributions.

Usage:
  lowering:  env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/proto_dynwin.py
  interpret: env _YOFC_TEST_REEXEC=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
             PYTHONPATH=/root/repo python -u scripts/proto_dynwin.py --cpu
"""

import sys
from functools import partial

import numpy as np


def main():
    cpu = "--cpu" in sys.argv
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    if not cpu:
        from jax.experimental.pallas import tpu as pltpu

    ny, nz, W, w_chunk, cap = 128, 128, 2048, 512, 4
    nxl = 8

    def kernel(nch_ref, dat_ref, out_ref, *, dynamic):
        i = pl.program_id(0)
        Wd = dat_ref.shape[2]
        n_ch_static = Wd // w_chunk

        def body(k, D):
            dwc = dat_ref[0, :, pl.ds(k * w_chunk, w_chunk)]
            y = dwc[1].astype(jnp.int32)
            ohyT = (jax.lax.broadcasted_iota(jnp.int32, (ny, w_chunk), 0)
                    == y[None, :]).astype(jnp.bfloat16)
            E = (dwc[0][:, None] * jnp.ones((w_chunk, nz), jnp.float32)
                 ).astype(jnp.bfloat16)
            t = jax.lax.dot_general(ohyT, E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return D + t

        bound = nch_ref[i] if dynamic else n_ch_static
        D = jax.lax.fori_loop(0, bound, body,
                              jnp.zeros((ny, nz), jnp.float32))
        out_ref[0] = D

    def run(dat, nch, dynamic):
        smem = ({} if cpu else {"memory_space": pltpu.SMEM})
        f = pl.pallas_call(
            partial(kernel, dynamic=dynamic),
            grid=(nxl,),
            in_specs=[
                pl.BlockSpec((nxl,), lambda i: (0,), **smem),
                pl.BlockSpec((1, 2, W), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nxl, ny, nz), jnp.float32),
            interpret=cpu,
        )
        return f(nch, dat)

    rng = np.random.RandomState(0)
    counts = np.array([0, 2048, 512, 0, 1536, 0, 0, 100], np.int32)
    dat = np.zeros((nxl, 2, W), np.float32)
    for i, c in enumerate(counts):
        dat[i, 0, :c] = rng.randn(c)
        dat[i, 1, :c] = rng.randint(0, ny, c)
        dat[i, 1, c:] = -1.0          # matches nothing
    nch = np.ceil(counts / w_chunk).astype(np.int32)
    dat, nch = jnp.asarray(dat), jnp.asarray(nch)

    if cpu:
        a = run(dat, nch, dynamic=False)
        b = run(dat, nch, dynamic=True)
        err = float(jnp.max(jnp.abs(a - b)))
        print("interpret max|static - dynamic| =", err)
        assert err == 0.0
        print("CPU EQUIVALENCE OK")
    else:
        lowered = jax.jit(partial(run, dynamic=True)).lower(dat, nch)
        _ = lowered.compiler_ir()
        print("LOWER OK (dynamic fori_loop bound from SMEM accepted)")


if __name__ == "__main__":
    main()

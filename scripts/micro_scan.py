"""Microbenchmark: prefix-max variants for rank_in_sorted_segments on TPU.

The associative_scan version measured ~10 ms for N=100k — launch-bound
(2 log2 N tiny kernels). Candidates: lax.cummax, and a 2-level blocked
shift-max scan (log passes over a (N/128, 128) view, fusable).
"""

import sys
import time

import numpy as np


def blocked_cummax(x, block=512):
    """Prefix max via a 2-level blocked scan: log2(block) shift-max passes
    within rows (fusable elementwise/static-slice chain) + a tiny row-carry
    scan + one broadcast combine."""
    import jax.numpy as jnp
    n = x.shape[0]
    b = block
    nrow = -(-n // b)
    pad = nrow * b - n
    neg = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf
    xp = jnp.concatenate([x, jnp.full((pad,), neg, x.dtype)]) if pad else x
    X = xp.reshape(nrow, b)
    s = 1
    while s < b:
        shifted = jnp.concatenate([jnp.full((nrow, s), neg, X.dtype), X[:, :-s]], axis=1)
        X = jnp.maximum(X, shifted)
        s *= 2
    row_tot = X[:, -1]
    s = 1
    R = row_tot
    while s < nrow:
        shifted = jnp.concatenate([jnp.full((s,), neg, R.dtype), R[:-s]])
        R = jnp.maximum(R, shifted)
        s *= 2
    carry = jnp.concatenate([jnp.full((1,), neg, R.dtype), R[:-1]])
    X = jnp.maximum(X, carry[:, None])
    return X.reshape(-1)[:n]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/yofc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from jax import lax

    N = 100_000
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(np.sort(rng.randint(0, 1 << 20, N)), jnp.int32)

    def timeit(name, fn, k=8):
        def make(n):
            def go():
                def body(x, _):
                    y = fn(x)
                    return x ^ y, None
                x, _ = jax.lax.scan(body, x0, None, length=n)
                return jnp.sum(x)
            return jax.jit(go)
        f1, fk = make(1), make(k)
        float(f1()); float(fk())
        best = None
        for _ in range(2):
            t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
            t2 = time.perf_counter(); float(fk()); t3 = time.perf_counter()
            ms = ((t3 - t2) - (t1 - t0)) / (k - 1) * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{name:28s} {best:9.3f} ms/iter", flush=True)

    idx = jnp.arange(N, dtype=jnp.int32)
    timeit("associative_scan max", lambda x: lax.associative_scan(jnp.maximum, x))
    timeit("lax.cummax", lambda x: lax.cummax(x))
    timeit("blocked cummax (512)", lambda x: blocked_cummax(x, 512))
    timeit("blocked cummax (1024)", lambda x: blocked_cummax(x, 1024))


if __name__ == "__main__":
    main()

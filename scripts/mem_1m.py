"""HBM memory analysis of the 1M/256^3 north-star step.

Hypothesis (round 5): the isolated-stage wins (substep unroll -290 ms,
dynamic window) do NOT compose in the full step because the program runs
at ~15.75/16 GB HBM — XLA serializes and spills under allocation
pressure. This prints the compiled program's own accounting
(argument/output/temp/peak bytes) for the exact bench_1m program, with
and without input-state donation.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/mem_1m.py --fast [--no-donate]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_1m import build_case  # noqa: E402


def human(n):
    return f"{n / 2**30:8.3f} GiB"


def main():
    import jax
    from yade_openfoam_coupling_tpu.models import coupled as cd

    cfg, state = build_case(sys.argv)
    run = cd.make_scan_fn(cfg, 3, donate="--no-donate" not in sys.argv)
    lowered = run.lower(state)
    print("lowered; compiling (cache: /tmp/yofc_jax_cache)...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is None:
        print("memory_analysis() unavailable on this backend")
        return
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k:32s} {human(v)}")
    tot = (getattr(ma, "argument_size_in_bytes", 0)
           + getattr(ma, "output_size_in_bytes", 0)
           + getattr(ma, "temp_size_in_bytes", 0)
           - getattr(ma, "alias_size_in_bytes", 0))
    print(f"{'peak (arg+out+temp-alias)':32s} {human(tot)}")


if __name__ == "__main__":
    main()

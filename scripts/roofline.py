"""Roofline / utilization accounting for the tracked benchmark step.

Models the HBM bytes each stage of the coupled step must move on a v5e
chip (819 GB/s HBM, 16 GB), from the measured per-primitive cost model of
PERF.md:

* full-field sweep: ncells * 4 B per channel read or written (fp32);
* random-indexed gather row ~7 ns, scatter row ~60 ns (sorted ~35), with
  512 B of HBM touched per row (one (8,128) f32 tile transaction);
* lane-padded (n, c<128) tables: n * 512 B per materialized pass.

Combined with the measured stage times this gives achieved GB/s and "% of
HBM roofline" — the first-principles answer to "is X ms/step good?". The
step is bandwidth/latency-bound by design (the only MXU work is the MG
coarse ops), so HBM utilization is the right roofline axis.

Measured times below are the round-2 ledger (PERF.md); re-run
scripts/profile_stages.py / micro_planes.py to refresh.
"""

GB = 1e9
HBM_BW = 819e9          # v5e HBM bandwidth, B/s
F32 = 4

# tracked config
NCELLS = 128 ** 3
N = 100_000
S = 19                  # sphere2 stencil
CAP = 4                 # slot capacity
C_IN = 10               # u3 + gradP3 + divTau3 + alpha
C_OUT = 8               # pvol + up3 + drag + src3
MG_ITERS = 8
N_SUB = 4
M = 8                   # DEM max_neighbors
NBIN = 106 ** 3
DCAP = 4

SWEEP = NCELLS * F32


def model():
    st = {}
    # --- planes exchange ---------------------------------------------------
    st["exchange.bin"] = (
        2 * N * 512                    # argsort passes (rough) + reorder gather
        + N * 512                      # sorted one-hot scatter rows
        + 2 * NCELLS * 512             # (ncells,32->128pad) staging init+read
        + C_OUT * CAP * SWEEP          # transposed D write
    )
    st["exchange.interp"] = (
        3 * (C_IN * SWEEP)             # 3 halo plane views of F
        + 4 * CAP * SWEEP              # pos/act planes
        + (C_IN + 1) * CAP * SWEEP     # G + norm write
    )
    st["exchange.deposit"] = (
        4 * CAP * SWEEP + C_OUT * CAP * SWEEP      # pos + V reads
        + 9 * C_OUT * SWEEP                        # 9 combo stacks write
        + 3 * 9 * C_OUT * SWEEP                    # roll epilogue r/r/w
    )
    st["exchange.physics+unbin"] = (
        (C_IN + 1 + C_OUT + 7 + 8) * CAP * SWEEP   # slot-plane passes
        + NCELLS * 512                             # unbin transpose (padded)
        + N * 512                                  # unbin row gather
    )
    # --- DEM ---------------------------------------------------------------
    st["dem.list"] = (
        N * 512                        # bin scatter
        + 28 * NBIN * DCAP * F32       # fused rolls
        + NBIN * DCAP * 512            # transposed (slots,27->128) table write
        + N * DCAP * 512               # cap-row gather
        + 3 * N * 27 * DCAP * F32      # top_k passes
    )
    st["dem.forces"] = (N_SUB + 1) * (N * M * 512 + 4 * N * 128 * F32)
    # --- fluid ---------------------------------------------------------------
    st["fluid.pressure"] = MG_ITERS * 13 * SWEEP
    st["fluid.momentum+turb"] = 37 * SWEEP
    st["glue (state updates, inputs)"] = 30 * SWEEP
    return st


MEASURED_MS = {
    "exchange.bin": 14.3,
    "exchange.interp": 6.6,
    "exchange.deposit": 8.8,
    "exchange.physics+unbin": 9.7,
    "dem.list": 23.2,
    "dem.forces": 9.0,
    "fluid.pressure": None,            # fluid total 19.7 (split not measured)
    "fluid.momentum+turb": None,
    "glue (state updates, inputs)": None,
}
FULL_STEP_MS = 109.2


def main():
    st = model()
    print(f"tracked config: {N} particles, 128^3 grid, S={S}, cap={CAP}\n")
    print(f"{'stage':30s} {'modeled GB':>10s} {'measured ms':>12s} "
          f"{'achieved GB/s':>14s} {'% HBM roofline':>15s}")
    total = 0.0
    for k, b in st.items():
        t = MEASURED_MS.get(k)
        line = f"{k:30s} {b / GB:10.3f}"
        if t:
            gbs = b / (t * 1e-3)
            line += f" {t:12.1f} {gbs / GB:14.1f} {100 * gbs / HBM_BW:14.1f}%"
        total += b
    # recompute printing in order with running
    for k, b in st.items():
        t = MEASURED_MS.get(k)
        line = f"{k:30s} {b / GB:10.3f}"
        if t:
            gbs = b / (t * 1e-3)
            line += f" {t:12.1f} {gbs / GB:14.1f} {100 * gbs / HBM_BW:14.1f}%"
        print(line)
    sol_ms = total / HBM_BW * 1e3
    print(f"\ntotal modeled: {total / GB:.2f} GB;  full step measured "
          f"{FULL_STEP_MS} ms -> {total / (FULL_STEP_MS * 1e-3) / GB:.0f} GB/s "
          f"= {100 * total / (FULL_STEP_MS * 1e-3) / HBM_BW:.1f}% of HBM roofline")
    print(f"speed-of-light step (all stages at 819 GB/s): {sol_ms:.1f} ms "
          f"-> {1e3 / sol_ms:.0f} steps/s ceiling (single chip)")


if __name__ == "__main__":
    main()

"""Roofline / utilization accounting for the tracked benchmark step.

Models the HBM bytes each stage of the coupled step must move on a v5e
chip (819 GB/s HBM, 16 GB), using the measured per-primitive cost model of
PERF.md:

* full-field sweep: ncells * 4 B per channel read or written (fp32);
* random-indexed row (gather or scatter): 512 B of HBM touched per index
  row (one (8,128) f32 tile transaction) — payload channels ride along;
* lane-padded (n, c<128) transients: n * 128 * 4 B per materialized pass.

Combining modeled bytes with measured stage times gives achieved GB/s and
"% of HBM roofline" — the first-principles answer to "is X ms/step good?".
FLOPs are negligible by comparison for every stage except the slot-table
einsums (reported), so the step is bandwidth/latency-bound by design and
HBM utilization is the right roofline axis.

Usage:
  python scripts/roofline.py                   # model + PERF.md table
  python scripts/roofline.py --ms full=145 ...  # plug in measured times
"""

import sys

GB = 1e9
HBM_BW = 819e9          # v5e HBM bandwidth, B/s
ROW_B = 512             # HBM bytes touched per random-indexed row (measured)
F32 = 4


def tracked_config():
    return dict(
        nx=128, n_particles=100_000, S=19,      # sphere2 stencil
        mg_iters=8,                              # observed MG-PCG iterations
        n_sub=4, M=8,                            # DEM substeps / max_neighbors
        nbin=64 ** 3,                            # DEM hash bins (128^3 mesh, bin=2r(1+skin)~2mm=2h)
        cap=4,                                   # DEM bin capacity
        slot_cap=4,                              # slot-table capacity
    )


def model(c):
    ncells = c["nx"] ** 3
    N = c["n_particles"]
    S = c["S"]
    sweep = ncells * F32                         # one channel, one pass

    st = {}

    # -- coupling input stencils: gradP (r1+w3), alpha faces (r1+w3),
    #    divTau (r6+w3) -> ~17 channel sweeps
    st["inputs"] = 17 * sweep

    # -- sparse exchange: weights (N,S) build (2 lane-padded passes),
    #    (N*S)-row input gather, N-row deposit scatter + S roll-out sweeps
    #    of the 8-channel deposit stack, N*S-row weight apply passes
    st["exchange_sparse"] = (
        2 * N * 128 * F32                        # (N,S) d2 + weights, lane-padded
        + N * S * ROW_B                          # input gather rows
        + N * ROW_B                              # anchor deposit rows
        + S * 8 * sweep                          # roll-distribute 8 channels
        + 4 * N * 128 * F32                      # per-particle (N,S,c) transients
    )

    # -- slot-table exchange: N-row bin scatter + N-row unbin gather;
    #    everything else is dense: W (ncells, cap, S) build/read ~3 passes,
    #    S rolled field stacks (gather einsum reads S*C sweeps), deposit
    #    einsum + S*C roll-out sweeps
    cap = c["slot_cap"]
    W_bytes = ncells * cap * S * F32
    st["exchange_slots"] = (
        2 * N * ROW_B                            # bin scatter + unbin gather
        + 3 * W_bytes                            # W build + 2 einsum reads
        + S * 4 * sweep                          # rolled input stack (4 ch)
        + S * 8 * sweep                          # deposit roll-out (8 ch)
        + 2 * ncells * cap * 11 * F32            # slot data table write+read
    )
    # einsum flops: gather G = W@F  2*ncells*cap*S*C for C~4+8
    st["exchange_slots_flops"] = 2 * ncells * cap * S * 12

    # -- DEM: list build (N-row bin scatter, 27 rolls of the fused
    #    (nbin*cap) table, N-row candidate gather of 27*cap ids ->
    #    27*cap*4B payload/row but >=512B, top_k pass) + per-substep force
    #    eval ((N*M)-row data gather)
    nbin, dcap, M, n_sub = c["nbin"], c["cap"], c["M"], c["n_sub"]
    cand_row = max(27 * dcap * 4, ROW_B)
    st["dem_list"] = (
        N * ROW_B                                # bin scatter
        + 28 * nbin * dcap * F32                 # roll-concat of fused table
        + N * cand_row                           # candidate row gather
        + 3 * N * 27 * dcap * F32                # top_k compaction passes
    )
    n_evals = n_sub + 1                          # velocity-Verlet: 1 + one/substep
    st["dem_forces"] = n_evals * (N * M * ROW_B + 4 * N * 128 * F32)

    # -- fluid: MG-PCG pressure (per iteration: ~5 sweeps level-0 stencil
    #    apply/axpy + V-cycle ~2x level-0 equivalent), momentum assembly
    #    ~20 sweeps, turbulence kEqn ~12 sweeps
    it = c["mg_iters"]
    st["pressure"] = it * (5 + 8) * sweep
    st["momentum"] = 25 * sweep
    st["turbulence"] = 12 * sweep
    st["diagnostics"] = 8 * sweep
    return st


def main():
    ms = {}
    for a in sys.argv[1:]:
        if a.startswith("--ms"):
            continue
        if "=" in a:
            k, v = a.split("=", 1)
            ms[k] = float(v)

    c = tracked_config()
    st = model(c)
    print(f"tracked config: {c['n_particles']} particles, {c['nx']}^3 grid, "
          f"S={c['S']}, {c['n_sub']} DEM substeps\n")
    print(f"{'stage':24s} {'modeled GB':>10s} {'measured ms':>12s} "
          f"{'achieved GB/s':>14s} {'% HBM roofline':>15s}")
    total_b = 0.0
    for k, b in st.items():
        if k.endswith("_flops"):
            continue
        t = ms.get(k)
        if k.startswith("exchange_") and f"{k.split('_')[1]}" not in str(ms):
            pass
        gbs = (b / (t * 1e-3)) / GB if t else None
        line = f"{k:24s} {b / GB:10.3f}"
        if t:
            line += f" {t:12.1f} {gbs:14.1f} {100 * gbs * GB / HBM_BW:14.1f}%"
        print(line)
        total_b += b
    # speed-of-light step time if every stage ran at full HBM bandwidth
    # (counting only one exchange variant)
    sol = (total_b - min(st["exchange_sparse"], st["exchange_slots"])) / HBM_BW
    print(f"\nspeed-of-light step (all stages at {HBM_BW/1e9:.0f} GB/s): "
          f"{sol*1e3:.1f} ms  ->  {1/sol:.0f} steps/s ceiling")


if __name__ == "__main__":
    main()

"""Communication / scaling budget for the sharded DAS step (analytic).

Real multi-chip hardware is not available in this deployment (one v5e chip
through a tunnel), so the ≥85 % scaling claim (BASELINE north star) is
backed three ways:
  1. correctness of every sharding on the 8-virtual-device CPU mesh
     (tests/test_parallel.py, __graft_entry__.dryrun_multichip);
  2. THIS analytic budget: per-shard FLOPs / HBM traffic vs ICI collective
     bytes per step, against published v5e roofline numbers;
  3. the measured single-chip step time (bench.py) as the compute term.

Model (per 5.24 ms block, per chip):
  - channel sharding ('ch' axis n_ch): each chip beamforms its C/n_ch
    channels into FULL [D, T] partial beams, then one psum over 'ch'
    moves ~2 * (n_ch-1)/n_ch * D*T*bytes per chip (bidirectional ring
    all-reduce).  Compute scales 1/n_ch; the psum payload does NOT scale
    down — channel sharding pays for itself only while psum time is small
    against the shrinking compute.
  - direction sharding ('dir' axis n_dir): zero communication; compute
    scales 1/n_dir.  The fft backend replicates (compute is already tiny)
    and slices; the dense backend shards its stencil rows.
  - time sharding ('t' axis n_t): one neighbor ppermute halo of
    S+taps samples per channel shard edge: C * (S+taps) * bytes per step.

Run:  python scripts/comm_budget.py [--mesh ch,dir ...]
"""

from __future__ import annotations

import argparse
import json

# v5e (lite) public roofline numbers.
BF16_MACS = 98.5e12          # 197 TFLOP/s bf16 -> MAC/s
ICI_BW = 2 * 45e9            # bytes/s per link direction x 2 links usable
SAMPLE_RATE = 48828.0
BLOCK_T = 256
BLOCK_S = 5.24e-3


def das_budget(c=256, d=65 * 65, t=BLOCK_T, s=64, n_ch=1, n_dir=1,
               bytes_per=2, measured_1chip_s=None):
    """Per-block times for the dense channel+direction-sharded DAS step."""
    macs = d * c * s * t                      # dense stencil contraction
    macs_local = macs / (n_ch * n_dir)
    compute_s = macs_local / BF16_MACS
    if measured_1chip_s is not None:
        # Anchor on the measured single-chip step instead of peak MACs.
        compute_s = measured_1chip_s / (n_ch * n_dir)
    # Ring all-reduce of [D/n_dir, T] partial beams over the ch axis.
    psum_bytes = (
        0 if n_ch == 1 else 2 * (n_ch - 1) / n_ch * (d / n_dir) * t * 4
    )
    psum_s = psum_bytes / ICI_BW
    step_s = compute_s + psum_s
    ideal = (measured_1chip_s or (macs / BF16_MACS)) / (n_ch * n_dir)
    return {
        "mesh": f"(ch={n_ch}, dir={n_dir})",
        "compute_ms": round(compute_s * 1e3, 4),
        "psum_MB": round(psum_bytes / 1e6, 3),
        "psum_ms": round(psum_s * 1e3, 4),
        "step_ms": round(step_s * 1e3, 4),
        "scaling_efficiency": round(ideal / step_s, 3),
        "realtime_x": round(BLOCK_S / step_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured single-chip dense step ms (bench.py "
                         "dense_bf16: 1000/4500 ~= 0.222)")
    args = ap.parse_args()
    meshes = [(1, 1), (1, 2), (1, 4), (1, 8), (2, 1), (4, 1), (8, 1),
              (2, 4), (4, 2), (2, 2)]
    rows = [
        das_budget(
            n_ch=ch, n_dir=dr,
            measured_1chip_s=(
                None if args.measured_ms is None else args.measured_ms / 1e3
            ),
        )
        for ch, dr in meshes
    ]
    for r in rows:
        print(json.dumps(r))
    best = max(rows[1:], key=lambda r: r["scaling_efficiency"])
    print(f"# best multi-chip efficiency: {best['mesh']} "
          f"-> {best['scaling_efficiency'] * 100:.1f}%")


if __name__ == "__main__":
    main()

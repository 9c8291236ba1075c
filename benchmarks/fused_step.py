"""Benchmark: the full fused AWPU step on one chip.

Measures blocks/s of the flagship ``make_awpu_step`` program — MIMO 64x64
heatmap + 10-iteration gradient tracker swarm + MISO beam, 64 mics,
256-sample blocks — i.e. everything the reference's three worker threads do
per block (``src/dsp/mimo.cpp``, ``src/dsp/gradient_ascend.cpp``,
``src/dsp/miso.cpp``), as ONE device program.

Methodology matches bench.py (remote-tunnel safe): N blocks chained in one
jitted ``lax.scan`` (``step.scan``), synced by host-fetching a small output,
fixed overhead removed by differencing two scan lengths.

Variants:
  f32        — full-precision parity path (heatmap + probes f32 HIGHEST)
  bf16_mimo  — bf16 heatmap contraction, f32 probes (old production config)
  bf16_all   — bf16 heatmap AND bf16 monopulse probe beams (f32 accumulate;
               tracker accuracy validated by tracking_accuracy.py)

All variants use the aperture-sized probe stencil (ops.delay.probe_span —
32 instead of 64 samples for the 8x8 array), which is exact.

Prints one line per variant to stdout; run with JAX_PLATFORMS unset for TPU.
"""

from __future__ import annotations

import dataclasses
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beamforming_lk_tpu.app import awpu_init, make_awpu_step  # noqa: E402
from beamforming_lk_tpu.config import (  # noqa: E402
    Config,
    DspConfig,
    MimoConfig,
    TrackerConfig,
)
from beamforming_lk_tpu.ops import antenna as ant  # noqa: E402

SAMPLE_RATE = 48828.0
BLOCK = 256
# Differenced span must dwarf the tunnel's multi-ms dispatch jitter: at
# ~70 us/block the r04 span of 96 blocks was ~7 ms — inside the jitter —
# and produced ±10 % run-to-run swings.  ~2k blocks ≈ 0.15 s of device
# time per differenced span (min-of-3) holds the estimate to ~±2 %.
# Both counts are multiples of 24 (pool tile 8 x fused_chunk 12).
N_SMALL = 24
N_LARGE = int(os.environ.get("FUSED_N_LARGE", "2064"))


def timed_rate(scan_step, state, blocks_small, blocks_large):
    _, out = scan_step(state, blocks_small)  # compile + warm
    np.asarray(out.prev_max)
    _, out = scan_step(state, blocks_large)  # compile the large length too
    np.asarray(out.prev_max)

    def run(blocks):
        t0 = time.perf_counter()
        _, out = scan_step(state, blocks)
        np.asarray(out.prev_max)
        return time.perf_counter() - t0

    t_small = min(run(blocks_small) for _ in range(3))
    t_large = min(run(blocks_large) for _ in range(3))
    dt = t_large - t_small
    if dt <= 0:  # tunnel-latency jitter swamped the difference
        return float("nan")
    return (N_LARGE - N_SMALL) / dt


def main():
    signal.signal(
        signal.SIGALRM,
        lambda *_: (print("# DEADLINE", file=sys.stderr), os._exit(1)),
    )
    signal.alarm(int(os.environ.get("BENCH_DEADLINE_S", "2400")))

    base = Config()
    variants = {
        "f32": base,
        "bf16_mimo": dataclasses.replace(
            base, dsp=DspConfig(compute="bfloat16")
        ),
        "bf16_all": dataclasses.replace(
            base, dsp=DspConfig(compute="bfloat16", probe_compute="bfloat16")
        ),
        # bf16 probes + separable frequency-domain heatmap (ops/fft_das.py)
        "bf16_fft": dataclasses.replace(
            base,
            dsp=DspConfig(compute="bfloat16", probe_compute="bfloat16"),
            mimo=MimoConfig(backend="fft"),
        ),
        # Real-time-faithful tracker cadence: the reference's update loop
        # runs only until the next block lands (~1-2 iterations at real
        # time, gradient_ascend.cpp:315); our default of 10 is a
        # deterministic superset.  iterations=2 is the deployment profile.
        "bf16_fft_iter2": dataclasses.replace(
            base,
            dsp=DspConfig(compute="bfloat16", probe_compute="bfloat16"),
            mimo=MimoConfig(backend="fft"),
            tracker=TrackerConfig(iterations=2),
        ),
        # + the monopulse chain as one Pallas kernel per swarm iteration
        # (ops/pallas_tracker.py, ~2x faster per round than the XLA chain).
        "bf16_fft_iter2_pallas": dataclasses.replace(
            base,
            dsp=DspConfig(compute="bfloat16", probe_compute="bfloat16"),
            mimo=MimoConfig(backend="fft"),
            tracker=TrackerConfig(iterations=2, probe_kernel="pallas"),
        ),
        # + display-rate heatmap decimation: recompute the heatmap every
        # 3rd block (the reference UI consumes ~60 fps = every ~3rd block
        # at the 190.7 block/s cadence, aw_control_unit.cpp:189); tracker
        # and MISO still run every block.
        "bf16_fft_iter2_pallas_hm3": dataclasses.replace(
            base,
            dsp=DspConfig(compute="bfloat16", probe_compute="bfloat16"),
            mimo=MimoConfig(backend="fft", heatmap_every=3),
            tracker=TrackerConfig(iterations=2, probe_kernel="pallas"),
        ),
        # In-kernel windowed-sinc FIR stencil (8-tap polyphase quality
        # variant) at the deployment cadence — quantifies the cost of the
        # higher-quality interpolation inside the whole-swarm kernel.
        "bf16_fft_iter2_pallas_fir": dataclasses.replace(
            base,
            dsp=DspConfig(
                compute="bfloat16", probe_compute="bfloat16", interp="fir"
            ),
            mimo=MimoConfig(backend="fft"),
            tracker=TrackerConfig(iterations=2, probe_kernel="pallas"),
        ),
        # + chunked streaming: 12 consecutive blocks' whole swarm updates
        # per pallas_call (swarm_chunk_pallas) with the window folds / RNG
        # / reference powers batched per chunk, heatmap decimation batched
        # at the chunk level — the throughput/replay shape (per-block
        # outputs identical, test_fused_chunk_matches_per_block).
        "bf16_fft_iter2_pallas_hm3_x12": dataclasses.replace(
            base,
            dsp=DspConfig(
                compute="bfloat16", probe_compute="bfloat16",
                fused_chunk=int(os.environ.get("FUSED_CHUNK", "12")),
            ),
            mimo=MimoConfig(backend="fft", heatmap_every=3),
            tracker=TrackerConfig(iterations=2, probe_kernel="pallas"),
        ),
        # Conservative 10-iteration profile with the Pallas chain.
        "bf16_fft_pallas": dataclasses.replace(
            base,
            dsp=DspConfig(compute="bfloat16", probe_compute="bfloat16"),
            mimo=MimoConfig(backend="fft"),
            tracker=TrackerConfig(probe_kernel="pallas"),
        ),
    }
    only = os.environ.get("BENCH_VARIANTS")
    if only:
        keep = only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}
    points = ant.create_antenna_grid(8, 8, 0.02)
    c = points.shape[1]
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.standard_normal((8, c, BLOCK)), jnp.float32)
    blocks_small = jnp.tile(pool, (N_SMALL // 8, 1, 1))
    blocks_large = jnp.tile(pool, (N_LARGE // 8, 1, 1))
    print(f"# device={jax.devices()[0].device_kind}", file=sys.stderr)

    for name, cfg in variants.items():
        step = make_awpu_step(points, cfg)
        state = awpu_init(cfg, c, seed=0)
        rate = timed_rate(step.scan, state, blocks_small, blocks_large)
        print(
            f"fused_step {name}: {rate:.1f} blocks/s "
            f"realtime_x={rate * BLOCK / SAMPLE_RATE:.2f}"
        )
        sys.stdout.flush()

    signal.alarm(0)


if __name__ == "__main__":
    main()

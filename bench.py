"""Benchmark: streaming MIMO heatmap throughput at the north-star config.

Workload (BASELINE.json): 256 mics (4 x 8x8 arrays in a 2x2 cluster) x
65x65 = 4225 directions x 256-sample blocks at 48 828 Hz — the
delay-and-sum inner loop that dominates the reference's compute
(``src/dsp/mimo.cpp:121-151``).

Metric: beam-samples/s/chip = directions x block_size x blocks/s.

Baseline: the reference's real-time AVX2 requirement — 100x100 dirs x
64 mics x 256 samples per 5.24 ms block ~= 3.12e10 mic-MAC/s
(``BASELINE.md``).  On this workload that CPU envelope yields
3.12e10 / 256 mics ~= 1.22e8 beam-samples/s; ``vs_baseline`` is the ratio
against that.  (A vs_baseline of ~8.9 means real-time at this 4x-bigger
config; the reference cannot run this config in real time at all.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
from beamforming_lk_tpu.io import ring as rg
from beamforming_lk_tpu.models import mimo as mm
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl

SAMPLE_RATE = 48828.0
REFERENCE_MIC_MACS_PER_S = 100 * 100 * 64 * 256 / (256 / SAMPLE_RATE)  # ~3.12e10


def build(n_mics=256, grid=65, block=256, shift_range=64):
    arr = ArrayConfig()
    dsp = DspConfig(block_size=block, shift_range=shift_range)
    mimo = MimoConfig(rows=grid, columns=grid)
    g = ant.create_antenna_grid(arr.columns, arr.rows, arr.distance)
    n_arrays = n_mics // g.shape[1]
    # 2x2 cluster keeps the aperture compact so min-subtracted steering
    # delays stay within the shift span (0.34 m diagonal ~= 49 samples).
    side = int(np.ceil(np.sqrt(n_arrays)))
    pitch = arr.columns * arr.distance
    offsets = [
        ((i % side) * pitch, (i // side) * pitch, 0.0) for i in range(n_arrays)
    ]
    points = ant.combine_arrays([g] * n_arrays, offsets)
    model = mm.make_mimo_model(points, mimo, dsp, arr)
    span = float(
        np.max(ant.steering_delays_np(points, model.theta, model.phi,
                                      arr.samples_per_meter))
    )
    assert span <= shift_range - model.taps, (span, shift_range)
    return points, model, dsp, arr


def main():
    points, model, dsp, arr = build()
    c = points.shape[1]
    d = model.theta.shape[0]
    t = dsp.block_size

    # Weights as a runtime arg — a closed-over concrete array would be baked
    # into the HLO as a giant literal constant.
    def _step(history, block, weights):
        history = rg.ring_push(history, block)
        window = rg.ring_window(history, t, dsp.shift_range, model.taps)
        beam = dl.das_beam(window, weights)
        tb = beam.shape[-1]
        powers = dl.das_power(
            beam, use_bandpass=dsp.use_bandpass, divisor=tb * c
        )
        return history, powers

    jitted = jax.jit(_step, donate_argnums=(0,))
    weights = jax.device_put(model.weights)

    def step(history, block):
        return jitted(history, block, weights)

    rng = np.random.default_rng(0)
    history = jnp.zeros((c, dsp.history), jnp.float32)
    blocks = [
        jnp.asarray(rng.standard_normal((c, t)), jnp.float32) for _ in range(8)
    ]

    # Warmup / compile.
    history, powers = step(history, blocks[0])
    jax.block_until_ready(powers)

    n_iter = 60
    start = time.perf_counter()
    for i in range(n_iter):
        history, powers = step(history, blocks[i % len(blocks)])
    jax.block_until_ready(powers)
    elapsed = time.perf_counter() - start

    blocks_per_s = n_iter / elapsed
    beam_samples_per_s = d * t * blocks_per_s
    mic_macs_per_s = d * c * t * blocks_per_s
    vs_baseline = mic_macs_per_s / REFERENCE_MIC_MACS_PER_S
    realtime_factor = blocks_per_s * t / SAMPLE_RATE

    print(
        f"# device={jax.devices()[0].device_kind} C={c} D={d} T={t} "
        f"S={dsp.shift_range} blocks/s={blocks_per_s:.1f} "
        f"realtime_x={realtime_factor:.2f} "
        f"mic-GMAC/s={mic_macs_per_s / 1e9:.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "das_beam_samples_per_s_256mic_4225dir",
                "value": round(beam_samples_per_s, 1),
                "unit": "beam-samples/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

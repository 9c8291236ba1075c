"""App-path chunked replay throughput: the bench.py chunked-streaming rate
reached THROUGH the application layer.

bench.py measures the chunked heatmap program in isolation;
``--heatmap-chunk`` + ``ControlUnit.run(batch=N)`` expose the same program
from the CLI.  This benchmark drives that exact app path —
``ControlUnit.process_batch`` → ``AwpuPipeline.process_blocks`` →
the chunked scan program — at the north-star workload (256 mics × 65×65
directions, bf16 fft backend, chunk 8) and reports blocks/s.

Methodology (remote tunnel): a 64-block pool is staged on device ONCE
(~16 MB over the wire), then tiled on-device to a 2048-block batch, so
repeated ``process_batch`` calls measure the app dispatch path rather
than host→device bandwidth (a locally-attached chip streams ingest
concurrently; the tunnel's ~30 ms sync amortizes over the batch).

Prints one JSON line {cli_replay_blocks_per_s, realtime_x} to stdout.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beamforming_lk_tpu.app.control import ControlUnit  # noqa: E402
from beamforming_lk_tpu.config import (  # noqa: E402
    Config,
    DspConfig,
    MimoConfig,
)

SAMPLE_RATE = 48828.0
BLOCK = 256
CHANNELS = 256
GRID = 65
CHUNK = 8
POOL = 64
TILE = int(os.environ.get("CLI_REPLAY_TILE", "16"))  # blocks = POOL * TILE


def main():
    signal.signal(
        signal.SIGALRM,
        lambda *_: (print("# DEADLINE", file=sys.stderr), os._exit(1)),
    )
    signal.alarm(int(os.environ.get("BENCH_DEADLINE_S", "2400")))

    cfg = Config(
        dsp=DspConfig(compute="bfloat16"),
        mimo=MimoConfig(rows=GRID, columns=GRID, backend="fft",
                        heatmap_chunk=CHUNK),
    )
    unit = ControlUnit(
        cfg, enable_tracker=False, enable_miso=False, channels=CHANNELS,
    )
    rng = np.random.default_rng(0)
    pool = jax.device_put(
        jnp.asarray(rng.standard_normal((POOL, CHANNELS, BLOCK)), jnp.float32)
    )
    blocks = jax.jit(lambda p: jnp.tile(p, (TILE, 1, 1)))(pool)
    n = POOL * TILE
    print(f"# device={jax.devices()[0].device_kind} n={n} chunk={CHUNK} "
          f"compiling...", file=sys.stderr, flush=True)
    unit.process_batch([blocks])  # compile + warm

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        unit.process_batch([blocks])
        best = max(best, n / (time.perf_counter() - t0))
    s = unit.metrics.summary()
    print(
        f"# app-path chunked replay: {best:.0f} blocks/s "
        f"(metrics realtime_factor over all calls "
        f"{s['realtime_factor']:.1f}x)",
        file=sys.stderr,
    )
    signal.alarm(0)
    print(json.dumps({
        "cli_replay_blocks_per_s": round(best, 1),
        "realtime_x": round(best * BLOCK / SAMPLE_RATE, 1),
    }))


if __name__ == "__main__":
    main()

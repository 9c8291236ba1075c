"""Time the Pallas DAS kernel on the real TPU at the north-star config.

Usage: timeout 1800 python scripts/bench_pallas_tpu.py [expand ...]

Sweeps tile_d x compute dtype with the same scan-differencing methodology
as bench.py, and prints blocks/s + parity vs the dense kernel per point.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench
from beamforming_lk_tpu.ops import delay as dl
from beamforming_lk_tpu.ops.pallas_das import (
    das_beam_pallas, delay_split_np, pad_directions,
)


def main():
    expands = sys.argv[1:] or ["repeat"]
    points, delays_np, dsp, arr, _theta, _phi = bench.build_geometry()
    c = points.shape[1]
    d = delays_np.shape[0]

    shift_np, tapw_np = delay_split_np(delays_np, bench.SHIFT_RANGE, "linear")
    rng = np.random.default_rng(0)
    blocks = jax.device_put(
        jnp.asarray(rng.standard_normal((8, c, bench.BLOCK)), jnp.float32)
    )
    history = jnp.zeros((c, dsp.history), jnp.float32)

    # Dense reference powers for parity.
    delays = jax.device_put(jnp.asarray(delays_np))
    weights = jax.jit(lambda x: dl.das_weights(x, bench.SHIFT_RANGE, "linear"))(delays)

    def dense_f32(window, w):
        beam = dl.das_beam(window, w)
        return dl.das_power(beam, divisor=bench.BLOCK * c)

    scan_dense = bench.make_scan(dense_f32, dl.LINEAR_TAPS)
    _, ref_p = scan_dense(history, blocks, 8, weights)
    ref_p = np.asarray(ref_p, np.float64)

    for tile_d in (128, 256, 512):
        (shift_p, tapw_p), d_pad = pad_directions([shift_np, tapw_np], d, tile_d)
        shift = jax.device_put(jnp.asarray(shift_p))
        tapw = jax.device_put(jnp.asarray(tapw_p))
        for expand in expands:
            for prec, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
                def fn(window, sh, tw, _td=tile_d, _dt=dtype, _ex=expand):
                    beam = das_beam_pallas(
                        window, sh, tw, span=bench.SHIFT_RANGE,
                        block_t=bench.BLOCK, tile_d=_td, tile_c=8,
                        compute_dtype=_dt, expand=_ex,
                    )[:d]
                    return dl.das_power(beam, divisor=bench.BLOCK * c)

                try:
                    scan_n = bench.make_scan(fn, dl.LINEAR_TAPS)
                    t0 = time.time()
                    rate = bench.timed_rate(scan_n, history, blocks, (shift, tapw))
                    _, p = scan_n(history, blocks, 8, shift, tapw)
                    p = np.asarray(p, np.float64)
                    err = float(np.max(np.abs(p - ref_p)
                                       / np.maximum(np.abs(ref_p), 1e-30)))
                    print(
                        f"pallas tile_d={tile_d} expand={expand} {prec}: "
                        f"{rate:.1f} blocks/s "
                        f"(realtime_x={rate * bench.BLOCK / bench.SAMPLE_RATE:.1f}, "
                        f"max_rel_err={err:.1e}, total_s={time.time()-t0:.0f})",
                        flush=True,
                    )
                except Exception as e:
                    print(f"pallas tile_d={tile_d} expand={expand} {prec} "
                          f"FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

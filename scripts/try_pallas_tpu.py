"""One guarded attempt to compile + run the Pallas DAS kernel on the real TPU.

Usage: timeout 900 python scripts/try_pallas_tpu.py [repeat|matmul] [f32|bf16]

Run each attempt in its own process (a Mosaic hang must only cost that
process); the driver shell kills the exact PID via `timeout`.  Prints one
PASS/FAIL line with max rel err vs the dense shift-matmul kernel evaluated
on the same device.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
from beamforming_lk_tpu.io import ring as rg
from beamforming_lk_tpu.io.synthetic import plane_wave_block
from beamforming_lk_tpu.models import mimo as mm
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl
from beamforming_lk_tpu.ops.pallas_das import (
    das_beam_pallas, delay_split_np, pad_directions,
)


def main():
    expand = sys.argv[1] if len(sys.argv) > 1 else "repeat"
    prec = sys.argv[2] if len(sys.argv) > 2 else "f32"
    compute_dtype = jnp.bfloat16 if prec == "bf16" else jnp.float32
    grid = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    acfg, dcfg = ArrayConfig(), DspConfig()
    points = ant.create_antenna_grid()
    theta, phi = mm.make_mimo_grid(MimoConfig(rows=grid, columns=grid))
    delays = ant.steering_delays_np(points, theta, phi, acfg.samples_per_meter)
    block = plane_wave_block(points, [(0.4, 1.0, 5000.0)], 0,
                             dcfg.block_size, acfg, noise_std=0.05)
    hist = rg.ring_push(rg.ring_init(64, dcfg.history), jnp.asarray(block))
    window = rg.ring_window(hist, dcfg.block_size, dcfg.shift_range,
                            dl.LINEAR_TAPS)
    window = jax.device_put(window)

    shift, tapw = delay_split_np(delays, dcfg.shift_range, "linear")
    (shift_p, tapw_p), _ = pad_directions([shift, tapw], shift.shape[0], 128)
    shift_d = jax.device_put(jnp.asarray(shift_p))
    tapw_d = jax.device_put(jnp.asarray(tapw_p))

    print(f"# device={jax.devices()[0].device_kind} expand={expand} "
          f"dtype={prec} D={shift_p.shape[0]} compiling...", flush=True)
    t0 = time.time()
    beam = das_beam_pallas(
        window, shift_d, tapw_d,
        span=dcfg.shift_range, block_t=dcfg.block_size,
        tile_d=128, tile_c=8, compute_dtype=compute_dtype, expand=expand,
    )
    got = np.asarray(beam)[: shift.shape[0]]
    t1 = time.time()
    print(f"# compiled+ran in {t1 - t0:.1f}s", flush=True)

    dense_w = dl.das_weights_np(delays, dcfg.shift_range, "linear")
    want = np.asarray(dl.das_beam(window, jax.device_put(jnp.asarray(dense_w))))
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    tol = 2e-2 if prec == "bf16" else 1e-5
    status = "PASS" if err < tol else "FAIL"
    print(f"{status} expand={expand} dtype={prec} max_rel_err={err:.2e} "
          f"compile_s={t1 - t0:.1f}", flush=True)
    sys.exit(0 if status == "PASS" else 1)


if __name__ == "__main__":
    main()

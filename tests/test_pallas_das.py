"""Pallas DAS kernel vs the dense shift-matmul reference path (interpret
mode on CPU; the real TPU lowering is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
from beamforming_lk_tpu.io import ring as rg
from beamforming_lk_tpu.io.synthetic import plane_wave_block
from beamforming_lk_tpu.models import mimo as mm
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl
from beamforming_lk_tpu.ops.pallas_das import (
    das_beam_pallas,
    delay_split_np,
    pad_directions,
)

ACFG = ArrayConfig()
DCFG = DspConfig()


def _window_and_delays(mode="linear", grid=16):
    points = ant.create_antenna_grid()
    theta, phi = mm.make_mimo_grid(MimoConfig(rows=grid, columns=grid))
    delays = ant.steering_delays_np(points, theta, phi, ACFG.samples_per_meter)
    block = plane_wave_block(
        points, [(0.4, 1.0, 5000.0)], 0, DCFG.block_size, ACFG, noise_std=0.05
    )
    hist = rg.ring_push(rg.ring_init(64, DCFG.history), jnp.asarray(block))
    taps = dl.LINEAR_TAPS if mode == "linear" else 8
    window = rg.ring_window(hist, DCFG.block_size, DCFG.shift_range, taps)
    return np.asarray(window), delays


def test_pallas_matches_dense_linear():
    window, delays = _window_and_delays("linear")
    dense_w = dl.das_weights_np(delays, DCFG.shift_range, "linear")
    want = np.asarray(dl.das_beam(jnp.asarray(window), jnp.asarray(dense_w)))

    shift, tapw = delay_split_np(delays, DCFG.shift_range, "linear")
    (shift_p, tapw_p), d_padded = pad_directions([shift, tapw], shift.shape[0], 128)
    beam = das_beam_pallas(
        jnp.asarray(window), jnp.asarray(shift_p), jnp.asarray(tapw_p),
        span=DCFG.shift_range, block_t=DCFG.block_size,
        tile_d=128, tile_c=8, interpret=True,
    )
    got = np.asarray(beam)[: shift.shape[0]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_matmul_expand_matches_dense():
    window, delays = _window_and_delays("linear")
    dense_w = dl.das_weights_np(delays, DCFG.shift_range, "linear")
    want = np.asarray(dl.das_beam(jnp.asarray(window), jnp.asarray(dense_w)))

    shift, tapw = delay_split_np(delays, DCFG.shift_range, "linear")
    (shift_p, tapw_p), _ = pad_directions([shift, tapw], shift.shape[0], 128)
    beam = das_beam_pallas(
        jnp.asarray(window), jnp.asarray(shift_p), jnp.asarray(tapw_p),
        span=DCFG.shift_range, block_t=DCFG.block_size,
        tile_d=128, tile_c=8, expand="matmul", interpret=True,
    )
    got = np.asarray(beam)[: shift.shape[0]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_matches_dense_fir():
    window, delays = _window_and_delays("fir")
    bank = dl.fractional_delay_fir_bank()
    dense_w = dl.das_weights_np(delays, DCFG.shift_range, "fir", bank)
    want = np.asarray(dl.das_beam(jnp.asarray(window), jnp.asarray(dense_w)))

    shift, tapw = delay_split_np(delays, DCFG.shift_range, "fir", bank)
    (shift_p, tapw_p), _ = pad_directions([shift, tapw], shift.shape[0], 128)
    beam = das_beam_pallas(
        jnp.asarray(window), jnp.asarray(shift_p), jnp.asarray(tapw_p),
        span=DCFG.shift_range, block_t=DCFG.block_size,
        tile_d=128, tile_c=8, interpret=True,
    )
    got = np.asarray(beam)[: shift.shape[0]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_bf16_close_to_f32():
    window, delays = _window_and_delays("linear")
    shift, tapw = delay_split_np(delays, DCFG.shift_range, "linear")
    (shift_p, tapw_p), _ = pad_directions([shift, tapw], shift.shape[0], 128)
    kwargs = dict(span=DCFG.shift_range, block_t=DCFG.block_size,
                  tile_d=128, tile_c=8, interpret=True)
    f32 = np.asarray(das_beam_pallas(
        jnp.asarray(window), jnp.asarray(shift_p), jnp.asarray(tapw_p), **kwargs
    ))[: shift.shape[0]]
    bf16 = np.asarray(das_beam_pallas(
        jnp.asarray(window), jnp.asarray(shift_p), jnp.asarray(tapw_p),
        compute_dtype=jnp.bfloat16, **kwargs,
    ))[: shift.shape[0]]
    # bf16 inputs, f32 accumulate: ~2-3 decimal digits on the beam.
    scale = np.abs(f32).max()
    assert np.abs(bf16 - f32).max() < 2e-2 * scale

import math

import numpy as np
import pytest

from beamforming_lk_tpu.config import ArrayConfig, DspConfig
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl
from tests import reference_impl as ref

ACFG = ArrayConfig()
T = 64  # small block for fast tests
S = 40
C = 16
H = 512


def _random_case(seed, max_delay=S - 8):
    rng = np.random.default_rng(seed)
    history = rng.standard_normal((C, H)).astype(np.float32)
    delays = rng.uniform(0.0, max_delay - 1e-3, size=C).astype(np.float32)
    return history, delays


def _kernel_das(history, delays, block_start, mode="linear", bank=None):
    """Run the shift-matmul DAS over a window aligned with reference
    semantics: window start = block_start - (S - taps)."""
    taps = 2 if mode == "linear" else bank.shape[1]
    w0 = block_start - (S - taps)
    window = history[:, w0 : w0 + T + S]
    weights = dl.das_weights(delays[None, :], S, mode, bank)  # [1, C, S]
    beam = np.asarray(dl.das_beam(window, weights))
    return beam[0]


def test_das_matches_reference_loop():
    history, delays = _random_case(3)
    block_start = 256
    truth = ref.das_ref(history, delays, block_start, T)
    mine = _kernel_das(history, delays, block_start)
    assert np.allclose(mine, truth, atol=1e-4)


def test_das_zero_delay_is_sum():
    history, _ = _random_case(4)
    delays = np.zeros(C, np.float32)
    block_start = 256
    mine = _kernel_das(history, delays, block_start)
    # zero delay, fraction 0 -> each channel contributes x[t + 1] (the
    # reference stencil's +1 quirk, delay.cpp:24)
    truth = history[:, block_start + 1 : block_start + 1 + T].sum(axis=0)
    assert np.allclose(mine, truth, atol=1e-4)


def test_das_integer_delay_shifts():
    history, _ = _random_case(5)
    delays = np.full(C, 7.0, np.float32)
    block_start = 256
    mine = _kernel_das(history, delays, block_start)
    truth = history[:, block_start - 7 + 1 : block_start - 7 + 1 + T].sum(axis=0)
    assert np.allclose(mine, truth, atol=1e-4)


def test_delay_lut_split():
    shift, frac = dl.delay_lut(np.array([0.0, 3.75, 31.5]), S, 2)
    assert np.asarray(shift).tolist() == [S - 2, S - 2 - 3, S - 2 - 31]
    assert np.allclose(np.asarray(frac), [0.0, 0.75, 0.5], atol=1e-6)


def test_bandpass_power_matches_reference():
    rng = np.random.default_rng(6)
    beam = rng.standard_normal(T).astype(np.float32)
    truth = ref.bandpass_power_ref(beam.astype(np.float64), T, T)
    mine = float(dl.das_power(beam, use_bandpass=True, divisor=T))
    assert np.allclose(mine, truth, rtol=1e-4)


def test_power_no_bandpass():
    beam = np.ones(T, np.float32)
    assert np.allclose(float(dl.das_power(beam, use_bandpass=False)), 1.0)


def test_fir_bank_shape_and_dc_gain():
    bank = dl.fractional_delay_fir_bank(101, 8)
    assert bank.shape == (101, 8)
    assert np.allclose(bank.sum(axis=1), 1.0, atol=1e-5)


def test_fir_bank_delays_sine():
    """Phase p of the bank must reconstruct x(n + center - f): feeding a
    sine through phase f should produce the sine advanced by (center - f)."""
    bank = dl.fractional_delay_fir_bank(101, 8, center=4.0)
    n = np.arange(256)
    freq = 0.05  # cycles/sample, well inside the band
    x = np.sin(2 * np.pi * freq * n)
    for p in (0, 33, 50, 100):
        f = p / 100.0
        y = np.stack([x[k : k + 200] for k in range(8)], 0).T @ bank[p]
        expected = np.sin(2 * np.pi * freq * (n[:200] + 4.0 - f))
        assert np.allclose(y, expected, atol=2e-2), p


def test_fir_das_coheres_plane_wave():
    """FIR-mode DAS steered at the synthetic source direction must give
    near-perfect coherent gain."""
    pts = ant.create_antenna_grid(8, 8, 0.02)
    c = pts.shape[1]
    theta, phi = 0.5, 1.0
    delays = np.asarray(
        ant.steering_delays(pts, theta, phi, ACFG.samples_per_meter)
    )
    freq = 8000.0
    fs = ACFG.sample_rate
    n = np.arange(H, dtype=np.float64)
    history = np.stack(
        [np.sin(2 * np.pi * freq * (n + delays[i]) / fs) for i in range(c)]
    ).astype(np.float32)

    bank = dl.fractional_delay_fir_bank(101, 8)
    block_start = 256
    w0 = block_start - (S - 8)
    window = history[:, w0 : w0 + T + S]
    weights = dl.das_weights(delays[None, :], S, "fir", bank)
    beam = np.asarray(dl.das_beam(window, weights))[0]
    # Coherent sum amplitude ~ C (each channel contributes amplitude 1).
    assert beam.max() > 0.95 * c

    # Steering 30 degrees off in theta must drop power substantially.
    delays_off = np.asarray(
        ant.steering_delays(pts, theta + 0.6, phi, ACFG.samples_per_meter)
    )
    weights_off = dl.das_weights(delays_off[None, :], S, "fir", bank)
    beam_off = np.asarray(dl.das_beam(window, weights_off))[0]
    assert (beam_off**2).mean() < 0.6 * (beam**2).mean()


def test_das_power_from_delays_with_mask():
    history, delays = _random_case(8)
    window = history[:, 100 : 100 + T + S]
    mask = np.ones(C, np.float32)
    mask[3] = 0.0
    d = np.tile(delays, (5, 1))
    p = np.asarray(
        dl.das_power_from_delays(
            window, d, shift_range=S, mode="linear", channel_mask=mask
        )
    )
    assert p.shape == (5,)
    assert (p > 0).all()
    # Masked channel must not influence the result.
    history2 = history.copy()
    history2[3] = 1e6
    window2 = history2[:, 100 : 100 + T + S]
    p2 = np.asarray(
        dl.das_power_from_delays(
            window2, d, shift_range=S, mode="linear", channel_mask=mask
        )
    )
    assert np.allclose(p, p2, rtol=1e-5)


def test_numpy_builders_match_traced():
    """das_weights_np / steering_delays_np are bit-compatible with the
    traced builders (they feed the same kernel)."""
    import numpy as np
    import jax.numpy as jnp
    from beamforming_lk_tpu.ops import antenna as ant
    from beamforming_lk_tpu.ops import delay as dl

    rng = np.random.default_rng(0)
    points = ant.create_antenna_grid()
    theta = rng.uniform(0.0, 1.2, 17).astype(np.float32)
    phi = rng.uniform(0.0, 6.28, 17).astype(np.float32)
    d_np = ant.steering_delays_np(points, theta, phi, 143.6)
    d_tr = np.asarray(ant.steering_delays(points, theta, phi, 143.6))
    np.testing.assert_allclose(d_np, d_tr, atol=1e-4)

    for mode, bank in (("linear", None), ("fir", dl.fractional_delay_fir_bank())):
        w_np = dl.das_weights_np(d_np, 64, mode, bank)
        w_tr = np.asarray(dl.das_weights(jnp.asarray(d_np), 64, mode,
                                         None if bank is None else jnp.asarray(bank)))
        np.testing.assert_allclose(w_np, w_tr, atol=1e-6)

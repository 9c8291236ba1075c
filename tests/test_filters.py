"""Filter designer vs its spec (filter_produce.m): unit in-band peak gain,
out-of-band rejection, fractional group delay, DAS integration."""

import numpy as np
from scipy import signal

from beamforming_lk_tpu.ops.filters import (
    REFERENCE_BANDS,
    SAMPLE_RATE,
    bandpass_fractional_bank,
    reference_band_banks,
    windowed_sinc_delay,
)


def test_sinc_delay_interpolates():
    """Delaying a smooth signal by 0.5 samples matches truth."""
    h = windowed_sinc_delay(18, 0.5)
    t = np.arange(256, dtype=np.float64)
    x = np.sin(2 * np.pi * 0.05 * t)
    y = np.convolve(x, h)[18 : 18 + 256]          # compensate integer delay
    want = np.sin(2 * np.pi * 0.05 * (t - 0.5))
    # The bare windowed sinc has ~0.997 passband gain (the reference only
    # normalizes the full bandpass bank); bound accordingly.
    np.testing.assert_allclose(y[30:-30], want[30:-30], atol=5e-3)


def test_band1_gain_profile():
    bank = bandpass_fractional_bank(REFERENCE_BANDS[0], phases=11,
                                    bandpass_order=20, sinc_half_width=18)
    assert bank.shape == (11, 20 + 37)
    nyq = SAMPLE_RATE / 2.0
    for row in bank[::5]:
        w, h = signal.freqz(row, 1, worN=2048)
        freqs = w / np.pi * nyq
        mag = np.abs(h)
        in_band = (freqs > 7000) & (freqs < 8500)
        out_band = freqs < 2000
        assert abs(mag.max() - 1.0) < 1e-6          # peak normalized
        assert mag[in_band].mean() > 0.5
        assert mag[out_band].max() < 0.1            # rejection


def test_fractional_group_delay_progression():
    from beamforming_lk_tpu.ops.filters import bank_group_delay

    bank = bandpass_fractional_bank(REFERENCE_BANDS[1], phases=5,
                                    bandpass_order=28, sinc_half_width=14)
    gd = bank_group_delay(bank)
    # Phase p should delay ~p/(phases-1) samples more than phase 0.
    rel = gd - gd[0]
    np.testing.assert_allclose(rel, [0.0, 0.25, 0.5, 0.75, 1.0], atol=0.1)


def test_all_reference_bands_generate():
    banks = reference_band_banks(phases=5)
    assert set(banks) == set(range(7))
    for i, bank in banks.items():
        assert np.all(np.isfinite(bank))
        assert bank.shape[0] == 5


def test_bank_feeds_das_kernel():
    """A designed bank drops into the DAS kernel as fir_bank."""
    import jax.numpy as jnp

    from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
    from beamforming_lk_tpu.io import ring as rg
    from beamforming_lk_tpu.io.synthetic import plane_wave_block
    from beamforming_lk_tpu.models import mimo as mm
    from beamforming_lk_tpu.ops import antenna as ant

    bank = bandpass_fractional_bank(REFERENCE_BANDS[0], phases=21,
                                    bandpass_order=20, sinc_half_width=18)
    taps = bank.shape[1]  # 57
    acfg = ArrayConfig()
    # span must cover max steering delay (~29) + taps
    dcfg = DspConfig(interp="fir", fir_taps=taps, shift_range=96)
    mcfg = MimoConfig(rows=12, columns=12)
    points = ant.create_antenna_grid()
    model = mm.make_mimo_model(points, mcfg, dcfg, acfg, fir_bank=bank)
    src = (0.4, 1.0, 7800.0)  # in band 1
    block = plane_wave_block(points, [src], 0, 256, acfg, noise_std=0.02)
    hist = rg.ring_push(rg.ring_init(64, 1024), jnp.asarray(block))
    window = rg.ring_window(hist, 256, dcfg.shift_range, taps)
    powers = np.asarray(mm.mimo_power(window, model))
    from beamforming_lk_tpu.ops.geometry import spherical_angle

    d = int(np.argmax(powers))
    ang = float(spherical_angle(model.theta[d], model.phi[d], src[0], src[1]))
    assert ang < np.radians(15), ang

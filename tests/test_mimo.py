import numpy as np

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
from beamforming_lk_tpu.io import ring_init, ring_push, ring_window
from beamforming_lk_tpu.io.synthetic import synthetic_blocks
from beamforming_lk_tpu.models import mimo
from beamforming_lk_tpu.ops import antenna as ant
from tests import reference_impl as ref

ACFG = ArrayConfig()
DCFG = DspConfig()


def test_grid_matches_reference():
    cfg = MimoConfig(rows=16, columns=16, fov_degrees=180.0)
    theta, phi = mimo.make_mimo_grid(cfg)
    t_ref, p_ref = ref.mimo_grid_ref(16, 16, 180.0)
    assert np.allclose(theta.reshape(16, 16), t_ref, atol=1e-5)
    assert np.allclose(phi.reshape(16, 16), p_ref, atol=1e-5)


def test_heatmap_peak_at_source():
    cfg = MimoConfig(rows=21, columns=21, fov_degrees=120.0)
    pts = ant.create_antenna_grid(8, 8, 0.02)
    model = mimo.make_mimo_model(pts, cfg, DCFG, ACFG)
    src_theta, src_phi = np.radians(25.0), np.radians(135.0)
    hist = ring_init(64, DCFG.history)
    for b in synthetic_blocks(pts, [(src_theta, src_phi, 7000.0)], 5):
        hist = ring_push(hist, b)
    window = ring_window(hist, DCFG.block_size, DCFG.shift_range, model.taps)
    power = np.asarray(mimo.mimo_power(window, model))
    k = power.argmax()
    d = float(
        np.arccos(
            np.clip(
                np.sin(model.theta[k]) * np.sin(src_theta) * np.cos(model.phi[k] - src_phi)
                + np.cos(model.theta[k]) * np.cos(src_theta),
                -1,
                1,
            )
        )
    )
    # Peak within ~one grid cell (about 6 degrees for 21x21 at 120 fov).
    assert np.degrees(d) < 8.0, np.degrees(d)


def test_render_heatmap_normalization():
    power = np.array([0.0, 0.5, 1.0, 0.25], np.float32)
    img, prev = mimo.render_heatmap(power, 2, 2, prev_power=0.0)
    img = np.asarray(img)
    assert img.dtype == np.uint8
    assert img.shape == (2, 2)
    assert img[1, 0] == 255          # max -> 255 (row-major layout k=r*cols+c)
    assert img[0, 0] == 0
    assert np.isclose(float(prev), 0.2)  # EMA alpha 0.2 of max


def test_render_heatmap_db_mode():
    power = np.array([1e-6, 1e-3, 1.0, 0.1], np.float32)
    img, _ = mimo.render_heatmap(power, 2, 2, prev_power=0.0, use_db=True)
    img = np.asarray(img)
    assert img[1, 0] == 255
    assert img[0, 0] == 0
    assert 0 < img[1, 1] < 255


def test_calibration_masks_dead_and_hot():
    from beamforming_lk_tpu.models import calibrate

    rng = np.random.default_rng(0)
    hist = rng.normal(0, 1e-2, size=(64, 1024)).astype(np.float32)
    hist[5] = 0.0          # dead mic
    hist[17] *= 100.0      # hot mic
    res = calibrate(hist, diff_threshold=1e-4, low_ratio=1e-3)
    mask = np.asarray(res.mask)
    assert mask[5] == 0.0
    assert mask[17] == 0.0
    assert mask.sum() == 62
    gains = np.asarray(res.gains)
    assert gains[5] == 0.0
    assert (gains[mask == 1.0] > 0).all()


def test_calibration_multi_antenna():
    from beamforming_lk_tpu.models import calibrate

    rng = np.random.default_rng(1)
    hist = rng.normal(0, 1e-2, size=(128, 512)).astype(np.float32)
    hist[70] = 0.0
    res = calibrate(hist)
    mask = np.asarray(res.mask)
    assert mask[70] == 0.0
    assert mask[:64].sum() == 64
    assert int(res.usable) == 127


def test_masked_channel_does_not_affect_heatmap():
    cfg = MimoConfig(rows=9, columns=9, fov_degrees=90.0)
    pts = ant.create_antenna_grid(8, 8, 0.02)
    mask = np.ones(64, np.float32)
    mask[12] = 0.0
    model = mimo.make_mimo_model(pts, cfg, DCFG, ACFG, channel_mask=mask)
    hist = ring_init(64, DCFG.history)
    for b in synthetic_blocks(pts, [(0.3, 1.0, 6000.0)], 5):
        hist = ring_push(hist, b)
    hist2 = np.asarray(hist).copy()
    hist2[12] = 1e9
    w1 = ring_window(hist, DCFG.block_size, DCFG.shift_range, model.taps)
    w2 = ring_window(np.asarray(hist2), DCFG.block_size, DCFG.shift_range, model.taps)
    p1 = np.asarray(mimo.mimo_power(w1, model, n_active=63))
    p2 = np.asarray(mimo.mimo_power(w2, model, n_active=63))
    assert np.allclose(p1, p2, rtol=1e-5)

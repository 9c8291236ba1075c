import math

import numpy as np

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, TrackerConfig
from beamforming_lk_tpu.io import ring_init, ring_push, ring_window
from beamforming_lk_tpu.io.synthetic import synthetic_blocks
from beamforming_lk_tpu.models import miso
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops.geometry import spherical_angle

ACFG = ArrayConfig()
DCFG = DspConfig()
TCFG = TrackerConfig(fov_degrees=120.0)


def test_miso_beam_coheres_and_recenters():
    pts = ant.create_antenna_grid(8, 8, 0.02)
    src_t, src_p = math.radians(20.0), math.radians(210.0)
    step = miso.make_miso_step(pts, TCFG, DCFG, ACFG)
    # Steer slightly off the true direction; the 3 refine steps per block
    # should pull the listener onto the source.
    state = miso.miso_steer(miso.miso_init(), src_t + 0.05, src_p - 0.05)
    hist = ring_init(64, DCFG.history)
    beam = None
    for b in synthetic_blocks(pts, [(src_t, src_p, 5000.0)], 20):
        hist = ring_push(hist, b)
        window = ring_window(hist, DCFG.block_size, DCFG.shift_range, 2)
        state, beam = step(state, window)
    beam = np.asarray(beam)
    assert beam.shape == (DCFG.block_size,)
    # Coherent gain: peak ~ 64 channels x 1e-2 amplitude.
    assert beam.max() > 0.5 * 64 * 1e-2
    d = float(
        spherical_angle(
            state.particle.theta[0], state.particle.phi[0], src_t, src_p
        )
    )
    assert math.degrees(d) < 3.0


def test_miso_steer_resets_direction():
    state = miso.miso_init()
    state = miso.miso_steer(state, 0.3, 1.0)
    assert np.isclose(float(state.particle.theta[0]), 0.3)
    assert np.isclose(float(state.particle.phi[0]), 1.0)
    assert bool(state.tracking)

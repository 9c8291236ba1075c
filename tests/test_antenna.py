import math

import numpy as np

from beamforming_lk_tpu.config import ArrayConfig
from beamforming_lk_tpu.ops import antenna as ant
from tests import reference_impl as ref

CFG = ArrayConfig()


def test_grid_layout():
    pts = ant.create_antenna_grid(8, 8, 0.02)
    assert pts.shape == (3, 64)
    # Centered at origin, z = 0, 2 cm pitch.
    assert np.allclose(pts.mean(axis=1), 0.0, atol=1e-7)
    assert np.allclose(pts[2], 0.0)
    assert np.allclose(pts[0, 1] - pts[0, 0], 0.02, atol=1e-7)
    # Element id = r * columns + c (row-major, reference antenna.cpp:66-75).
    assert np.allclose(pts[1, 8] - pts[1, 0], 0.02, atol=1e-7)
    assert np.allclose(pts[0, 8] - pts[0, 0], 0.0, atol=1e-7)


def test_steering_delays_match_reference():
    pts = ant.create_antenna_grid(8, 8, 0.02)
    rng = np.random.default_rng(2)
    thetas = rng.uniform(0, math.pi / 2, size=16)
    phis = rng.uniform(0, 2 * math.pi, size=16)
    batched = np.asarray(
        ant.steering_delays(pts, thetas, phis, CFG.samples_per_meter)
    )
    assert batched.shape == (16, 64)
    for i in range(16):
        truth = ref.steering_delays_ref(pts, thetas[i], phis[i], CFG.samples_per_meter)
        assert np.allclose(batched[i], truth, atol=1e-3)
    # Non-negative with a zero minimum per direction.
    assert (batched >= -1e-4).all()
    assert np.allclose(batched.min(axis=1), 0.0, atol=1e-4)


def test_boresight_delays_zero():
    pts = ant.create_antenna_grid(8, 8, 0.02)
    d = np.asarray(ant.steering_delays(pts, 0.0, 0.0, CFG.samples_per_meter))
    assert np.allclose(d, 0.0, atol=1e-4)


def test_max_delay_bound():
    pts = ant.create_antenna_grid(8, 8, 0.02)
    thetas = np.linspace(0, math.pi / 2, 64)
    phis = np.linspace(0, 2 * math.pi, 65)
    tt, pp = np.meshgrid(thetas, phis)
    d = np.asarray(
        ant.steering_delays(pts, tt.ravel(), pp.ravel(), CFG.samples_per_meter)
    )
    assert d.max() <= CFG.max_delay_samples + 1e-3


def test_steer_points_matches_rotation():
    pts = ant.create_antenna_grid(8, 8, 0.02)
    theta, phi = 0.4, 2.1
    mine = np.asarray(ant.steer_points(pts, theta, phi))
    truth = ref.rotate_y(-theta) @ ref.rotate_z(phi) @ pts
    assert np.allclose(mine, truth, atol=1e-5)


def test_steering_horizontal_equivalence():
    # azimuth/elevation (0, 0) is boresight -> zero delays (antenna.cpp:109-117).
    pts = ant.create_antenna_grid(8, 8, 0.02)
    d = np.asarray(
        ant.steering_delays_horizontal(pts, 0.0, 0.0, CFG.samples_per_meter)
    )
    assert np.allclose(d, 0.0, atol=1e-4)


def test_unit_dome_and_lookup():
    dome = ant.generate_unit_dome(512)
    assert dome.shape == (512, 3)
    assert np.allclose(np.linalg.norm(dome, axis=1), 1.0, atol=1e-5)
    assert (dome[:, 2] >= -1e-6).all()  # hemisphere
    table = ant.generate_dome_lookup(dome)
    assert table.shape == (90, 360)
    # The reference's self-test allows max chord distance 0.2
    # (antenna.cpp:180-211); our exhaustive check must pass the same bound.
    assert ant.dome_lookup_max_error(dome, table) < 0.2


def test_sector_masks():
    masks = ant.sector_masks()
    assert masks.shape == (4, 64)
    assert masks.sum() == 64
    assert (masks.sum(axis=0) == 1).all()


def test_combine_arrays():
    g1 = ant.create_antenna_grid(8, 8, 0.02)
    combined = ant.combine_arrays([g1, g1], [(0, 0, 0), (1.0, 0, 0)])
    assert combined.shape == (3, 128)
    assert np.allclose(combined[0, 64:] - combined[0, :64], 1.0, atol=1e-6)

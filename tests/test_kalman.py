import numpy as np

from beamforming_lk_tpu.models.kalman import KalmanFilter3D
from tests import reference_impl as ref


def _numpy_kf_update(x, p, a, q, h, r, z):
    x = a @ x
    p = a @ p @ a.T + q
    s = h @ p @ h.T + r
    k = p @ h.T @ np.linalg.inv(s)
    x = x + k @ (z - h @ x)
    p = (np.eye(9) - k @ h) @ p
    return x, p


def test_matrices_match_reference():
    kf = KalmanFilter3D(0.2)
    a, q, h, r = ref.kalman_ref_matrices(0.2)
    assert np.allclose(np.asarray(kf.a), a, atol=1e-6)
    assert np.allclose(np.asarray(kf.q), q, atol=1e-6)
    assert np.allclose(np.asarray(kf.h), h)
    assert np.allclose(np.asarray(kf.r), r)


def test_update_matches_numpy_truth():
    kf = KalmanFilter3D(0.2)
    state = kf.init()
    a, q, h, r = ref.kalman_ref_matrices(0.2)
    x = np.zeros(9)
    p = np.eye(9)
    rng = np.random.default_rng(0)
    for _ in range(10):
        z = rng.standard_normal(3)
        state = kf.update(state, z.astype(np.float32))
        x, p = _numpy_kf_update(x, p, a, q, h, r, z)
    assert np.allclose(np.asarray(state.x), x, atol=1e-3)


def test_tracks_constant_velocity():
    kf = KalmanFilter3D(1.0)
    state = kf.init()
    for t in range(30):
        state = kf.update(state, np.array([t * 1.0, 0.0, 0.0], np.float32))
    pos = np.asarray(kf.position(state))
    vel = np.asarray(kf.velocity(state))
    assert abs(pos[0] - 29.0) < 0.5
    assert abs(vel[0] - 1.0) < 0.2
    # predict(0) applies one A step: leads the target by ~one dt.
    lead = np.asarray(kf.predict(state, 0))
    assert lead[0] <= pos[0] + 2.5
    one = np.asarray(kf.predict_time(state, 0.0))
    assert abs(one[0] - (pos[0] + vel[0])) < 1.0

import math

import numpy as np
import pytest

from beamforming_lk_tpu.ops import geometry as g
from tests import reference_impl as ref


def test_wrap_angle():
    assert np.allclose(g.wrap_angle(7.0), 7.0 - 2 * math.pi, atol=1e-6)
    assert np.allclose(g.wrap_angle(-0.5), 2 * math.pi - 0.5, atol=1e-6)
    assert np.allclose(g.wrap_angle(1.25), 1.25, atol=1e-7)


def test_smallest_angle():
    assert np.allclose(g.smallest_angle(0.1, 2 * math.pi - 0.1), 0.2, atol=1e-6)
    assert np.allclose(g.smallest_angle(-0.1, 0.1), -0.2, atol=1e-6)


def test_spherical_cartesian_roundtrip():
    rng = np.random.default_rng(0)
    theta = rng.uniform(0.01, math.pi / 2 - 0.01, size=(17,))
    phi = rng.uniform(-math.pi, math.pi, size=(17,))
    xyz = np.asarray(g.spherical_to_cartesian(theta, phi))
    assert np.allclose(np.linalg.norm(xyz, axis=-1), 1.0, atol=1e-5)
    t2, p2, r2 = g.cartesian_to_spherical(xyz)
    assert np.allclose(np.asarray(t2), theta, atol=1e-5)
    assert np.allclose(
        np.mod(np.asarray(p2), 2 * math.pi), np.mod(phi, 2 * math.pi), atol=1e-4
    )
    assert np.allclose(np.asarray(r2), 1.0, atol=1e-5)


def test_rotations_match_reference():
    for a in (0.0, 0.3, -1.2, 2.5):
        assert np.allclose(np.asarray(g.rotation_y(a)), ref.rotate_y(a), atol=1e-6)
        assert np.allclose(np.asarray(g.rotation_z(a)), ref.rotate_z(a), atol=1e-6)


def test_rotation_batching():
    angles = np.array([0.1, 0.7, 1.3])
    batched = np.asarray(g.rotation_y(angles))
    for i, a in enumerate(angles):
        assert np.allclose(batched[i], ref.rotate_y(a), atol=1e-6)


def test_spherical_angle_geodesic():
    # Same direction -> 0; orthogonal boresight/horizon -> pi/2.
    assert np.allclose(g.spherical_angle(0.3, 1.0, 0.3, 1.0), 0.0, atol=1e-3)
    assert np.allclose(
        g.spherical_angle(0.0, 0.0, math.pi / 2, 0.0), math.pi / 2, atol=1e-5
    )


def test_horizontal_to_spherical_boresight():
    theta, phi = g.horizontal_to_spherical(0.0, 0.0)
    assert np.allclose(theta, 0.0, atol=1e-6)


def test_quadrant_probes_reference_parity():
    rng = np.random.default_rng(1)
    for _ in range(10):
        theta = rng.uniform(0.0, math.pi / 2)
        phi = rng.uniform(0, 2 * math.pi)
        spread = math.radians(2.0)
        probes_ref, adj_ref = ref.quadrant_ref(theta, phi, spread)
        pt, pp, adj = g.quadrant_probes_reference(theta, phi, spread)
        pt, pp, adj = np.asarray(pt), np.asarray(pp), np.asarray(adj)
        assert np.allclose(adj, adj_ref, atol=1e-5)
        for i, (rt, rp) in enumerate(probes_ref):
            assert np.allclose(pt[i], rt, atol=1e-4)
            # compare wrapped phases
            assert (
                abs(math.remainder(float(pp[i]) - rp, 2 * math.pi)) < 1e-4
            )


def test_quadrant_probes_near_current_direction():
    # For a tiny spread every probe collapses onto the current direction.
    theta, phi = 0.4, 1.1
    pt, pp, _ = g.quadrant_probes(theta, phi, 1e-4)
    assert np.allclose(np.asarray(pt), theta, atol=1e-3)
    d = np.asarray(
        g.spherical_angle(np.asarray(pt), np.asarray(pp), theta, np.asarray(pp) * 0 + phi)
    )
    assert (np.asarray(pt) >= 0).all()


def test_normalize_spherical():
    t, p = g.normalize_spherical(2.0, -0.5, 1.5)
    assert np.allclose(t, 1.5)
    assert np.allclose(p, 2 * math.pi - 0.5, atol=1e-6)

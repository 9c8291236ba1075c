"""Triangulation + track-store fusion vs straightforward geometry truth
(reference semantics: src/target_handler/triangulate.cpp:10-41,
target_handler.cpp:65-128)."""

import numpy as np

from beamforming_lk_tpu.config import TriangulationConfig
from beamforming_lk_tpu.models.fusion import (
    TargetFusion,
    TrackStore,
    heading_rotation,
    position_to_gps,
    triangulate_rays,
)
from beamforming_lk_tpu.ops.geometry import cartesian_to_spherical

CFG = TriangulationConfig()


def _ray_through(origin, point):
    d = np.asarray(point, np.float64) - origin
    return np.asarray(origin, np.float32), (d / np.linalg.norm(d)).astype(np.float32)


def test_exact_intersection_recovered():
    target = np.array([1.5, 0.5, 4.0])
    o1, d1 = _ray_through([-1.0, 0.0, 0.0], target)
    o2, d2 = _ray_through([1.0, 0.0, 0.0], target)
    pts, valid = triangulate_rays(o1, d1, o2, d2, CFG)
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(pts), target, atol=1e-5)


def test_gates():
    # Closest approach above threshold -> invalid.
    o1 = np.array([-1.0, 0.0, 0.0], np.float32)
    d1 = np.array([0.0, 0.0, 1.0], np.float32)
    o2 = np.array([1.0, 0.0, 0.0], np.float32)
    d2 = np.array([0.0, 1e-3, 1.0], np.float32)
    d2 /= np.linalg.norm(d2)
    pts, valid = triangulate_rays(o1, d1, o2, d2, CFG)
    assert not bool(valid) and np.all(np.asarray(pts) == 0.0)

    # Behind the arrays (negative z) -> invalid.
    target = np.array([0.0, 0.0, -4.0])
    o1, d1 = _ray_through([-1.0, 0.0, 0.0], target)
    o2, d2 = _ray_through([1.0, 0.0, 0.0], target)
    _, valid = triangulate_rays(o1, d1, o2, d2, CFG)
    assert not bool(valid)

    # Too close (z < 1 m static noise) -> invalid.
    target = np.array([0.0, 0.0, 0.5])
    o1, d1 = _ray_through([-1.0, 0.0, 0.0], target)
    o2, d2 = _ray_through([1.0, 0.0, 0.0], target)
    _, valid = triangulate_rays(o1, d1, o2, d2, CFG)
    assert not bool(valid)

    # Beyond max range (20 m) -> invalid.
    target = np.array([0.0, 0.0, 30.0])
    o1, d1 = _ray_through([-1.0, 0.0, 0.0], target)
    o2, d2 = _ray_through([1.0, 0.0, 0.0], target)
    _, valid = triangulate_rays(o1, d1, o2, d2, CFG)
    assert not bool(valid)

    # Parallel rays -> invalid, no NaNs.
    pts, valid = triangulate_rays(o1, d1, o1 + [2, 0, 0], d1, CFG)
    assert not bool(valid) and np.all(np.isfinite(np.asarray(pts)))


def test_batched_pairs():
    targets = np.array([[0.0, 1.0, 5.0], [2.0, -1.0, 8.0], [0.0, 0.0, 3.0]])
    rays1 = [_ray_through([-1.0, 0.0, 0.0], t) for t in targets]
    rays2 = [_ray_through([1.0, 0.0, 0.0], t) for t in targets]
    o1 = np.stack([r[0] for r in rays1])
    d1 = np.stack([r[1] for r in rays1])
    o2 = np.stack([r[0] for r in rays2])
    d2 = np.stack([r[1] for r in rays2])
    pts, valid = triangulate_rays(o1, d1, o2, d2, CFG)
    assert valid.all()
    np.testing.assert_allclose(np.asarray(pts), targets, atol=1e-4)


def test_track_store_merge_and_expire():
    store = TrackStore(CFG)
    store.add_target([0.0, 0.0, 5.0], now=0.0)
    store.add_target([0.2, 0.1, 5.1], now=0.1)   # within 1 m box -> merge
    assert len(store.tracks) == 1 and store.tracks[0].hits == 2
    # Bit-identical duplicate -> dropped entirely.
    store.add_target(store.tracks[0].position.copy(), now=0.15)
    assert store.tracks[0].hits == 2
    # Far target -> new track.
    store.add_target([5.0, 0.0, 10.0], now=0.2)
    assert len(store.tracks) == 2
    best = store.update(now=0.3)
    assert best is store.tracks[0]
    # Expire: after timeout both invalid; slot is reused.
    store.update(now=1.0)
    assert not any(t.valid for t in store.tracks)
    store.add_target([1.0, 1.0, 3.0], now=1.1)
    assert len(store.tracks) == 2 and store.tracks[-1].valid


def test_fusion_replay_two_arrays():
    """Offline-replay style fusion (the math_toolbox/track_algorithm.py
    workflow): two arrays at +/-1 m x-offsets see a target at known angles;
    fusion recovers its 3D position."""
    target = np.array([0.4, 0.6, 6.0])
    fusion = TargetFusion(CFG)
    fusion.add_array(None, [-1.0, 0.0, 0.0])
    fusion.add_array(None, [1.0, 0.0, 0.0])

    def spherical_of(origin, jitter):
        d = target - np.asarray(origin)
        d = d / np.linalg.norm(d)
        th, ph, _ = np.asarray(cartesian_to_spherical(d), np.float64)
        return {"theta": float(th) + jitter, "phi": float(ph), "power": 1.0,
                "probability": 1.0, "start": 0.0}

    best = None
    # Slightly jittered repeat measurements, as real tracker output would be
    # (bit-identical repeats are dropped by the duplicate gate, faithfully to
    # target_handler.cpp:91-97).
    for k in range(3):
        lists = [
            [spherical_of([-1.0, 0.0, 0.0], 1e-4 * k)],
            [spherical_of([1.0, 0.0, 0.0], -1e-4 * k)],
        ]
        best = fusion.step(now=0.01 * k, target_lists=lists)
    assert best is not None and best.hits >= 2
    np.testing.assert_allclose(best.position, target, atol=1e-3)


def test_gps_and_heading():
    gps = position_to_gps([111.111, 0.0, 10.0], 57.0, 16.0, 100.0)
    assert abs(gps["latitude"] - 57.001) < 1e-6
    assert gps["altitude"] == 110.0
    # heading 0: swap y and z (target_handler.cpp:189-196).
    rot = heading_rotation(0.0)
    np.testing.assert_allclose(rot @ np.array([1.0, 2.0, 3.0]), [1.0, 3.0, 2.0])


def test_ray_log_round_trip(tmp_path):
    """TargetFusion's ray log replays through tools/track_replay (the
    Targets.txt -> track_algorithm.py offline workflow)."""
    import subprocess
    import sys

    target = np.array([0.4, 0.6, 6.0])
    log = str(tmp_path / "Targets.txt")
    fusion = TargetFusion(CFG, log_path=log)
    fusion.add_array(None, [-1.0, 0.0, 0.0])
    fusion.add_array(None, [1.0, 0.0, 0.0])

    def spherical_of(origin, jitter):
        d = target - np.asarray(origin)
        d = d / np.linalg.norm(d)
        th, ph, _ = np.asarray(cartesian_to_spherical(d), np.float64)
        return {"theta": float(th) + jitter, "phi": float(ph), "power": 1.0,
                "probability": 1.0, "start": 0.0}

    for k in range(3):
        lists = [
            [spherical_of([-1.0, 0.0, 0.0], 1e-4 * k)],
            [spherical_of([1.0, 0.0, 0.0], -1e-4 * k)],
        ]
        fusion.step(now=0.01 * k, target_lists=lists)
    fusion._log.close()

    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "track_replay.py"), log],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert "3 ray pairs, 3 valid intersections" in out.stdout
    assert "best:" in out.stdout


def test_adaptive_merge_grows_with_hits():
    # CalculateDistanceThreshold (target_handler.cpp:116-121) applied when
    # cfg.adaptive_merge is on: a well-established track (many hits) merges
    # targets beyond the base 1 m box; a fresh track does not.
    import dataclasses

    cfg = dataclasses.replace(CFG, adaptive_merge=True)
    store = TrackStore(cfg)
    store.add_target([0.0, 0.0, 5.0], now=0.0)
    for i in range(30):  # build up hits: threshold = 1 + 0.325*log(hits)
        store.add_target([0.0, 0.0, 5.0 + 1e-6 * (i + 1)], now=0.01 * i)
    assert store.tracks[0].hits == 31
    thresh = store.adaptive_distance(store.tracks[0])
    assert thresh > 2.0
    store.add_target([0.0, 0.0, 5.0 + 0.5 * (thresh + 1.0)], now=0.5)
    assert len(store.tracks) == 1, "adaptive box should have merged"
    # Fresh store without the flag: same offset spawns a second track.
    store2 = TrackStore(CFG)
    store2.add_target([0.0, 0.0, 5.0], now=0.0)
    store2.add_target([0.0, 0.0, 5.0 + 0.5 * (thresh + 1.0)], now=0.1)
    assert len(store2.tracks) == 2

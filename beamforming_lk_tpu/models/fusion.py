"""Multi-array fusion: ray triangulation, track store, geo-referencing.

Re-design of the reference's ``src/target_handler/`` — ``triangulatePoint``
(``triangulate.cpp:10-41``), the recursive pairwise intersection sweep
(``target_handler.cpp:130-169``), the track store
(``target_handler.cpp:81-128``) and ``PositionToGPS``
(``triangulate.cpp:43-54``).  The geometry is vectorized over ALL cross-array
ray pairs at once (jnp, jittable); the tiny sequential track store runs
host-side exactly like the reference's 5 ms fusion thread.
"""

from __future__ import annotations

import dataclasses
import itertools
import math
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.config import TriangulationConfig
from beamforming_lk_tpu.ops.geometry import spherical_to_cartesian


def triangulate_rays(
    origins1,
    dirs1,
    origins2,
    dirs2,
    cfg: TriangulationConfig = TriangulationConfig(),
):
    """Closest-point triangulation for batches of ray pairs.

    All inputs [..., 3].  Returns (points [..., 3], valid [...]) — the
    midpoint of the two closest points with the reference's validity gates
    (triangulate.cpp:10-41):

    - closest approach  > ``distance_threshold``  -> invalid
    - midpoint norm     > ``max_range`` (20 m)    -> invalid
    - z1 + z2           < ``min_z`` (behind)      -> invalid
    - midpoint z        < ``near_z`` (static)     -> invalid

    Invalid pairs return the reference's {0,0,0} sentinel.
    """
    o1 = jnp.asarray(origins1, jnp.float32)
    d1 = jnp.asarray(dirs1, jnp.float32)
    o2 = jnp.asarray(origins2, jnp.float32)
    d2 = jnp.asarray(dirs2, jnp.float32)
    n = jnp.cross(d1, d2)
    nn = jnp.sum(n * n, axis=-1, keepdims=True)
    # Parallel rays: nn ~ 0 -> closest points fly to inf; guard and gate.
    safe_nn = jnp.maximum(nn, 1e-20)
    do = o2 - o1
    t1 = jnp.sum(jnp.cross(d2, n) * do, axis=-1, keepdims=True) / safe_nn
    t2 = jnp.sum(jnp.cross(d1, n) * do, axis=-1, keepdims=True) / safe_nn
    p1 = o1 + d1 * t1
    p2 = o2 + d2 * t2
    mid = (p1 + p2) / 2.0
    approach = jnp.linalg.norm(p1 - p2, axis=-1)
    valid = (
        (nn[..., 0] > 1e-20)
        & (approach <= cfg.distance_threshold)
        & (jnp.linalg.norm(mid, axis=-1) <= cfg.max_range)
        & (p1[..., 2] + p2[..., 2] >= cfg.min_z)
        & (mid[..., 2] >= cfg.near_z)
    )
    return jnp.where(valid[..., None], mid, 0.0), valid


def target_rays(targets: Sequence[dict], position) -> tuple:
    """Per-array target dicts -> (origins [N,3], unit directions [N,3]).

    The reference converts each Target's spherical direction to a world ray
    from the array's mounting position (target_handler.cpp:46-63).
    """
    position = np.asarray(position, np.float32)
    if not targets:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    dirs = np.stack(
        [
            np.asarray(
                spherical_to_cartesian(t["theta"], t["phi"]), np.float32
            )
            for t in targets
        ]
    )
    dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    origins = np.broadcast_to(position, dirs.shape).copy()
    return origins, dirs


@dataclasses.dataclass
class Track:
    """One fused track (reference: Track struct, target_handler.h)."""

    position: np.ndarray
    time_last_hit: float
    valid: bool = True
    hits: int = 1


class TrackStore:
    """Sequential track store with the reference's exact update rules
    (target_handler.cpp:65-128): merge hits within a 1 m per-axis box,
    drop bit-identical duplicates, reuse invalidated slots, expire idle
    tracks, select the best track by hit count."""

    def __init__(self, cfg: TriangulationConfig = TriangulationConfig()):
        self.cfg = cfg
        self.tracks: List[Track] = []
        self.best: Optional[Track] = None

    def adaptive_distance(self, track: Track) -> float:
        """Log-scaled per-track merge distance
        (CalculateDistanceThreshold, target_handler.cpp:116-121)."""
        return min(
            self.cfg.track_merge_distance + 0.325 * math.log(max(track.hits, 1)),
            4.0,
        )

    def add_target(self, position, now: float) -> None:
        """CheckTracksForTarget (target_handler.cpp:81-114)."""
        position = np.asarray(position, np.float64)
        invalid_index = -1
        for i, track in enumerate(self.tracks):
            if not track.valid:
                invalid_index = i
                continue
            delta = np.abs(position - track.position)
            if np.all(delta < self.cfg.track_duplicate_eps):
                return  # bit-identical: usually static noise, drop
            merge_dist = (
                self.adaptive_distance(track)
                if self.cfg.adaptive_merge
                else self.cfg.track_merge_distance
            )
            if np.all(delta < merge_dist):
                track.position = position
                track.hits += 1
                track.time_last_hit = now
                return
        if invalid_index != -1:
            self.tracks[invalid_index] = Track(position, now)
            return
        if len(self.tracks) < self.cfg.max_tracks:
            self.tracks.append(Track(position, now))

    def update(self, now: float) -> Optional[Track]:
        """UpdateTracks (target_handler.cpp:65-79): expire + pick best."""
        best_hits = -1
        for track in self.tracks:
            if now - track.time_last_hit > self.cfg.track_timeout:
                track.valid = False
                continue
            if track.valid and track.hits > best_hits:
                self.best = track
                best_hits = track.hits
        return self.best

    def valid_tracks(self) -> List[Track]:
        return [t for t in self.tracks if t.valid]


class TargetFusion:
    """The TargetHandler equivalent: fuse target lists from >= 2 arrays.

    Hold (pipeline, position) pairs; each ``step`` pulls the per-array
    target lists, triangulates every cross-array ray pair in one vectorized
    call, and feeds hits into the track store
    (reference worker loop: target_handler.cpp:27-37).
    """

    def __init__(
        self,
        cfg: TriangulationConfig = TriangulationConfig(),
        log_path: Optional[str] = None,
    ):
        self.cfg = cfg
        self.store = TrackStore(cfg)
        self.positions: List[np.ndarray] = []
        self._pipelines: List = []
        # Ray-pair debug log, the reference's Targets.txt
        # (target_handler.cpp:24-25,145-152): one line per compared pair,
        # "o1,d1;o2,d2;timestamp" with space-separated vectors.
        self._log = open(log_path, "w") if log_path else None

    def add_array(self, pipeline, position) -> "TargetFusion":
        """AddAWPU (target_handler.cpp:39-43)."""
        self._pipelines.append(pipeline)
        self.positions.append(np.asarray(position, np.float32))
        return self

    def step(self, now: float, target_lists: Optional[List[List[dict]]] = None):
        """One fusion pass; returns the current best track (or None).

        ``target_lists`` overrides pulling from the registered pipelines
        (for offline replay, the math_toolbox/track_algorithm.py workflow).
        """
        if target_lists is None:
            target_lists = [p.targets() for p in self._pipelines]
        rays = [
            target_rays(tl, pos)
            for tl, pos in zip(target_lists, self.positions)
        ]
        for (i, j) in itertools.combinations(range(len(rays)), 2):
            o1, d1 = rays[i]
            o2, d2 = rays[j]
            if len(o1) == 0 or len(o2) == 0:
                continue
            # All cross pairs between array i and array j.
            oo1 = np.repeat(o1, len(o2), axis=0)
            dd1 = np.repeat(d1, len(o2), axis=0)
            oo2 = np.tile(o2, (len(o1), 1))
            dd2 = np.tile(d2, (len(o1), 1))
            if self._log is not None:
                for k in range(len(oo1)):
                    self._log.write(
                        f"{' '.join(map(str, oo1[k]))},{' '.join(map(str, dd1[k]))};"
                        f"{' '.join(map(str, oo2[k]))},{' '.join(map(str, dd2[k]))};"
                        f"{now}\n"
                    )
            pts, valid = triangulate_rays(oo1, dd1, oo2, dd2, self.cfg)
            pts = np.asarray(pts)
            valid = np.asarray(valid)
            # The reference adds a norm-limit gate at the sweep level
            # (target_handler.cpp:154).
            norms = np.linalg.norm(pts, axis=-1)
            for p in pts[valid & (norms > 0) & (norms <= self.cfg.norm_limit)]:
                self.store.add_target(p, now)
        return self.store.update(now)


def position_to_gps(position, latitude: float, longitude: float, altitude: float):
    """Local ENU offset [3] -> (lat, lon, alt) with the reference's
    1 deg ~= 111111 m flat-earth model (triangulate.cpp:43-54)."""
    position = np.asarray(position, np.float64)
    lat = latitude + position[0] / 111111.0
    lon = longitude + position[1] / (
        111111.0 * math.cos(math.radians(latitude))
    )
    alt = altitude + position[2]
    return {
        "latitude": lat,
        "longitude": lon,
        "altitude": alt,
        "type": "GeoPoint",
    }


def heading_rotation(heading: float) -> np.ndarray:
    """The WARA PS publish rotation: swap z and y, rotate to heading
    (target_handler.cpp:189-196)."""
    c, s = math.cos(heading), math.sin(heading)
    return np.array([[c, 0.0, s], [-s, 0.0, c], [0.0, 1.0, 0.0]])

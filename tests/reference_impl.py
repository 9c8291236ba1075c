"""Plain-NumPy truth implementations of the reference math.

These are deliberately written as direct, loopy ports of the C++ semantics
(cited per function) and serve as the "NumPy truth" the reference's own
stale tests intended to compare against (tests/test_antenna.py:127-148 in
the reference tree).  The framework's vectorized/jitted ops are asserted
against these.
"""

from __future__ import annotations

import math

import numpy as np


def rotate_z(angle):
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def rotate_y(angle):
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def steering_delays_ref(points, theta, phi, samples_per_meter):
    """Port of steer() + compute_delays() (antenna.cpp:89-107)."""
    rotated = rotate_y(-theta) @ rotate_z(phi) @ np.asarray(points, np.float64)
    delays = rotated[2] * samples_per_meter
    return delays - delays.min()


def delay_ref(out, signal, fraction, n_samples):
    """Port of the active AVX2 linear-interp delay (delay.cpp:16-26)."""
    for i in range(n_samples):
        out[i] += signal[i + 1] + fraction * (signal[i] - signal[i + 1])
    return out


def das_ref(history, delays, block_start, n_samples):
    """Delay-and-sum a block: for each channel split the delay into integer
    and fractional parts as the reference does (particle.cpp:37-49) and
    accumulate the linearly-interpolated, shifted signal."""
    out = np.zeros(n_samples, np.float64)
    for c in range(history.shape[0]):
        whole = int(delays[c])  # trunc, delays >= 0
        frac = float(delays[c]) - whole
        off = block_start - whole
        delay_ref(out, history[c, off : off + n_samples + 1], frac, n_samples)
    return out


def bandpass_power_ref(out, n_samples, divisor):
    """Port of the 3-tap MA bandpass power (mimo.cpp:131-137)."""
    acc = 0.0
    for i in range(1, n_samples - 1):
        ma = out[i] * 0.5 - 0.25 * (out[i + 1] + out[i - 1])
        acc += ma * ma
    return acc / divisor


def mimo_grid_ref(rows, columns, fov_degrees):
    """Port of the heatmap direction grid (mimo.cpp:20-59): pixel -> (x, y)
    on the sin-projected FoV disc -> (theta, phi)."""
    fov = math.radians(fov_degrees)
    sep_r = math.sin(fov / 2.0) / (rows / 2.0)
    sep_c = math.sin(fov / 2.0) / (columns / 2.0)
    thetas = np.zeros((rows, columns))
    phis = np.zeros((rows, columns))
    for r in range(rows):
        for c in range(columns):
            y = r * sep_r - rows * sep_r / 2.0 + sep_r / 2.0
            x = c * sep_c - columns * sep_c / 2.0 + sep_c / 2.0
            norm = math.hypot(x, y)
            xn, yn = x / norm, y / norm
            theta = math.asin(min(norm, 1.0))
            phi = math.atan2(yn, xn)
            thetas[r, c] = theta
            phis[r, c] = phi
    return thetas, phis


def quadrant_ref(theta, phi, spread):
    """Port of Spherical::quadrant (geometry.cpp:181-217).

    Returns (probes list of (theta, phi), adjusted_theta)."""

    def to_cart(t, p):
        return np.array(
            [math.sin(t) * math.cos(p), math.sin(t) * math.sin(p), math.cos(t)]
        )

    base = np.stack(
        [to_cart(spread, math.radians(a)) for a in (45.0, 315.0, 225.0, 135.0)]
    )
    rotate_theta = theta
    adjusted = theta
    if rotate_theta + spread > math.pi / 2.0:
        rotate_theta -= spread
        adjusted = theta - spread / 2.0
    rot = rotate_y(rotate_theta) @ rotate_z(phi)
    rotated = base @ rot
    probes = []
    for k in rotated:
        new_theta = math.acos(np.clip(k[2], -1, 1))
        new_phi = math.atan2(k[1], k[0]) - math.pi
        probes.append((new_theta, new_phi))
    return probes, adjusted


def kalman_ref_matrices(dt):
    """Port of KalmanFilter3D's model matrices (kf.h:34-83)."""
    dt2, dt3, dt4, dt5, dt6 = dt**2, dt**3, dt**4, dt**5, dt**6
    a = np.eye(9)
    for i in range(3):
        a[i, i + 3] = dt
        a[i, i + 6] = dt2 / 2.0
        a[i + 3, i + 6] = dt
    q = np.zeros((9, 9))
    for i in range(3):
        q[i, i] = dt6 / 36
        q[i, i + 3] = q[i + 3, i] = dt5 / 12
        q[i, i + 6] = q[i + 6, i] = dt4 / 6
        q[i + 3, i + 3] = dt4 / 4
        q[i + 3, i + 6] = q[i + 6, i + 3] = dt3 / 2
        q[i + 6, i + 6] = dt2
    h = np.zeros((3, 9))
    h[:3, :3] = np.eye(3)
    r = np.eye(3)
    return a, q, h, r


def triangulate_ref(o1, d1, o2, d2, distance_threshold):
    """Port of triangulatePoint (triangulate.cpp:10-41)."""
    o1, d1, o2, d2 = (np.asarray(v, np.float64) for v in (o1, d1, o2, d2))
    n = np.cross(d1, d2)
    t1 = np.dot(np.cross(d2, n), o2 - o1) / np.dot(n, n)
    t2 = np.dot(np.cross(d1, n), o2 - o1) / np.dot(n, n)
    p1 = o1 + d1 * t1
    p2 = o2 + d2 * t2
    mid = (p1 + p2) / 2.0
    if (
        np.linalg.norm(p1 - p2) > distance_threshold
        or np.linalg.norm(mid) > 20.0
        or (p1 + p2)[2] < 0.0
        or mid[2] < 1.0
    ):
        return np.zeros(3)
    return mid

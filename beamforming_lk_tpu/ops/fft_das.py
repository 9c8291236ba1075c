"""Separable frequency-domain DAS heatmap for lattice apertures.

The dense shift-matmul heatmap (:mod:`ops.delay`) does ``D*C*S*T`` MACs per
block — a one-hot stencil wastes a factor ``S/taps`` (~32x) to ride the MXU.
For the configurations that actually occur — planar *rectangular-lattice*
microphone arrays (every reference array is an 8x8 grid,
``src/geometry/antenna.cpp:60-87``; clusters at array pitch are bigger
lattices) steered over the heatmap's sin-projected *tensor* direction grid
(``src/dsp/mimo.cpp:20-59``) — the DAS sum factors exactly:

    tau[d, c] = fs/c * (u_x[dx] * x[cx]  +  u_y[dy] * y[cy])

so in the frequency domain the steering phase is a tensor product and the
beamform becomes two tiny transforms (a "2-D zoom DFT"):

    X[cy, cx, f]  = rfft(window)                    # C FFTs of length L
    B1[dx, cy, f] = sum_cx Ex[f, dx, cx] X[..]      # D_x x C_x per bin
    B2[dy, dx, f] = sum_cy Ey[f, dy, cy] B1[..]     # D_y x C_y per bin
    beam[d, t]    = irfft(B2)[:T]                   # D inverse FFTs

Work drops from ``D*C*S*T`` to ``F*(Dx*Cx*Cy + D*Cy) + D*L*log L`` — about
250x fewer FLOPs at the 256-mic x 65x65 north-star config — and fractional
delays become *exact* (band-limited sinc) instead of 2-tap linear
interpolation.  The min-subtraction per direction (antenna.cpp:89-97) is
itself separable (min of a separable function over a lattice splits per
axis) and is folded into ``Ex``/``Ey`` so the time alignment matches the
dense kernel's window convention exactly.

Out-of-disc heatmap corner pixels (the reference clamps them onto the FOV
disc edge, mimo.cpp:36-43) are not on the tensor grid; they are filled from
the nearest on-disc pixel by a static gather — within one pixel pitch of
the reference's clamped direction.

Dead channels from calibration are removed by *subtracting* their rank-1
contribution (``Ex[:, :, cx0] (x) Ey[:, :, cy0] (x) X[c0]``) — exact for
binary masks; non-binary gain masks fall back to the dense kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.ops import delay as dl


@dataclasses.dataclass(frozen=True)
class Lattice:
    """Rectangular-lattice factorization of a planar element cloud."""

    x: np.ndarray      # [Cx] sorted unique x coordinates
    y: np.ndarray      # [Cy] sorted unique y coordinates
    perm: np.ndarray   # [Cy*Cx] channel index at lattice site (iy, ix), row-major


def lattice_factorization(points, tol: float = 1e-5) -> Optional[Lattice]:
    """Detect whether ``points [3, C]`` form a complete planar rectangular
    lattice (z = const, every (x, y) pair present exactly once).

    Returns None when the cloud does not factor (then use the dense kernel).
    """
    pts = np.asarray(points, np.float64)
    if pts.shape[0] != 3 or pts.shape[1] == 0:
        return None
    if np.ptp(pts[2]) > tol:
        return None  # not planar
    c = pts.shape[1]

    def _unique(v):
        sv = np.sort(v)
        edges = np.nonzero(np.diff(sv) > tol)[0]
        reps = np.concatenate([[sv[0]], sv[edges + 1]])
        return reps

    ux, uy = _unique(pts[0]), _unique(pts[1])
    if len(ux) * len(uy) != c:
        return None
    ix = np.argmin(np.abs(pts[0][None, :] - ux[:, None]), axis=0)
    iy = np.argmin(np.abs(pts[1][None, :] - uy[:, None]), axis=0)
    if np.max(np.abs(pts[0] - ux[ix])) > tol or np.max(np.abs(pts[1] - uy[iy])) > tol:
        return None
    site = iy * len(ux) + ix
    if len(np.unique(site)) != c:
        return None  # duplicate sites
    perm = np.empty(c, np.int64)
    perm[site] = np.arange(c)
    return Lattice(x=ux, y=uy, perm=perm)


def _grid_axes(mimo_cfg):
    """The heatmap's per-axis direction components (u_x[cols], u_y[rows]) —
    the tensor factors of make_mimo_grid's sin-projected pixel map."""
    fov = np.radians(mimo_cfg.fov_degrees)
    rows, cols = mimo_cfg.rows, mimo_cfg.columns
    sep_r = np.sin(fov / 2.0) / (rows / 2.0)
    sep_c = np.sin(fov / 2.0) / (cols / 2.0)
    uy = np.arange(rows) * sep_r - rows * sep_r / 2.0 + sep_r / 2.0
    ux = np.arange(cols) * sep_c - cols * sep_c / 2.0 + sep_c / 2.0
    return ux, uy


def _offdisc_gather(mimo_cfg) -> Optional[np.ndarray]:
    """[D] source index map: identity on the FOV disc, nearest on-disc
    pixel for the clamped corner pixels (mimo.cpp:36-43 analog)."""
    ux, uy = _grid_axes(mimo_cfg)
    rows, cols = mimo_cfg.rows, mimo_cfg.columns
    yy, xx = np.meshgrid(uy, ux, indexing="ij")
    norm = np.hypot(xx, yy)
    src = np.arange(rows * cols, dtype=np.int64)
    out = norm.reshape(-1) > 1.0
    if not out.any():
        return None
    # Radially project the out-of-disc pixel onto the disc, then take the
    # nearest ON-disc grid pixel (a plain snap can land on another
    # out-of-disc pixel just past the rim).
    n = norm.reshape(-1)[out]
    px = xx.reshape(-1)[out] / n
    py = yy.reshape(-1)[out] / n
    in_idx = np.nonzero(~(norm.reshape(-1) > 1.0))[0]
    gx = xx.reshape(-1)[in_idx]
    gy = yy.reshape(-1)[in_idx]
    d2 = (gx[None, :] - px[:, None]) ** 2 + (gy[None, :] - py[:, None]) ** 2
    src[out] = in_idx[d2.argmin(axis=1)]
    return src


@dataclasses.dataclass(frozen=True)
class FftHeatmapModel:
    """Static operands of the separable frequency-domain heatmap."""

    ex: jax.Array               # [F, Dx, Cx] complex64 steering factors (x)
    ey: jax.Array               # [F, Dy, Cy] complex64 steering factors (y)
    perm: jax.Array             # [C] channel -> lattice site permutation
    src_map: Optional[jax.Array]  # [D] out-of-disc gather (None if all in)
    dead: Optional[tuple]       # (xd [F,Dx,Nd], yd [F,Dy,Nd], chan [Nd])
    rows: int
    columns: int
    block_size: int
    fft_len: int
    n_active: float
    use_bandpass: bool


def make_fft_heatmap_model(
    points,
    mimo_cfg,
    dsp_cfg,
    array_cfg,
    channel_mask=None,
) -> Optional[FftHeatmapModel]:
    """Precompute the separable steering factors, or None if this
    configuration does not factor (non-lattice points / gain masks)."""
    lat = lattice_factorization(points)
    if lat is None:
        return None
    mask = None
    if channel_mask is not None:
        mask = np.asarray(channel_mask, np.float64)
        binary = np.all((mask < 1e-12) | (np.abs(mask - 1.0) < 1e-6))
        if not binary:
            return None  # gain masks are not rank-1-correctable
    taps = dl.LINEAR_TAPS if dsp_cfg.interp == "linear" else dsp_cfg.fir_taps
    s, t = dsp_cfg.shift_range, dsp_cfg.block_size
    L = s + t
    spm = array_cfg.samples_per_meter
    ux, uy = _grid_axes(mimo_cfg)

    # Window convention (ops/delay.py): beam[t] reads window position
    # t + (S - taps) - tau[d, c]; tau = raw - min_d with
    # raw = spm * (ux*x + uy*y).  The advance Delta = (S-taps) - tau is a
    # phase exp(+2i pi f Delta / L) on rfft bins; min_d = mx[dx] + my[dy]
    # splits per axis, so fold (S - taps) + mx into Ex and my into Ey.
    f = np.arange(L // 2 + 1, dtype=np.float64)
    # Steering direction row u = [sin(t)cos(p), -sin(t)sin(p), cos(t)]
    # (antenna.cpp:99-107; note the MINUS on the y component) with
    # sin(t)cos(p) = u_x and sin(t)sin(p) = u_y on the pixel grid.
    raw_x = spm * np.outer(ux, lat.x)                 # [Dx, Cx]
    raw_y = -spm * np.outer(uy, lat.y)                # [Dy, Cy]
    mx = raw_x.min(axis=1, keepdims=True)             # [Dx, 1]
    my = raw_y.min(axis=1, keepdims=True)             # [Dy, 1]
    # The +1 reproduces the reference's backwards-interp quirk: its active
    # AVX2 path effectively delays by tau - 1 (delay.cpp:24; see
    # ops/delay.py module docstring), and the dense kernel matches it — so
    # the fft backend shifts identically and the two backends agree
    # sample-for-sample in linear mode.
    dx_shift = (s - taps) + 1 + mx - raw_x            # [Dx, Cx]
    dy_shift = my - raw_y                             # [Dy, Cy]
    ex = np.exp(2j * np.pi * f[:, None, None] * dx_shift[None] / L)
    ey = np.exp(2j * np.pi * f[:, None, None] * dy_shift[None] / L)

    dead = None
    n_active = float(points.shape[1])
    if mask is not None:
        dead_chan = np.nonzero(mask < 0.5)[0]
        n_active = float(points.shape[1] - len(dead_chan))
        if len(dead_chan):
            # Lattice site of each dead channel: perm[site] = channel.
            site_of_chan = np.empty_like(lat.perm)
            site_of_chan[lat.perm] = np.arange(len(lat.perm))
            sites = site_of_chan[dead_chan]
            cxs, cys = sites % len(lat.x), sites // len(lat.x)
            dead = (
                jnp.asarray(ex[:, :, cxs], jnp.complex64),
                jnp.asarray(ey[:, :, cys], jnp.complex64),
                jnp.asarray(dead_chan),
            )
    return FftHeatmapModel(
        ex=jnp.asarray(ex, jnp.complex64),
        ey=jnp.asarray(ey, jnp.complex64),
        perm=jnp.asarray(lat.perm),
        src_map=(lambda m: None if m is None else jnp.asarray(m))(
            _offdisc_gather(mimo_cfg)
        ),
        dead=dead,
        rows=mimo_cfg.rows,
        columns=mimo_cfg.columns,
        block_size=t,
        fft_len=L,
        n_active=n_active,
        use_bandpass=dsp_cfg.use_bandpass,
    )


def fft_heatmap_powers(window, model: FftHeatmapModel):
    """Heatmap powers [rows*columns] from a DAS window [C, S+T].

    Same semantics as the dense path (band-passed mean power over the
    beamformed block, normalized by T * active channels) with exact
    band-limited fractional delays.
    """
    L, t = model.fft_len, model.block_size
    cx = model.ex.shape[-1]
    cy = model.ey.shape[-1]
    w = window[model.perm].reshape(cy, cx, -1)
    x = jnp.fft.rfft(w, n=L, axis=-1)                       # [Cy, Cx, F]
    b1 = jnp.einsum("fdc,ycf->dyf", model.ex, x)            # [Dx, Cy, F]
    b2 = jnp.einsum("fdc,xcf->dxf", model.ey, b1)           # [Dy, Dx, F]
    if model.dead is not None:
        xd, yd, chan = model.dead
        wd = window[chan]
        sd = jnp.fft.rfft(wd, n=L, axis=-1)                 # [Nd, F]
        b2 = b2 - jnp.einsum("fxn,fyn,nf->yxf", xd, yd, sd)
    beam = jnp.fft.irfft(b2, n=L, axis=-1)[..., :t]         # [Dy, Dx, T]
    beam = beam.reshape(model.rows * model.columns, t)
    powers = dl.das_power(
        beam, use_bandpass=model.use_bandpass, divisor=t * model.n_active
    )
    if model.src_map is not None:
        powers = powers[model.src_map]
    return powers

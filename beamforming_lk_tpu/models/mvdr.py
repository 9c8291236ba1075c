"""Wideband frequency-domain MVDR (Capon) beamforming.

BASELINE.json's stretch config: the reference is time-domain DAS only; an
adaptive beamformer suppresses interferers that DAS smears across the map.
TPU-native formulation, fully batched over (bins, directions):

  1. Split each [C, T] block into overlapping frames, STFT -> snapshots
     ``X[F, C]`` per frame.
  2. Per-bin spatial covariance EMA: ``R[F, C, C] <- (1-a) R + a X X^H``
     with diagonal loading (keeps R well-conditioned while the EMA warms).
  3. Steering: ``v[F, D, C] = exp(-2 pi i f tau_c / fs)`` from the SAME
     min-subtracted steering delays the DAS kernel uses (ops/antenna.py).
  4. Capon power: ``P[d] = sum_f 1 / (v^H R^-1 v)`` over selected bins —
     computed with one batched Cholesky solve over F bins.

Every step is batched linear algebra (Cholesky over [F, C, C], einsum over
[F, D, C]) — MXU work; bins are embarrassingly parallel, so on a mesh they
shard over the ``dir`` axis with no communication (the "STFT bins sharded
across the pod" story).
"""

from __future__ import annotations

import contextlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.config import ArrayConfig
from beamforming_lk_tpu.ops import antenna as ant


class MvdrState(NamedTuple):
    cov: jnp.ndarray     # [F, C, C] complex64 EMA covariance
    count: jnp.ndarray   # [] int32 blocks folded in


def _complex_safe_device():
    """A device that supports complex dtypes, or None for the default.

    Some remote-TPU deployments (the axon tunnel) reject complex64 outright
    — and the first failed complex op poisons the whole process.  MVDR is
    complex-valued linear algebra, so off-CPU backends without complex
    support pin it to the host CPU device (the heatmap/tracker fast paths
    are unaffected — they are complex-free by construction).
    """
    import os

    try:
        if jax.default_backend() == "cpu":
            return None
        # Probing with a real complex op is NOT safe — on the axon tunnel
        # the probe itself would poison the process.  Detect the tunnel by
        # its platform registration instead.
        platforms = str(os.environ.get("JAX_PLATFORMS", "")) + str(
            jax.config.jax_platforms or ""
        )
        if "axon" in platforms:
            return jax.devices("cpu")[0]
        return None
    except RuntimeError:
        return None


def mvdr_init(n_bins: int, channels: int) -> MvdrState:
    dev = _complex_safe_device()
    with jax.default_device(dev) if dev is not None else contextlib.nullcontext():
        eye = jnp.eye(channels, dtype=jnp.complex64)
        return MvdrState(
            cov=jnp.broadcast_to(eye, (n_bins, channels, channels)).astype(
                jnp.complex64
            ),
            count=jnp.zeros((), jnp.int32),
        )


def select_bins(
    frame_size: int,
    sample_rate: float,
    f_low: float = 550.0,
    f_high: float = 9000.0,
) -> np.ndarray:
    """rfft bin indices inside the band of interest (the reference's band
    envelope, filter_produce.m: 550-9000 Hz)."""
    freqs = np.fft.rfftfreq(frame_size, 1.0 / sample_rate)
    idx = np.where((freqs >= f_low) & (freqs <= f_high))[0]
    # Skip DC/nyquist edges even for wide bands.
    return idx[(idx > 0) & (idx < frame_size // 2)]


def steering_matrix(
    points,
    theta,
    phi,
    freqs_hz,
    array_cfg: ArrayConfig = ArrayConfig(),
) -> np.ndarray:
    """v[F, D, C] = exp(+2 pi i f tau / fs) from the DAS delay model.

    Sign convention: the DAS kernel reads channel c at ``t - tau_c`` (larger
    min-subtracted delay = further into the past), i.e. a plane wave from
    the steered direction satisfies ``x_c(n) = s(n + tau_c)`` — in the
    frequency domain ``X_c = S e^{+2 pi i f tau_c / fs}``, so the matched
    steering phasor carries the SAME positive sign (phase-consistent with
    ops/delay.py and io/synthetic.py).
    """
    delays = ant.steering_delays_np(
        np.asarray(points), np.asarray(theta), np.asarray(phi),
        array_cfg.samples_per_meter,
    )  # [D, C] in samples
    phase = (
        +2.0j
        * np.pi
        * np.asarray(freqs_hz)[:, None, None]
        * delays[None, :, :]
        / array_cfg.sample_rate
    )
    return np.exp(phase).astype(np.complex64)


def make_mvdr_step(
    points,
    theta,
    phi,
    array_cfg: ArrayConfig = ArrayConfig(),
    frame_size: int = 64,
    hop: int = 32,
    f_low: float = 550.0,
    f_high: float = 9000.0,
    ema_alpha: float = 0.1,
    diagonal_loading: float = 1e-3,
    channel_mask=None,
):
    """Build the jitted per-block MVDR update.

    Returns ``(step, n_bins)`` with ``step(state, block[C, T]) ->
    (state, powers[D])``.
    """
    bins = select_bins(frame_size, array_cfg.sample_rate, f_low, f_high)
    freqs = np.fft.rfftfreq(frame_size, 1.0 / array_cfg.sample_rate)[bins]
    dev = _complex_safe_device()
    with jax.default_device(dev) if dev is not None else contextlib.nullcontext():
        v = jnp.asarray(steering_matrix(points, theta, phi, freqs, array_cfg))
        window_fn = jnp.asarray(np.hanning(frame_size).astype(np.float32))
        mask = (
            None if channel_mask is None else jnp.asarray(channel_mask, jnp.float32)
        )

    impl = _make_mvdr_impl(
        frame_size, hop, window_fn, mask, ema_alpha, diagonal_loading
    )
    bins_j = jnp.asarray(bins)
    binw = jnp.ones((len(bins),), jnp.float32)

    jitted = jax.jit(lambda state, block, vv, bb, ww: impl(state, block, vv, bb, ww))

    def step(state: MvdrState, block):
        if dev is None:
            return jitted(state, block, v, bins_j, binw)
        with jax.default_device(dev):
            # The block may live on the (complex-incapable) accelerator;
            # route it through the host.
            block = jax.device_put(np.asarray(block), dev)
            return jitted(state, block, v, bins_j, binw)

    return step, len(bins)


def _make_mvdr_impl(frame_size, hop, window_fn, mask, ema_alpha,
                    diagonal_loading, axis_name=None):
    """Core per-block update over a (possibly sharded) bin subset.

    ``v_local`` [F_loc, D, C], ``bins_local`` [F_loc] rfft indices,
    ``binw_local`` [F_loc] per-bin weights (0 for padding bins).  With
    ``axis_name`` the bins are a mesh shard: each shard STFTs the (tiny,
    replicated) block, solves only its own bins' Cholesky systems, and the
    Capon powers psum across shards — bins are embarrassingly parallel, so
    this scales the heaviest MVDR cost (F Cholesky factorizations) linearly.
    """

    def impl(state: MvdrState, block, v_local, bins_local, binw_local):
        c, t = block.shape
        n_frames = (t - frame_size) // hop + 1
        starts = jnp.arange(n_frames) * hop
        frames = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(block, s, frame_size, axis=1)
        )(starts)                                   # [M, C, frame]
        if mask is not None:
            frames = frames * mask[None, :, None]
        spec = jnp.fft.rfft(frames * window_fn[None, None, :], axis=-1)
        snaps = spec[:, :, bins_local]              # [M, C, F_loc]
        snaps = jnp.transpose(snaps, (2, 1, 0))     # [F_loc, C, M]
        # Per-bin sample covariance of this block.
        r_new = jnp.einsum(
            "fcm,fdm->fcd", snaps, jnp.conj(snaps)
        ) / n_frames                                 # [F_loc, C, C]
        warm = state.count > 0
        alpha = jnp.where(warm, ema_alpha, 1.0).astype(jnp.float32)
        cov = (1.0 - alpha) * state.cov + alpha * r_new

        # Diagonal loading scaled to the average channel power per bin.
        tr = jnp.real(jnp.trace(cov, axis1=-2, axis2=-1))[:, None]  # [F, 1]
        load = (diagonal_loading * tr / c + 1e-12).astype(jnp.float32)
        eye = jnp.eye(c, dtype=cov.dtype)
        r_loaded = cov + load[..., None] * eye

        # Capon spectrum: P = 1 / (v^H R^-1 v), batched Cholesky solve.
        chol = jax.lax.linalg.cholesky(r_loaded)            # [F, C, C]
        vt = jnp.transpose(v_local, (0, 2, 1))              # [F, C, D]
        y = jax.lax.linalg.triangular_solve(
            chol, vt, left_side=True, lower=True
        )                                                   # L y = v
        denom = jnp.sum(jnp.real(y * jnp.conj(y)), axis=1)  # [F, D]
        per_bin = binw_local[:, None] / jnp.maximum(denom, 1e-20)
        powers = jnp.sum(per_bin, axis=0)                   # [D]
        if axis_name is not None:
            powers = jax.lax.psum(powers, axis_name)
        new_state = MvdrState(cov=cov, count=state.count + 1)
        return new_state, powers

    return impl


def make_sharded_mvdr_step(
    points,
    theta,
    phi,
    mesh,
    axis_name: str = "dir",
    array_cfg: ArrayConfig = ArrayConfig(),
    frame_size: int = 64,
    hop: int = 32,
    f_low: float = 550.0,
    f_high: float = 9000.0,
    ema_alpha: float = 0.1,
    diagonal_loading: float = 1e-3,
    channel_mask=None,
):
    """Bin-sharded MVDR (the "STFT bins across the pod" stretch config).

    Returns ``(step, state)``: bins pad up to the shard count (padding bins
    carry zero weight), the per-bin covariance EMA lives sharded on its
    shard, and only the [D] Capon powers cross the mesh (one psum).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    bins = select_bins(frame_size, array_cfg.sample_rate, f_low, f_high)
    pad = (-len(bins)) % n_shards
    bins_p = np.concatenate([bins, np.repeat(bins[-1:], pad)])
    binw_p = np.concatenate(
        [np.ones(len(bins), np.float32), np.zeros(pad, np.float32)]
    )
    freqs = np.fft.rfftfreq(frame_size, 1.0 / array_cfg.sample_rate)[bins_p]
    v = steering_matrix(points, theta, phi, freqs, array_cfg)
    window_fn = jnp.asarray(np.hanning(frame_size).astype(np.float32))
    mask = None if channel_mask is None else jnp.asarray(channel_mask, jnp.float32)

    impl = _make_mvdr_impl(
        frame_size, hop, window_fn, mask, ema_alpha, diagonal_loading,
        axis_name=axis_name,
    )
    f_pad = len(bins_p)
    c = np.asarray(points).shape[1]

    state_spec = MvdrState(cov=P(axis_name, None, None), count=P())
    sharded = jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(state_spec, P(None, None), P(axis_name, None, None),
                  P(axis_name), P(axis_name)),
        out_specs=(state_spec, P()),
    )
    shard = NamedSharding(mesh, P(axis_name))
    v_dev = jax.device_put(
        jnp.asarray(v), NamedSharding(mesh, P(axis_name, None, None))
    )
    bins_dev = jax.device_put(jnp.asarray(bins_p), shard)
    binw_dev = jax.device_put(jnp.asarray(binw_p), shard)
    jitted = jax.jit(sharded)

    def step(state, block):
        return jitted(state, block, v_dev, bins_dev, binw_dev)

    state = MvdrState(
        cov=jax.device_put(
            jnp.broadcast_to(
                jnp.eye(c, dtype=jnp.complex64), (f_pad, c, c)
            ).astype(jnp.complex64),
            NamedSharding(mesh, P(axis_name, None, None)),
        ),
        count=jnp.zeros((), jnp.int32),
    )
    return step, state

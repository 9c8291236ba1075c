"""Wideband (incoherent) MUSIC direction-of-arrival estimation.

Third beamforming family beyond the reference's time-domain DAS (and this
framework's MVDR/Capon): subspace DOA.  Per frequency bin, the EMA spatial
covariance (same state machinery as :mod:`models.mvdr`) is
eigendecomposed; the noise subspace — the C−K smallest eigenvectors — is
orthogonal to the K source steering vectors, so the pseudo-spectrum

    P[d] = sum_f  1 / || En[f]^H v[f, d] ||^2

spikes sharply at source directions, with resolution far beyond the
aperture's beamwidth (super-resolution).  Incoherent wideband combining:
bins are averaged after the per-bin pseudo-spectrum, the standard
incoherent-MUSIC recipe.

Complex eigendecomposition does not exist on every accelerator backend —
like MVDR this pins itself to the host CPU device on platforms without
complex support (models/mvdr._complex_safe_device); the DAS/fft heatmap
fast paths are unaffected.
"""

from __future__ import annotations

import contextlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.config import ArrayConfig
from beamforming_lk_tpu.models.mvdr import (
    _complex_safe_device,
    select_bins,
    steering_matrix,
)


class MusicState(NamedTuple):
    cov: jnp.ndarray     # [F, C, C] complex64 EMA covariance
    count: jnp.ndarray   # [] int32 blocks folded in


def music_init(n_bins: int, channels: int) -> MusicState:
    dev = _complex_safe_device()
    with jax.default_device(dev) if dev is not None else contextlib.nullcontext():
        eye = jnp.eye(channels, dtype=jnp.complex64)
        return MusicState(
            cov=jnp.broadcast_to(eye, (n_bins, channels, channels)).astype(
                jnp.complex64
            ),
            count=jnp.zeros((), jnp.int32),
        )


def make_music_step(
    points,
    theta,
    phi,
    array_cfg: ArrayConfig = ArrayConfig(),
    n_sources: int = 3,
    frame_size: int = 64,
    hop: int = 32,
    f_low: float = 550.0,
    f_high: float = 9000.0,
    ema_alpha: float = 0.1,
    channel_mask=None,
):
    """Build the jitted per-block MUSIC update.

    Returns ``(step, n_bins)`` with ``step(state, block[C, T]) ->
    (state, pseudo[D])``.  ``n_sources`` is the assumed model order K (the
    noise subspace spans the C−K weakest eigenvectors; overestimating K a
    little is benign, underestimating merges nearby sources).
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
    bins_j = jnp.asarray(bins)
    c = int(np.asarray(points).shape[1])
    k = int(n_sources)
    if not 0 < k < c:
        raise ValueError(f"n_sources must be in (0, {c}), got {k}")

    def impl(state: MusicState, block, v_local, bins_local):
        n_frames = (block.shape[1] - frame_size) // hop + 1
        starts = jnp.arange(n_frames) * hop
        frames = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(block, s, frame_size, axis=1)
        )(starts)                                   # [M, C, frame]
        if mask is not None:
            frames = frames * mask[None, :, None]
        spec = jnp.fft.rfft(frames * window_fn[None, None, :], axis=-1)
        snaps = jnp.transpose(spec[:, :, bins_local], (2, 1, 0))  # [F, C, M]
        r_new = jnp.einsum("fcm,fdm->fcd", snaps, jnp.conj(snaps)) / n_frames
        warm = state.count > 0
        alpha = jnp.where(warm, ema_alpha, 1.0).astype(jnp.float32)
        cov = (1.0 - alpha) * state.cov + alpha * r_new

        # Hermitian eigendecomposition, ascending eigenvalues: the first
        # C - K eigenvectors span the noise subspace.
        vals, vecs = jnp.linalg.eigh(cov)           # [F, C], [F, C, C]
        en = vecs[..., : c - k]                      # [F, C, C-K]
        # Projection of each steering vector onto the noise subspace.
        y = jnp.einsum("fcn,fdc->fdn", jnp.conj(en), v_local)  # [F, D, C-K]
        denom = jnp.sum(jnp.real(y * jnp.conj(y)), axis=-1)    # [F, D]
        # SNR-weighted incoherent combining: weight each bin by its signal
        # eigenvalue mass above the noise floor, so noise-only bins (whose
        # "noise subspace" is random) do not dilute narrowband sources.
        noise_mean = jnp.mean(vals[..., : c - k], axis=-1)     # [F]
        sig = jnp.maximum(
            jnp.sum(vals[..., c - k:], axis=-1) - k * noise_mean, 0.0
        )
        w = sig / jnp.maximum(jnp.sum(sig), 1e-30)             # [F]
        pseudo = jnp.sum(w[:, None] / jnp.maximum(denom, 1e-12), axis=0)
        return MusicState(cov=cov, count=state.count + 1), pseudo

    jitted = jax.jit(impl)

    def step(state: MusicState, block):
        if dev is None:
            return jitted(state, block, v, bins_j)
        with jax.default_device(dev):
            block = jax.device_put(np.asarray(block), dev)
            return jitted(state, block, v, bins_j)

    return step, len(bins)

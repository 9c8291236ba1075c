"""Wideband (incoherent) MUSIC direction-of-arrival estimation — complex-free.

Third beamforming family beyond the reference's time-domain DAS (and this
framework's MVDR/Capon): subspace DOA.  Per frequency bin, the EMA spatial
covariance (same re/im-plane state machinery as :mod:`models.mvdr`) is
eigendecomposed; the noise subspace — orthogonal to the K source steering
vectors — makes the pseudo-spectrum

    P[d] = sum_f  1 / || En[f]^H v[f, d] ||^2

spike sharply at source directions, with resolution far beyond the
aperture's beamwidth (super-resolution).  Incoherent wideband combining:
bins are averaged after the per-bin pseudo-spectrum, the standard
incoherent-MUSIC recipe.

Complex-free on every backend (TPU included): the Hermitian covariance
``R = Re + i Im`` is embedded as the real symmetric ``M = [[Re, -Im],
[Im, Re]]`` whose eigenvalues are R's, each doubled, and whose eigenspaces
are the embeddings of R's — so the noise projector of ``M`` (the 2(C-K)
weakest eigenvectors) computes exactly the complex noise-projection norm:
``||En^H v||^2 = || Ên^T v_emb ||^2``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.config import ArrayConfig
from beamforming_lk_tpu.models.mvdr import (
    _attach_scan,
    _stft_snapshots,
    dft_tables,
    hermitian_embed,
    select_bins,
    steering_matrix,
)


class MusicState(NamedTuple):
    cov_re: jnp.ndarray  # [F, C, C] float32, symmetric plane of R
    cov_im: jnp.ndarray  # [F, C, C] float32, antisymmetric plane of R
    count: jnp.ndarray   # [] int32 blocks folded in


def music_init(n_bins: int, channels: int) -> MusicState:
    eye = jnp.eye(channels, dtype=jnp.float32)
    return MusicState(
        cov_re=jnp.broadcast_to(eye, (n_bins, channels, channels)).astype(
            jnp.float32
        ),
        cov_im=jnp.zeros((n_bins, channels, channels), jnp.float32),
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
    v = jnp.asarray(steering_matrix(points, theta, phi, freqs, array_cfg))
    dft_t = jnp.asarray(dft_tables(frame_size, bins))
    mask = (
        None if channel_mask is None else jnp.asarray(channel_mask, jnp.float32)
    )
    c = int(np.asarray(points).shape[1])
    k = int(n_sources)
    if not 0 < k < c:
        raise ValueError(f"n_sources must be in (0, {c}), got {k}")

    impl = _make_music_impl(frame_size, hop, mask, ema_alpha, c, k)
    jitted = jax.jit(impl)

    def step(state: MusicState, block):
        return jitted(state, jnp.asarray(block, jnp.float32), v, dft_t)

    step.scan = _attach_scan(impl, (v, dft_t))
    return step, len(bins)


def _make_music_impl(frame_size, hop, mask, ema_alpha, c, k):
    """Per-block MUSIC update with operands (steering planes, DFT tables)
    as explicit arguments — shared by :func:`make_music_step` and the TPU
    benchmark (which builds the 95 MB steering planes on device)."""

    def impl(state: MusicState, block, v_local, dft_local):
        xr, xi, n_frames = _stft_snapshots(block, dft_local, frame_size, hop, mask)
        r_re = (
            jnp.einsum("fcm,fdm->fcd", xr, xr)
            + jnp.einsum("fcm,fdm->fcd", xi, xi)
        ) / n_frames
        r_im = (
            jnp.einsum("fcm,fdm->fcd", xi, xr)
            - jnp.einsum("fcm,fdm->fcd", xr, xi)
        ) / n_frames
        warm = state.count > 0
        alpha = jnp.where(warm, ema_alpha, 1.0).astype(jnp.float32)
        cov_re = (1.0 - alpha) * state.cov_re + alpha * r_re
        cov_im = (1.0 - alpha) * state.cov_im + alpha * r_im

        # Real symmetric eigendecomposition of the embedding, ascending:
        # R's eigenvalues each appear twice; the first 2(C-K) eigenvectors
        # span (the embedding of) the noise subspace.
        m = hermitian_embed(cov_re, cov_im)          # [F, 2C, 2C]
        vals, vecs = jnp.linalg.eigh(m)              # [F, 2C], [F, 2C, 2C]
        n_noise = 2 * (c - k)
        en = vecs[..., :n_noise]                     # [F, 2C, 2(C-K)]
        v_emb = jnp.concatenate([v_local[0], v_local[1]], axis=-1)  # [F, D, 2C]
        # Noise-projection norm of each steering vector (equals the complex
        # ||En^H v||^2 — the projector is basis-independent per eigenspace).
        y = jnp.einsum("fcn,fdc->fdn", en, v_emb)    # [F, D, 2(C-K)]
        denom = jnp.sum(y * y, axis=-1)              # [F, D]
        # SNR-weighted incoherent combining: weight each bin by its signal
        # eigenvalue mass above the noise floor, so noise-only bins (whose
        # "noise subspace" is random) do not dilute narrowband sources.
        # (Doubled embedding eigenvalues cancel in the normalization.)
        noise_mean = jnp.mean(vals[..., :n_noise], axis=-1)        # [F]
        sig = jnp.maximum(
            jnp.sum(vals[..., n_noise:], axis=-1) - 2 * k * noise_mean, 0.0
        )
        w = sig / jnp.maximum(jnp.sum(sig), 1e-30)                 # [F]
        pseudo = jnp.sum(w[:, None] / jnp.maximum(denom, 1e-12), axis=0)
        new_state = MusicState(cov_re=cov_re, cov_im=cov_im,
                               count=state.count + 1)
        return new_state, pseudo

    return impl

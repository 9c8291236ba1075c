"""MISO steered-listening ("audio zoom") model.

Re-design of the reference's ``MISOWorker`` (``src/dsp/miso.cpp``): a single
tracker particle pinned by UI clicks re-centers on the source with 3 slow
monopulse steps per block, then the delay-and-sum *time-domain beam* for the
current direction is emitted as the audio block the playback/recording path
consumes (miso.cpp:25-55).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, TrackerConfig
from beamforming_lk_tpu.models.tracker import Particles, _monopulse_step
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl


class MisoState(NamedTuple):
    particle: Particles      # batch of 1
    tracking: jnp.ndarray    # [] bool


def miso_init(theta=0.0, phi=0.0) -> MisoState:
    z = jnp.zeros((1,), jnp.float32)
    return MisoState(
        particle=Particles(
            theta=jnp.full((1,), theta, jnp.float32),
            phi=jnp.full((1,), phi, jnp.float32),
            grad_theta=z,
            grad_phi=z,
            radius=z,
            error=z,
        ),
        tracking=jnp.asarray(True),
    )


def miso_steer(state: MisoState, theta, phi) -> MisoState:
    """Pin the listener to a direction (click-to-steer; miso.cpp:14-19)."""
    return MisoState(
        particle=state.particle._replace(
            theta=jnp.full((1,), theta, jnp.float32),
            phi=jnp.full((1,), phi, jnp.float32),
        ),
        tracking=jnp.asarray(True),
    )


def make_miso_step_impl(
    cfg: TrackerConfig,
    dsp: DspConfig,
    array_cfg: ArrayConfig,
    fir_bank=None,
    refine_steps: int = 3,
    axis_name=None,
    probe_span=None,
):
    """Build the *unjitted* per-block MISO update with the array model as
    runtime operands (see :func:`make_swarm_step_impl` for the sharding
    contract).

    Returns ``step(state, window, points, channel_mask) -> (state, beam[T])``.
    """
    if dsp.interp == "fir" and fir_bank is None:
        fir_bank = dl.fractional_delay_fir_bank(dsp.fir_phases, dsp.fir_taps)
    bank = None if dsp.interp == "linear" else jnp.asarray(fir_bank)

    base_mono = functools.partial(
        _monopulse_step,
        window=None,
        theta_limit=cfg.theta_limit,
        shift_range=dsp.shift_range,
        mode=dsp.interp,
        fir_bank=bank,
        samples_per_meter=array_cfg.samples_per_meter,
        axis_name=axis_name,
        compute=dsp.probe_compute,
        probe_layout=cfg.probe_layout,
    )
    span = (
        dsp.shift_range
        if probe_span is None
        else min(probe_span, dsp.shift_range)
    )

    def step(state: MisoState, window, points, channel_mask):
        # Hoisted loop-invariant window unfold shared by the refine chain
        # (compute dtype) and the audio beam (f32); see ops.delay.das_beam_unfolded.
        pw = (
            window
            if span >= dsp.shift_range
            else window[..., dsp.shift_range - span:]
        )
        unf_f32 = dl.unfold_window(pw, span, pw.shape[-1] - span)
        unf = (
            unf_f32.astype(jnp.bfloat16)
            if dsp.probe_compute == "bfloat16"
            else unf_f32
        )
        mono = functools.partial(
            base_mono, points=points, channel_mask=channel_mask, unfolded=unf
        )
        particle = state.particle
        active = jnp.ones((1,), bool)
        for _ in range(refine_steps):
            particle = mono(
                particle,
                active,
                rate=cfg.tracker_step_gain * cfg.tracker_spread / 3.0,
                spread=cfg.tracker_spread,
            )

        delays = ant.steering_delays(
            points,
            particle.theta,
            particle.phi,
            array_cfg.samples_per_meter,
            axis_name=axis_name,
        )  # [1, C]
        # Audio beam stays float32; the tight span gives identical samples
        # (window sliced by the same constant the shift base moves).
        w = dl.das_weights(delays, span, dsp.interp, bank)
        if channel_mask is not None:
            w = w * channel_mask[..., :, None]
        beam = dl.das_beam_unfolded(unf_f32, w, axis_name=axis_name)[0]  # [T]
        return MisoState(particle=particle, tracking=state.tracking), beam

    return step


def make_miso_step(
    points,
    cfg: TrackerConfig,
    dsp: DspConfig,
    array_cfg: ArrayConfig,
    channel_mask=None,
    fir_bank=None,
    refine_steps: int = 3,
):
    """Build the jitted single-device per-block MISO update.

    Returns ``step(state, window) -> (state, beam[T])``: 3 tracker steps at
    rate/10 (miso.cpp:39-40), then the DAS beam for the refined direction.
    """
    taps = dl.LINEAR_TAPS if dsp.interp == "linear" else dsp.fir_taps
    span = dl.probe_span(
        points, array_cfg.samples_per_meter, taps, dsp.shift_range
    )
    impl = make_miso_step_impl(
        cfg, dsp, array_cfg, fir_bank, refine_steps=refine_steps, probe_span=span
    )
    points = jnp.asarray(points, jnp.float32)
    mask = None if channel_mask is None else jnp.asarray(channel_mask, jnp.float32)

    @jax.jit
    def step(state: MisoState, window):
        return impl(state, window, points, mask)

    return step

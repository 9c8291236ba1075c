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


def make_miso_step(
    points,
    cfg: TrackerConfig,
    dsp: DspConfig,
    array_cfg: ArrayConfig,
    channel_mask=None,
    fir_bank=None,
    refine_steps: int = 3,
):
    """Build the jitted per-block MISO update.

    Returns ``step(state, window) -> (state, beam[T])``: 3 tracker steps at
    rate/10 (miso.cpp:39-40), then the DAS beam for the refined direction.
    """
    points = jnp.asarray(points, jnp.float32)
    mask = None if channel_mask is None else jnp.asarray(channel_mask, jnp.float32)
    if dsp.interp == "fir" and fir_bank is None:
        fir_bank = dl.fractional_delay_fir_bank(dsp.fir_phases, dsp.fir_taps)
    bank = None if dsp.interp == "linear" else jnp.asarray(fir_bank)
    taps = dl.LINEAR_TAPS if dsp.interp == "linear" else dsp.fir_taps

    mono = functools.partial(
        _monopulse_step,
        points=points,
        channel_mask=mask,
        theta_limit=cfg.theta_limit,
        shift_range=dsp.shift_range,
        mode=dsp.interp,
        fir_bank=bank,
        samples_per_meter=array_cfg.samples_per_meter,
    )

    @jax.jit
    def step(state: MisoState, window):
        b0 = dsp.shift_range - taps
        raw = jax.lax.dynamic_slice_in_dim(window[0], b0, dsp.block_size)
        reference = dl.das_power(raw, use_bandpass=True, divisor=dsp.block_size - 2)

        particle = state.particle
        active = jnp.ones((1,), bool)
        for _ in range(refine_steps):
            particle = mono(
                particle,
                active,
                window,
                rate=cfg.tracker_step_gain * cfg.tracker_spread / 3.0,
                spread=cfg.tracker_spread,
            )

        delays = ant.steering_delays(
            points, particle.theta, particle.phi, array_cfg.samples_per_meter
        )  # [1, C]
        w = dl.das_weights(delays, dsp.shift_range, dsp.interp, bank)
        if mask is not None:
            w = w * mask[..., :, None]
        beam = dl.das_beam(window, w)[0]                   # [T]
        return MisoState(particle=particle, tracking=state.tracking), beam

    return step

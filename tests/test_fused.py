"""Parity of the fused swarm+MISO monopulse chain with the unfused impls.

``make_fused_step_impl`` batches tracker sub-step, seeker, and MISO-refine
probe evaluations into shared DAS dispatches (extra MXU rows).  Per-row
matmul results are independent of the other rows in a batch, so every
particle's trajectory must match the unfused
``make_swarm_step_impl`` + ``make_miso_step_impl`` composition exactly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beamforming_lk_tpu.config import ArrayConfig, Config, DspConfig, TrackerConfig
from beamforming_lk_tpu.io import ring_init, ring_push, ring_window
from beamforming_lk_tpu.io.synthetic import synthetic_blocks
from beamforming_lk_tpu.models import miso as ms
from beamforming_lk_tpu.models import tracker as trk
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl

ACFG = ArrayConfig()
TCFG = TrackerConfig(
    n_seekers=8, n_trackers=4, iterations=4, fov_degrees=120.0,
    seeker_reset_interval=64,
)
SOURCES = [(math.radians(25.0), math.radians(60.0), 5000.0)]


def _tree_allclose(a, b, **kw):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), **kw)


@pytest.mark.parametrize("probe_compute", ["float32", "bfloat16"])
def test_fused_step_parity(probe_compute):
    dsp = DspConfig(probe_compute=probe_compute)
    pts_np = ant.create_antenna_grid(8, 8, 0.02)
    pts = jnp.asarray(pts_np)
    taps = dl.LINEAR_TAPS
    span = dl.probe_span(pts_np, ACFG.samples_per_meter, taps, dsp.shift_range)

    swarm_impl = trk.make_swarm_step_impl(TCFG, dsp, ACFG, probe_span=span)
    miso_impl = ms.make_miso_step_impl(TCFG, dsp, ACFG, probe_span=span)
    fused_impl = trk.make_fused_step_impl(TCFG, dsp, ACFG, probe_span=span)

    sw_a = sw_b = trk.swarm_init(TCFG, jax.random.PRNGKey(3))
    mi_a = ms.miso_init(math.radians(20.0), math.radians(50.0))
    mi_b_particle = mi_a.particle

    hist = ring_init(64, dsp.history)
    for i, b in enumerate(synthetic_blocks(pts_np, SOURCES, 8, amplitude=1e-2)):
        hist = ring_push(hist, b)
        window = ring_window(hist, dsp.block_size, dsp.shift_range, taps)
        sw_a, tg_a = swarm_impl(sw_a, window, np.int32(i), pts, None)
        mi_a, beam_a = miso_impl(mi_a, window, pts, None)
        sw_b, tg_b, mi_b_particle, beam_b = fused_impl(
            sw_b, mi_b_particle, window, np.int32(i), pts, None
        )
        # Not bit-exact: the batched per-particle-spread probe construction
        # reassociates a few float ops (~1e-6 rel); discrete divergence
        # (merge/promote flips) would show up as O(1) mismatches.
        _tree_allclose(sw_a, sw_b, rtol=1e-4, atol=1e-6)
        _tree_allclose(tg_a, tg_b, rtol=1e-4, atol=1e-6)
        _tree_allclose(mi_a.particle, mi_b_particle, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(beam_a), np.asarray(beam_b), rtol=1e-4, atol=1e-6
        )


def test_awpu_uses_fused_path_and_tracks():
    # End-to-end: the default awpu step (fused chain) still locks onto the
    # synthetic source and emits a coherent MISO beam.
    from beamforming_lk_tpu.app import awpu_init, make_awpu_step
    from beamforming_lk_tpu.ops.geometry import spherical_angle

    cfg = Config(tracker=TCFG)
    pts_np = ant.create_antenna_grid(8, 8, 0.02)
    step = make_awpu_step(pts_np, cfg)
    state = awpu_init(cfg, 64, seed=0)
    out = None
    for b in synthetic_blocks(pts_np, SOURCES, 20, amplitude=1e-2):
        state, out = step(state, jnp.asarray(b))
    valid = np.asarray(out.targets.valid)
    assert valid.any()
    d = np.degrees(
        np.asarray(
            spherical_angle(
                np.asarray(out.targets.theta)[valid],
                np.asarray(out.targets.phi)[valid],
                SOURCES[0][0],
                SOURCES[0][1],
            )
        )
    )
    assert d.min() < 10.0
    assert float(np.abs(np.asarray(out.miso_beam)).max()) > 0.0


def test_fused_chunk_scan_matches_per_block_scan():
    """The app-level chunked fused path (DspConfig.fused_chunk: K blocks
    per swarm_chunk_pallas call + per-chunk batched heatmap decimation)
    produces per-block outputs identical to the per-block scan."""
    import dataclasses

    import numpy as np

    from beamforming_lk_tpu.app import awpu_init, make_awpu_step
    from beamforming_lk_tpu.config import Config, DspConfig, MimoConfig

    pts = ant.create_antenna_grid(8, 8, 0.02)
    base = Config(
        mimo=MimoConfig(rows=12, columns=12, heatmap_every=3),
        tracker=TrackerConfig(
            n_seekers=8, n_trackers=4, iterations=2,
            probe_kernel="pallas", seeker_reset_interval=4,
        ),
    )
    cfg_chunk = dataclasses.replace(
        base, dsp=dataclasses.replace(base.dsp, fused_chunk=6)
    )
    blocks = jnp.stack(list(synthetic_blocks(pts, SOURCES, 12,
                                             amplitude=1e-2)))
    step_a = make_awpu_step(pts, base)
    step_b = make_awpu_step(pts, cfg_chunk)
    state_a = awpu_init(base, 64, seed=1)
    state_b = awpu_init(cfg_chunk, 64, seed=1)
    state_a, out_a = step_a.scan(state_a, blocks)
    state_b, out_b = step_b.scan(state_b, blocks)
    np.testing.assert_array_equal(
        np.asarray(out_b.targets.valid), np.asarray(out_a.targets.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out_b.targets.theta), np.asarray(out_a.targets.theta),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_b.powers), np.asarray(out_a.powers),
        rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(out_b.prev_max), np.asarray(out_a.prev_max), rtol=1e-5
    )
    scale = max(float(np.abs(np.asarray(out_a.miso_beam)).max()), 1e-12)
    np.testing.assert_allclose(
        np.asarray(out_b.miso_beam) / scale,
        np.asarray(out_a.miso_beam) / scale, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.swarm.tracking), np.asarray(state_a.swarm.tracking)
    )
    assert int(np.asarray(state_b.block_index)) == 12


def test_fused_chunk_vmem_gate_falls_back(capsys):
    """A chunk whose VMEM-resident windows exceed the budget (large
    apertures: span*C scales with channels) is refused with a stderr note
    and the step silently uses the per-block path (app/awpu.py gate)."""
    import dataclasses

    from beamforming_lk_tpu.app import awpu_init, make_awpu_step
    from beamforming_lk_tpu.config import Config, DspConfig, MimoConfig
    from beamforming_lk_tpu.ops import antenna as ant_ops

    pts = ant_ops.multi_array_cluster(256, 8, 8, 0.02)
    cfg = Config(
        dsp=DspConfig(fused_chunk=48, shift_range=128, history=2048),
        mimo=MimoConfig(rows=8, columns=8),
        tracker=TrackerConfig(iterations=2, probe_kernel="pallas",
                              n_seekers=4, n_trackers=2),
    )
    step = make_awpu_step(pts, cfg)
    err = capsys.readouterr().err
    assert "VMEM" in err and "per-block fused step" in err
    # And the step still runs (per-block path).
    state = awpu_init(cfg, 256, seed=0)
    blocks = jnp.stack(list(synthetic_blocks(
        pts, SOURCES, 2, amplitude=1e-2
    )))
    state, out = step.scan(state, blocks)
    assert np.isfinite(np.asarray(out.prev_max)).all()


def test_fused_step_requires_enough_slots():
    dsp = DspConfig()
    with pytest.raises(ValueError):
        trk.make_fused_step_impl(
            TrackerConfig(iterations=1, tracker_steps=2), dsp, ACFG,
            miso_refine_steps=3,
        )

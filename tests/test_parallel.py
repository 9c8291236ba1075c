"""Sharded DAS must match the single-device path bit-for-bit in structure
and numerically to float tolerance, on an 8-virtual-device CPU mesh
(conftest.py) — the multi-FPGA offline-test strategy of the reference
(udpreplay, ``udp/README.md``) without hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
from beamforming_lk_tpu.io import ring as rg
from beamforming_lk_tpu.io.synthetic import plane_wave_block
from beamforming_lk_tpu.models import mimo as mm
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl
from beamforming_lk_tpu.parallel import (
    make_sharded_das_power,
    make_time_sharded_beam,
    mesh as pm,
    shard_window,
    shard_weights,
)
from beamforming_lk_tpu.parallel.das import make_sharded_mimo_step


ACFG = ArrayConfig()
DCFG = DspConfig(shift_range=64)
MCFG = MimoConfig(rows=16, columns=16)


def _setup(c_pad_to=64):
    points = ant.create_antenna_grid(ACFG.columns, ACFG.rows, ACFG.distance)
    model = mm.make_mimo_model(points, MCFG, DCFG, ACFG)
    block = plane_wave_block(
        points, [(0.4, 1.0, 4000.0)], 0, DCFG.block_size, ACFG, noise_std=0.05
    )
    hist = rg.ring_init(points.shape[1], DCFG.history)
    hist = rg.ring_push(hist, jnp.asarray(block))
    window = rg.ring_window(hist, DCFG.block_size, DCFG.shift_range, model.taps)
    return points, model, np.asarray(window), np.asarray(block), np.asarray(hist)


def test_mesh_factoring():
    m = pm.make_mesh()
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == (pm.CH_AXIS, pm.DIR_AXIS)


def test_channel_dir_sharded_power_matches_dense():
    points, model, window, _, _ = _setup()
    mesh = pm.make_mesh((2, 4))
    f = make_sharded_das_power(mesh, use_bandpass=True)
    w_sh = shard_window(jnp.asarray(window), mesh)
    wt_sh = shard_weights(model.weights, mesh)
    got = np.asarray(f(w_sh, wt_sh))
    want = np.asarray(mm.mimo_power(jnp.asarray(window), model))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-12)


def test_dir_only_sharding():
    points, model, window, _, _ = _setup()
    mesh = pm.make_mesh((1, 8))
    f = make_sharded_das_power(mesh, use_bandpass=True)
    got = np.asarray(
        f(shard_window(jnp.asarray(window), mesh), shard_weights(model.weights, mesh))
    )
    want = np.asarray(mm.mimo_power(jnp.asarray(window), model))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-12)


def test_time_sharded_beam_matches_dense():
    points, model, window, _, _ = _setup()
    s = DCFG.shift_range
    window = jnp.asarray(window)
    history_tail = window[:, :s]           # the S samples before the block
    block = window[:, s:]                  # [C, T]
    mesh = pm.make_mesh((2, 4), axis_names=(pm.DIR_AXIS, pm.TIME_AXIS))
    f = make_time_sharded_beam(mesh)
    got = np.asarray(f(block, history_tail, model.weights))
    want = np.asarray(dl.das_beam(window, model.weights))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-10)


def test_sharded_streaming_step_matches_dense():
    points, model, window, block, hist0 = _setup()
    mesh = pm.make_mesh((2, 4))
    step = make_sharded_mimo_step(
        mesh,
        block_size=DCFG.block_size,
        shift_range=DCFG.shift_range,
        taps=model.taps,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    hist_empty = jax.device_put(
        rg.ring_init(points.shape[1], DCFG.history),
        NamedSharding(mesh, P(pm.CH_AXIS, None)),
    )
    blk = jax.device_put(
        jnp.asarray(block), NamedSharding(mesh, P(pm.CH_AXIS, None))
    )
    wts = shard_weights(model.weights, mesh)
    hist1, powers = step(hist_empty, blk, wts)
    want = np.asarray(mm.mimo_power(jnp.asarray(window), model))
    np.testing.assert_allclose(np.asarray(powers), want, rtol=2e-4, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hist1), hist0, rtol=0, atol=0)
    # heatmap argmax still finds the source through the sharded path
    d = int(np.argmax(np.asarray(powers)))
    th, ph = model.theta[d], model.phi[d]
    from beamforming_lk_tpu.ops.geometry import spherical_angle

    ang = float(spherical_angle(th, ph, 0.4, 1.0))
    assert ang < np.radians(12.0)


def test_16_array_channel_sharded_heatmap():
    """BASELINE config 4: 16 arrays (1024 mics) channel-sharded over the
    mesh, fused into one coherent aperture; sharded powers match dense."""
    dcfg = DspConfig(shift_range=192, history=1024)
    mcfg = MimoConfig(rows=8, columns=8)
    points = ant.multi_array_cluster(1024)
    model = mm.make_mimo_model(points, mcfg, dcfg, ACFG)
    block = plane_wave_block(
        points, [(0.3, 0.6, 3000.0)], 0, dcfg.block_size, ACFG, noise_std=0.02
    )
    hist = rg.ring_push(rg.ring_init(1024, dcfg.history), jnp.asarray(block))
    window = rg.ring_window(hist, dcfg.block_size, dcfg.shift_range, model.taps)

    want = np.asarray(mm.mimo_power(window, model))

    mesh = pm.make_mesh((8, 1))
    f = make_sharded_das_power(mesh, use_bandpass=True)
    got = np.asarray(
        f(shard_window(window, mesh), shard_weights(model.weights, mesh))
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-13)
    # Peak still lands on the source through 8-way channel sharding.
    d = int(np.argmax(got))
    from beamforming_lk_tpu.ops.geometry import spherical_angle

    assert float(spherical_angle(model.theta[d], model.phi[d], 0.3, 0.6)) < np.radians(15)

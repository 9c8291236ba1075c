"""Checkpoint/resume: a restored pipeline continues bit-identically (the
reference's save_pipeline is a dead stub — pipeline.cpp:300-315)."""

import numpy as np

from beamforming_lk_tpu.app import AwpuPipeline
from beamforming_lk_tpu.config import Config, MimoConfig, TrackerConfig
from beamforming_lk_tpu.io.checkpoint import load_state, save_state
from beamforming_lk_tpu.io.synthetic import plane_wave_block

CFG = Config(mimo=MimoConfig(rows=16, columns=16), tracker=TrackerConfig(iterations=2))


def _blocks(points, n, start=0):
    return [
        plane_wave_block(
            points, [(0.5, 1.5, 5000.0)], (start + b) * 256, 256, CFG.array,
            noise_std=0.02,
        )
        for b in range(n)
    ]


def test_pipeline_save_restore_continues_identically(tmp_path):
    path = str(tmp_path / "state.npz")
    pipe = AwpuPipeline(CFG, seed=1)
    for b in _blocks(pipe.points, 4):
        pipe.process_block(b)
    pipe.save(path)
    cont = _blocks(pipe.points, 3, start=4)
    out_a = [np.asarray(pipe.process_block(b).powers) for b in cont]

    pipe2 = AwpuPipeline(CFG, seed=99)  # different init, then restore
    pipe2.restore(path)
    assert int(np.asarray(pipe2.state.block_index)) == 4
    out_b = [np.asarray(pipe2.process_block(b).powers) for b in cont]
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_rejects_shape_mismatch(tmp_path):
    import pytest

    path = str(tmp_path / "s.npz")
    save_state(path, {"a": np.zeros((3,))})
    with pytest.raises(ValueError):
        load_state(path, {"a": np.zeros((4,))})
    with pytest.raises(KeyError):
        load_state(path, {"b": np.zeros((3,))})

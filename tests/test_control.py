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


def test_live_playback_and_mp3_recording(tmp_path):
    """`play="miso"` streams s16le PCM of the beam through the player
    command and `miso_mp3` pipes the SAME samples to the encoder command —
    the reference plays and records simultaneously
    (audio_wrapper.cpp:93-143 and :12-85)."""
    unit = ControlUnit(CFG, enable_tracker=False, enable_miso=True)
    n = 6
    blocks = _blocks_for(unit.pipelines[0].points, (0, 0, 0), (0.5, 0.3, 5.0), n, 0)
    played = str(tmp_path / "played.pcm")
    encoded = str(tmp_path / "encoded.pcm")
    wav = str(tmp_path / "out.wav")
    summary = unit.run(
        [blocks], n_blocks=n, miso_wav=wav, miso_mp3=str(tmp_path / "out.mp3"),
        play="miso",
        player_command=["sh", "-c", f"cat > {played}"],
        mp3_command=["sh", "-c", f"cat > {encoded}"],
    )
    assert summary["blocks"] == n
    pcm = np.frombuffer(open(played, "rb").read(), "<i2")
    assert pcm.shape == (n * 256,)
    enc = np.frombuffer(open(encoded, "rb").read(), "<i2")
    np.testing.assert_array_equal(pcm, enc)
    # The played stream is the recorded WAV, within s16 quantization.
    from beamforming_lk_tpu.io.wav import read_wav

    data, _rate = read_wav(wav)
    np.testing.assert_allclose(
        pcm / 32767.0, np.clip(data[0], -1, 1), atol=1.0 / 32000
    )
    assert np.abs(pcm).max() > 0, "beam was silent"


def test_raw_playback_streams_mic0(tmp_path):
    unit = ControlUnit(CFG, enable_tracker=False, enable_miso=False)
    n = 3
    blocks = _blocks_for(unit.pipelines[0].points, (0, 0, 0), (0.5, 0.3, 5.0), n, 0)
    played = str(tmp_path / "raw.pcm")
    unit.run([blocks], n_blocks=n, play="raw",
             player_command=["sh", "-c", f"cat > {played}"])
    pcm = np.frombuffer(open(played, "rb").read(), "<i2") / 32767.0
    want = np.clip(np.concatenate([np.asarray(b)[0] for b in blocks]), -1, 1)
    np.testing.assert_allclose(pcm, want, atol=1.0 / 32000)


def test_audio_degrades_without_player_or_encoder(tmp_path, capsys):
    """No player/encoder binaries -> warn to stderr and keep running (the
    reference degrades the same way for its optional sinks)."""
    import beamforming_lk_tpu.io.audio_out as ao

    unit = ControlUnit(CFG, enable_tracker=False, enable_miso=True)
    n = 2
    blocks = _blocks_for(unit.pipelines[0].points, (0, 0, 0), (0.5, 0.3, 5.0), n, 0)
    old_p, old_e = ao.default_player_command, ao.default_encoder_command
    ao.default_player_command = lambda *_: None
    ao.default_encoder_command = lambda *_: None
    try:
        summary = unit.run(
            [blocks], n_blocks=n, play="miso", miso_mp3=str(tmp_path / "x.mp3")
        )
    finally:
        ao.default_player_command, ao.default_encoder_command = old_p, old_e
    assert summary["blocks"] == n
    err = capsys.readouterr().err
    assert "audio playback disabled" in err and "mp3 recording disabled" in err


def test_click_to_steer_moves_miso_listener():
    """A frame click maps pixel -> (theta, phi) -> MISO steer (the
    reference's clickEvent, aw_control_unit.cpp:30-47)."""
    from beamforming_lk_tpu.utils.overlay import (
        direction_to_pixel,
        pixel_to_direction,
    )

    unit = ControlUnit(CFG, enable_tracker=False, enable_miso=True)
    n = unit.frame_size
    # pixel_to_direction is the exact inverse of direction_to_pixel.
    for th, ph in [(0.3, 0.7), (0.9, -2.0), (0.05, 3.0)]:
        r, c = direction_to_pixel(th, ph, n, CFG.mimo.fov_degrees)
        th2, ph2 = pixel_to_direction(r, c, n, CFG.mimo.fov_degrees)
        assert abs(th2 - th) < 0.02
        assert abs((ph2 - ph + np.pi) % (2 * np.pi) - np.pi) < 0.2 / max(th, 0.1)

    before = float(np.asarray(unit.pipelines[0].state.miso.particle.theta)[0])
    hit = unit.handle_click(n // 4, n // 4)
    assert hit is not None
    tile, theta, phi = hit
    assert tile == 0
    after = unit.pipelines[0].state.miso.particle
    assert float(np.asarray(after.theta)[0]) == np.float32(theta) != before
    assert float(np.asarray(after.phi)[0]) == np.float32(phi)
    # Clicks outside the frame are ignored.
    assert unit.handle_click(-1, 0) is None
    assert unit.handle_click(0, 5 * n) is None

    # With flip the same physical direction lands on the mirrored column.
    unit_f = ControlUnit(CFG, enable_tracker=False, enable_miso=True, flip=True)
    hit_f = unit_f.handle_click(n // 4, n - 1 - n // 4)
    assert hit_f is not None
    assert abs(hit_f[1] - theta) < 1e-6 and abs(hit_f[2] - phi) < 1e-6


def test_debug_overlay_draws_tracker_count():
    """--debug renders the tracker-count text on each tile
    (aw_control_unit.cpp:336-350)."""
    unit = ControlUnit(CFG, enable_tracker=True, enable_miso=False, debug=True)
    blocks = _blocks_for(unit.pipelines[0].points, (0, 0, 0), (0.5, 0.3, 5.0), 6, 0)
    for b in blocks:
        unit.process([b])
    frame = unit.render_frame()
    n_targets = len(unit.pipelines[0].targets())
    corner = frame[4:18, 4:18]
    assert (corner == 255).all(axis=-1).any(), "no debug text pixels drawn"
    assert isinstance(n_targets, int)


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


def test_batched_run_matches_per_block(tmp_path):
    """run(batch=N) drives N blocks per device dispatch (process_batch /
    AwpuPipeline.process_blocks) and produces the same MISO WAV and block
    count as per-block stepping — the offline-replay throughput path."""
    from beamforming_lk_tpu.io.wav import read_wav

    cfg = Config(mimo=MimoConfig(rows=16, columns=16),
                 tracker=TrackerConfig(iterations=1))
    n = 7
    blocks = None
    wavs = {}
    for batch in (1, 3):
        unit = ControlUnit(cfg, enable_tracker=False, enable_miso=True)
        if blocks is None:
            blocks = _blocks_for(
                unit.pipelines[0].points, (0, 0, 0), (0.5, 0.3, 5.0), n, 0
            )
        wav = str(tmp_path / f"b{batch}.wav")
        summary = unit.run([blocks], n_blocks=n, miso_wav=wav, batch=batch)
        assert summary["blocks"] == n
        wavs[batch] = read_wav(wav)[0]
    np.testing.assert_allclose(wavs[3], wavs[1], rtol=1e-6, atol=2.0 / 32767)


def test_run_summary_reports_audio_stats(tmp_path):
    unit = ControlUnit(CFG, enable_tracker=False, enable_miso=True)
    n = 4
    blocks = _blocks_for(unit.pipelines[0].points, (0, 0, 0), (0.5, 0.3, 5.0), n, 0)
    sink = str(tmp_path / "sink.pcm")
    summary = unit.run(
        [blocks], n_blocks=n, play="miso",
        player_command=["sh", "-c", f"cat > {sink}"],
    )
    audio = summary["audio"]
    assert audio["queued"] == n and audio["dropped"] == 0
    assert audio["played"] == n  # close() joins the writer before summary


def test_audio_player_bounded_buffer_drops():
    """A stalled consumer (never reads the pipe) fills the bounded queue;
    further blocks are DROPPED and counted instead of stalling the block
    cadence (the reference's device-clocked PortAudio buffer contract)."""
    from beamforming_lk_tpu.io.audio_out import AudioPlayer

    p = AudioPlayer(
        48828.0, command=["sh", "-c", "sleep 30"], max_buffer_blocks=2
    )
    big = np.zeros(65536, np.float32)  # 128 KiB PCM > pipe capacity
    for _ in range(8):
        p.play(big)
    st = p.stats()
    assert st["queued"] + st["dropped"] == 8
    assert st["dropped"] >= 3 and st["max_depth"] >= 1
    p.close()  # terminates the wedged player instead of hanging
    assert p.stats()["dropped"] >= 3


def test_logo_overlay_composited():
    """--logo composites into the top-left corner (alpha-blended for RGBA),
    like the reference's logo copy in the UI loop."""
    logo = np.full((10, 20, 3), 200, np.uint8)
    unit = ControlUnit(CFG, enable_tracker=False, enable_miso=False, logo=logo)
    blocks = _blocks_for(unit.pipelines[0].points, (0, 0, 0), (0.5, 0.3, 5.0), 1, 0)
    unit.process([blocks[0]])
    frame = unit.render_frame()
    assert tuple(frame[0, 0]) == (200, 200, 200)
    lh = unit._logo.shape[0]
    assert lh == unit.frame_size // 6

    # Fully transparent RGBA logo leaves the frame untouched.
    unit2 = ControlUnit(CFG, enable_tracker=False, enable_miso=False)
    unit2.process([blocks[0]])
    base = unit2.render_frame()
    rgba = np.zeros((10, 20, 4), np.uint8)
    unit3 = ControlUnit(CFG, enable_tracker=False, enable_miso=False, logo=rgba)
    unit3.process([blocks[0]])
    np.testing.assert_array_equal(unit3.render_frame(), base)


def test_cli_heatmap_chunk_replay(tmp_path, capsys):
    """--heatmap-chunk N runs the chunked-streaming program from the CLI
    (replay batch defaults to the chunk) and renders the same heatmap as
    the per-block path."""
    from beamforming_lk_tpu.app.cli import main
    from beamforming_lk_tpu.utils.png import read_png

    frames = {}
    for name, extra in {"plain": [], "chunk": ["--heatmap-chunk", "4"]}.items():
        out_dir = str(tmp_path / name)
        rc = main(
            ["--mimo", "--blocks", "8", "--mimo-res", "16", "--fps",
             "--output-dir", out_dir, "--render-every", "8",
             "--synthetic-source", "20", "45", "5000"] + extra
        )
        assert rc == 0
        assert '"blocks": 8' in capsys.readouterr().out
        files = sorted(os.listdir(out_dir))
        assert files, name
        frames[name] = read_png(os.path.join(out_dir, files[-1])).astype(int)
    assert np.abs(frames["chunk"] - frames["plain"]).max() <= 1


def test_runtime_record_toggle(monkeypatch, tmp_path):
    """The 'r' key starts/stops AVI capture mid-run (the reference's runtime
    toggle, aw_control_unit.cpp:150-162): pressing 'r' with no recorder opens
    one, pressing it again closes it, and a re-start writes a numbered
    sibling so the first capture survives."""
    from beamforming_lk_tpu.utils import video as vid

    opened, closed = [], []

    class _FakeRecorder:
        def __init__(self, path, fps=60.0):
            self.path = path
            opened.append(path)

        def write(self, frame):
            pass

        def close(self):
            closed.append(self.path)

    monkeypatch.setattr(vid, "VideoRecorder", _FakeRecorder)
    base = str(tmp_path / "cap.avi")

    rec, n = ControlUnit._toggle_record(None, base, 0)
    assert isinstance(rec, _FakeRecorder) and rec.path == base and n == 1
    rec2, n = ControlUnit._toggle_record(rec, base, n)
    assert rec2 is None and closed == [base] and n == 1
    rec3, n = ControlUnit._toggle_record(None, base, n)
    assert rec3.path == str(tmp_path / "cap_1.avi") and n == 2
    # Default path when --record was never given.
    rec4, n4 = ControlUnit._toggle_record(None, None, 0)
    assert rec4.path == "recording.avi" and n4 == 1


def test_runtime_record_toggle_in_run_loop(monkeypatch, tmp_path):
    """End-to-end: a display whose key stream is r, None, r, q makes the run
    loop record exactly the frames between the two presses."""
    from beamforming_lk_tpu.utils import video as vid

    frames_written = []

    class _FakeRecorder:
        def __init__(self, path, fps=60.0):
            self.path = path

        def write(self, frame):
            frames_written.append(np.asarray(frame).shape)

        def close(self):
            pass

    class _FakeDisplay:
        def __init__(self, title="x"):
            self.keys = iter(["r", None, "r", "q"])

        def show(self, frame):
            return next(self.keys, None)

        def pop_clicks(self):
            return []

        def close(self):
            pass

    monkeypatch.setattr(vid, "VideoRecorder", _FakeRecorder)
    monkeypatch.setattr(vid, "LiveDisplay", _FakeDisplay)
    cfg = Config(mimo=MimoConfig(rows=8, columns=8),
                 tracker=TrackerConfig(iterations=2))
    unit = ControlUnit(cfg, n_arrays=1, enable_tracker=False)
    pts = unit.pipelines[0].points
    blocks = [
        plane_wave_block(pts, [(0.3, 1.0, 4000.0)], b * 256, 256, cfg.array)
        for b in range(8)
    ]
    unit.run([blocks], n_blocks=8, render_every=1, display=True)
    # Keys fire on render boundaries 1..: 'r' starts after frame 1, so
    # frames 2 and 3 are written ('r' at frame 3 stops AFTER the write;
    # the reference's toggle likewise applies from the next frame).
    assert len(frames_written) == 2, frames_written


def test_cli_realtime_implies_heatmap_decimation(monkeypatch):
    """--realtime deploys the measured profile incl. heatmap_every=3;
    an explicit --heatmap-every overrides it (app/cli.py)."""
    from beamforming_lk_tpu.app import cli as c

    seen = {}

    class _Unit:
        def __init__(self, cfg, **kw):
            seen["cfg"] = cfg
            raise RuntimeError("stop after config build")

    monkeypatch.setattr(
        "beamforming_lk_tpu.app.control.ControlUnit", _Unit
    )
    import pytest

    for argv, want in (
        (["--tracking", "--realtime"], 3),
        (["--tracking", "--realtime", "--heatmap-every", "5"], 5),
        # 0 and 1 both force every-block recompute, overriding --realtime's 3.
        (["--tracking", "--realtime", "--heatmap-every", "1"], 1),
        (["--tracking", "--realtime", "--heatmap-every", "0"], 1),
        (["--tracking", "--heatmap-every", "2"], 2),
        (["--tracking"], 1),
    ):
        with pytest.raises(RuntimeError):
            c.main(argv + ["--source", "synthetic", "--blocks", "1"])
        cfg = seen["cfg"]
        assert cfg.mimo.heatmap_every == want, (argv, cfg.mimo)

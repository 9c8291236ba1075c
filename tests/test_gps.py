"""gpsd client + telemetry heartbeat + camera underlay tests."""

import json
import socket
import threading
import time

import numpy as np

from beamforming_lk_tpu.app.waraps import TelemetryHeartbeat, TelemetrySink
from beamforming_lk_tpu.io.gps import GpsdClient, GpsFix
from beamforming_lk_tpu.utils.overlay import blend_underlay, nearest_resize


def _fake_gpsd(reports):
    """Minimal gpsd: VERSION banner, wait for ?WATCH, stream reports."""
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        conn.sendall(b'{"class":"VERSION","release":"3.x"}\n')
        buf = b""
        while b"\n" not in buf:
            buf += conn.recv(1024)
        assert b"WATCH" in buf
        for r in reports:
            conn.sendall((json.dumps(r) + "\n").encode())
        time.sleep(0.3)
        conn.close()
        server.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    return port, t


def test_gpsd_client_parses_latest_tpv():
    port, t = _fake_gpsd(
        [
            {"class": "SKY", "satellites": []},
            {"class": "TPV", "mode": 1},  # no fix -> ignored
            {"class": "TPV", "mode": 3, "lat": 57.7, "lon": 16.6, "alt": 12.0,
             "track": 90.0, "speed": 1.5},
            {"class": "TPV", "mode": 3, "lat": 57.8, "lon": 16.7},
        ]
    )
    client = GpsdClient.connect("127.0.0.1", port)
    assert client is not None
    fix = None
    for _ in range(50):
        fix = client.poll()
        if fix is not None and fix.latitude == 57.8:
            break
        time.sleep(0.02)
    assert fix is not None
    assert fix.latitude == 57.8 and fix.longitude == 16.7
    assert fix.mode == 3
    # Sticky: still returned after the server is gone.
    t.join()
    assert client.poll().latitude == 57.8
    client.close()


def test_gpsd_connect_degrades_gracefully():
    # Nothing listening -> None, no exception (aw_control_unit.cpp:473-482).
    assert GpsdClient.connect("127.0.0.1", 1, timeout=0.2) is None


def test_telemetry_heartbeat_rate_limits(tmp_path):
    path = str(tmp_path / "telemetry.ndjson")
    sink = TelemetrySink(fallback_path=path)
    hb = TelemetryHeartbeat(sink, interval=1.0)
    fix = GpsFix(57.7, 16.6, 10.0, 45.0, 2.0, 3)
    assert hb.maybe_publish(fix, now=0.0)
    assert not hb.maybe_publish(fix, now=0.5)   # inside the interval
    assert not hb.maybe_publish(None, now=2.0)  # no fix -> nothing
    assert hb.maybe_publish(fix, now=2.0)
    sink.close()
    lines = [json.loads(line) for line in open(path)]
    assert len(lines) == 2
    assert lines[0]["payload"]["heading"] == 45.0
    assert lines[0]["payload"]["latitude"] == 57.7


def test_blend_underlay_resizes_and_blends():
    cam = np.full((6, 9, 3), 100, np.uint8)
    hm = np.zeros((4, 4, 3), np.uint8)
    hm[:, :, 0] = 200
    out = blend_underlay(cam, hm, alpha=0.5)
    assert out.shape == cam.shape
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, 0], [150, 50, 50])


def test_nearest_resize_identity_and_scale():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert nearest_resize(img, (3, 4)) is img
    up = nearest_resize(img, (6, 8))
    assert up.shape == (6, 8)
    assert up[0, 0] == img[0, 0] and up[-1, -1] == img[-1, -1]


def test_control_unit_camera_underlay():
    from beamforming_lk_tpu.app.control import ControlUnit
    from beamforming_lk_tpu.config import Config, MimoConfig
    from beamforming_lk_tpu.io.synthetic import synthetic_blocks

    cfg = Config(mimo=MimoConfig(rows=8, columns=8))
    cam = np.full((480, 640, 3), 90, np.uint8)
    unit = ControlUnit(
        cfg, enable_tracker=False, frame_size=32, camera=lambda: cam
    )
    plain = ControlUnit(cfg, enable_tracker=False, frame_size=32)
    blocks = list(
        synthetic_blocks(unit.pipelines[0].points, [(0.4, 1.0, 5000.0)], 3)
    )
    for b in blocks:
        unit.process([b])
        plain.process([b])
    with_cam = unit.render_frame()
    without = plain.render_frame()
    assert with_cam.shape == without.shape == (32, 32, 3)
    assert not np.array_equal(with_cam, without)  # camera blended in

"""Golden wire-to-track acceptance test.

One automated test drives the WHOLE stack the way the reference's offline
workflow does (record wire traffic -> udpreplay against the unmodified app,
``/root/reference/udp/README.md``): synthesize a wire-format pcap of a
moving source, run the full CLI (``app/cli.py:main`` with ``--source pcap
--tracking --miso --miso-wav``), and assert on the OUTPUTS only — heatmap
argmax at truth, tracker lock, MISO beam SNR.  This is the BASELINE
config-1 acceptance as one test instead of pieces spread across
test_io/test_control.
"""

import math
import os
import re

import numpy as np

from beamforming_lk_tpu.config import ArrayConfig
from beamforming_lk_tpu.io import packets as pk
from beamforming_lk_tpu.io import pcap as pc
from beamforming_lk_tpu.io.synthetic import plane_wave_block
from beamforming_lk_tpu.ops import antenna as ant

SRC_FREQ = 5000.0
PHI_DEG = 45.0
THETA_DEG_START, THETA_DEG_END = 16.0, 24.0
N_BLOCKS = 16
BLOCK = 256
MIMO_RES = 32


def _write_moving_source_pcap(path: str) -> None:
    """Wire-format capture of a source sweeping theta 16->24 deg: real
    packet structs (header + 24-bit PCM + daisy-chain column flip,
    io/packets.py) through the raw-IP pcap writer."""
    points = ant.create_antenna_grid(8, 8, 0.02)
    acfg = ArrayConfig()
    payloads = []
    for b in range(N_BLOCKS):
        th = math.radians(
            THETA_DEG_START
            + (THETA_DEG_END - THETA_DEG_START) * b / (N_BLOCKS - 1)
        )
        block = plane_wave_block(
            points, [(th, math.radians(PHI_DEG), SRC_FREQ)],
            b * BLOCK, BLOCK, acfg, noise_std=0.02,
        )
        wire = pk.build_packets(block, start_counter=b * BLOCK)
        payloads.extend(
            wire[i * pk.PACKET_SIZE:(i + 1) * pk.PACKET_SIZE]
            for i in range(BLOCK)
        )
    pc.write_pcap(path, payloads, dst_port=21844)


def _write_two_array_pcap(path: str, positions, trajectory) -> None:
    """Wire-format capture of TWO array links (one dst port each, mixed in
    one file like a real multi-FPGA wireshark capture) observing one moving
    world target: per block, each array sees the plane wave from ITS
    direction to the target (the 2-FPGA concurrent-beamforming demo,
    /root/reference/README.md:10)."""
    from beamforming_lk_tpu.ops.geometry import cartesian_to_spherical

    points = ant.create_antenna_grid(8, 8, 0.02)
    acfg = ArrayConfig()
    payloads = []
    for b, target in enumerate(trajectory):
        per_array_wire = []
        for a, pos in enumerate(positions):
            d = np.asarray(target, np.float64) - np.asarray(pos, np.float64)
            th, ph, _ = np.asarray(cartesian_to_spherical(d / np.linalg.norm(d)))
            block = plane_wave_block(
                points, [(float(th), float(ph), SRC_FREQ)],
                b * BLOCK, BLOCK, acfg, noise_std=0.02,
            )
            per_array_wire.append(pk.build_packets(block, start_counter=b * BLOCK))
        # Interleave per sample, as simultaneous links appear on the wire.
        for i in range(BLOCK):
            for a, wire in enumerate(per_array_wire):
                payloads.append((
                    wire[i * pk.PACKET_SIZE:(i + 1) * pk.PACKET_SIZE],
                    21844 + a,
                ))
    pc.write_pcap(path, payloads)


def test_two_array_wire_to_geopoint_golden(tmp_path):
    """Flagship demo path as one golden test: two-array wire capture ->
    CLI with fusion + WARA PS NDJSON sink -> published GeoPoints track the
    truth trajectory (triangulate.cpp:43-54, target_handler.cpp:172-222).

    The CLI registers two arrays at the reference's hardcoded +/-1 m
    x-offsets (aw_control_unit.cpp:261-265), so the capture is synthesized
    against exactly those positions."""
    import json

    from beamforming_lk_tpu.app.cli import main

    positions = [(-1.0, 0.0, 0.0), (1.0, 0.0, 0.0)]
    n = 24
    trajectory = [
        np.array([0.2 + 0.4 * b / (n - 1), -0.2 + 0.5 * b / (n - 1), 5.0])
        for b in range(n)
    ]
    cap = str(tmp_path / "two_array.pcap")
    _write_two_array_pcap(cap, positions, trajectory)
    ndjson = str(tmp_path / "telemetry.ndjson")
    lat0, lon0, alt0 = 57.76, 16.68, 10.0

    rc = main([
        "--source", "pcap", "--pcap", cap,
        "--port", "21844", "--port", "21845", "--arrays", "2",
        "--tracking", "--blocks", str(n), "--mimo-res", "16",
        "--wara-ps", "--telemetry-file", ndjson,
        "--gps", str(lat0), str(lon0), str(alt0),
        "--render-every", "4",
    ])
    assert rc == 0

    with open(ndjson) as f:
        msgs = [json.loads(line) for line in f if line.strip()]
    geo = [m["payload"] for m in msgs if m["topic"] == "sensor/position"]
    assert geo, "no GeoPoint published"
    for g in geo:
        assert g["type"] == "GeoPoint"
        # Invert the publish transform (heading 0: out = (x, z, y); lat from
        # x, lon from z, alt from y — models/fusion.py position_to_gps).
        x = (g["latitude"] - lat0) * 111111.0
        z = (g["longitude"] - lon0) * 111111.0 * math.cos(math.radians(lat0))
        y = g["altitude"] - alt0
        p = np.array([x, y, z])
        err = min(np.linalg.norm(p - t) for t in trajectory)
        assert err < 1.5, (p, err)


def test_wire_to_track_golden(tmp_path, capsys):
    from beamforming_lk_tpu.app.cli import main
    from beamforming_lk_tpu.utils.png import read_png
    from beamforming_lk_tpu.utils.overlay import pixel_to_direction

    cap = str(tmp_path / "moving_source.pcap")
    _write_moving_source_pcap(cap)
    out_dir = str(tmp_path / "frames")
    wav = str(tmp_path / "beam.wav")

    rc = main([
        "--source", "pcap", "--pcap", cap, "--port", "21844",
        "--mimo", "--tracking", "--miso",
        "--blocks", str(N_BLOCKS), "--mimo-res", str(MIMO_RES),
        "--miso-wav", wav,
        "--steer", "20", str(PHI_DEG),
        "--output-dir", out_dir, "--render-every", str(N_BLOCKS),
    ])
    assert rc == 0
    out = capsys.readouterr().out

    # --- Tracker locked onto the (moving) source: the final published
    # target sits within ~2 deg of the end-of-sweep truth.
    targets = re.findall(
        r"target theta=([-\d.]+) phi=([-\d.]+) power=([\d.e+-]+)", out
    )
    assert targets, f"no tracker targets published:\n{out}"
    best = max(targets, key=lambda t: float(t[2]))
    assert abs(float(best[0]) - THETA_DEG_END) < 2.5, best
    assert abs(float(best[1]) - PHI_DEG) < 2.5 / math.sin(
        math.radians(THETA_DEG_END)
    ), best

    # --- Heatmap argmax at truth: decode the final rendered frame (jet
    # colormap: peak power -> red-dominant pixel) back to a direction.
    frames = sorted(os.listdir(out_dir))
    assert frames
    rgb = read_png(os.path.join(out_dir, frames[-1])).astype(int)
    score = rgb[..., 0] - rgb[..., 2]  # red minus blue: max at peak power
    r, c = np.unravel_index(np.argmax(score), score.shape)
    th_px, ph_px = pixel_to_direction(r, c, rgb.shape[0], 180.0)
    # One heatmap cell at res 32 spans ~ 180/32 deg; allow two cells.
    assert abs(math.degrees(th_px) - THETA_DEG_END) < 2 * 180.0 / MIMO_RES
    dphi = (math.degrees(ph_px) - PHI_DEG + 180.0) % 360.0 - 180.0
    assert abs(dphi) < 2 * 180.0 / (MIMO_RES * math.sin(math.radians(20.0)))

    # --- MISO beam SNR: the steered beam concentrates the 5 kHz tone.
    from beamforming_lk_tpu.io.wav import read_wav

    data, rate = read_wav(wav)
    assert data.shape == (1, N_BLOCKS * BLOCK) and rate == 48828
    x = data[0] - data[0].mean()
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size))) ** 2
    freqs = np.fft.rfftfreq(x.size, 1.0 / rate)
    tone = spec[np.abs(freqs - SRC_FREQ) < 100.0].sum()
    rest = spec.sum() - tone
    snr_db = 10.0 * np.log10(tone / max(rest, 1e-30))
    assert snr_db > 10.0, f"MISO beam SNR {snr_db:.1f} dB"

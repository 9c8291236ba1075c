"""Ingestion and output: block pipeline, synthetic sources, pcap/UDP, WAV."""

from beamforming_lk_tpu.io.ring import RingState, ring_init, ring_push, ring_window
from beamforming_lk_tpu.io.synthetic import synthetic_blocks, plane_wave_block
from beamforming_lk_tpu.io.packets import (
    build_packets,
    column_flip_map,
    parse_header,
    parse_packets,
)
from beamforming_lk_tpu.io.pcap import read_pcap_payloads, replay_blocks, write_pcap
from beamforming_lk_tpu.io.wav import WavWriter, read_wav
from beamforming_lk_tpu.io.checkpoint import load_state, save_state
from beamforming_lk_tpu.io.gps import GpsdClient, GpsFix

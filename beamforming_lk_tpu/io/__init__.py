"""Ingestion and output: block pipeline, synthetic sources, pcap/UDP, WAV."""

from beamforming_lk_tpu.io.ring import RingState, ring_init, ring_push, ring_window
from beamforming_lk_tpu.io.synthetic import synthetic_blocks, plane_wave_block

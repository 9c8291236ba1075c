"""Utilities: colormaps/rendering, PNG output, metrics/observability.

Replaces the reference's OpenCV UI pipeline (resize, Gaussian blur, JET/
OCEAN colormap, FPS overlay — ``src/aw_control_unit/aw_control_unit.cpp:
277-441``) with dependency-light numpy equivalents, and upgrades its only
observability hook (an FPS counter) to real block-latency / throughput
meters (SURVEY §5).
"""

from beamforming_lk_tpu.utils.colormap import (
    apply_colormap,
    gaussian_blur,
    jet_lut,
    ocean_lut,
    upscale,
)
from beamforming_lk_tpu.utils.png import write_png
from beamforming_lk_tpu.utils.metrics import BlockMetrics, FpsMeter

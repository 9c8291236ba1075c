"""Processing models: MIMO heatmap, gradient tracker swarm, MISO listener,
calibration, Kalman filter, triangulation/fusion."""

from beamforming_lk_tpu.models.mimo import (
    MimoModel,
    make_mimo_grid,
    make_mimo_model,
    mimo_power,
    render_heatmap,
)
from beamforming_lk_tpu.models.calibration import CalibrationResult, calibrate

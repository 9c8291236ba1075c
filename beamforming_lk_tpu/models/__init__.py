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
from beamforming_lk_tpu.models.kalman import KalmanFilter3D, KalmanState
from beamforming_lk_tpu.models.miso import MisoState, make_miso_step, miso_init, miso_steer
from beamforming_lk_tpu.models.targets import targets_to_list
from beamforming_lk_tpu.models.tracker import (
    Particles,
    SwarmState,
    Targets,
    make_swarm_step,
    swarm_init,
)
from beamforming_lk_tpu.models.fusion import (
    TargetFusion,
    Track,
    TrackStore,
    position_to_gps,
    target_rays,
    triangulate_rays,
)
from beamforming_lk_tpu.models.mvdr import (
    MvdrState,
    make_mvdr_step,
    mvdr_init,
    steering_matrix,
)

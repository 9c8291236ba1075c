"""Worker for the real 2-process multi-host test (test_multihost.py).

Each process owns half the mic channels (its "FPGA links"), bootstraps
``jax.distributed`` over a local coordinator, assembles the global [C, T]
block with ``global_block_from_local`` (no cross-host sample traffic), runs
the fused sharded AWPU step over the global (ch, dir) mesh, and asserts the
heatmap powers match a dense single-device reference computed locally.

Usage: python tests/_multihost_worker.py <coordinator_port> <process_id> <num_processes>

The reference's multi-machine story is one independent process per FPGA
(SURVEY §2.3); here the processes form ONE logical array whose beam partials
meet via psum riding the collective fabric.
"""

import os
import sys

port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={8 // nproc}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beamforming_lk_tpu.app import awpu_init, make_awpu_step  # noqa: E402
from beamforming_lk_tpu.config import (  # noqa: E402
    Config,
    DspConfig,
    MimoConfig,
    TrackerConfig,
)
from beamforming_lk_tpu.io.synthetic import plane_wave_block  # noqa: E402
from beamforming_lk_tpu.ops import antenna as ant  # noqa: E402
from beamforming_lk_tpu.parallel import mesh as pm  # noqa: E402
from beamforming_lk_tpu.parallel.multihost import (  # noqa: E402
    global_block_from_local,
    initialize,
)


def main() -> None:
    got_pid = initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert got_pid == pid, (got_pid, pid)
    assert jax.process_count() == nproc
    devices = jax.devices()
    assert len(devices) == 8, len(devices)

    cfg = Config(
        dsp=DspConfig(block_size=128, history=512, shift_range=64),
        mimo=MimoConfig(rows=8, columns=8),
        tracker=TrackerConfig(iterations=1, tracker_steps=1),
    )
    channels = 64
    points = ant.create_antenna_grid(
        cfg.array.columns, cfg.array.rows, cfg.array.distance
    )
    blocks = [
        plane_wave_block(
            points, [(0.4, 1.0, 5000.0)], b * cfg.dsp.block_size,
            cfg.dsp.block_size, cfg.array, noise_std=0.02,
        )
        for b in range(3)
    ]

    # --- Global (ch=nproc, dir=...) mesh: each process owns exactly one
    # channel shard, so its local ingest IS its shard.
    mesh = pm.make_mesh((nproc, 8 // nproc), devices=devices)
    mask = np.ones(channels, np.float32)
    step = make_awpu_step(points, cfg, channel_mask=mask, mesh=mesh)
    state = awpu_init(cfg, channels, mesh=mesh, seed=0)

    c_local = channels // nproc
    lo = pid * c_local
    results = []
    for block in blocks:
        gblock = global_block_from_local(
            np.asarray(block)[lo : lo + c_local], mesh
        )
        assert gblock.shape == (channels, cfg.dsp.block_size)
        state, out = step(state, gblock)
        results.append(np.asarray(out.powers))

    # --- Dense single-device reference, computed locally by each process.
    step_ref = make_awpu_step(points, cfg, channel_mask=mask)
    state_ref = awpu_init(cfg, channels, seed=0)
    for block, got in zip(blocks, results):
        state_ref, out_ref = step_ref(state_ref, jnp.asarray(block))
        want = np.asarray(out_ref.powers)
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-12)
    # Tracker swarm state must agree too (same seed, same psum'd beams).
    np.testing.assert_allclose(
        np.asarray(state.swarm.trackers.theta),
        np.asarray(state_ref.swarm.trackers.theta),
        rtol=1e-3, atol=1e-5,
    )
    print(f"MULTIHOST_OK pid={pid} processes={jax.process_count()}")


if __name__ == "__main__":
    main()

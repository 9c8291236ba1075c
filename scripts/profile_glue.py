"""Micro-ablation of the NON-kernel cost in the fused tracker+MISO step.

Locates the per-block glue around the whole-swarm kernel by toggling it:

    base        fused step, heatmap off (tracker + MISO, deployment cadence)
    no_rng      same, _swarm_jumps monkeypatched to zeros (no jump draw)
    batched_rng same, _swarm_jumps as one batched uniform draw
    kernel_only swarm_chain_pallas alone, chained across blocks on a fixed
                window (the kernel floor incl. launch)

History: the r05 run of this script found the per-iteration threefry
split scan inside ``_swarm_jumps`` costing ~24 us/block (base 60 us vs
batched_rng 36 us vs kernel floor 27 us on v5e) — ``_swarm_jumps`` is now
the batched draw in production, so ``batched_rng`` ≈ ``base``; the
variants remain as regression probes.

Methodology: scan differencing (bench.py).  Run on the TPU:
    PYTHONUNBUFFERED=1 python scripts/profile_glue.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from beamforming_lk_tpu.app import awpu_init, make_awpu_step  # noqa: E402
from beamforming_lk_tpu.config import (  # noqa: E402
    Config, DspConfig, MimoConfig, TrackerConfig,
)
from beamforming_lk_tpu.models import tracker as tk  # noqa: E402
from beamforming_lk_tpu.ops import antenna as ant  # noqa: E402
from beamforming_lk_tpu.ops import delay as dl  # noqa: E402
from beamforming_lk_tpu.ops import pallas_tracker as ptk  # noqa: E402

BLOCK = 256
N_SMALL, N_LARGE = 8, 2056  # differenced span must dwarf tunnel jitter (see fused_step.py)


def timed(scan_step, state, blocks_small, blocks_large, sync):
    _, out = scan_step(state, blocks_small)
    sync(out)
    _, out = scan_step(state, blocks_large)
    sync(out)

    def run(blocks):
        t0 = time.perf_counter()
        _, out = scan_step(state, blocks)
        sync(out)
        return time.perf_counter() - t0

    t_s = min(run(blocks_small) for _ in range(3))
    t_l = min(run(blocks_large) for _ in range(3))
    return (N_LARGE - N_SMALL) / max(t_l - t_s, 1e-9)


def main():
    cfg = Config(
        dsp=DspConfig(compute="bfloat16", probe_compute="bfloat16"),
        mimo=MimoConfig(backend="fft"),
        tracker=TrackerConfig(iterations=2, probe_kernel="pallas"),
    )
    points = ant.create_antenna_grid(8, 8, 0.02)
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.standard_normal((8, 64, BLOCK)), jnp.float32)
    small = jnp.tile(pool, (N_SMALL // 8, 1, 1))
    large = jnp.tile(pool, (N_LARGE // 8, 1, 1))
    print(f"# device={jax.devices()[0].device_kind}", flush=True)

    def report(name, rate):
        print(f"glue[{name}]: {rate:.1f} blocks/s "
              f"({1e6 / rate:.0f} us/block)", flush=True)

    def run_fused(name):
        step = make_awpu_step(points, cfg, enable_mimo=False)
        state = awpu_init(cfg, 64, seed=0)
        report(name, timed(step.scan, state, small, large,
                           lambda o: np.asarray(o.targets.power[-1])))

    run_fused("base")

    real_jumps = tk._swarm_jumps

    def zero_jumps(key, n_iter, n_seekers, jump):
        key, _ = jax.random.split(key)
        z = jnp.zeros((n_iter, n_seekers), jnp.float32)
        return key, z, z

    tk._swarm_jumps = zero_jumps
    try:
        run_fused("no_rng_scan1")
    finally:
        tk._swarm_jumps = real_jumps

    def cheap_jumps(key, n_iter, n_seekers, jump):
        # ONE batched uniform draw instead of a scan of per-iteration
        # splits (different schedule, same distribution).
        key, k1 = jax.random.split(key)
        u = (jax.random.uniform(k1, (2, n_iter, n_seekers)) * 2.0 - 1.0) * jump
        return key, u[0], u[1]

    tk._swarm_jumps = cheap_jumps
    try:
        run_fused("batched_rng")
    finally:
        tk._swarm_jumps = real_jumps

    # Kernel floor: the swarm_chain_pallas call alone, chained.
    dsp, tcfg = cfg.dsp, cfg.tracker
    taps = dl.LINEAR_TAPS
    span = dl.probe_span(points, cfg.array.samples_per_meter, taps,
                         dsp.shift_range)
    window = jnp.asarray(rng.standard_normal((64, dsp.shift_range + BLOCK)),
                         jnp.float32)
    pw = window[..., dsp.shift_range - span:]
    win_bp = ptk.bandpass_smaj_window(pw, span).astype(jnp.bfloat16)
    win_raw = ptk.smaj_window(pw, span)
    xyz = ptk.pack_geometry(points, cfg.array.samples_per_meter)
    p = tcfg.n_trackers + tcfg.n_seekers + 1
    fam = np.zeros((3, p), np.float32)
    fam[0, :tcfg.n_trackers] = 1
    fam[1, tcfg.n_trackers:-1] = 1
    fam[2, -1] = 1
    rates = jnp.full((p,), 2e-3, jnp.float32)
    spreads = jnp.full((p,), 0.03, jnp.float32)
    jumps = jnp.zeros((tcfg.iterations, p), jnp.float32)

    def kernel_scan(state, blocks):
        theta0, phi0 = state

        def body(carry, i):
            th, ph = carry
            out = ptk.swarm_chain_pallas(
                xyz, win_bp, th, ph, rates, spreads,
                (th * 0, ph * 0, th * 0, ph * 0),
                jnp.asarray(fam), jnp.zeros((p,)), jnp.zeros((p,)),
                jnp.zeros((3, p)), jumps, jumps, i, jnp.float32(1e-6),
                window_raw=win_raw,
                n_iter=tcfg.iterations, n_sub=tcfg.tracker_steps,
                refine=3, n_trackers=tcfg.n_trackers, span=span,
                theta_limit=tcfg.theta_limit, divisor=float(BLOCK),
                closeness=tcfg.tracker_closeness,
                error_threshold=tcfg.error_threshold,
                min_power_fraction=tcfg.min_power_fraction,
            )
            return (out[0], out[1]), out[4]

        (th, ph), rad = jax.lax.scan(body, (theta0, phi0),
                                     jnp.arange(blocks.shape[0]))
        return (th, ph), rad

    kj = jax.jit(kernel_scan)
    theta0 = jnp.asarray(rng.uniform(0.1, 1.2, (p,)), jnp.float32)
    phi0 = jnp.asarray(rng.uniform(0, 6.2, (p,)), jnp.float32)
    report("kernel_only", timed(
        kj, (theta0, phi0), small, large, lambda o: np.asarray(o[-1])
    ))


if __name__ == "__main__":
    main()

"""Benchmark: streaming MIMO heatmap throughput at the north-star config.

Workload (BASELINE.json): 256 mics (4 x 8x8 arrays in a 2x2 cluster) x
65x65 = 4225 directions x 256-sample blocks at 48 828 Hz — the
delay-and-sum inner loop that dominates the reference's compute
(``src/dsp/mimo.cpp:121-151``).

Methodology notes (tunneled remote device):
- ``block_until_ready`` does not reliably fence through the remote-device
  tunnel, and per-call dispatch pays ~30 ms network latency; so N blocks are
  chained inside ONE jitted ``lax.scan`` (the real deployment shape for a
  streaming TPU pipeline anyway), synced by fetching the result, and fixed
  overhead is removed by differencing two scan lengths.
- The dense stencil (D*C*S floats, ~280 MB) is built ON DEVICE from the
  [D, C] delay table; only ~4 MB of delays ever cross the wire.

Variants: dense shift-matmul (f32-highest parity kernel, bf16-input/f32-acc),
the separable frequency-domain kernel (ops/fft_das.py, f32 / bf16 — the
fastest and the only one with exact sinc fractional delays), and optionally
the Pallas on-the-fly-stencil kernel.  The headline metric is the fastest
variant; all are printed to stderr.  bf16-dense differs from f32-dense by
<= ~3e-3 relative on heatmap powers (the reference itself runs -Ofast
-ffast-math float32); the fft kernels' max_rel_err vs the dense reference
is LARGE ON NOISE by construction (different fractional-delay
interpolation reweights broadband noise per direction) while agreeing
exactly on physical sources — see tests/test_fft_das.py.

Metric: beam-samples/s/chip = directions x block_size x blocks/s.
Baseline: the reference's implied real-time AVX2 envelope — 100x100 dirs x
64 mics x 256 samples per 5.24 ms block ~= 3.12e10 mic-MAC/s (BASELINE.md);
on this workload that yields ~1.22e8 beam-samples/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
from beamforming_lk_tpu.io import ring as rg
from beamforming_lk_tpu.models import mimo as mm
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops import delay as dl
from beamforming_lk_tpu.ops import fft_das as fd
from beamforming_lk_tpu.ops.pallas_das import das_beam_pallas, delay_split_np, pad_directions

SAMPLE_RATE = 48828.0
REFERENCE_MIC_MACS_PER_S = 100 * 100 * 64 * 256 / (256 / SAMPLE_RATE)  # ~3.12e10

N_MICS = 256
GRID = 65
BLOCK = 256
SHIFT_RANGE = 64
CHUNK = 8  # blocks per dispatch in the chunked-streaming variants
# Pallas kernel tiles: tile_d=512, tile_c=32 measured fastest on v5e (the
# X3D window re-read scales with D/tile_d; contraction = tile_c * S = 2048).
TILE_D = 512
TILE_C = 32


def build_geometry():
    arr = ArrayConfig()
    dsp = DspConfig(block_size=BLOCK, shift_range=SHIFT_RANGE)
    mimo = MimoConfig(rows=GRID, columns=GRID)
    points = ant.multi_array_cluster(N_MICS, arr.columns, arr.rows, arr.distance)
    theta, phi = mm.make_mimo_grid(mimo)
    delays = ant.steering_delays_np(points, theta, phi, arr.samples_per_meter)
    assert delays.max() <= SHIFT_RANGE - 2, delays.max()
    return points, delays, dsp, arr, theta, phi


def timed_rate(step_scan, history, blocks, params, n_small=8, n_large=72,
               target_dt=0.7):
    """blocks/s via scan-length differencing with host-fetch sync.

    The tunnel's dispatch+fetch latency (~30 ms, with multi-ms jitter) sits
    in BOTH scan timings and cancels in the difference — but only if the
    differenced span itself is large against the jitter.  At >10k blocks/s
    the original 72-8 block span is ~3 ms of device time, i.e. *smaller*
    than the jitter it must cancel (observed: run-to-run headline swings of
    2x).  So after a first estimate, grow the large scan until the
    difference is ~``target_dt`` seconds and re-measure.
    """
    h, p = step_scan(history, blocks, n_small, *params)   # compile + warm
    np.asarray(p[:4])

    def run(n):
        t0 = time.perf_counter()
        _, p = step_scan(history, blocks, n, *params)
        np.asarray(p[:4])
        return time.perf_counter() - t0

    t_small = min(run(n_small) for _ in range(2))
    t_large = min(run(n_large) for _ in range(2))
    dt = max(t_large - t_small, 1e-9)
    # Clamp the first estimate: when the span is smaller than dispatch
    # jitter, dt can be ~0 and the raw rate absurd (then n_big overflows).
    rate = min((n_large - n_small) / dt, 3e5)
    if dt < target_dt / 2:
        n_big = n_small + int(np.ceil(rate * target_dt / 8.0)) * 8
        t_big = min(run(n_big) for _ in range(3))  # one extra compile
        dt = max(t_big - t_small, 1e-9)
        rate = (n_big - n_small) / dt
    return rate


def make_scan(step_fn, taps):
    """Wrap a per-block power fn into scan-over-blocks (cycling 8 blocks).

    ``params`` (weights / delay splits) are explicit jit arguments — a
    closed-over device array would be embedded into the compiled program as
    a literal constant (and blow the remote-compile request size).
    """

    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_n(history, blocks, n, *params):
        k = blocks.shape[0]

        def body(carry, i):
            history = carry
            history = rg.ring_push(history, blocks[i % k])
            window = rg.ring_window(history, BLOCK, SHIFT_RANGE, taps)
            powers = step_fn(window, *params)
            return history, powers

        history, powers = jax.lax.scan(body, history, jnp.arange(n))
        return history, powers[-1]

    return scan_n


def make_scan_chunked(step_fn, taps, chunk):
    """Chunked streaming: each scan step pushes ``chunk`` blocks at once
    ([C, chunk*T], pre-laid-out) and beamforms all of their windows as one
    batched dispatch (``ring_windows``) — per-block outputs identical to
    block-at-a-time streaming, matmuls ``chunk``x bigger.  This is the
    deployment shape of the WAN-tunnel soak benchmark (16-block dispatch
    chunks) and of faster-than-real-time replay.  ``n`` still counts
    BLOCKS (must be a chunk multiple).
    """

    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_n(history, big_blocks, n, *params):
        def body(carry, i):
            history = rg.ring_push(carry, big_blocks)
            windows = rg.ring_windows(history, BLOCK, SHIFT_RANGE, taps, chunk)
            powers = step_fn(windows, *params)      # chunk-level fn [ck, D]
            return history, powers[-1]

        history, powers = jax.lax.scan(body, history, jnp.arange(n // chunk))
        return history, powers[-1]

    return scan_n


_RESULTS: dict = {}


def _emit(results) -> None:
    if results:
        best_name = max(results, key=results.get)
        blocks_per_s = results[best_name]
    else:
        best_name, blocks_per_s = "none", 0.0
    d = GRID * GRID
    beam_samples_per_s = d * BLOCK * blocks_per_s
    mic_macs_per_s = d * N_MICS * BLOCK * blocks_per_s
    print(
        json.dumps(
            {
                "metric": "das_beam_samples_per_s_256mic_4225dir",
                "value": round(beam_samples_per_s, 1),
                "unit": "beam-samples/s/chip",
                "vs_baseline": round(mic_macs_per_s / REFERENCE_MIC_MACS_PER_S, 3),
            }
        )
    )


def _deadline(signum, frame):
    # The remote-device tunnel can wedge mid-compile; emit what we have
    # rather than nothing, then hard-exit (worker threads may be stuck).
    print("# DEADLINE hit — emitting partial results", file=sys.stderr)
    _emit(_RESULTS)
    sys.stdout.flush()
    os._exit(0)


def main():
    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(int(os.environ.get("BENCH_DEADLINE_S", "2400")))
    points, delays_np, dsp, arr, theta, phi = build_geometry()
    c = points.shape[1]
    d = delays_np.shape[0]

    # Device-side data (keep wire transfers small).
    delays = jax.device_put(jnp.asarray(delays_np))
    shift_np, tapw_np = delay_split_np(delays_np, SHIFT_RANGE, "linear")
    (shift_p, tapw_p), d_pad = pad_directions([shift_np, tapw_np], d, TILE_D)
    shift = jax.device_put(jnp.asarray(shift_p))
    tapw = jax.device_put(jnp.asarray(tapw_p))
    rng = np.random.default_rng(0)
    blocks_np = rng.standard_normal((8, c, BLOCK)).astype(np.float32)
    blocks = jax.device_put(jnp.asarray(blocks_np))
    history = jnp.zeros((c, dsp.history), jnp.float32)

    # Dense stencil built on device (~280 MB never crosses the tunnel).
    weights = jax.jit(
        lambda dl_: dl.das_weights(dl_, SHIFT_RANGE, "linear")
    )(delays)
    weights_bf16 = weights.astype(jnp.bfloat16)

    def dense_f32(window, w):
        beam = dl.das_beam(window, w)
        return dl.das_power(beam, divisor=BLOCK * c)

    def dense_bf16(window, w):
        beam = dl.das_beam(
            window.astype(jnp.bfloat16), w,
            precision=jax.lax.Precision.DEFAULT,
        )
        return dl.das_power(beam, divisor=BLOCK * c)

    def pallas_f32(window, sh, tw):
        # Half the bf16 tile: f32 doubles per-tile VMEM and tile_d=512
        # overflows the 16 MB scoped-vmem stack limit on v5e.
        beam = das_beam_pallas(
            window, sh, tw, span=SHIFT_RANGE, block_t=BLOCK,
            tile_d=TILE_D // 2, tile_c=TILE_C,
        )[:d]
        return dl.das_power(beam, divisor=BLOCK * c)

    def pallas_bf16(window, sh, tw):
        beam = das_beam_pallas(
            window, sh, tw, span=SHIFT_RANGE, block_t=BLOCK,
            tile_d=TILE_D, tile_c=TILE_C, compute_dtype=jnp.bfloat16,
        )[:d]
        return dl.das_power(beam, divisor=BLOCK * c)

    # Separable frequency-domain heatmap (ops/fft_das.py): the 256-mic
    # cluster is a contiguous 16x16 lattice, so the DAS sum factors into two
    # tiny per-bin transforms (~20x fewer FLOPs than the dense stencil,
    # exact sinc fractional delays).  Complex-free by construction (the
    # axon tunnel rejects complex dtypes); model operands are a few MB —
    # safe to close over even on the remote-compile path.
    mimo_cfg = MimoConfig(rows=GRID, columns=GRID)
    fft_f32 = fd.make_fft_heatmap_model(np.asarray(points), mimo_cfg, dsp, arr)
    fft_bf16 = fd.make_fft_heatmap_model(
        np.asarray(points), mimo_cfg, dsp, arr, compute="bfloat16"
    )
    # Lattice-ordered variant: ingestion reorders rows host-side (free), the
    # per-block [C, C] permutation matmul disappears.
    fft_bf16_lat = fd.make_fft_heatmap_model(
        np.asarray(points), mimo_cfg, dsp, arr, compute="bfloat16",
        assume_lattice_order=True,
    )
    fft_bf16_lat_pl = fd.make_fft_heatmap_model(
        np.asarray(points), mimo_cfg, dsp, arr, compute="bfloat16",
        assume_lattice_order=True, power_path="pallas",
    )
    lat_perm = fft_bf16_lat.channel_perm

    # Chunked streaming (CHUNK blocks per dispatch, identical per-block
    # outputs — see make_scan_chunked): longer history + chunk-major blocks.
    chunk = CHUNK
    hist_chunked = jnp.zeros(
        (c, chunk * BLOCK + SHIFT_RANGE + rg.LOOKAHEAD_GUARD), jnp.float32
    )

    def chunk_layout(blks_np, perm=None):
        b = blks_np if perm is None else blks_np[:, perm]
        return jnp.asarray(
            b.transpose(1, 0, 2).reshape(c, -1), jnp.float32
        )

    # Variant spec: fn, params, chunk (1 = block-at-a-time), channel perm
    # applied to input blocks host-side (lattice-order models).
    variants = {
        "dense_f32_highest": dict(fn=dense_f32, params=(weights,)),
        "dense_bf16": dict(fn=dense_bf16, params=(weights_bf16,)),
        "fft_f32": dict(fn=lambda w: fd.fft_heatmap_powers(w, fft_f32), params=()),
        "fft_bf16": dict(fn=lambda w: fd.fft_heatmap_powers(w, fft_bf16), params=()),
        "fft_bf16_lat": dict(
            fn=lambda w: fd.fft_heatmap_powers(w, fft_bf16_lat),
            params=(), perm=lat_perm,
        ),
        # Chunked variants take [ck, C, T+S] stacked windows; _pl routes the
        # power stage through one Pallas kernel for the whole chunk.
        "fft_bf16_x8": dict(
            fn=lambda ws: fd.fft_heatmap_powers_chunked(ws, fft_bf16_lat),
            params=(), perm=lat_perm, chunk=chunk,
        ),
        "fft_bf16_x8_pl": dict(
            fn=lambda ws: fd.fft_heatmap_powers_chunked(ws, fft_bf16_lat_pl),
            params=(), perm=lat_perm, chunk=chunk,
        ),
        # Pallas on-the-fly-stencil kernel (v3: precomputed unfold + in-VMEM
        # stencil build, ops/pallas_das.py).  Compiles clean on this Mosaic
        # toolchain (the roll/scratch-based v1/v2 designs hung it); bf16
        # runs the one-hot contraction at ~MXU roofline.  BENCH_NO_PALLAS=1
        # to skip.
        "pallas_f32": dict(fn=pallas_f32, params=(shift, tapw)),
        "pallas_bf16": dict(fn=pallas_bf16, params=(shift, tapw)),
    }
    if os.environ.get("BENCH_NO_PALLAS"):
        variants.pop("pallas_f32")
        variants.pop("pallas_bf16")
        variants.pop("fft_bf16_x8_pl")
    def build_scan(spec):
        """(scan_n, history, noise-blocks input) for a variant spec."""
        ck = spec.get("chunk", 1)
        perm = spec.get("perm")
        if ck == 1:
            blk = (
                blocks
                if perm is None
                else jax.device_put(jnp.asarray(blocks_np[:, perm]))
            )
            return make_scan(spec["fn"], dl.LINEAR_TAPS), history, blk
        scan_n = make_scan_chunked(spec["fn"], dl.LINEAR_TAPS, ck)
        return scan_n, hist_chunked, jax.device_put(chunk_layout(blocks_np, perm))

    results = _RESULTS
    ref_powers = None
    # The remote-device tunnel can fail transiently (observed: every op
    # erroring with UNIMPLEMENTED for a few minutes, then recovering).
    # Retry failed variants a few times rather than reporting 0.
    pending = dict(variants)
    for attempt in range(3):
        if attempt:
            print(
                f"# retrying {len(pending)} failed variant(s) in 90 s "
                f"(attempt {attempt + 1}/3)",
                file=sys.stderr,
            )
            time.sleep(90)
        failed = {}
        for name, spec in pending.items():
            params = spec["params"]
            try:
                scan_n, hist0, blk = build_scan(spec)
                rate = timed_rate(scan_n, hist0, blk, params)
                results[name] = rate
                _, p = scan_n(hist0, blk, 8, *params)
                p = np.asarray(p, np.float64)
                if ref_powers is None:
                    ref_powers = p
                    err = 0.0
                else:
                    err = float(
                        np.max(np.abs(p - ref_powers) / np.maximum(np.abs(ref_powers), 1e-30))
                    )
                print(
                    f"# {name}: {rate:.1f} blocks/s "
                    f"(realtime_x={rate * BLOCK / SAMPLE_RATE:.1f}, "
                    f"max_rel_err={err:.1e})",
                    file=sys.stderr,
                )
            except Exception as e:  # keep the bench robust if a variant breaks
                print(f"# {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
                failed[name] = spec
        pending = failed
        if not pending:
            break

    # Run-to-run variance of the headline variant: tunnel jitter has
    # produced +/-40 % swings in single measurements across rounds (the
    # r01->r03 fft_bf16 delta, docs/performance.md "variance &
    # methodology").  Re-measure the best variant a few times, report the
    # spread, and emit the MEDIAN as the headline.
    try:
        if results:
            best_name = max(results, key=results.get)
            spec = variants[best_name]
            scan_n, hist0, blk = build_scan(spec)
            reps = [results[best_name]]
            for _ in range(3):
                reps.append(timed_rate(scan_n, hist0, blk, spec["params"]))
            reps_s = sorted(reps)
            med = reps_s[len(reps_s) // 2]
            results[best_name] = med
            print(
                f"# jitter {best_name}: n={len(reps)} min={reps_s[0]:.0f} "
                f"median={med:.0f} max={reps_s[-1]:.0f} blocks/s "
                f"(spread {100 * (reps_s[-1] - reps_s[0]) / med:.0f}% of "
                f"median; headline = median)",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"# jitter measurement failed: {e}", file=sys.stderr)

    # Plane-wave parity: noise blocks cannot validate the fft variants
    # (different fractional-delay interpolation reweights broadband noise),
    # so beamform a KNOWN synthetic source and assert every variant peaks
    # at it.  This is the check that would catch a real kernel regression.
    try:
        from beamforming_lk_tpu.io.synthetic import plane_wave_block

        src = (0.5, 1.2, 4000.0)
        pw = np.stack([
            plane_wave_block(points, [src], i * BLOCK, BLOCK, arr,
                             noise_std=0.0)
            for i in range(8)
        ]).astype(np.float32)
        pw_dev: dict = {}

        def pw_input(spec):
            ck, perm = spec.get("chunk", 1), spec.get("perm")
            key = (ck, perm is not None)
            if key not in pw_dev:
                pw_dev[key] = jax.device_put(
                    jnp.asarray(pw if perm is None else pw[:, perm])
                    if ck == 1
                    else chunk_layout(pw, perm)
                )
            return pw_dev[key]

        cos_src = None
        for name in list(results):
            spec = variants[name]
            params = spec["params"]
            ck = spec.get("chunk", 1)
            if ck == 1:
                scan_n = make_scan(spec["fn"], dl.LINEAR_TAPS)
                _, p = scan_n(history, pw_input(spec), 8, *params)
            else:
                scan_n = make_scan_chunked(spec["fn"], dl.LINEAR_TAPS, ck)
                _, p = scan_n(hist_chunked, pw_input(spec), 8, *params)
            p = np.asarray(p, np.float64)
            k = int(np.argmax(p))
            cos_ang = (
                np.cos(theta[k]) * np.cos(src[0])
                + np.sin(theta[k]) * np.sin(src[0]) * np.cos(phi[k] - src[1])
            )
            err_deg = float(np.degrees(np.arccos(np.clip(cos_ang, -1, 1))))
            peak_med = float(p[k] / max(np.median(p), 1e-30))
            ok = err_deg < 4.0 and peak_med > 10.0
            cos_src = ok if cos_src is None else (cos_src and ok)
            print(
                f"# planewave {name}: peak_err={err_deg:.2f}deg "
                f"peak/median={peak_med:.0f} {'OK' if ok else 'MISMATCH'}",
                file=sys.stderr,
            )
        if cos_src is False:
            print("# planewave parity: MISMATCH in at least one variant",
                  file=sys.stderr)
    except Exception as e:
        print(f"# planewave parity check failed to run: {e}", file=sys.stderr)

    signal.alarm(0)
    if results:
        best_name = max(results, key=results.get)
        blocks_per_s = results[best_name]
        print(
            f"# device={jax.devices()[0].device_kind} best={best_name} "
            f"C={c} D={d} T={BLOCK} S={SHIFT_RANGE} "
            f"realtime_x={blocks_per_s * BLOCK / SAMPLE_RATE:.1f} "
            f"mic-GMAC/s={d * c * BLOCK * blocks_per_s / 1e9:.1f}",
            file=sys.stderr,
        )
    _emit(results)


if __name__ == "__main__":
    main()

"""Pallas TPU kernel for fractional-delay delay-and-sum.

STATUS (measured, v5e, BENCH_r04): **research baseline, not the production
path.**  This kernel is strictly dominated by the XLA alternatives it was
built to beat — dense bf16 stencil 4 497 blocks/s vs 3 213 here, and the
separable-fft backend 4-8x faster still — so ``make_awpu_step`` /
``Config.realtime()`` never select it.  The HBM-traffic argument below is
real but loses in practice: XLA's own HBM pipelining of the precomputed
stencil matmul outruns the in-kernel rebuild (the rebuild spends VPU time
inside the MXU's inner loop), and the fft path removes the redundant FLOPs
entirely instead of streaming them faster.  The kernel stays as (a) the
measured evidence for that design conclusion (docs/performance.md "The
Pallas DAS kernel"), and (b) the working template for ops that DO need
on-the-fly stencils (per-direction dynamic delays that cannot be
precomputed — the whole-swarm tracker kernel in ops/pallas_tracker.py is
exactly that, and it DOES win).

Original motivation, for the record: the dense path (ops/delay.py)
materializes the one-hot stencil ``W[D, C, S]`` in HBM and streams it
through one big matmul — at the north-star config (D=4225, C=256, S=64)
that is ~280 MB of HBM traffic per 5.24 ms block.  This kernel rebuilds
the stencil ON THE FLY in VMEM from the compact delay split
(``shift[D, C]`` int32 + ``tap_weights[D, C, taps]``, ~6 MB total), so the
dominant HBM stream drops to the unfolded window (``C*S x T``, 16 MB f32 /
8 MB bf16, re-read once per direction tile).

Design notes (v3 — deliberately boring, after two Mosaic compile hangs on
rolls / span-chunked scratch variants):

- The sliding-window unfold ``X2D[c*S + s, t] = window[c, t + s]`` is done
  OUTSIDE the kernel by XLA (cheap static slices); the kernel never
  shifts or rolls anything.
- Grid ``(D/tile_d, C/tile_c)`` with the channel tile innermost; the
  output tile stays resident and accumulates across channel tiles (the
  standard matmul k-inner pattern).
- In-kernel work is 2D only: expand ``shift``/``tap`` rows across the span
  (``pltpu.repeat`` sublane-axis repeat, or a one-hot iota matmul with
  ``expand="matmul"``), two iota compares per tap, one MXU contraction of
  size ``tile_c * S``.
- All VMEM blocks keep the last two dims (8k, 128k)-tileable or full-dim;
  the tap axis is the LEADING (full) dim of a 3D block, indexed with a
  plain static int.

Equivalent math to the reference's ``delay()`` accumulate
(``src/dsp/delay.cpp:16-26``); consumes the same ``delay_lut`` split as
ops/delay.py (see there for the index-level parity argument).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamforming_lk_tpu.ops import delay as dl


def _das_kernel(shift_ref, tapw_ref, x_ref, out_ref, *, span, taps,
                compute_dtype, expand):
    j = pl.program_id(1)

    shift = shift_ref[...]                      # [tile_c, tile_d] int32
    tile_c, tile_d = shift.shape
    rows = tile_c * span
    # Row order r = s*tile_c + c (span-major): exactly what stacking span
    # copies of the [tile_c, tile_d] tile produces, and what the [S, tile_c,
    # T] -> [S*tile_c, T] leading-dims reshape of the window block produces.

    if expand == "repeat":
        # pltpu.repeat concatenates copies along the axis: row r holds
        # shift[r % tile_c].
        shift_rep = pltpu.repeat(shift, span, axis=0)        # [rows, tile_d]
        taps_rep = [
            pltpu.repeat(tapw_ref[t], span, axis=0).astype(compute_dtype)
            for t in range(taps)
        ]
    else:
        # One-hot expansion matrix E[r, c] = [r % tile_c == c], built from
        # 2D iotas, applied on the MXU.  Exact for the small-int operands.
        r_c = jax.lax.broadcasted_iota(jnp.int32, (rows, tile_c), 0) % tile_c
        c_c = jax.lax.broadcasted_iota(jnp.int32, (rows, tile_c), 1)
        e = (r_c == c_c).astype(compute_dtype)
        shift_rep = jax.lax.dot_general(
            e, shift.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        taps_rep = [
            jax.lax.dot_general(
                e, tapw_ref[t].astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype)
            for t in range(taps)
        ]

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, tile_d), 0) // tile_c
    w = jnp.zeros((rows, tile_d), compute_dtype)
    for t in range(taps):
        w = w + taps_rep[t] * (shift_rep + t == s_iota).astype(compute_dtype)

    x = x_ref[...].reshape(rows, x_ref.shape[-1])   # [S, tile_c, T] -> 2D
    # f32 compute asks for full f32 MXU passes (parity with the dense
    # HIGHEST-precision path); bf16 compute runs at full MXU rate.
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    acc = jax.lax.dot_general(
        w, x.astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(j == 0)
    def _():
        out_ref[...] = acc

    @pl.when(j != 0)
    def _():
        out_ref[...] = out_ref[...] + acc


@functools.partial(
    jax.jit,
    static_argnames=("span", "block_t", "tile_d", "tile_c",
                     "compute_dtype", "expand", "interpret"),
)
def das_beam_pallas(
    window,
    shift,
    tap_weights,
    *,
    span: int,
    block_t: int,
    tile_d: int = 256,
    tile_c: int = 8,
    compute_dtype=jnp.float32,
    expand: str = "repeat",
    interpret: bool = False,
):
    """beam[D, T] from window [C, T+S], shift [D, C] int32, tap_weights
    [D, C, taps].

    D must divide by ``tile_d`` and C by ``tile_c`` (pad the direction grid
    with :func:`pad_directions` if needed).  ``compute_dtype=jnp.bfloat16``
    runs the matmul at full MXU rate with float32 accumulation and halves
    the unfolded-window HBM stream.  The contraction size is
    ``tile_c * span`` — keep it >= 128.  ``expand`` picks how the per-span
    stencil rows are built in VMEM: ``"repeat"`` (sublane repeat) or
    ``"matmul"`` (one-hot iota matmul).
    """
    d, c = shift.shape
    taps = tap_weights.shape[-1]
    if d % tile_d or c % tile_c:
        raise ValueError(f"D={d} C={c} must tile by ({tile_d}, {tile_c})")
    if window.shape != (c, block_t + span):
        raise ValueError(f"window {window.shape} != ({c}, {block_t + span})")
    if expand not in ("repeat", "matmul"):
        raise ValueError(f"unknown expand mode: {expand}")

    # Unfolded window X[s, c, t] = window[c, t + s], built by XLA from
    # S static slices (fused, never gathers).  Kept 3D so each channel
    # tile's rows are one contiguous VMEM block; the kernel collapses the
    # two leading dims.
    x3d = dl.unfold_window(window, span, block_t)            # [C, S, T]
    x3d = jnp.transpose(x3d, (1, 0, 2)).astype(compute_dtype)  # [S, C, T]

    # [taps, C, D] so the VMEM block's last two dims are (8k, 128k)-tileable
    # and the tap axis is a full leading dim.
    shift_t = jnp.transpose(shift, (1, 0))                   # [C, D]
    tapw_t = jnp.transpose(tap_weights, (2, 1, 0))           # [taps, C, D]

    kernel = functools.partial(
        _das_kernel, span=span, taps=taps,
        compute_dtype=compute_dtype, expand=expand,
    )
    flops = 2 * d * c * span * block_t
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d, c // tile_c),
        in_specs=[
            pl.BlockSpec(
                (tile_c, tile_d), lambda i, j: (j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (taps, tile_c, tile_d), lambda i, j: (0, j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (span, tile_c, block_t), lambda i, j: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_d, block_t), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, block_t), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(d * c * (4 + 4 * taps))
            + (d // tile_d) * x3d.size * x3d.dtype.itemsize
            + d * block_t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(shift_t, tapw_t, x3d)


def delay_split_np(delays, span: int, mode: str = "linear", fir_bank=None):
    """Host-side (shift, tap_weights) split feeding the Pallas kernel —
    same convention as :func:`beamforming_lk_tpu.ops.delay.delay_lut`."""
    taps = dl.LINEAR_TAPS if mode == "linear" else int(np.shape(fir_bank)[-1])
    delays = np.clip(np.asarray(delays, np.float64), 0.0, float(span - taps))
    whole = np.floor(delays)
    frac = (delays - whole).astype(np.float32)
    shift = ((span - taps) - whole).astype(np.int32)
    if mode == "linear":
        w = np.stack([frac, 1.0 - frac], axis=-1)
    else:
        bank = np.asarray(fir_bank, np.float32)
        idx = np.round(frac * (bank.shape[0] - 1)).astype(np.int64)
        w = bank[idx]
    return shift, np.ascontiguousarray(w, np.float32)


def pad_directions(arrs, d: int, tile_d: int):
    """Pad leading D axis of each array up to a multiple of tile_d."""
    d_pad = (-d) % tile_d
    if d_pad == 0:
        return arrs, d
    out = []
    for a in arrs:
        pad = [(0, d_pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(np.pad(a, pad))
    return out, d + d_pad

"""Pallas TPU kernel for fractional-delay delay-and-sum.

The dense path (ops/delay.py) materializes the one-hot stencil
``W[D, C, S]`` in HBM and streams it through one big matmul — at the
north-star config (D=4225, C=256, S=64) that is ~277 MB of HBM traffic per
5.24 ms block, which approaches the HBM roofline before the MXU is busy.
This kernel rebuilds the stencil ON THE FLY in VMEM from the compact delay
split (``shift[D, C]`` int32 + ``tap_weights[D, C, taps]``, ~6 MB total):

    grid = (D/TILE_D, C/TILE_C)   # C innermost: output tile accumulates
    per step:
      one-hot  W_tile[TILE_D, TILE_C*S]   (VPU iota-compare, cheap)
      unfold   X_tile[TILE_C*S, T]        (static slices of the window)
      matmul   beam_tile += W_tile @ X_tile          (MXU)

so HBM reads drop to the window + the delay split, and the op becomes
MXU-bound.  Equivalent math to ``delay()`` in the reference
(``src/dsp/delay.cpp:16-26``) — see ops/delay.py for the index-level parity
argument; this kernel consumes the same ``delay_lut`` split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamforming_lk_tpu.ops import delay as dl


def _das_kernel(shift_ref, tapw_ref, window_ref, out_ref, *, span, taps,
                block_t, compute_dtype):
    """One (d_tile, c_tile) step: build stencil tile, unfold, matmul-accumulate.

    The delay split arrives TRANSPOSED as [C, D] so its VMEM blocks are
    (tile_c=8-multiple, tile_d=128-multiple) — the TPU lane tiling requires
    the last two block dims be (8k, 128k) or span the full array dim.
    """
    c_idx = pl.program_id(1)

    shift = shift_ref[...]                      # [TILE_C, TILE_D] int32
    tapw = tapw_ref[...]                        # [TILE_C, TILE_D, taps]
    tile_c, tile_d = shift.shape

    # Stencil tile W[c, s, d]: keeping the 128-aligned d axis MINOR means
    # the (c, s) collapse below is a pure major-dim reshape, which Mosaic
    # supports (collapsing into the lane dim is not).
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_c, span, tile_d), 1)
    w = jnp.zeros((tile_c, span, tile_d), compute_dtype)
    for j in range(taps):
        onehot = (s_iota == (shift + j)[:, None, :]).astype(compute_dtype)
        # (two-step indexing: int-then-newaxis stays a slice; mixing them
        # in one bracket lowers as an unsupported gather)
        wj = tapw[:, :, j].astype(compute_dtype)
        w = w + wj[:, None, :] * onehot
    w2d = w.reshape(tile_c * span, tile_d)      # [K, TILE_D]

    # Unfolded window tile X[c, k, t] = window[c, t + k].  Slicing at lane
    # offset k and concatenating trips Mosaic ("offset mismatch on
    # non-concat dimension"); rotating with pltpu.roll keeps every slice at
    # lane offset 0.  Only major dims collapse in the reshape (t stays
    # minor).
    win = window_ref[...].astype(compute_dtype)  # [TILE_C, T + S]
    width = block_t + span
    unf = jnp.stack(
        [
            pltpu.roll(win, (width - k) % width, 1)[:, :block_t]
            for k in range(span)
        ],
        axis=1,
    ).reshape(tile_c * span, block_t)            # [K, T]

    # beam_tile[d, t] = sum_K W[K, d] * X[K, t]
    acc = jax.lax.dot_general(
        w2d, unf,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c_idx == 0)
    def _():
        out_ref[...] = acc

    @pl.when(c_idx != 0)
    def _():
        out_ref[...] = out_ref[...] + acc


@functools.partial(
    jax.jit,
    static_argnames=("span", "block_t", "tile_d", "tile_c", "compute_dtype",
                     "interpret"),
)
def das_beam_pallas(
    window,
    shift,
    tap_weights,
    *,
    span: int,
    block_t: int,
    tile_d: int = 128,
    tile_c: int = 8,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """beam[D, T] from window [C, T+S], shift [D, C] int32, tap_weights
    [D, C, taps].

    D must divide by ``tile_d`` and C by ``tile_c`` (pad the direction grid
    if needed — powers appear in padded slots as garbage to be sliced off).
    ``compute_dtype=jnp.bfloat16`` runs the matmul at full MXU rate with
    float32 accumulation.
    """
    d, c = shift.shape
    taps = tap_weights.shape[-1]
    if d % tile_d or c % tile_c:
        raise ValueError(f"D={d} C={c} must tile by ({tile_d}, {tile_c})")
    if window.shape != (c, block_t + span):
        raise ValueError(f"window {window.shape} != ({c}, {block_t + span})")

    kernel = functools.partial(
        _das_kernel, span=span, taps=taps, block_t=block_t,
        compute_dtype=compute_dtype,
    )
    flops = 2 * d * c * span * block_t
    # Transposed [C, D] layout => (8k, 128k)-tileable VMEM blocks.
    shift_t = jnp.transpose(shift, (1, 0))
    tapw_t = jnp.transpose(tap_weights, (1, 0, 2))
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d, c // tile_c),
        in_specs=[
            pl.BlockSpec(
                (tile_c, tile_d), lambda i, j: (j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_c, tile_d, taps), lambda i, j: (j, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_c, block_t + span), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_d, block_t), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, block_t), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(d * c * (4 + 4 * taps)) + window.size * 4 + d * block_t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(shift_t, tapw_t, window)


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

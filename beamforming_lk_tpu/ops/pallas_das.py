"""Pallas TPU kernel for fractional-delay delay-and-sum.

The dense path (ops/delay.py) materializes the one-hot stencil
``W[D, C, S]`` in HBM and streams it through one big matmul — at the
north-star config (D=4225, C=256, S=64) that is ~280 MB of HBM traffic per
5.24 ms block.  This kernel rebuilds the stencil ON THE FLY in VMEM from
the compact delay split (``shift[D, C]`` int32 + ``tap_weights[D, C, taps]``,
~6 MB total), so HBM reads drop to the window + the split and the op is
MXU-bound.

Mosaic (real-TPU) lowering constraints shaped the design — interpret mode
checks none of these (each was found by bisection on hardware):

- VMEM blocks: last two dims (8k, 128k) or the full array dim -> the delay
  split is fed TRANSPOSED as [C, D].
- No 3D-middle-axis concat/broadcast; no lane-offset slicing -> 2D ops
  only, shifted rows produced with ``pltpu.roll`` at lane offset 0.
- ``pltpu.roll`` needs a 128-multiple lane width -> window lane-padded.
- Unrolled scratch stores each get their own stack slot (span x row-block
  bytes can blow the 16 MB VMEM stack); dynamic roll amounts hang the
  compiler -> the span is CHUNKED into a third grid dimension: the chunk
  index picks a pre-shifted window block (built host/XLA-side), so the
  in-kernel rolls are by STATIC amounts and only ``chunk_s`` row-blocks
  are ever live.

Grid ``(D/tile_d, C/tile_c, S/chunk_s)``, last dim innermost; the output
tile accumulates across the two inner dims:

    rows k of chunk q:  K = tile_c * chunk_s, s = q*chunk_s + u
    W2D[u*C + c, d] = sum_j tapw[c, d, j] * [shift[c, d] + j == s]
    X  [u*C + c, t] = window[c, t + s]
    beam[d, t]     += W2D^T @ X       (MXU, K = tile_c * chunk_s)

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


def _das_kernel(shift_ref, tapw_ref, winc_ref, out_ref, w_scr, x_scr, *,
                chunk_s, taps, block_t, pad_width, compute_dtype):
    c_idx = pl.program_id(1)
    q_idx = pl.program_id(2)

    shift = shift_ref[...]                      # [TILE_C, TILE_D] int32
    tapw = tapw_ref[...]                        # [TILE_C, TILE_D, taps]
    tile_c, tile_d = shift.shape
    win = winc_ref[0].astype(compute_dtype)     # [TILE_C, pad_width]
    s_base = q_idx * chunk_s

    tapw_c = [tapw[:, :, j].astype(compute_dtype) for j in range(taps)]
    for u in range(chunk_s):
        s = s_base + u                          # dynamic scalar (compare only)
        w_s = jnp.zeros((tile_c, tile_d), compute_dtype)
        for j in range(taps):
            w_s = w_s + tapw_c[j] * (shift + j == s).astype(compute_dtype)
        w_scr[u * tile_c : (u + 1) * tile_c, :] = w_s
        # The chunk's window block is pre-shifted by s_base, so the roll
        # amount u is STATIC (dynamic rolls hang the Mosaic compiler).
        x_scr[u * tile_c : (u + 1) * tile_c, :] = pltpu.roll(
            win, (pad_width - u) % pad_width, 1
        )[:, :block_t]

    acc = jax.lax.dot_general(
        w_scr[...], x_scr[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when((c_idx == 0) & (q_idx == 0))
    def _():
        out_ref[...] = acc

    @pl.when((c_idx != 0) | (q_idx != 0))
    def _():
        out_ref[...] = out_ref[...] + acc


@functools.partial(
    jax.jit,
    static_argnames=("span", "block_t", "tile_d", "tile_c", "chunk_s",
                     "compute_dtype", "interpret"),
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
    chunk_s: int = 16,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """beam[D, T] from window [C, T+S], shift [D, C] int32, tap_weights
    [D, C, taps].

    D must divide by ``tile_d``, C by ``tile_c``, and S by ``chunk_s``
    (pad the direction grid with :func:`pad_directions` if needed).
    ``compute_dtype=jnp.bfloat16`` runs the matmul at full MXU rate with
    float32 accumulation.  ``tile_c * chunk_s`` is the matmul contraction
    size — keep it >= 128.
    """
    d, c = shift.shape
    taps = tap_weights.shape[-1]
    if d % tile_d or c % tile_c or span % chunk_s:
        raise ValueError(
            f"D={d} C={c} S={span} must tile by ({tile_d}, {tile_c}, {chunk_s})"
        )
    if window.shape != (c, block_t + span):
        raise ValueError(f"window {window.shape} != ({c}, {block_t + span})")
    n_chunks = span // chunk_s
    # Pre-shifted window copies, one per span chunk, lane-padded to a
    # 128 multiple (rolling a non-128-multiple width is unsupported).
    need = block_t + chunk_s
    pad_width = -(-need // 128) * 128
    win_chunks = jnp.stack(
        [
            jnp.pad(
                jax.lax.slice_in_dim(window, q * chunk_s, q * chunk_s + need, axis=1),
                ((0, 0), (0, pad_width - need)),
            )
            for q in range(n_chunks)
        ]
    )                                           # [n_chunks, C, pad_width]

    kernel = functools.partial(
        _das_kernel, chunk_s=chunk_s, taps=taps, block_t=block_t,
        pad_width=pad_width, compute_dtype=compute_dtype,
    )
    # Transposed [C, D] layout => (8k, 128k)-tileable VMEM blocks.
    shift_t = jnp.transpose(shift, (1, 0))
    tapw_t = jnp.transpose(tap_weights, (1, 0, 2))
    flops = 2 * d * c * span * block_t
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d, c // tile_c, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (tile_c, tile_d), lambda i, j, q: (j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_c, tile_d, taps), lambda i, j, q: (j, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_c, pad_width), lambda i, j, q: (q, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_d, block_t), lambda i, j, q: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, block_t), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_c * chunk_s, tile_d), compute_dtype),
            pltpu.VMEM((tile_c * chunk_s, block_t), compute_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(d * c * (4 + 4 * taps))
            + win_chunks.size * 4
            + d * block_t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(shift_t, tapw_t, win_chunks)


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

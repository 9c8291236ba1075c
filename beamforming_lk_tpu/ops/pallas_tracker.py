"""Monopulse sub-step chain as ONE Pallas TPU kernel.

The gradient tracker's hot loop is a *sequential* chain of monopulse steps
(``src/dsp/gradient_ascend.cpp:301-409``: 5 tracker sub-steps per iteration,
each beamforming 4 probes and nudging the particle).  The XLA lowering of
one step (``models/tracker.py::_monopulse_step``) is ~7 us/round on v5e —
all kernel-launch floor: the actual math is a [P, C*span] x [C*span, T]
matmul plus elementwise trig.  This kernel runs the whole chain of
``n_sub`` dependent sub-steps inside one ``pallas_call``: particle state
lives in registers/VMEM across rounds, the bandpass-folded probe window
stays VMEM-resident, and each round is ONE [4P, C*span] MXU dot (all four
probes batched into the M dimension) plus VPU trig.

Exact math parity with ``_monopulse_step`` (quadrant or nearby probe
layout, linear interp), step for step:

  probes   ``ops.geometry.quadrant_probes`` / ``nearby_probes``
           (Rz(phi) @ Ry(rt) rotation of 4 ring points at inclination
           ``spread``; FoV-edge back-off; the layouts differ only in the
           ring azimuths and the discriminant combining)
  steering ``ops.antenna.steering_delays``    (u = (st*cos, -st*sin, ct),
           min-subtracted) — expressed WITHOUT acos/atan2 (Mosaic has no
           inverse-trig lowering): the rotated probe vector (wx, wy, wz)
           is already the unit direction, so u = (wx, -wy, wz), and the
           theta clip pulls the vector to inclination ``theta_limit`` at
           the same azimuth in Cartesian form.
  stencil  ``ops.delay.delay_lut`` + linear ``interp_weights``
           ([frac, 1-frac] at shift = (span-taps) - floor(tau))
  power    ``ops.delay.das_power`` with the 3-tap bandpass *pre-folded
           into the window columns* (bandpass commutes with the
           time-invariant stencil contraction)
  update   monopulse discriminants, theta-then-phi step, clamp/wrap

Mosaic-friendly construction throughout: delays are computed in the
compact [4P, C] domain and tiled to the contraction domain with
``pltpu.repeat`` (a tile-concat — which is exactly the s-major
``[span, C]`` window layout), the stencil is an iota+compare one-hot, and
there are no gathers, no reshapes into the lane dim, no ``pltpu.roll``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamforming_lk_tpu.ops import delay as dl

#: Probe ring azimuths per layout (ops/geometry.py::quadrant_probes /
#: nearby_probes) — the two constellations differ only in where the 4
#: probes sit and how the monopulse discriminant combines them.  Any
#: ``probe_layout`` other than "quadrant" (the config spells it
#: "horizontal") selects the N/E/S/W ring, mirroring
#: ``models/tracker.py::_monopulse_step``.
_QUADRANT_PHIS = tuple(np.deg2rad((45.0, 315.0, 225.0, 135.0)).tolist())
_NEARBY_PHIS = tuple(np.deg2rad((0.0, 90.0, 180.0, 270.0)).tolist())
_EPS = 1e-9  # models/tracker.py EPSILON (phi step 1/sin(eps + theta))
_TWO_PI = 2.0 * np.pi


def pack_geometry(points, samples_per_meter, channel_mask=None):
    """[4, C] static operand: rows (x, y, z) * samples_per_meter and the
    channel validity mask."""
    pts = np.asarray(points, np.float64) * float(samples_per_meter)
    c = pts.shape[1]
    mask = (
        np.ones(c, np.float64)
        if channel_mask is None
        else np.asarray(channel_mask, np.float64)
    )
    return jnp.asarray(np.vstack([pts, mask[None]]), jnp.float32)


def fold_bandpass_window(unfolded):
    """[C, span, T] unfolded probe window -> s-major [span*C, Tp] with the
    3-tap bandpass (``ops.delay.bandpass_ma``) folded into the time columns
    and zero-padded to a lane multiple (zero columns add zero power).

    Row ``k = s*C + c`` holds channel c's window at tap offset s — the
    layout ``pltpu.repeat`` produces when tiling per-channel values
    ``span`` times along the contraction axis.

    Prefer :func:`bandpass_smaj_window` when starting from the compact
    [C, W] probe window — same columns, ~span-x less bandpass work and no
    [C, span, T] transpose.
    """
    c, span, t = unfolded.shape
    u = jnp.swapaxes(unfolded, 0, 1).reshape(span * c, t)
    bp = 0.5 * u[:, 1:-1] - 0.25 * (u[:, 2:] + u[:, :-2])
    pad = (-(t - 2)) % 128
    if pad:
        bp = jnp.pad(bp, ((0, 0), (0, pad)))
    return bp


def bandpass_smaj_window(pw, span: int):
    """Compact [C, W] probe window -> s-major [span*C, Tp] bandpass-folded
    window, bit-identical to ``fold_bandpass_window(unfold_window(pw, span,
    W - span))`` but cheaper: the 3-tap bandpass commutes with the sliding
    unfold, so it runs ONCE on the [C, W] window (span-x less elementwise
    work) and the unfold is span static slices concatenated straight into
    the s-major row order — no [C, span, T] intermediate, no transpose.
    """
    c, wlen = pw.shape
    t = wlen - span
    bp = 0.5 * pw[:, 1:-1] - 0.25 * (pw[:, 2:] + pw[:, :-2])   # [C, W-2]
    rows = jnp.concatenate(
        [bp[:, s:s + t - 2] for s in range(span)], axis=0
    )                                                          # [span*C, T-2]
    pad = (-(t - 2)) % 128
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return rows


def smaj_window(pw, span: int):
    """Compact [C, W] probe window -> s-major [span*C, Tp] RAW (unfiltered)
    rows — the audio-beam twin of :func:`bandpass_smaj_window` (row
    ``k = s*C + c`` col ``j`` = ``pw[c, s + j]``, ``j < W - span``,
    zero-padded to a lane multiple)."""
    c, wlen = pw.shape
    t = wlen - span
    rows = jnp.concatenate([pw[:, s:s + t] for s in range(span)], axis=0)
    pad = (-t) % 128
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return rows


def _stencil_rows(shift, frac, mask_e, s_k, span, taps, interp, fir_phases):
    """[R, C] integer shift + fractional part -> [R, span*C] stencil rows
    on the s-major contraction layout (``ops.delay.das_weights`` math:
    linear-interp ``[frac, 1-frac]`` at ``shift`` — the reference's
    backwards-interp quirk, delay.cpp:24 — or the ``taps``-tap polyphase
    windowed-sinc bank row recomputed in-kernel from the quantized
    fraction).

    FIR path cost note: ``sin(pi(t - d)) = (-1)^(t+1) sin(pi d)`` for
    integer taps t, so ALL taps' sinc numerators share ONE transcendental
    per (row, channel) — 8x fewer sin evaluations than the naive per-tap
    form (the r04 FIR-variant cost lever)."""
    shift_e = pltpu.repeat(shift, span, axis=1)                # [R, span*C]
    if interp == "linear":
        frac_e = pltpu.repeat(frac, span, axis=1)
        return (
            jnp.where(s_k == shift_e, frac_e, 0.0)
            + jnp.where(s_k == shift_e + 1, 1.0 - frac_e, 0.0)
        ) * mask_e
    # Closed-form windowed-sinc bank row (ops.delay.fractional_delay_fir_bank
    # generator, delay.py:74-94): quantize the fraction to the bank's phase
    # grid, evaluate sinc(t - d) * blackman(t) per tap, DC-normalize.
    fq = jnp.round(frac * (fir_phases - 1)) / float(fir_phases - 1)
    d = float(dl.FIR_DEFAULT_CENTER) - fq                      # [R, C]
    bw = np.blackman(taps)
    sin_pd = jnp.sin(np.pi * d)                                # shared sin
    hs = []
    for t in range(taps):
        x = np.pi * (float(t) - d)
        sign = 1.0 if t % 2 == 1 else -1.0
        near = jnp.abs(x) < 1e-4
        # sinc via the shared sin with the |x|->0 series (x==0 at the
        # center tap when the fraction quantizes to 0 or 1).
        s = jnp.where(
            near,
            1.0 - x * x * (1.0 / 6.0),
            sign * sin_pd / jnp.where(near, 1.0, x),
        )
        hs.append(s * float(bw[t]))
    hsum = hs[0]
    for h in hs[1:]:
        hsum = hsum + h
    w = jnp.zeros_like(shift_e, dtype=jnp.float32)
    for t in range(taps):
        h_e = pltpu.repeat(hs[t] / hsum, span, axis=1)
        w = w + jnp.where(s_k == shift_e + t, h_e, 0.0)
    return w * mask_e


def _make_substep(
    xyz_ref, win, rate, spread, *,
    span, taps, theta_limit, inv_divisor, precision,
    probe_layout="quadrant", interp="linear", fir_phases=101,
):
    """Shared monopulse sub-step core: (active, carry6) -> carry6.

    One [4P, C*span] MXU dot per call; all the probe/steering/stencil math
    on the VPU.  Closured over the geometry ref and the window / rate /
    spread VALUES — the row count follows ``rate``'s, so callers can build
    a full-swarm substep AND a prefix-rows substep (the first R rows) from
    the same window and run cheap sub-steps on only the particles that can
    move (see ``_make_swarm_block_update``'s prefix path).

    ``interp="fir"`` builds the ``taps``-tap polyphase stencil IN-KERNEL
    from the windowed-sinc closed form (the [phases, taps] bank of
    ``ops.delay.fractional_delay_fir_bank`` is ``sinc(j - (center - fq)) *
    blackman(j)``, DC-normalized, delay.py:74-94) — a LUT gather would not
    lower in Mosaic, but the bank's generator is pure forward trig, so each
    row is recomputed from the quantized fraction where it is needed
    (f32 vs the XLA bank's f64 build: coefficient deltas ~1e-7)."""
    c = xyz_ref.shape[1]
    p = rate.shape[0]
    px = xyz_ref[0:1, :]                                   # [1, C]
    py = xyz_ref[1:2, :]
    pz = xyz_ref[2:3, :]
    mask = xyz_ref[3:4, :]
    k = span * c
    # Static per-column tap offset s = k // C in the s-major layout.
    s_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) // c
    mask_e = pltpu.repeat(mask, span, axis=1)              # [1, span*C]
    sin_sp = jnp.sin(spread)
    cos_sp = jnp.cos(spread)
    sin_tl = float(np.sin(theta_limit))
    cos_tl = float(np.cos(theta_limit))

    def probe_u(phi, rt, base_phi):
        """Steering vector components [P, 1] for one probe ring point."""
        bx = sin_sp * np.cos(base_phi)
        by = sin_sp * np.sin(base_phi)
        bz = cos_sp
        c_t, s_t = jnp.cos(rt), jnp.sin(rt)
        vx = c_t * bx + s_t * bz
        vz = -s_t * bx + c_t * bz
        c_p, s_p = jnp.cos(phi), jnp.sin(phi)
        wx = c_p * vx - s_p * by
        wy = s_p * vx + c_p * by
        clipped = vz < cos_tl
        r = jnp.maximum(jnp.sqrt(wx * wx + wy * wy), 1e-12)
        ux = jnp.where(clipped, sin_tl * wx / r, wx)
        uy = -jnp.where(clipped, sin_tl * wy / r, wy)
        uz = jnp.where(clipped, cos_tl, vz)
        return ux, uy, uz

    def substep(active, carry):
        theta, phi, gt0, gp0, rad0, err0 = carry
        # FoV-edge back-off (ops/geometry.py::_edge_adjust).
        near = theta + spread > (np.pi / 2.0)
        rt = jnp.where(near, theta - spread, theta)
        adj = jnp.where(near, theta - spread / 2.0, theta)
        # All 4 probes stacked along the M (sublane) axis: one dot.
        phis = _QUADRANT_PHIS if probe_layout == "quadrant" else _NEARBY_PHIS
        us = [probe_u(phi, rt, b) for b in phis]
        u_x = jnp.concatenate([u[0] for u in us], axis=0)  # [4P, 1]
        u_y = jnp.concatenate([u[1] for u in us], axis=0)
        u_z = jnp.concatenate([u[2] for u in us], axis=0)
        tau = u_x * px + u_y * py + u_z * pz               # [4P, C]
        # Min over ALL channels — steering_delays does not exclude masked
        # channels from the min (ops/antenna.py:142); the mask only zeroes
        # stencil weights below.
        tau_min = jnp.min(tau, axis=1, keepdims=True)
        tau = jnp.clip(tau - tau_min, 0.0, float(span - taps))
        whole = jnp.floor(tau)
        frac = tau - whole
        shift = (span - taps) - whole.astype(jnp.int32)    # [4P, C]
        w = _stencil_rows(
            shift, frac, mask_e, s_k, span, taps, interp, fir_phases
        )                                                  # [4P, span*C]
        beam = jax.lax.dot_general(
            w.astype(win.dtype), win,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                  # [4P, Tp] f32
        powers = jnp.sum(beam * beam, axis=1, keepdims=True) * inv_divisor
        q1, q2, q3, q4 = (powers[j * p:(j + 1) * p] for j in range(4))
        total = jnp.maximum(q1 + q2 + q3 + q4, 1e-30)
        if probe_layout == "quadrant":
            gt = ((q1 + q2) - (q3 + q4)) / total
            gp = ((q1 + q4) - (q2 + q3)) / total
        else:
            # N/E/S/W probes (models/tracker.py::_monopulse_step nearby
            # branch): each axis normalized by the max of its pair.
            gt = (q1 - q3) / jnp.maximum(jnp.maximum(q1, q3), 1e-30)
            gp = (q2 - q4) / jnp.maximum(jnp.maximum(q2, q4), 1e-30)
        err = jnp.abs(gt) + jnp.abs(gp)
        rad = total * 0.25
        new_t = adj + rate * gt
        new_p = phi + (rate * gp) / jnp.sin(_EPS + new_t)
        new_t = jnp.clip(new_t, 0.0, theta_limit)
        new_p = new_p - jnp.floor(new_p / _TWO_PI) * _TWO_PI
        return (
            jnp.where(active, new_t, theta),
            jnp.where(active, new_p, phi),
            jnp.where(active, gt, gt0),
            jnp.where(active, gp, gp0),
            jnp.where(active, rad, rad0),
            jnp.where(active, err, err0),
        )

    return substep


def _chain_kernel(
    xyz_ref,      # [4, C]  f32: spm*x, spm*y, spm*z + channel mask
    win_ref,      # [span*C, Tp] compute dtype: bandpass-folded window
    th_ref,       # [P, 1]  f32 initial theta
    ph_ref,       # [P, 1]  f32 initial phi
    st0_ref,      # [4, P, 1] f32 initial (grad_t, grad_p, radius, error)
                  #           — passed through on never-active rows
    rate_ref,     # [P, 1]  f32 per-particle step rate
    spread_ref,   # [P, 1]  f32 per-particle probe spread
    act_ref,      # [S, P, 1] f32 per-sub-step active mask (1 = step)
    out_th, out_ph, out_gt, out_gp, out_rad, out_err,   # [P, 1] f32 each
    *,
    n_sub: int,
    span: int,
    taps: int,
    theta_limit: float,
    inv_divisor: float,
    precision,
    probe_layout: str,
    interp: str = "linear",
    fir_phases: int = 101,
):
    substep = _make_substep(
        xyz_ref, win_ref[...], rate_ref[...], spread_ref[...],
        span=span, taps=taps, theta_limit=theta_limit,
        inv_divisor=inv_divisor, precision=precision,
        probe_layout=probe_layout, interp=interp, fir_phases=fir_phases,
    )

    def body(i, carry):
        return substep(act_ref[i] > 0.0, carry)

    carry = (
        th_ref[...], ph_ref[...],
        st0_ref[0], st0_ref[1], st0_ref[2], st0_ref[3],
    )
    theta, phi, gt, gp, rad, err = jax.lax.fori_loop(
        0, n_sub, body, carry
    )
    out_th[...] = theta
    out_ph[...] = phi
    out_gt[...] = gt
    out_gp[...] = gp
    out_rad[...] = rad
    out_err[...] = err


@functools.partial(
    jax.jit,
    static_argnames=(
        "span", "taps", "theta_limit", "divisor", "interpret",
        "probe_layout", "interp", "fir_phases",
    ),
)
def monopulse_chain_pallas(
    xyz,            # [4, C] from pack_geometry
    window_bp,      # [span*C, Tp] from fold_bandpass_window (compute dtype)
    theta, phi,     # [P] f32
    rates, spreads, # [P] f32
    active,         # [n_sub, P] bool/float — per-sub-step row mask
    state0=None,    # optional (grad_t, grad_p, radius, error) [P] each
    *,
    span: int,
    taps: int = dl.LINEAR_TAPS,
    theta_limit: float,
    divisor: float,
    interpret: bool = False,
    probe_layout: str = "quadrant",
    interp: str = "linear",
    fir_phases: int = 101,
):
    """Run ``n_sub`` dependent monopulse sub-steps in one kernel.

    Returns ``(theta, phi, grad_theta, grad_phi, radius, error)`` each [P]
    f32 — the state after the chain, rows stepped only where ``active``
    (matching ``_monopulse_step``'s masked passthrough round by round;
    never-active rows keep their ``state0`` values, zeros if omitted).
    """
    p = theta.shape[0]
    n_sub = active.shape[0]
    pad = (-p) % 32                       # sublane multiple for every dtype
    pp_ = p + pad

    def col(v):
        v = jnp.asarray(v, jnp.float32).reshape(p, 1)
        return jnp.pad(v, ((0, pad), (0, 0)))

    if state0 is None:
        st0 = jnp.zeros((4, pp_, 1), jnp.float32)
    else:
        st0 = jnp.stack([col(s) for s in state0])
    act = jnp.pad(
        jnp.asarray(active, jnp.float32).reshape(n_sub, p, 1),
        ((0, 0), (0, pad), (0, 0)),
    )
    precision = (
        jax.lax.Precision.HIGHEST
        if window_bp.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    kern = functools.partial(
        _chain_kernel,
        n_sub=n_sub,
        span=span,
        taps=taps,
        theta_limit=float(theta_limit),
        inv_divisor=1.0 / float(divisor),
        precision=precision,
        probe_layout=probe_layout,
        interp=interp,
        fir_phases=fir_phases,
    )
    out_sds = [jax.ShapeDtypeStruct((pp_, 1), jnp.float32)] * 6
    k = window_bp.shape[0]
    tp = window_bp.shape[1]
    outs = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=out_sds,
        cost_estimate=pl.CostEstimate(
            flops=n_sub * (2 * 4 * pp_ * k * tp + 80 * pp_ * k),
            bytes_accessed=k * tp * window_bp.dtype.itemsize
            + n_sub * 4 * pp_ * k * 4,
            transcendentals=n_sub * 4 * 10 * pp_,
        ),
        # The FIR stencil build keeps a few extra [4P, span*C] temporaries
        # live, overflowing the default 16 MiB scoped-VMEM stack; v5e has
        # 128 MiB of VMEM, so raise the scoped limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        xyz, window_bp, col(theta), col(phi), st0,
        col(rates), col(spreads), act,
    )
    return tuple(o[:p, 0] for o in outs)


def _swarm_kernel(
    xyz_ref,      # [4, C]  f32 geometry + channel mask
    win_ref,      # [span*C, Tp] compute-dtype bandpass-folded window
    th_ref,       # [P, 1]  f32 initial theta   (rows: trackers|seekers|miso)
    ph_ref,       # [P, 1]  f32 initial phi
    st0_ref,      # [4, P, 1] f32 initial (grad_t, grad_p, radius, error)
    rate_ref,     # [P, 1]  f32 per-particle step rate
    spread_ref,   # [P, 1]  f32 per-particle probe spread
    fam_ref,      # [3, P, 1] f32 family one-hots (tracker, seeker, miso)
    trk0_ref,     # [2, P, 1] f32 (tracking 0/1, start block) — tracker rows
    tgt_ref,      # [3, P, 1] f32 previous block's published targets
                  #           (theta, phi, valid) — tracker rows
    jt_ref,       # [I, P, 1] f32 per-iteration seeker jump theta offsets
    jp_ref,       # [I, P, 1] f32 per-iteration seeker jump phi offsets
    bi_ref,       # [1, 1]  f32 block index (tracker start stamp)
    ref_ref,      # [1, 1]  f32 reference power (channel-0 bandpass power —
                  #         the prune floor, gradient_ascend.cpp:304-313)
    *refs,        # optional raw window [span*C, Tp2] f32 (emit_beam), then
                  # out refs: th, ph, gt, gp, rad, err, trk, start, mean
                  # [, beam]
    n_iter: int,
    n_sub: int,
    refine: int,
    span: int,
    taps: int,
    theta_limit: float,
    inv_divisor: float,
    cos_closeness: float,
    error_threshold: float,
    n_trackers: int,
    precision,
    probe_layout: str,
    interp: str = "linear",
    fir_phases: int = 101,
    min_power_fraction: float = 0.0,
    emit_beam: bool = False,
    prefix_rows: int = 0,
):
    """The WHOLE per-block swarm update as one kernel: ``n_iter`` iterations
    of [``n_sub`` chained monopulse sub-steps + merge + seeker jump +
    promote] (``models/tracker.py`` iteration bodies,
    gradient_ascend.cpp:301-409) with particle state resident in VMEM across
    all of it.

    In-kernel versions of the iteration-boundary logic, Mosaic-style:

      scalar picks   one-hot ``sum(where(row_idx == n, v, 0))`` reductions
                     instead of dynamic gathers
      merge          fori over the ``n_trackers`` rows; geodesic closeness
                     via ``cos(ang) > cos(closeness)`` (no arccos — Mosaic
                     has no inverse trig), oldest/lowest-index survives
      seeker jump    same loop checks seekers against the previous block's
                     published targets; the random offsets are PRE-GENERATED
                     outside with the exact key schedule of the XLA path
      promote        max + first-index one-hot argmax of converged seekers;
                     all free trackers start at the winner

    Row layout: trackers (0..n_trackers-1) | seekers | optional miso row;
    padded rows carry zero family one-hots so they never step, merge, or
    promote.

    Epilogue (r05): the publish boundary that used to run as XLA glue
    after the kernel now runs in-kernel — prune weak/diverged trackers
    against the seeker mean, the reference power and the sidelobe gate
    (``min_power_fraction``; gradient_ascend.cpp:398-408), and with
    ``emit_beam`` the MISO audio beam at the refined listener direction is
    ONE extra f32 stencil + dot against the raw (unfiltered) window —
    removing the per-block steering/weights/beam op chain outside.
    """
    if emit_beam:
        raw_ref, refs = refs[0], refs[1:]
    (out_th, out_ph, out_gt, out_gp, out_rad, out_err,
     out_trk, out_start, out_mean) = refs[:9]
    if emit_beam:
        out_beam = refs[9]
    block_update, miso_beam = _make_swarm_block_update(
        xyz_ref, rate_ref, spread_ref, fam_ref, jt_ref, jp_ref,
        n_iter=n_iter, n_sub=n_sub, refine=refine, span=span, taps=taps,
        theta_limit=theta_limit, inv_divisor=inv_divisor,
        cos_closeness=cos_closeness, error_threshold=error_threshold,
        n_trackers=n_trackers, precision=precision,
        probe_layout=probe_layout, interp=interp, fir_phases=fir_phases,
        min_power_fraction=min_power_fraction, prefix_rows=prefix_rows,
    )
    state8 = (
        th_ref[...], ph_ref[...],
        st0_ref[0], st0_ref[1], st0_ref[2], st0_ref[3],
        trk0_ref[0], trk0_ref[1],
    )
    theta, phi, gt, gp, rad, err, tracking, start, mean = block_update(
        win_ref[...], state8, (tgt_ref[0], tgt_ref[1], tgt_ref[2]),
        bi_ref[0:1, 0:1], ref_ref[0:1, 0:1], 0,
    )
    out_th[...] = theta
    out_ph[...] = phi
    out_gt[...] = gt
    out_gp[...] = gp
    out_rad[...] = rad
    out_err[...] = err
    out_trk[...] = tracking
    out_start[...] = start
    out_mean[...] = mean
    if emit_beam:
        beam = miso_beam(raw_ref[...], theta, phi, fam_ref[2] > 0.5)
        out_beam[...] = jnp.broadcast_to(beam, out_beam.shape)


def _make_swarm_block_update(
    xyz_ref, rate_ref, spread_ref, fam_ref, jt_ref, jp_ref, *,
    n_iter, n_sub, refine, span, taps, theta_limit, inv_divisor,
    cos_closeness, error_threshold, n_trackers, precision, probe_layout,
    interp, fir_phases, min_power_fraction, prefix_rows=0,
):
    """The whole per-block swarm update (iterations + boundaries + publish
    prune) as a reusable in-kernel function — shared verbatim by the
    single-block kernel (``_swarm_kernel``) and the K-block chunked kernel
    (``_swarm_chunk_kernel``).

    ``prefix_rows`` > 0 enables the sub-step prefix optimization: on
    sub-steps j > 0 only trackers (and the MISO row's refine budget) can
    move, so the caller lays rows out as trackers | miso | seekers and the
    kernel runs those sub-steps on ONLY the first ``prefix_rows`` rows —
    the stencil expansion (the kernel's measured VPU floor) shrinks by
    prefix/P for (n_sub-1)/n_sub of the chain.  Rows beyond the prefix
    pass through bit-identically to the masked full-width compute (matmul
    rows are independent).  Requires the iterations to unroll (the refine
    budget and the slicing must be static), so callers pass it only when
    ``n_iter`` is small.

    Returns ``(block_update, miso_beam)``:
      ``block_update(win, state8, tgt3, bi, ref_p, jt_base) -> state9``
          state8 = (theta, phi, gt, gp, rad, err, tracking, start);
          tgt3 = previous published (theta, phi, valid); ``jt_base``
          offsets the jump-table rows (``k * n_iter`` for chunk block k);
          returns the post-publish state plus the mean seeker power.
      ``miso_beam(raw, theta, phi, is_miso) -> [1, Tp2]``
          the audio beam at the refined listener row's direction.
    """
    p = rate_ref.shape[0]
    if prefix_rows >= p:
        prefix_rows = 0
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    is_tracker = fam_ref[0] > 0.5
    is_seeker = fam_ref[1] > 0.5
    is_miso = fam_ref[2] > 0.5
    nt_f = float(n_trackers)
    big_idx = jnp.int32(2**30)
    rate_full = rate_ref[...]
    spread_full = spread_ref[...]

    def pick(oh, v):
        """Scalar [1, 1] extraction of row n via a one-hot reduction."""
        return jnp.sum(jnp.where(oh, v, 0.0), axis=0, keepdims=True)

    def block_update(win, state8, tgt3, bi, ref_p, jt_base):
        substep = _make_substep(
            xyz_ref, win, rate_full, spread_full,
            span=span, taps=taps, theta_limit=theta_limit,
            inv_divisor=inv_divisor, precision=precision,
            probe_layout=probe_layout, interp=interp, fir_phases=fir_phases,
        )
        if prefix_rows:
            substep_p = _make_substep(
                xyz_ref, win,
                rate_full[0:prefix_rows], spread_full[0:prefix_rows],
                span=span, taps=taps, theta_limit=theta_limit,
                inv_divisor=inv_divisor, precision=precision,
                probe_layout=probe_layout, interp=interp,
                fir_phases=fir_phases,
            )
        tgt_th, tgt_ph, tgt_va = tgt3

        def iteration(it, carry):
            theta, phi, gt, gp, rad, err, tracking, start, mean = carry
            trk_b = tracking > 0.5
            state6 = (theta, phi, gt, gp, rad, err)
            static_it = isinstance(it, int)
            for j in range(n_sub):
                # Trackers step while tracking; seekers ride sub-step 0;
                # the miso row while its refine budget (it*n_sub+j) lasts.
                active = is_tracker & trk_b
                if j == 0:
                    active = active | is_seeker
                slot = it * n_sub + j
                if static_it:
                    if slot < refine:
                        active = active | is_miso
                else:
                    active = active | (is_miso & (slot < refine))
                if prefix_rows and static_it and j > 0:
                    # Only prefix rows (trackers | miso) can move here.
                    sub6 = tuple(x[0:prefix_rows] for x in state6)
                    sub6 = substep_p(active[0:prefix_rows], sub6)
                    state6 = tuple(
                        jnp.concatenate([n, f[prefix_rows:]], axis=0)
                        for n, f in zip(sub6, state6)
                    )
                else:
                    state6 = substep(active, state6)
                trk_b = tracking > 0.5  # unchanged inside the chain
            theta, phi, gt, gp, rad, err = state6

            # Pre-merge tracker count gates promotion (tracker.py).
            n_tracking = jnp.sum(jnp.where(trk_b, 1.0, 0.0), axis=0,
                                 keepdims=True)                  # [1, 1]

            # --- merge close trackers (oldest / lowest index survives)
            # and seeker avoidance vs the previous block's published
            # targets — one fori over the tracker slots covers both.
            cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

            def pair_body(nn, acc):
                # f32 0/1 carries: Mosaic cannot carry i1 vectors through
                # an scf loop, so flags ride as floats.
                stop_f, tc_f = acc
                oh = row_idx == nn
                th_n = pick(oh, theta)
                ph_n = pick(oh, phi)
                trk_n = pick(oh, tracking)
                st_n = pick(oh, start)
                cos_ang = cos_t * jnp.cos(th_n) + sin_t * jnp.sin(
                    th_n
                ) * jnp.cos(phi - ph_n)
                close = (
                    (cos_ang > cos_closeness)
                    & trk_b & (trk_n > 0.5) & (row_idx != nn) & is_tracker
                )
                older_n = (start > st_n) | (
                    (start == st_n) & (row_idx > nn)
                )
                # Seeker side: distance to published target nn.
                t_th = pick(oh, tgt_th)
                t_ph = pick(oh, tgt_ph)
                t_va = pick(oh, tgt_va)
                cos_tg = cos_t * jnp.cos(t_th) + sin_t * jnp.sin(
                    t_th
                ) * jnp.cos(phi - t_ph)
                near_t = (cos_tg > cos_closeness) & (t_va > 0.5)
                return (
                    jnp.where(close & older_n, 1.0, stop_f),
                    jnp.where(near_t, 1.0, tc_f),
                )

            stop_f, tc_f = jax.lax.fori_loop(
                0, n_trackers, pair_body,
                (jnp.zeros((p, 1), jnp.float32),
                 jnp.zeros((p, 1), jnp.float32)),
            )
            tracking = jnp.where(stop_f > 0.5, 0.0, tracking)
            too_close = (tc_f > 0.5) & is_seeker

            # --- jump seekers out of capture zones (pre-gen offsets).
            j_theta = jnp.clip(theta + jt_ref[jt_base + it], 0.0,
                               theta_limit)
            j_phi_raw = phi + jp_ref[jt_base + it]
            j_phi = j_phi_raw - jnp.floor(j_phi_raw / _TWO_PI) * _TWO_PI
            theta = jnp.where(too_close, j_theta, theta)
            phi = jnp.where(too_close, j_phi, phi)

            # --- promote the best converged seeker to ALL free trackers.
            valid = is_seeker & ~too_close
            converged = valid & (err < error_threshold)
            pm = jnp.where(converged, rad, -3.0e38)
            maxv = jnp.max(pm, axis=0, keepdims=True)
            is_best = converged & (pm >= maxv)
            idx_best = jnp.min(
                jnp.where(is_best, row_idx, big_idx), axis=0, keepdims=True
            )
            oh_best = row_idx == idx_best
            th_best = pick(oh_best, theta)
            ph_best = pick(oh_best, phi)
            better = jnp.max(
                jnp.where(converged & (rad > 0.0), 1.0, 0.0),
                axis=0, keepdims=True,
            )
            promote = (
                (better > 0.5) & (n_tracking < nt_f)
                & ~(tracking > 0.5) & is_tracker
            )
            theta = jnp.where(promote, th_best, theta)
            phi = jnp.where(promote, ph_best, phi)
            start = jnp.where(promote, bi, start)
            tracking = jnp.where(promote, 1.0, tracking)

            # --- mean valid-seeker power (prune threshold).
            n_valid = jnp.maximum(
                jnp.sum(jnp.where(valid, 1.0, 0.0), axis=0, keepdims=True),
                1.0,
            )
            mean = jnp.sum(
                jnp.where(valid, rad, 0.0), axis=0, keepdims=True
            ) / n_valid
            return theta, phi, gt, gp, rad, err, tracking, start, mean

        carry = state8 + (jnp.zeros((1, 1), jnp.float32),)
        if prefix_rows:
            # Unrolled iterations: the prefix slicing and the miso refine
            # budget need static (it, j).
            for it_s in range(n_iter):
                carry = iteration(it_s, carry)
            (theta, phi, gt, gp, rad, err, tracking, start, mean) = carry
        else:
            (theta, phi, gt, gp, rad, err, tracking, start, mean) = (
                jax.lax.fori_loop(0, n_iter, iteration, carry)
            )

        # --- publish boundary (was XLA glue): prune weak/diverged
        # trackers (gradient_ascend.cpp:398-408) + the sidelobe gate.
        weak = (rad < mean) | (rad < ref_p) | (err > error_threshold)
        tracking = jnp.where(weak, 0.0, tracking)
        if min_power_fraction > 0.0:
            strongest = jnp.max(
                jnp.where(tracking > 0.5, rad, 0.0), axis=0, keepdims=True
            )
            tracking = jnp.where(
                rad >= min_power_fraction * strongest, tracking, 0.0
            )
        return theta, phi, gt, gp, rad, err, tracking, start, mean

    def miso_beam(raw, theta, phi, is_miso_col):
        # MISO audio beam at the refined listener direction
        # (miso.cpp:41-55): center-direction steering (the rotated unit
        # vector IS the steering direction — no inverse trig), one f32
        # stencil row, one dot against the RAW s-major window.
        px = xyz_ref[0:1, :]
        py = xyz_ref[1:2, :]
        pz = xyz_ref[2:3, :]
        c = xyz_ref.shape[1]
        s_k = jax.lax.broadcasted_iota(jnp.int32, (1, span * c), 1) // c
        mask_e = pltpu.repeat(xyz_ref[3:4, :], span, axis=1)
        th_m = pick(is_miso_col, theta)                      # [1, 1]
        ph_m = pick(is_miso_col, phi)
        st_m, ct_m = jnp.sin(th_m), jnp.cos(th_m)
        sp_m, cp_m = jnp.sin(ph_m), jnp.cos(ph_m)
        tau = (st_m * cp_m) * px + (-st_m * sp_m) * py + ct_m * pz  # [1, C]
        tau = jnp.clip(
            tau - jnp.min(tau, axis=1, keepdims=True), 0.0,
            float(span - taps),
        )
        whole = jnp.floor(tau)
        w = _stencil_rows(
            (span - taps) - whole.astype(jnp.int32), tau - whole,
            mask_e, s_k, span, taps, interp, fir_phases,
        )                                                    # [1, span*C]
        return jax.lax.dot_general(
            w, raw,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,             # audio stays f32
        )                                                    # [1, Tp2]

    return block_update, miso_beam


def _swarm_chunk_kernel(
    xyz_ref,      # [4, C]  f32 geometry + channel mask
    win_ref,      # [K, span*C, Tp] compute-dtype bandpass-folded windows
    th_ref,       # [P, 1]  f32 initial theta   (rows: trackers|seekers|miso)
    ph_ref,       # [P, 1]  f32 initial phi
    st0_ref,      # [4, P, 1] f32 initial (grad_t, grad_p, radius, error)
    rate_ref,     # [P, 1]  f32 per-particle step rate
    spread_ref,   # [P, 1]  f32 per-particle probe spread
    fam_ref,      # [3, P, 1] f32 family one-hots (tracker, seeker, miso)
    trk0_ref,     # [2, P, 1] f32 (tracking 0/1, start block) — tracker rows
    tgt_ref,      # [3, P, 1] f32 published targets entering block 0
    jt_ref,       # [K*I, P, 1] f32 seeker jump theta offsets, blocks-major
    jp_ref,       # [K*I, P, 1] f32
    bi_ref,       # [1, 1]  f32 block index of chunk block 0
    ref_ref,      # [K, 1, 1] f32 per-block reference power
    rs_ref,       # [K, 3, P, 1] f32 per-block seeker reset: rows
                  #   (flag broadcast, theta, phi) — flag 0 = no reset
    raw_ref,      # [K, span*C, Tp2] f32 raw windows (MISO beams)
    out_th, out_ph, out_gt, out_gp, out_rad, out_err,   # [K, P, 1] f32
    out_trk, out_start,                                  # [K, P, 1] f32
    out_mean,                                            # [K, 1, 1] f32
    out_beam,                                            # [K, 8, Tp2] f32
    *,
    n_blocks: int,
    n_iter: int,
    n_sub: int,
    refine: int,
    span: int,
    taps: int,
    theta_limit: float,
    inv_divisor: float,
    cos_closeness: float,
    error_threshold: float,
    n_trackers: int,
    precision,
    probe_layout: str,
    interp: str = "linear",
    fir_phases: int = 101,
    min_power_fraction: float = 0.0,
    prefix_rows: int = 0,
):
    """K consecutive blocks' WHOLE swarm updates in ONE ``pallas_call`` —
    the chunked-streaming shape of the fused step.  Particle state never
    leaves VMEM between blocks; per block the kernel applies the seeker
    reset (pre-generated outside), runs the full block update (shared
    ``_make_swarm_block_update`` — identical math to the single-block
    kernel), emits the MISO beam, and carries the published targets into
    the next block's seeker avoidance exactly as the per-block path's
    ``SwarmState.target_*`` does."""
    block_update, miso_beam = _make_swarm_block_update(
        xyz_ref, rate_ref, spread_ref, fam_ref, jt_ref, jp_ref,
        n_iter=n_iter, n_sub=n_sub, refine=refine, span=span, taps=taps,
        theta_limit=theta_limit, inv_divisor=inv_divisor,
        cos_closeness=cos_closeness, error_threshold=error_threshold,
        n_trackers=n_trackers, precision=precision,
        probe_layout=probe_layout, interp=interp, fir_phases=fir_phases,
        min_power_fraction=min_power_fraction, prefix_rows=prefix_rows,
    )
    is_seeker = fam_ref[1] > 0.5
    is_miso = fam_ref[2] > 0.5
    is_tracker = fam_ref[0] > 0.5
    bi0 = bi_ref[0:1, 0:1]

    def body(k, carry):
        (theta, phi, gt, gp, rad, err, tracking, start,
         tgt_th, tgt_ph, tgt_va) = carry
        # Seeker reset (gradient_ascend.cpp:295-299), pre-generated.
        rs = rs_ref[k]                                     # [3, P, 1]
        do_reset = (rs[0] > 0.5) & is_seeker
        theta = jnp.where(do_reset, rs[1], theta)
        phi = jnp.where(do_reset, rs[2], phi)
        bi = bi0 + jnp.float32(1.0) * k
        state9 = block_update(
            win_ref[k],
            (theta, phi, gt, gp, rad, err, tracking, start),
            (tgt_th, tgt_ph, tgt_va),
            bi, ref_ref[k], k * n_iter,
        )
        theta, phi, gt, gp, rad, err, tracking, start, mean = state9
        beam = miso_beam(raw_ref[k], theta, phi, is_miso)
        out_th[k] = theta
        out_ph[k] = phi
        out_gt[k] = gt
        out_gp[k] = gp
        out_rad[k] = rad
        out_err[k] = err
        out_trk[k] = tracking
        out_start[k] = start
        out_mean[k] = mean
        out_beam[k] = jnp.broadcast_to(beam, out_beam.shape[1:])
        # Published targets feed the NEXT block's seeker avoidance
        # (models/tracker.py: SwarmState.target_* = post-publish trackers).
        tgt_th = jnp.where(is_tracker, theta, 0.0)
        tgt_ph = jnp.where(is_tracker, phi, 0.0)
        tgt_va = tracking
        return (theta, phi, gt, gp, rad, err, tracking, start,
                tgt_th, tgt_ph, tgt_va)

    carry = (
        th_ref[...], ph_ref[...],
        st0_ref[0], st0_ref[1], st0_ref[2], st0_ref[3],
        trk0_ref[0], trk0_ref[1],
        tgt_ref[0], tgt_ref[1], tgt_ref[2],
    )
    jax.lax.fori_loop(0, n_blocks, body, carry)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter", "n_sub", "refine", "n_trackers", "span", "taps",
        "theta_limit", "divisor", "closeness", "error_threshold",
        "interpret", "probe_layout", "interp", "fir_phases",
        "min_power_fraction", "prefix_rows",
    ),
)
def swarm_chain_pallas(
    xyz,            # [4, C] from pack_geometry
    window_bp,      # [span*C, Tp] from bandpass_smaj_window (compute dtype)
    theta, phi,     # [P] f32 — rows: trackers | seekers | (miso)
    rates, spreads, # [P] f32
    state0,         # (grad_t, grad_p, radius, error) [P] each
    family,         # [3, P] f32 one-hots (tracker, seeker, miso)
    tracking,       # [P] f32/bool — tracker rows' active flags
    start,          # [P] f32 — tracker rows' start stamps
    targets,        # [3, P] f32 previous published (theta, phi, valid)
    jump_theta,     # [n_iter, P] f32 seeker jump offsets
    jump_phi,       # [n_iter, P] f32
    block_index,    # [] f32/int
    reference,      # [] f32 reference power (the prune floor)
    window_raw=None,  # [span*C, Tp2] f32 raw window -> in-kernel MISO beam
    *,
    n_iter: int,
    n_sub: int,
    refine: int,
    n_trackers: int,
    span: int,
    taps: int = dl.LINEAR_TAPS,
    theta_limit: float,
    divisor: float,
    closeness: float,
    error_threshold: float,
    interpret: bool = False,
    probe_layout: str = "quadrant",
    interp: str = "linear",
    fir_phases: int = 101,
    min_power_fraction: float = 0.0,
    prefix_rows: int = 0,
):
    """Run the whole per-block swarm update (all ``n_iter`` iterations with
    their merge/jump/promote boundaries) AND the publish boundary (prune +
    sidelobe gate) in ONE ``pallas_call``.

    Returns ``(theta, phi, grad_theta, grad_phi, radius, error, tracking,
    start, mean)`` — the post-update combined particle rows plus the
    POST-PRUNE tracker flags and the mean valid-seeker power, matching the
    XLA iteration scan + publish of ``models/tracker.py`` slot for slot.
    With ``window_raw`` the MISO audio beam at the refined listener row's
    final direction is appended: ``(..., mean, beam[Tp2])`` (f32; slice the
    first T columns).
    """
    p = theta.shape[0]
    pad = (-p) % 32
    pp_ = p + pad

    def col(v):
        v = jnp.asarray(v, jnp.float32).reshape(p, 1)
        return jnp.pad(v, ((0, pad), (0, 0)))

    def stack3(vs):
        return jnp.stack([col(v) for v in vs])

    st0 = jnp.stack([col(s) for s in state0])
    jt = jnp.pad(
        jnp.asarray(jump_theta, jnp.float32).reshape(n_iter, p, 1),
        ((0, 0), (0, pad), (0, 0)),
    )
    jp = jnp.pad(
        jnp.asarray(jump_phi, jnp.float32).reshape(n_iter, p, 1),
        ((0, 0), (0, pad), (0, 0)),
    )
    bi = jnp.asarray(block_index, jnp.float32).reshape(1, 1)
    ref = jnp.asarray(reference, jnp.float32).reshape(1, 1)
    emit_beam = window_raw is not None
    precision = (
        jax.lax.Precision.HIGHEST
        if window_bp.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    kern = functools.partial(
        _swarm_kernel,
        n_iter=n_iter,
        n_sub=n_sub,
        refine=refine,
        span=span,
        taps=taps,
        theta_limit=float(theta_limit),
        inv_divisor=1.0 / float(divisor),
        cos_closeness=float(np.cos(closeness)),
        error_threshold=float(error_threshold),
        n_trackers=n_trackers,
        precision=precision,
        probe_layout=probe_layout,
        interp=interp,
        fir_phases=fir_phases,
        min_power_fraction=float(min_power_fraction),
        emit_beam=emit_beam,
        prefix_rows=int(prefix_rows),
    )
    out_sds = [jax.ShapeDtypeStruct((pp_, 1), jnp.float32)] * 8 + [
        jax.ShapeDtypeStruct((1, 1), jnp.float32)
    ]
    extra_in = ()
    if emit_beam:
        out_sds.append(
            jax.ShapeDtypeStruct((8, window_raw.shape[1]), jnp.float32)
        )
        extra_in = (window_raw,)
    k = window_bp.shape[0]
    tp = window_bp.shape[1]
    total_sub = n_iter * n_sub
    outs = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (14 + len(extra_in)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_sds),
        out_shape=out_sds,
        cost_estimate=pl.CostEstimate(
            flops=total_sub * (2 * 4 * pp_ * k * tp + 80 * pp_ * k),
            bytes_accessed=k * tp * window_bp.dtype.itemsize
            + total_sub * 4 * pp_ * k * 4,
            transcendentals=total_sub * 4 * 10 * pp_,
        ),
        # See monopulse_chain_pallas: the FIR stencil needs more scoped
        # VMEM than the 16 MiB default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        xyz, window_bp, col(theta), col(phi), st0,
        col(rates), col(spreads),
        stack3(family), stack3([tracking, start]),
        stack3(targets), jt, jp, bi, ref, *extra_in,
    )
    core = tuple(o[:p, 0] for o in outs[:8]) + (outs[8][0, 0],)
    if emit_beam:
        return core + (outs[9][0],)
    return core


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_blocks", "n_iter", "n_sub", "refine", "n_trackers", "span",
        "taps", "theta_limit", "divisor", "closeness", "error_threshold",
        "interpret", "probe_layout", "interp", "fir_phases",
        "min_power_fraction", "prefix_rows",
    ),
)
def swarm_chunk_pallas(
    xyz,            # [4, C] from pack_geometry
    windows_bp,     # [K, span*C, Tp] bandpass-folded windows (compute dtype)
    windows_raw,    # [K, span*C, Tp2] f32 raw windows (MISO beams)
    theta, phi,     # [P] f32 — rows: trackers | seekers | miso
    rates, spreads, # [P] f32
    state0,         # (grad_t, grad_p, radius, error) [P] each
    family,         # [3, P] f32 one-hots (tracker, seeker, miso)
    tracking,       # [P] f32/bool
    start,          # [P] f32
    targets,        # [3, P] f32 published (theta, phi, valid) entering k=0
    jump_theta,     # [K, n_iter, P] f32 per-block seeker jump offsets
    jump_phi,       # [K, n_iter, P] f32
    reset_flag,     # [K] f32/bool — seeker reset fires before block k
    reset_theta,    # [K, P] f32 reset directions (seeker rows)
    reset_phi,      # [K, P] f32
    block_index0,   # [] f32/int — global index of chunk block 0
    references,     # [K] f32 per-block reference powers
    *,
    n_blocks: int,
    n_iter: int,
    n_sub: int,
    refine: int,
    n_trackers: int,
    span: int,
    taps: int = dl.LINEAR_TAPS,
    theta_limit: float,
    divisor: float,
    closeness: float,
    error_threshold: float,
    interpret: bool = False,
    probe_layout: str = "quadrant",
    interp: str = "linear",
    fir_phases: int = 101,
    min_power_fraction: float = 0.0,
    prefix_rows: int = 0,
):
    """K consecutive blocks' whole swarm updates in ONE ``pallas_call`` —
    the chunked-streaming fused-step shape (``_swarm_chunk_kernel``).

    Returns per-block stacked ``(theta, phi, grad_theta, grad_phi, radius,
    error, tracking, start)`` each [K, P], ``mean`` [K], and the MISO
    audio beams [K, Tp2] — block k's rows identical to running
    :func:`swarm_chain_pallas` k+1 times with the same per-block operands
    (seeker resets applied in-kernel from the pre-generated directions;
    published targets carried block to block in VMEM).
    """
    p = theta.shape[0]
    pad = (-p) % 32
    pp_ = p + pad
    kb = n_blocks

    def col(v):
        v = jnp.asarray(v, jnp.float32).reshape(p, 1)
        return jnp.pad(v, ((0, pad), (0, 0)))

    def stack3(vs):
        return jnp.stack([col(v) for v in vs])

    def blocks_cols(v, lead):
        v = jnp.asarray(v, jnp.float32).reshape(lead, p, 1)
        return jnp.pad(v, ((0, 0), (0, pad), (0, 0)))

    st0 = jnp.stack([col(s) for s in state0])
    jt = blocks_cols(jump_theta, kb * n_iter)
    jp = blocks_cols(jump_phi, kb * n_iter)
    rs = jnp.stack([
        jnp.broadcast_to(
            jnp.asarray(reset_flag, jnp.float32).reshape(kb, 1, 1),
            (kb, pp_, 1),
        ),
        blocks_cols(reset_theta, kb),
        blocks_cols(reset_phi, kb),
    ], axis=1)                                            # [K, 3, P, 1]
    bi = jnp.asarray(block_index0, jnp.float32).reshape(1, 1)
    refs = jnp.asarray(references, jnp.float32).reshape(kb, 1, 1)
    precision = (
        jax.lax.Precision.HIGHEST
        if windows_bp.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    kern = functools.partial(
        _swarm_chunk_kernel,
        n_blocks=kb,
        n_iter=n_iter,
        n_sub=n_sub,
        refine=refine,
        span=span,
        taps=taps,
        theta_limit=float(theta_limit),
        inv_divisor=1.0 / float(divisor),
        cos_closeness=float(np.cos(closeness)),
        error_threshold=float(error_threshold),
        n_trackers=n_trackers,
        precision=precision,
        probe_layout=probe_layout,
        interp=interp,
        fir_phases=fir_phases,
        min_power_fraction=float(min_power_fraction),
        prefix_rows=int(prefix_rows),
    )
    tp2 = windows_raw.shape[-1]
    out_sds = (
        [jax.ShapeDtypeStruct((kb, pp_, 1), jnp.float32)] * 8
        + [jax.ShapeDtypeStruct((kb, 1, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct((kb, 8, tp2), jnp.float32)]
    )
    krows = windows_bp.shape[-2]
    tp = windows_bp.shape[-1]
    total_sub = kb * n_iter * n_sub
    outs = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_sds),
        out_shape=out_sds,
        cost_estimate=pl.CostEstimate(
            flops=total_sub * (2 * 4 * pp_ * krows * tp + 80 * pp_ * krows),
            bytes_accessed=kb * krows * (
                tp * windows_bp.dtype.itemsize + tp2 * 4
            ) + total_sub * 4 * pp_ * krows * 4,
            transcendentals=total_sub * 4 * 10 * pp_,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        xyz, windows_bp, col(theta), col(phi), st0,
        col(rates), col(spreads),
        stack3(family), stack3([tracking, start]),
        stack3(targets), jt, jp, bi, refs, rs, windows_raw,
    )
    per_block = tuple(o[:, :p, 0] for o in outs[:8])       # each [K, P]
    return per_block + (outs[8][:, 0, 0], outs[9][:, 0, :])

"""Fused multi-channel waveform synthesis: one Pallas kernel, any schedule.

The kernel interprets the flat descriptor tensors produced by
:mod:`waveforms_tpu.ops.lowering`: grid = (channel, sample-tile); each
invocation walks its channel's segments (skipping segments that don't
overlap the tile -- the device analog of the oracle's zero-segment skipping),
multiplies out factor stacks with *scalar-dispatched* opcodes (``lax.switch``
on an SMEM scalar emits a real branch, so exactly one basis function is
evaluated per factor), clips, masks by exact integer sample bounds, and
accumulates.  Because descriptors are data, a new pulse schedule never
recompiles -- the kernel cache is keyed only on bucket sizes.

Phase accuracy in f32 (the make-or-break detail at 2 GS/s x 1 ms):
carrier phase is accumulated as **int32 fixed-point turns** (2^32 == one
turn), so ``q32 * sample_delta`` wraps to exactly the right phase modulo
2 pi regardless of magnitude; the sub-quantum residual (< 2^-33 turn/sample)
is added linearly in f32.  Total phase error ~1e-7 rad over 2M samples,
versus ~1e-3 rad for naive f32 accumulation.  The idea follows the
fixed-point time/phase design sketched in the reference's unbuilt C engine
(``/root/reference/src/waveform.h:13-37``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lowering import (DRAG_SIN_NC, DRAG_SINX_MAXQ, N_OPS, OP_COS, OP_COSH,
                       OP_DRAG, OP_DRAG_SIN, OP_DRAG_SINX, OP_ERF, OP_EXP,
                       OP_EXPCHIRP, OP_GAUSSIAN, OP_HYPCHIRP, OP_INTERP,
                       OP_LINEAR, OP_LINEARCHIRP, OP_MOLLIFIER,
                       OP_POLY_GAUSS, OP_SINC, OP_SINH, W_ARGS,
                       LoweredSchedule, UnsupportedFactor, lower_schedule)

__all__ = ['synthesize', 'synthesize_lowered', 'default_rows_per_tile']

_PHASE = np.float32(2 * np.pi / 2**32)   # int32 fixed-point turn -> radians
_INV_TWO_PI = np.float32(1.0 / (2 * np.pi))
_EXP_CLAMP = np.float32(80.0)

# Measured optimum on TPU v5e (device-event sweep, benchmarks/tpu_state.json):
# R=256 runs the flagship schedule 6.7x faster than R=16 -- per-grid-step
# overhead dominates below ~128 KB output tiles.
TUNED_ROWS_PER_TILE = 256

# Sub-block height for the fine-skip walk (see _synth_kernel): inside a
# live (R, 128) tile, segments are re-bisected at this granularity so a
# tile that is 5% occupied evaluates ~5% of its samples instead of 100%.
# The dense grid stays static (pipelined stores) -- this is what makes the
# dense kernel the mid-occupancy (1-20% live) engine; the sparse worklist
# kernel's dynamic grid serializes at ~1 us per step (measured r3/r4) and
# only wins when almost everything is silent.
FINE_ROWS = 32


# Cost gate for compiling the fine-skip program: the prologue bisect +
# 2xGxNF SMEM operands + per-tile branch cost ~0.4 us/tile on v5e, so
# fine only pays when it SAVES at least this many (FINE_ROWS, 128)
# sub-block evaluations per tile on average.  Calibration (on-chip A/Bs,
# benchmarks/tpu_state.json): mid stratum saves 5.5 units/tile and fine
# wins 1.9x (r4_mid_dense_fine 19.4 vs nofine 10.3 GS/s); the flagship
# saves only 0.78 units/tile and fine LOSES 1.76x (r5_dense_fine_ab
# 62.4 nofine vs 35.4 fine); occupancy-1 saves 0 and loses 13%
# (28.6 vs 25.3).  K=2 separates the regimes with margin both ways.
FINE_GATE_UNITS_PER_TILE = 2.0


def fine_would_engage(dev, R, n_rows, tiles_per_bucket=None, row0=0):
    """Host-side cost gate for the fine-skip sub-block walk.

    Replays the kernel prologue's per-sub-block bisect on the host and
    returns True iff the walk saves enough (FINE_ROWS, 128) sub-block
    evaluations per tile to beat the prologue's fixed cost (see
    FINE_GATE_UNITS_PER_TILE).  When False, callers compile with
    ``fine=False``: the NF=1 program is bit-identical on every tile (the
    not-fine branch IS the plain walk) but skips the prologue bisect, the
    2xGxNF SMEM range operands, and the per-tile branch -- measured to
    matter on occupancy-1 schedules (r4_dense_R256 25.3 vs r3 29.4 GS/s,
    VERDICT r4 weak #2) and on the flagship's dense-grid fallback
    (r5_dense_fine_ab: 62.4 vs 35.4 GS/s).
    """
    if not (R > FINE_ROWS and R % FINE_ROWS == 0):
        return False
    # the decision is pure in (descriptors, R, n_rows, G, row0); memoize
    # on the schedule so repeated-shot callers replay the bisect once
    key = (R, int(n_rows), tiles_per_bucket, int(row0))
    cache = getattr(dev, '_fine_gate_cache', None)
    if cache is None:
        cache = dev._fine_gate_cache = {}
    if key in cache:
        return cache[key]
    C, NB, S, T, F = dev.shape
    G = tiles_per_bucket
    if G is None:
        G = max(dev.bucket_samples // (R * 128), 1)
    if NB == 1:
        G = max(n_rows // R, 1)   # the kernel's own G for single-bucket
    NF = R // FINE_ROWS
    if 8 * G * NF > 128 * 1024:   # the compiled range operand's size
        cache[key] = False
        return False
    # replay only the tiles this launch actually runs (the grid is
    # n_rows // R tiles starting at row0): a window of a larger schedule
    # must not dilute per-tile savings with never-launched tiles
    n_launch = max(n_rows // R, 1)
    fine_sz = R * 128 // NF
    bases = (int(row0) + np.arange(n_launch * NF, dtype=np.int64)
             * fine_sz).reshape(n_launch, NF)
    # kernel bucket mapping: tile j reads bucket j // G (row0 != 0 with
    # NB > 1 would misalign buckets in the kernel too -- windows are a
    # single-bucket feature; the clamp mirrors the index map's behavior)
    tile_bucket = (np.minimum(np.arange(n_launch) // G, NB - 1)
                   if NB > 1 else np.zeros(n_launch, np.intp))
    lo = dev.host_seg_lo.reshape(C, NB, S)
    hm = dev.host_seg_hmax.reshape(C, NB, S)
    saved = 0
    for c in range(C):
        for b in range(NB):
            sel = tile_bucket == b
            Gb = int(sel.sum())
            if Gb == 0:
                continue
            bb = bases[sel].reshape(-1)
            s0 = np.searchsorted(hm[c, b], bb, side='right')
            s1 = np.searchsorted(lo[c, b], bb + fine_sz, side='left')
            s0t = s0.reshape(Gb, NF)[:, 0]
            s1t = s1.reshape(Gb, NF)[:, -1]
            wf = np.maximum(s1 - s0, 0).reshape(Gb, NF).sum(-1)
            wc = np.maximum(s1t - s0t, 0) * NF
            saved += int(np.maximum(wc - wf, 0).sum())
    n_tiles = C * n_launch
    res = saved >= FINE_GATE_UNITS_PER_TILE * n_tiles
    cache[key] = res
    return res


def dac_scale_tensor(out_dtype, dac_scale, n_channels):
    """Validated (C, 1, 1, 1) DAC scale for integer output, else None.

    One shared gate for every synthesis entry point: integer output means
    int16 exactly (other widths would silently wrap after the kernel's
    +-32767 clamp), and ``dac_scale`` must be a scalar or length-C vector.
    """
    if not jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer):
        return None
    if jnp.dtype(out_dtype) != jnp.dtype(jnp.int16):
        raise ValueError("integer output supports int16 only")
    scale = jnp.asarray(dac_scale, jnp.float32).reshape(-1)
    if scale.shape[0] == 1:
        scale = jnp.broadcast_to(scale, (n_channels,))
    if scale.shape != (n_channels,):
        raise ValueError(
            f"dac_scale must be scalar or length-{n_channels}")
    return scale.reshape(n_channels, 1, 1, 1)


def validate_out_mode(out_dtype, amp_im, n_channels, dac_scale):
    """One shared output-mode gate for every synthesis entry point.

    Returns the (C, 1, 1, 1) DAC scale tensor for int16 output, None for
    float outputs; raises on unsupported dtype / pair-mode combinations.
    """
    scale = dac_scale_tensor(out_dtype, dac_scale, n_channels)
    if amp_im is not None and (scale is not None or jnp.dtype(out_dtype)
                               != jnp.dtype(jnp.float32)):
        # normalized comparison: 'float32'/np.float32 spellings are f32
        raise ValueError("pair-mode (complex) synthesis requires f32 output")
    if scale is None and jnp.dtype(out_dtype) not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
            jnp.dtype(jnp.float16)):
        raise ValueError(f"out_dtype must be a float type, got {out_dtype}")
    return scale


def default_rows_per_tile(n_samples, bucket_samples=0, n_buckets=1,
                          divides=0):
    """Largest power-of-two tile height <= the tuned optimum that satisfies
    the layout constraints: divides the descriptor bucket (multi-bucket
    schedules), divides an enclosing chunk (streaming), and doesn't pad a
    tiny schedule past ~2x its sample count."""
    R = TUNED_ROWS_PER_TILE
    while R > 8:
        tile = R * 128
        if ((n_buckets <= 1 or bucket_samples % tile == 0)
                and (not divides or divides % R == 0)
                and 2 * n_samples >= tile):
            return R
        R //= 2
    return 8


def _carrier_parts(di, q32, cq32, eps, ceps):
    """Exact-mod-2pi carrier phase as (int32 turns, small f32 residual).

    ``q32`` is the per-sample increment and ``cq32`` the constant phase,
    both in int32 fixed-point turns (2^32 == one turn) -- integer
    multiply-accumulate wraps to the exact phase modulo 2 pi.  The
    residual (sub-quantum increment ``eps`` times the sample delta, plus
    the constant's split remainder) stays below ~2e-3 rad.
    """
    turns = q32 * di + cq32
    return turns, eps * di.astype(jnp.float32) + ceps


def _quadratic_parts(di, q_hh, q_hl, q_ll, q_lin, e_hh, e_hl, e_ll, e_lin):
    """Exact-mod-2pi quadratic phase (chirps) as (turns, residual).

    int32 arithmetic is a ring mod 2^32, so integer multiply-accumulate
    wraps to the exact phase; but the f32 *residual* of A*di^2 would reach
    thousands of radians at di ~ 2^21.  Splitting di = dh*2^11 + dl keeps
    every residual operand below 2^22 (f32-exact) and every residual term
    below ~3e-3 rad:

        A*di^2 = (A*2^22)*dh^2 + (A*2^12)*(dh*dl) + A*dl^2
    """
    dh = di >> 11
    dl = di - (dh << 11)           # in [0, 2048)
    turns = q_hh * dh * dh + q_hl * dh * dl + q_ll * dl * dl + q_lin * di
    dhf = dh.astype(jnp.float32)
    dlf = dl.astype(jnp.float32)
    dif = di.astype(jnp.float32)
    resid = ((e_hh * dhf + e_hl * dlf) * dhf + e_ll * dlf * dlf
             + e_lin * dif)
    return turns, resid


def _const_phase_turns(phi):
    """Scalar f32 radians -> (int32 turns, f32 residual), for consts whose
    q32 slots are already spoken for (chirps).  Error ~2e-7 rad -- below
    the chirp residual budget (~3e-3 rad)."""
    c = phi * _INV_TWO_PI
    ci = jnp.round((c - jnp.round(c)) * np.float32(2**31)).astype(jnp.int32)
    turns = ci * 2
    # turns*PHASE lands in [-pi, pi) while phi may be in [0, 2pi): wrap the
    # residual back to a small value (it must stay << pi/4 for the poly)
    resid = phi - turns.astype(jnp.float32) * _PHASE
    return turns, resid - np.float32(2 * np.pi) * jnp.round(
        resid * _INV_TWO_PI)


def _sincos_turns(turns, resid, need_sin=True, need_cos=True):
    """(sin, cos) of ``turns * 2pi/2^32 + resid``.

    The int32 turns give an EXACT range reduction for free: the top two
    bits (after rounding to the nearest quarter turn) select the quadrant
    and the low 30 bits map to [-pi/4, pi/4), where short Taylor
    polynomials reach < 1e-9 truncation error (f32 arithmetic ~1e-7
    dominates).  Replaces two jnp.sin/cos calls -- whose internal
    range-reduction work the turns representation makes redundant -- at
    roughly a third of the VPU cost (measured: dense carrier schedules
    5.2 -> ~3 ns/sample/ch).  |resid| must be << pi/4; lowering bounds it
    at ~1e-2 rad.
    """
    q = turns + np.int32(1 << 29)           # round to nearest quarter turn
    quad = (q >> 30) & 3                    # top two bits: quadrant 0..3
    r = (q & np.int32(0x3FFFFFFF)) - np.int32(1 << 29)
    x = r.astype(jnp.float32) * _PHASE + resid
    x2 = x * x
    cosx = 1.0 + x2 * (np.float32(-1 / 2) + x2 * (
        np.float32(1 / 24) + x2 * (np.float32(-1 / 720) + x2 * (
            np.float32(1 / 40320) + x2 * np.float32(-1 / 3628800)))))
    sinx = x * (1.0 + x2 * (np.float32(-1 / 6) + x2 * (
        np.float32(1 / 120) + x2 * (np.float32(-1 / 5040)
                                    + x2 * np.float32(1 / 362880)))))
    swap = (quad & 1) == 1
    sin = cos = None
    if need_cos:
        csign = jnp.where((quad == 1) | (quad == 2),
                          np.float32(-1.0), np.float32(1.0))
        cos = jnp.where(swap, sinx, cosx) * csign
    if need_sin:
        ssign = jnp.where(quad >= 2, np.float32(-1.0), np.float32(1.0))
        sin = jnp.where(swap, cosx, sinx) * ssign
    return sin, cos


def op_builders(di, arg, q32, eread):
    """The basis-function formulas, written once for every engine.

    Returns ``{opcode: zero-arg builder}``.  ``di`` is the int32 sample
    delta (idx - shift_hi); ``arg(k)``/``q32(j)``/``eread(k)`` read the
    factor's descriptor slots -- SMEM scalars inside the Pallas kernels,
    per-instance (M, 1) arrays in the batched pulse-instance evaluator
    (:mod:`waveforms_tpu.ops.stack_synth`).  Broadcasting makes the same
    expressions correct in both, so cross-engine equality is structural.
    """
    dif = di.astype(jnp.float32)

    def u():  # shift-corrected sample delta
        return dif - arg(0)

    def op_linear():
        return arg(1) * u()

    def op_gaussian():
        x = arg(1) * u()
        return jnp.exp(-(x * x))

    def op_erf():
        # Mosaic has no erf primitive; Abramowitz-Stegun 7.1.26
        # rational approximation (max abs error 1.5e-7 ~ f32 noise).
        x = arg(1) * u()
        sign = jnp.sign(x)
        ax = jnp.abs(x)
        t = 1.0 / (1.0 + np.float32(0.3275911) * ax)
        poly = t * (np.float32(0.254829592) + t *
                    (np.float32(-0.284496736) + t *
                     (np.float32(1.421413741) + t *
                      (np.float32(-1.453152027) + t *
                       np.float32(1.061405429)))))
        return sign * (1.0 - poly * jnp.exp(-(ax * ax)))

    def op_cos():
        turns, resid = _carrier_parts(di, q32(0), q32(1), arg(2), arg(3))
        return _sincos_turns(turns, resid, need_sin=False)[1]

    def op_sinc():
        x = arg(1) * u()
        px = np.float32(np.pi) * x
        small = jnp.abs(px) < 1e-6
        safe = jnp.where(small, 1.0, px)
        return jnp.where(small, 1.0, jnp.sin(safe) / safe)

    def op_exp():
        x = jnp.clip(arg(1) * u(), -_EXP_CLAMP, _EXP_CLAMP)
        return jnp.exp(x)

    def op_linearchirp():
        turns, resid = _quadratic_parts(
            di, q32(0), q32(1), q32(2), q32(3),
            arg(2), arg(3), arg(4), arg(5))
        # q32 slots are all taken by the quadratic split; the constant
        # phase converts to turns from its (scalar) f32 arg instead
        cturns, ceps = _const_phase_turns(arg(6))
        return _sincos_turns(turns + cturns, resid + ceps,
                             need_cos=False)[0]

    def op_expchirp():
        x = jnp.clip(arg(2) * u(), -_EXP_CLAMP, _EXP_CLAMP)
        return jnp.sin(arg(3) + arg(1) * jnp.exp(x))

    def op_hypchirp():
        x = jnp.maximum(1.0 + arg(2) * u(), 1e-30)
        return jnp.sin(arg(3) + arg(1) * jnp.log(x))

    def op_cosh():
        # Mosaic has no cosh/sinh primitive; use the exp form.
        x = jnp.clip(arg(1) * u(), -_EXP_CLAMP, _EXP_CLAMP)
        e = jnp.exp(x)
        return 0.5 * (e + 1.0 / e)

    def op_sinh():
        x = jnp.clip(arg(1) * u(), -_EXP_CLAMP, _EXP_CLAMP)
        e = jnp.exp(x)
        return 0.5 * (e - 1.0 / e)

    def op_drag():
        x = arg(1) * u()                      # o * (t - t0')
        s = jnp.sin(x)
        env_x = s * s
        # one range reduction yields BOTH carrier quadratures
        turns, resid = _carrier_parts(di, q32(0), q32(1), arg(3), arg(4))
        sin_t, cos_t = _sincos_turns(turns, resid)
        b = arg(5)
        env_y = b * jnp.sin(2.0 * x)
        return env_x * cos_t + env_y * sin_t

    def _polyval_asc(x, first, count):
        # coefficients stored ascending at args[first:first+count]
        acc = jnp.zeros_like(x)
        for k in range(count - 1, -1, -1):
            acc = acc * x + arg(first + k)
        return acc

    def op_poly_gauss():
        x = arg(1) * u()
        return arg(2) * _polyval_asc(x, 3, 9) * jnp.exp(-(x * x))

    def _drag_sin_like(with_blend):
        # fixed-layout ext block (see lowering._lower_factor), read via the
        # engine-provided eread accessor
        o_dt = arg(1)
        uu = u()
        left_hi = arg(5) * 0.5
        right_lo = left_hi + arg(6)
        rise = uu <= left_hi
        flat = jnp.logical_not(rise) & (uu < right_lo)
        bt = jnp.where(rise, uu, uu - arg(6))
        s = jnp.sin(o_dt * bt)
        c = jnp.cos(o_dt * bt)

        ox = jnp.zeros_like(uu)
        oy = jnp.zeros_like(uu)
        sp = jnp.ones_like(uu)
        for p in range(DRAG_SIN_NC):          # padded coeffs: zeros no-op
            basis = sp * c if p % 2 else sp
            ox = ox + eread(1 + p) * basis
            oy = oy + eread(1 + DRAG_SIN_NC + p) * basis
            sp = sp * s
        ox = jnp.where(flat, eread(1 + 2 * DRAG_SIN_NC), ox)
        oy = jnp.where(flat, eread(2 + 2 * DRAG_SIN_NC), oy)

        if with_blend:
            b0 = 3 + 2 * DRAG_SIN_NC
            bh = eread(b0)

            def horner(base, x):
                # descending Horner over zero-padded ascending storage:
                # never forms large powers of x (x is in samples)
                acc = jnp.zeros_like(x)
                for k in range(DRAG_SINX_MAXQ - 1, -1, -1):
                    acc = acc * x + eread(base + k)
                return acc

            stride = 1 + DRAG_SINX_MAXQ
            dl_ = uu - left_hi
            dr_ = uu - right_lo
            in_l = (uu >= left_hi - bh) & (uu <= left_hi)
            in_r = (uu >= right_lo) & (uu <= right_lo + bh)
            ox = jnp.where(in_l, horner(b0 + 2, dl_), ox)
            oy = jnp.where(in_l, horner(b0 + 2 + stride, dl_), oy)
            ox = jnp.where(in_r, horner(b0 + 2 + 2 * stride, dr_), ox)
            oy = jnp.where(in_r, horner(b0 + 2 + 3 * stride, dr_), oy)

        turns, resid = _carrier_parts(di, q32(0), q32(1), arg(3), arg(4))
        sin_t, cos_t = _sincos_turns(turns, resid)
        return ox * cos_t + oy * sin_t

    def op_drag_sin():
        return _drag_sin_like(False)

    def op_drag_sinx():
        return _drag_sin_like(True)

    def op_mollifier():
        x = arg(1) * u()
        xx1 = x * x - 1.0
        inside = xx1 < 0
        safe = jnp.where(inside, xx1, -1.0)
        bump = jnp.exp(1.0 / safe + 1.0)
        d = arg(2)
        denom = jnp.where(inside, (-safe) ** (2.0 * d), 1.0)
        poly = jnp.where(d > 0, _polyval_asc(x, 3, 9), 1.0)
        return jnp.where(inside, bump / denom * poly, 0.0)

    return {
        OP_LINEAR: op_linear,
        OP_GAUSSIAN: op_gaussian,
        OP_ERF: op_erf,
        OP_COS: op_cos,
        OP_SINC: op_sinc,
        OP_EXP: op_exp,
        OP_LINEARCHIRP: op_linearchirp,
        OP_EXPCHIRP: op_expchirp,
        OP_HYPCHIRP: op_hypchirp,
        OP_COSH: op_cosh,
        OP_SINH: op_sinh,
        OP_DRAG: op_drag,
        OP_POLY_GAUSS: op_poly_gauss,
        OP_MOLLIFIER: op_mollifier,
        OP_INTERP: op_linear,   # reserved: never emitted
        OP_DRAG_SIN: op_drag_sin,
        OP_DRAG_SINX: op_drag_sinx,
    }


def _tile_walker(idx, base, tile, R, seg_lo_ref, seg_hi_ref, nterm_ref,
                 nfac_ref, amp_ref, op_ref, pw_ref, sh_ref, q32_ref,
                 args_ref, ext_ref, clip_ref, amp2_ref, *, T, F,
                 ops_present, pair):
    """Per-tile segment evaluator shared by the dense-grid and sparse
    (worklist) kernels: returns ``(segment_at, acc0)`` where
    ``segment_at(s, acc)`` accumulates segment *s* of this tile.

    ``idx`` is the (R, 128) global sample-index tile starting at ``base``;
    descriptor refs are the one-channel/one-bucket SMEM blocks.  In pair
    mode ``acc`` is a (re, im) tuple scaled by the two amplitude planes.
    """

    def factor_value(flat_idx):
        """Evaluate one factor's opcode over the whole tile."""
        op = op_ref[0, 0, 0, flat_idx]
        di = idx - sh_ref[0, 0, 0, flat_idx]
        aoff = flat_idx * W_ARGS

        def arg(k):
            return args_ref[0, 0, 0, aoff + k]

        def q32(j):
            return q32_ref[0, 0, 0, 4 * flat_idx + j]

        def eread(k):
            return ext_ref[0, 0, 0, arg(7).astype(jnp.int32) + k]

        builders = op_builders(di, arg, q32, eread)
        # only the opcodes this schedule actually uses compile into the
        # switch (descriptor op values are compact indices into
        # ops_present); one-op schedules branch not at all
        branches = [builders[o] for o in ops_present]
        if len(branches) == 1:
            val = branches[0]()
        else:
            val = jax.lax.switch(op, branches)

        p = pw_ref[0, 0, 0, flat_idx]

        def raise_power(v):
            ap = jnp.abs(p)
            out = jax.lax.fori_loop(1, ap, lambda i, acc: acc * v, v)
            return jnp.where(p < 0, 1.0 / out, out)

        return jax.lax.cond(p == 1, lambda v: v, raise_power, val)

    zeros = jnp.zeros((R, 128), jnp.float32)
    cmin = clip_ref[0, 0, 0, 0]
    cmax = clip_ref[0, 0, 0, 1]

    def clip(v):
        return jnp.minimum(jnp.maximum(v, cmin), cmax)

    def segment_at(s, acc):
        lo = seg_lo_ref[0, 0, 0, s]
        hi = seg_hi_ref[0, 0, 0, s]
        nt = nterm_ref[0, 0, 0, s]

        def add_segment(acc):
            def term_body(t, seg):
                flat_t = s * T + t
                if pair:
                    prod = jnp.full((R, 128), 1.0, dtype=jnp.float32)
                else:
                    prod = jnp.full((R, 128), amp_ref[0, 0, 0, flat_t],
                                    dtype=jnp.float32)

                def fac_body(f, prod):
                    return prod * factor_value(flat_t * F + f)

                prod = jax.lax.fori_loop(0, nfac_ref[0, 0, 0, flat_t], fac_body,
                                         prod)
                if pair:
                    return (seg[0] + amp_ref[0, 0, 0, flat_t] * prod,
                            seg[1] + amp2_ref[0, 0, 0, flat_t] * prod)
                return seg + prod

            if pair:
                sr, si = jax.lax.fori_loop(0, nt, term_body, (zeros, zeros))
            else:
                seg = jax.lax.fori_loop(0, nt, term_body, zeros)

            # occupancy-1 fast path: a segment covering the whole tile
            # with open clip rails needs no mask/clip -- saves ~4 vector
            # ops per sample, which is material when the factor math
            # itself is only ~10 (scalar branch, so silent cost is nil)
            covers = ((lo <= base) & (hi >= base + tile)
                      & (cmin == -jnp.inf) & (cmax == jnp.inf))

            def plain(a):
                if pair:
                    return (a[0] + sr, a[1] + si)
                return a + seg

            def masked(a):
                mask = (idx >= lo) & (idx < hi)
                if pair:
                    return (a[0] + jnp.where(mask, clip(sr), 0.0),
                            a[1] + jnp.where(mask, clip(si), 0.0))
                return a + jnp.where(mask, clip(seg), 0.0)

            return jax.lax.cond(covers, plain, masked, acc)

        overlap = (hi > base) & (lo < base + tile) & (nt > 0)
        return jax.lax.cond(overlap, add_segment, lambda a: a, acc)

    acc0 = (zeros, zeros) if pair else zeros
    return segment_at, acc0


def _synth_kernel(row0_ref, seg_lo_ref, seg_hi_ref, s0_ref, s1_ref,
                  *rest, S, T, F, R, G, NF,
                  ops_present, pair=False, dac=False):
    # the fine-walk operand triple (s0f, s1f, fine flag) is shipped only
    # when the fine program compiles (NF > 1): at NF == 1 they would
    # duplicate s0/s1, and each dynamically index-mapped SMEM operand
    # costs ~30 ns of step machinery (r4_grid_overhead_probe) -- on a
    # 4096-step occupancy-1 launch the three dead operands were the
    # r4->r5 dense `value` drift (29.4 -> 28.6 GS/s)
    if NF > 1:
        s0f_ref, s1f_ref, fine_ref = rest[:3]
        rest = rest[3:]
    else:
        s0f_ref = s1f_ref = fine_ref = None
    (nterm_ref, nfac_ref, amp_ref, op_ref, pw_ref, sh_ref, q32_ref,
     args_ref, ext_ref, clip_ref) = rest[:10]
    rest = rest[10:]
    # pair mode fuses a complex synthesis into one pass: the factor
    # product (all the transcendental work) is computed once per term and
    # scaled by two amplitude planes into two output planes.
    scale_ref = amp2_ref = None
    if pair:
        amp2_ref, out_ref, out2_ref = rest
    elif dac:
        # int16 DAC codes: accumulate f32, store round(acc * scale)
        scale_ref, out_ref = rest
    else:
        (out_ref,) = rest
    tile = R * 128
    # row0 is this shard's global sample offset (time-axis sharding over a
    # device mesh: each shard synthesizes its slice of the sample axis).
    base = row0_ref[0, 0, 0, 0] + pl.program_id(1) * tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    idx = base + rows * 128 + cols

    walker_args = (seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref,
                   amp_ref, op_ref, pw_ref, sh_ref, q32_ref, args_ref,
                   ext_ref, clip_ref, amp2_ref)
    walker_kw = dict(T=T, F=F, ops_present=ops_present, pair=pair)

    # The host-side prologue in _run_kernel precomputes, per tile, the
    # index range [s0, s1) of segments that can overlap it (each bucket's
    # segment list is sorted by lo with 2^31-1 sentinels in the padding;
    # s0/s1 come from searchsorted over the running-max-of-hi and lo).
    # Silent tiles therefore cost two scalar reads and the store; live
    # tiles walk exactly their overlapping segments.
    g = pl.program_id(1) % G
    s0 = s0_ref[0, 0, 0, g]
    s1 = s1_ref[0, 0, 0, g]

    def store(acc, row0, nrows):
        """Write an (nrows, 128) accumulator into the output block at a
        (dynamic, sublane-aligned) row offset.  The store may narrow
        (bf16/int16 halve the write bandwidth and buffer footprint);
        accumulation stays f32."""
        sl = pl.ds(row0, nrows)
        if pair:
            out_ref[0, sl, :] = acc[0].astype(out_ref.dtype)
            out2_ref[0, sl, :] = acc[1].astype(out2_ref.dtype)
        elif dac:
            # exact DAC codes: round-half-even, clamp to the code range
            code = jnp.round(acc * scale_ref[0, 0, 0, 0])
            out_ref[0, sl, :] = jnp.clip(code, -32768.0,
                                         32767.0).astype(out_ref.dtype)
        else:
            out_ref[0, sl, :] = acc.astype(out_ref.dtype)

    def full_walk():
        segment_at, acc0 = _tile_walker(idx, base, tile, R, *walker_args,
                                        **walker_kw)
        store(jax.lax.fori_loop(s0, s1, segment_at, acc0), 0, R)

    if NF <= 1:
        full_walk()
    else:
        # Fine-skip walk: the prologue also bisected every (R/NF)-row
        # sub-block; when the summed fine work is smaller than walking
        # the whole tile (a tile that is live only in a few strips), the
        # kernel walks sub-blocks instead, and strips with an empty
        # [s0f, s1f) cost one zero-trip loop.  The choice is a host
        # decision per tile (fine_ref), so occupancy-1 schedules keep the
        # single-walk fast path bit-for-bit.  Each sub-block stores
        # straight into its rows of the output block (Mosaic has no
        # value-level dynamic_update_slice; ref stores at dynamic
        # sublane-aligned offsets are the supported form).
        Rf = R // NF
        fine = fine_ref[0, 0, 0, g] != 0

        @pl.when(fine)
        def _():
            rows_f = jax.lax.broadcasted_iota(jnp.int32, (Rf, 128), 0)
            cols_f = jax.lax.broadcasted_iota(jnp.int32, (Rf, 128), 1)

            def sub(j, carry):
                sub_base = base + j * (Rf * 128)
                idx_f = sub_base + rows_f * 128 + cols_f
                seg_at, a0 = _tile_walker(idx_f, sub_base, Rf * 128, Rf,
                                          *walker_args, **walker_kw)
                a = jax.lax.fori_loop(s0f_ref[0, 0, 0, g * NF + j],
                                      s1f_ref[0, 0, 0, g * NF + j],
                                      seg_at, a0)
                store(a, j * Rf, Rf)
                return carry

            jax.lax.fori_loop(0, NF, sub, 0)

        @pl.when(jnp.logical_not(fine))
        def _():
            full_walk()


@functools.partial(jax.jit,
                   static_argnames=('S', 'T', 'F', 'R', 'n_rows',
                                    'tiles_per_bucket', 'ops_present',
                                    'interpret', 'dimsem', 'out_dtype',
                                    'fine'))
def _run_kernel(row0, seg_lo, seg_hi, seg_hmax, nterm, nfac, amp, op, pw,
                sh, q32, args, ext, clip, amp_im=None, scale=None, *, S, T,
                F, R, n_rows, tiles_per_bucket,
                ops_present=tuple(range(N_OPS)),
                interpret=False, dimsem=None, out_dtype=jnp.float32,
                fine=True):
    C = seg_lo.shape[0]
    E = ext.shape[-1]
    grid = (C, n_rows // R)
    G = tiles_per_bucket
    pair = amp_im is not None
    dac = jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer)
    if dac and scale is None:
        raise ValueError("integer out_dtype requires a per-channel scale")

    # Prologue (plain XLA, runs once per dispatch): per-tile segment index
    # ranges.  Tile (b, g) covers samples [row0 + (b*G+g)*tile, ... + tile);
    # its overlapping segments are exactly [s0, s1) in the bucket's
    # lo-sorted list, with s0 from the running-max-of-hi (ascending under
    # overlap) and s1 from lo itself.  The kernel then does no searching.
    NB = seg_lo.shape[1]
    # the static S parameter must agree with the descriptor layout -- a
    # silent reassignment here masked caller reshape bugs while still
    # fragmenting the jit cache on the dead value
    assert seg_lo.shape[-1] == S, (
        f"S={S} but seg_lo trailing axis is {seg_lo.shape[-1]}")
    if NB == 1:
        # single bucket: G only partitions the tile->bucket index maps, so
        # any G >= the tile count is valid -- callers may pass a
        # bucket_samples-derived G smaller than the launch's tile count
        G = max(n_rows // R, 1)
    tile_sz = R * 128
    # fine-skip granularity: bisect at FINE_ROWS-row sub-blocks too, so
    # live tiles with silent strips walk only their live strips.  The fine
    # range arrays ride SMEM (2 x G x NF i32 per grid step); cap their
    # footprint so monster single-bucket launches never crowd the
    # descriptor block out of scalar memory (lowering.PALLAS_SMEM_BUDGET).
    # NF must DIVIDE R: a non-multiple R would make the prologue's
    # fine_sz disagree with the kernel's Rf*128 sub-block (wrong segment
    # windows + unwritten tail rows) and break sublane alignment
    NF = (R // FINE_ROWS
          if (fine and R > FINE_ROWS and R % FINE_ROWS == 0) else 1)
    if 8 * G * NF > 128 * 1024:
        NF = 1
    fine_sz = tile_sz // NF
    bases = (row0.reshape(()) + jnp.arange(NB * G * NF, dtype=jnp.int32)
             * fine_sz).reshape(NB, G * NF)

    def ranges(hmax_row, lo_row, base_row):
        s0 = jnp.searchsorted(hmax_row, base_row, side='right')
        s1 = jnp.searchsorted(lo_row, base_row + fine_sz, side='left')
        return s0.astype(jnp.int32), s1.astype(jnp.int32)

    per_bucket = jax.vmap(ranges, in_axes=(0, 0, 0))
    s0f, s1f = jax.vmap(per_bucket, in_axes=(0, 0, None))(
        seg_hmax.reshape(C, NB, S), seg_lo.reshape(C, NB, S), bases)
    # the coarse tile range is the hull of its sub-block ranges (the fine
    # bisect at the tile's first/last sub-block boundary IS the coarse one)
    s0t = s0f.reshape(C, NB, G, NF)[..., 0]
    s1t = s1f.reshape(C, NB, G, NF)[..., NF - 1]
    # host decision per tile: fine pays off when the summed sub-block walk
    # touches fewer samples than one full-tile walk (strict <: ties keep
    # the full walk, so occupancy-1 tiles are untouched)
    work_f = jnp.maximum(s1f - s0f, 0).reshape(C, NB, G, NF).sum(-1)
    work_c = jnp.maximum(s1t - s0t, 0) * NF
    finet = (work_f < work_c).astype(jnp.int32).reshape(C, NB, 1, G)
    s0f = s0f.reshape(C, NB, 1, G * NF)
    s1f = s1f.reshape(C, NB, 1, G * NF)
    s0t = s0t.reshape(C, NB, 1, G)
    s1t = s1t.reshape(C, NB, 1, G)
    # ship the fine triple only when the fine program compiles (NF > 1);
    # see the matching unpack in _synth_kernel
    fine_ops = [s0f, s1f, finet] if NF > 1 else []

    def smem(k, bcast=False):
        # (C, NB, 1, k) arrays with (1, 1, 1, k) blocks: the trailing two
        # block dims equal the array dims (Mosaic's constraint applies only
        # to the last two), while the index map slices one channel's
        # descriptors *for the bucket containing this tile* into SMEM.
        if bcast:
            return pl.BlockSpec((1, 1, 1, k), lambda c, j: (0, 0, 0, 0),
                                memory_space=pltpu.SMEM)
        return pl.BlockSpec((1, 1, 1, k), lambda c, j: (c, j // G, 0, 0),
                            memory_space=pltpu.SMEM)

    kernel = functools.partial(_synth_kernel, S=S, T=T, F=F, R=R, G=G,
                               NF=NF, ops_present=ops_present, pair=pair,
                               dac=dac)
    out_spec = pl.BlockSpec((1, R, 128), lambda c, j: (c, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, n_rows, 128), out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem(1, bcast=True),                         # row0 (shard offset)
            smem(S), smem(S),                            # seg_lo, seg_hi
            smem(G), smem(G),                            # per-tile s0, s1
        ] + ([smem(G * NF), smem(G * NF), smem(G)]       # fine s0, s1, flag
             if NF > 1 else []) + [
            smem(S),                                     # nterm
            smem(S * T), smem(S * T),                    # nfac, amp
            smem(S * T * F), smem(S * T * F),            # op, power
            smem(S * T * F), smem(S * T * F * 4),        # shift_hi, q32
            smem(S * T * F * W_ARGS),                    # args
            smem(E, bcast=True),                         # ext side-buffer
            pl.BlockSpec((1, 1, 1, 2), lambda c, j: (c, 0, 0, 0),
                         memory_space=pltpu.SMEM),       # clip (per channel)
        ] + ([smem(S * T)] if pair else [])              # amp_im (pair mode)
        + ([pl.BlockSpec((1, 1, 1, 1), lambda c, j: (c, 0, 0, 0),
                         memory_space=pltpu.SMEM)]
           if dac else []),                              # DAC scale
        out_specs=(out_spec, out_spec) if pair else out_spec,
        out_shape=(out_shape, out_shape) if pair else out_shape,
        interpret=interpret,
        # opt-in Mosaic scheduling hint, e.g. ('parallel', 'arbitrary'):
        # every grid step writes a disjoint output tile, so both dims are
        # semantically parallel (tuning knob, see tools/tune.py)
        **({'compiler_params': pltpu.CompilerParams(
            dimension_semantics=dimsem)} if dimsem is not None else {}),
    )(row0, seg_lo, seg_hi, s0t, s1t, *fine_ops, nterm, nfac, amp,
      op, pw, sh, q32, args, ext, clip, *([amp_im] if pair else []),
      *([scale] if dac else []))


class DeviceSchedule:
    """Descriptor tensors resident on device, ready for repeated synthesis.

    Lower once, ``to_device`` once, synthesize many times -- descriptor
    upload (which can dwarf kernel time for big schedules on slow host
    links) is paid a single time, exactly like an AWG's waveform-memory
    upload in the reference's lab usage model.
    """

    def __init__(self, low: LoweredSchedule):
        if not low.pallas_ok:
            raise UnsupportedFactor(
                "schedule exceeds the Pallas kernel's limits (exotic "
                f"opcode, ext buffer, or descriptor block {low.shape} over "
                "the SMEM budget -- e.g. a many-knot interp table in one "
                "bucket; try smaller bucket_samples); use the native or "
                "XLA engine")
        C, NB, S, T, F = low.shape
        self.shape = low.shape
        self.n_samples = low.n_samples
        self.bucket_samples = low.bucket_samples
        clip = np.stack([low.clip_min, low.clip_max], axis=1)
        # ext pads to a multiple of 256 so similar schedules share kernels
        n_ext = max(int(low.ext.size) if low.ext is not None else 0, 1)
        e_pad = -(-n_ext // 256) * 256
        ext = np.zeros(e_pad, np.float32)
        if low.ext is not None and low.ext.size:
            ext[:low.ext.size] = low.ext
        self.ext = jnp.asarray(ext.reshape(1, 1, 1, e_pad))
        # compact opcode renumbering: only the branches a schedule uses
        # compile into the kernel's switch
        present = np.unique(low.op)
        self.ops_present = tuple(int(o) for o in present)
        remap = np.zeros(N_OPS, np.int32)
        for i, o in enumerate(self.ops_present):
            remap[o] = i
        op_compact = remap[low.op]
        # running max of hi per bucket list: the kernel's bisect key stays
        # ascending even when stack channels emit overlapping segments
        hmax = np.maximum.accumulate(low.seg_hi, axis=-1)
        # host copies of the bisect keys: fine_would_engage() replays the
        # kernel prologue's fine/full decision without a device round-trip
        self.host_seg_lo = np.ascontiguousarray(low.seg_lo)
        self.host_seg_hmax = np.ascontiguousarray(hmax)
        self.tensors = (
            jnp.asarray(low.seg_lo.reshape(C, NB, 1, S)),
            jnp.asarray(low.seg_hi.reshape(C, NB, 1, S)),
            jnp.asarray(hmax.reshape(C, NB, 1, S)),
            jnp.asarray(low.nterm.reshape(C, NB, 1, S)),
            jnp.asarray(low.nfac.reshape(C, NB, 1, S * T)),
            jnp.asarray(low.amp.reshape(C, NB, 1, S * T)),
            jnp.asarray(op_compact.reshape(C, NB, 1, S * T * F)),
            jnp.asarray(low.power.reshape(C, NB, 1, S * T * F)),
            jnp.asarray(low.shift_hi.reshape(C, NB, 1, S * T * F)),
            jnp.asarray(low.q32.reshape(C, NB, 1, S * T * F * 4)),
            jnp.asarray(low.args.reshape(C, NB, 1, S * T * F * W_ARGS)),
            self.ext,
            jnp.asarray(clip.reshape(C, 1, 1, 2)),
        )
        # part='complex' schedules carry a second amplitude plane; the
        # kernel then synthesizes re/im in one fused pass (pair mode)
        self.amp_im = (jnp.asarray(low.amp_im.reshape(C, NB, 1, S * T))
                       if low.amp_im is not None else None)


def synthesize_device(dev: DeviceSchedule, rows_per_tile: int | None = None,
                      interpret: bool = False,
                      out_dtype=jnp.float32,
                      dac_scale=32767.0,
                      combine_pair: bool = True) -> jax.Array:
    """Run the synthesis kernel on device-resident descriptors.

    ``rows_per_tile=None`` picks the measured-optimal tile height (see
    :func:`default_rows_per_tile`).  ``out_dtype=jnp.bfloat16`` halves the
    output write bandwidth; accumulation stays f32, so only the final store
    quantizes.  ``out_dtype=jnp.int16`` emits exact DAC codes
    ``round(clip(x) * dac_scale)`` clamped to the int16 range --
    ``dac_scale`` is a scalar or per-channel array of codes-per-unit
    (default: full scale at |x| = 1).  Pair-mode (complex) schedules
    require f32.
    """
    C, NB, S, T, F = dev.shape
    scale = validate_out_mode(out_dtype, dev.amp_im, C, dac_scale)
    if rows_per_tile is None:
        rows_per_tile = default_rows_per_tile(dev.n_samples,
                                              dev.bucket_samples, NB)
    R = rows_per_tile
    tile = R * 128
    if NB > 1 and dev.bucket_samples % tile != 0:
        raise ValueError(
            f"bucket_samples {dev.bucket_samples} must be a multiple of the "
            f"tile ({tile})")
    G = max(dev.bucket_samples // tile, 1)
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    # every padded tile maps to an existing bucket: NB*bucket >= n_rows*128
    # holds because bucket_samples is a multiple of the tile (coarser
    # ceil-rounding of n_samples dominates the finer one).
    out = _run_kernel(
        jnp.zeros((1, 1, 1, 1), jnp.int32), *dev.tensors, dev.amp_im,
        scale, S=S, T=T, F=F, R=R, n_rows=n_rows, tiles_per_bucket=G,
        ops_present=dev.ops_present, interpret=interpret,
        out_dtype=out_dtype,
        fine=fine_would_engage(dev, R, n_rows, tiles_per_bucket=G))
    if dev.amp_im is not None:
        re, im = out
        if not combine_pair:
            # separate f32 I/Q planes (see sparse_synth.synthesize_sparse)
            return (re.reshape(C, n_rows * 128)[:, :dev.n_samples],
                    im.reshape(C, n_rows * 128)[:, :dev.n_samples])
        out = re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)
    return out.reshape(C, n_rows * 128)[:, :dev.n_samples]


def synthesize_lowered(low: LoweredSchedule, rows_per_tile: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Upload + run (one-shot convenience; reuse DeviceSchedule in loops)."""
    return synthesize_device(DeviceSchedule(low), rows_per_tile=rows_per_tile,
                             interpret=interpret)


def synthesize(channels, start: float, stop: float, sample_rate: float,
               part: str = 'real', pad_to=None,
               rows_per_tile: int | None = None,
               interpret: bool = False) -> jax.Array:
    """Lower + synthesize a multi-channel schedule -> (C, N) f32 on device.

    ``channels`` is a list of Waveform/WaveVStack.  Raises
    :class:`waveforms_tpu.ops.lowering.UnsupportedFactor` if a channel uses
    a basis outside the kernel's opcode set (use the XLA path for those).
    """
    low = lower_schedule(channels, start, stop, sample_rate, part=part,
                         pad_to=pad_to)
    return synthesize_lowered(low, rows_per_tile=rows_per_tile,
                              interpret=interpret)

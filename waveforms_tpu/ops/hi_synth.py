"""High-precision (double-f32) synthesis kernel: the 1e-9 tier at speed.

The f32 kernels deliver ~7.7e-7 relative parity at 130+ GS/s; the XLA x64
engine delivers 4.4e-10 at 1.7 GS/s (f64 emulation).  This module fills
the 77x gap between them: the same descriptor walk as the dense kernel,
but every envelope quantity is a double-f32 pair (:mod:`.df32`), the
phase path keeps its exact int32-turn reduction, and the kernel emits TWO
f32 planes whose (f64) sum carries ~49 significand bits.  Target contract
(docs/PRECISION.md): <= 1e-9 relative to the numpy f64 oracle at >= 10
GS/s on v5e.

Inputs come from ``lower_schedule(..., keep_f64=True)``, which packs
``args_lo``/``amp_lo`` residual planes (args ~ args + args_lo to f64).

Supported opcodes: LINEAR, GAUSSIAN, COS, EXP, SINC, DRAG, ERF, and
LINEARCHIRP (which also carries the exotic chirps after lowering's
quadratic-window expansion) -- the factor set of production
carrier/envelope/flux schedules.  Schedules using other bases raise
:class:`UnsupportedFactor`; route those to ``engine='xla'`` under x64
(the measured 4.4e-10 path).  Precision caveats, by design:

* clip rails apply at f32 precision (the rail value itself rounds);
* erf runs the df32 three-regime form (:func:`.df32.erf`, ~2e-12 rel),
  replacing the f32 kernel's 1.5e-7 Abramowitz-Stegun approximation;
* per-sample values below ~1e-34 of the output scale lose their lo plane
  to f32 underflow (irrelevant at any physical DAC scale).

Reference parity anchor: the reference's float64 numpy semantics
(/root/reference/waveforms/waveform.py:120-257) -- BASELINE.json's
"1e-9 relative tolerance" contract at production speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df32 as df
from .lowering import (DRAG_SIN_NC, DRAG_SINX_MAXQ, OP_COS, OP_COSH,
                       OP_DRAG, OP_DRAG_SIN, OP_DRAG_SINX, OP_ERF, OP_EXP,
                       OP_GAUSSIAN, OP_LINEAR, OP_LINEARCHIRP,
                       OP_MOLLIFIER, OP_POLY_GAUSS, OP_SINC, OP_SINH,
                       W_ARGS, LoweredSchedule, UnsupportedFactor)

__all__ = ['synthesize_hi', 'synthesize_hi_panels', 'synthesize_hi_routed',
           'HiSchedule', 'HI_OPS']

HI_OPS = frozenset({OP_LINEAR, OP_GAUSSIAN, OP_COS, OP_EXP, OP_SINC,
                    OP_DRAG, OP_LINEARCHIRP, OP_ERF, OP_COSH, OP_SINH,
                    OP_POLY_GAUSS, OP_MOLLIFIER, OP_DRAG_SIN,
                    OP_DRAG_SINX})
from .pallas_synth import _EXP_CLAMP    # one clamp across f32/hi tiers
_PI_H, _PI_L = df._c(np.pi)


def _combine_f64(hi, lo):
    """The one (hi, lo) -> float64 combine convention for every hi path."""
    return (np.asarray(hi).astype(np.float64)
            + np.asarray(lo).astype(np.float64))



def op_builders_hi(di, arg, arglo, q32, eread=None, ereadlo=None):
    """df analogs of pallas_synth.op_builders for the HI_OPS subset.

    ``di`` is the int32 sample delta; ``arg(k)``/``arglo(k)`` read the f32
    descriptor slot and its f64 residual; ``eread(k)``/``ereadlo(k)`` read
    the ext side-buffer's hi/lo planes (drag_sin coefficient blocks).
    Every builder returns an (hi, lo) f32 pair.  Shared by the Pallas
    kernel (SMEM scalars) and the interpret/test path, mirroring the
    single-source op_builders design.
    """
    di_df = df.from_int(di)

    def e_df(k):
        return eread(k), ereadlo(k)

    def sel_df(mask, a, b):
        return jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1])

    def le_df(a, b):
        # a <= b on df pairs: the hi planes order unless they tie
        return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))

    def lt_df(a, b):
        return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))

    def a_df(k):
        return arg(k), arglo(k)

    def u_df():
        return df.add(*di_df, -arg(0), -arglo(0))

    def x_df():
        return df.mul(*a_df(1), *u_df())

    def op_linear():
        return x_df()

    def op_gaussian():
        # clamp like op_exp: df.exp's range reduction NaNs once the
        # magnitude passes ~3e7, where the oracle (and the f32 kernel)
        # underflow to 0 -- e^-80 is already exactly 0 in f32
        nh, nl = df.neg(*df.sqr(*x_df()))
        clip = nh < -_EXP_CLAMP
        nh = jnp.maximum(nh, -_EXP_CLAMP)
        nl = jnp.where(clip, 0.0, nl)
        return df.exp(nh, nl)

    def op_exp():
        xh, xl = x_df()
        clip = jnp.abs(xh) > _EXP_CLAMP
        xh = jnp.clip(xh, -_EXP_CLAMP, _EXP_CLAMP)
        xl = jnp.where(clip, 0.0, xl)
        return df.exp(xh, xl)

    def op_erf():
        # df erf (Taylor / Chebyshev-erfc / saturation, ~2e-12 rel --
        # df32.erf banner) replaces the f32 kernel's 1.5e-7
        # Abramowitz-Stegun form; the step(type='erf')-edged flux
        # schedules of /root/reference/waveforms/waveform.py:1082-1107
        # keep the hi tier's 1e-9 contract
        return df.erf(*x_df())

    def _exp_clamped(xh, xl):
        clip = jnp.abs(xh) > _EXP_CLAMP
        xh = jnp.clip(xh, -_EXP_CLAMP, _EXP_CLAMP)
        xl = jnp.where(clip, 0.0, xl)
        return df.exp(xh, xl)

    def op_cosh():
        # exp form like the f32 kernel; 1/e^x via df division keeps the
        # subtraction/addition of the two branches at df accuracy
        e = _exp_clamped(*x_df())
        inv = df.div(jnp.ones_like(e[0]), jnp.zeros_like(e[0]), *e)
        return df.mul_f(*df.add(*e, *inv), np.float32(0.5))

    def op_sinh():
        # NB: near x = 0 the e^x - e^-x cancellation is benign in df --
        # both operands carry ~49 significand bits, so the difference
        # keeps ~(49 - 1) bits of sinh(x) ~ x
        e = _exp_clamped(*x_df())
        inv = df.div(jnp.ones_like(e[0]), jnp.zeros_like(e[0]), *e)
        return df.mul_f(*df.add(*e, *df.neg(*inv)), np.float32(0.5))

    def _polyval_asc_df(x, first, count):
        # descending Horner over df coefficients stored ascending at
        # args[first:first+count] (zero-padded; matches the f32 kernel)
        acc_h = jnp.full_like(x[0], arg(first + count - 1))
        acc_l = jnp.full_like(x[0], arglo(first + count - 1))
        for k in range(count - 2, -1, -1):
            acc_h, acc_l = df.mul(acc_h, acc_l, *x)
            acc_h, acc_l = df.add(acc_h, acc_l, arg(first + k),
                                  arglo(first + k))
        return acc_h, acc_l

    def op_poly_gauss():
        # P(x) * exp(-x^2) with df coefficients: the d_gaussian
        # derivative family (reference waveform.py D_GAUSSIAN) keeps
        # 1e-9 where the f32 tier's coefficient rounding cost ~1e-6
        x = x_df()
        nh, nl = df.neg(*df.sqr(*x))
        clip = nh < -_EXP_CLAMP
        nh = jnp.maximum(nh, -_EXP_CLAMP)
        nl = jnp.where(clip, 0.0, nl)
        out = df.mul(*_polyval_asc_df(x, 3, 9), *df.exp(nh, nl))
        return df.mul(*a_df(2), *out)

    def op_mollifier():
        # bump exp(1/(x^2-1) + 1) inside |x| < 1, or its d-th derivative
        # (d <= 3, lowering bound): bump / (x^2-1)^(2d) * P_d(x) with the
        # polynomial in df coefficients (args_lo residuals) -- the
        # (-1)^k k!-scaled cancellation that broke the f32 tier (~1e-6,
        # PRECISION.md) sits ~8 digits lower in df.  Deep-edge samples
        # where the exp argument passes the df.exp clamp (-80) force an
        # exact 0: the true ratio there is <= e^-80 / (1/81)^6 ~ 3e-24 of
        # peak, far below the 1e-9 contract, and skipping the division
        # avoids the denominator-underflow 0/0 the f32 kernel tolerates.
        x = x_df()
        vh, vl = df.add(*df.sqr(*x), np.float32(-1.0), np.float32(0.0))
        inside = vh < 0
        sh_ = jnp.where(inside, vh, np.float32(-1.0))
        sl_ = jnp.where(inside, vl, np.float32(0.0))
        qh, ql = df.div(jnp.ones_like(sh_), jnp.zeros_like(sh_), sh_, sl_)
        qh, ql = df.add(qh, ql, np.float32(1.0), np.float32(0.0))
        deep = qh < -_EXP_CLAMP
        qh = jnp.maximum(qh, -_EXP_CLAMP)
        ql = jnp.where(deep, 0.0, ql)
        out = df.exp(qh, ql)
        d = arg(2)
        # denominator (x^2-1)^(2d) = (safe^2)^d: outside the deep-edge
        # region safe^2 >= (1/81)^2, so the unrolled product (d <= 3)
        # neither under- nor overflows f32
        s2 = df.sqr(sh_, sl_)
        s2 = sel_df(deep, (jnp.ones_like(sh_), jnp.zeros_like(sh_)), s2)
        inv = df.div(jnp.ones_like(sh_), jnp.zeros_like(sh_), *s2)
        for k in (1, 2, 3):
            out = sel_df(d >= k, df.mul(*out, *inv), out)
        poly = _polyval_asc_df(x, 3, 9)
        out = sel_df(d > 0, df.mul(*out, *poly), out)
        keep = inside & jnp.logical_not(deep)
        return jnp.where(keep, out[0], 0.0), jnp.where(keep, out[1], 0.0)

    def _drag_sin_like_hi(with_blend):
        # df analog of pallas_synth._drag_sin_like: the fixed-layout ext
        # block (lowering._lower_factor) read through the hi/lo ext
        # planes.  The per-power trig expansion is exact host math; in df
        # the remaining error is the sincos_rad/Horner rounding (~1e-10).
        uu = u_df()
        lh = df.mul_f(*a_df(5), np.float32(0.5))
        rl = df.add(*lh, *a_df(6))
        rise = le_df(uu, lh)
        flat = jnp.logical_not(rise) & lt_df(uu, rl)
        bt = sel_df(rise, uu, df.add(*uu, -arg(6), -arglo(6)))
        ang = df.mul(*a_df(1), *bt)
        s, c = df.sincos_rad(*ang)

        zeros = jnp.zeros_like(uu[0])
        ox = (zeros, zeros)
        oy = (zeros, zeros)
        sp = (jnp.ones_like(uu[0]), zeros)
        for p in range(DRAG_SIN_NC):          # padded coeffs: zeros no-op
            basis = df.mul(*sp, *c) if p % 2 else sp
            ox = df.add(*ox, *df.mul(*e_df(1 + p), *basis))
            oy = df.add(*oy, *df.mul(*e_df(1 + DRAG_SIN_NC + p), *basis))
            sp = df.mul(*sp, *s)
        flat_x = e_df(1 + 2 * DRAG_SIN_NC)
        flat_y = e_df(2 + 2 * DRAG_SIN_NC)
        ox = sel_df(flat, (jnp.full_like(zeros, flat_x[0]),
                           jnp.full_like(zeros, flat_x[1])), ox)
        oy = sel_df(flat, (jnp.full_like(zeros, flat_y[0]),
                           jnp.full_like(zeros, flat_y[1])), oy)

        if with_blend:
            b0 = 3 + 2 * DRAG_SIN_NC
            bh_ = (eread(b0), ereadlo(b0))

            def horner(base, x):
                # descending Horner over zero-padded ascending df
                # coefficients (argument in samples, never large powers).
                # Rolled into a fori_loop: unrolling the 40-term df chain
                # four times (~700 loads + ~2500 vector ops) sits past
                # XLA:CPU's compile-time cliff (>9 min; the f32 kernel's
                # 160-load unroll compiles fine), and the blend regions
                # cover a handful of samples, so loop overhead is noise.
                def body(j, acc):
                    k = DRAG_SINX_MAXQ - 2 - j
                    h, l = df.mul(*acc, *x)
                    return df.add(h, l, eread(base + k), ereadlo(base + k))

                acc = (jnp.full_like(x[0], eread(base + DRAG_SINX_MAXQ - 1)),
                       jnp.full_like(x[0],
                                     ereadlo(base + DRAG_SINX_MAXQ - 1)))
                return jax.lax.fori_loop(0, DRAG_SINX_MAXQ - 1, body, acc)

            stride = 1 + DRAG_SINX_MAXQ
            dl_ = df.add(*uu, *df.neg(*lh))
            dr_ = df.add(*uu, *df.neg(*rl))
            nbh = df.neg(*bh_)
            in_l = le_df(nbh, dl_) & le_df(dl_, (zeros, zeros))
            in_r = le_df((zeros, zeros), dr_) & le_df(dr_, bh_)
            ox = sel_df(in_l, horner(b0 + 2, dl_), ox)
            oy = sel_df(in_l, horner(b0 + 2 + stride, dl_), oy)
            ox = sel_df(in_r, horner(b0 + 2 + 2 * stride, dr_), ox)
            oy = sel_df(in_r, horner(b0 + 2 + 3 * stride, dr_), oy)

        sin_t, cos_t = _carrier(3, 4, True, True)
        out = df.mul(*ox, *cos_t)
        return df.add(*out, *df.mul(*oy, *sin_t))

    def op_drag_sin():
        return _drag_sin_like_hi(False)

    def op_drag_sinx():
        return _drag_sin_like_hi(True)

    def _carrier(eps_slot, ceps_slot, need_sin, need_cos):
        # slot layout follows the f32 op_builders: OP_COS keeps (eps,
        # ceps) at (2, 3); OP_DRAG at (3, 4) -- see lowering._lower_factor
        turns = q32(0) * di + q32(1)
        # residual = eps * di + ceps in df (eps/ceps tiny: < 2^-33
        # turn/sample and < 1 quantum respectively)
        r = df.mul(*a_df(eps_slot), *di_df)
        r = df.add(*r, arg(ceps_slot), arglo(ceps_slot))
        return df.sincos_turns(turns, *r, need_sin=need_sin,
                               need_cos=need_cos)

    def op_cos():
        return _carrier(2, 3, False, True)[1]

    def op_sinc():
        xh, xl = x_df()
        ph, plo = df.mul(xh, xl, _PI_H, _PI_L)
        sin, _ = df.sincos_rad(ph, plo, need_cos=False)
        small = jnp.abs(ph) < 1e-6
        safe_h = jnp.where(small, 1.0, ph)
        safe_l = jnp.where(small, 0.0, plo)
        qh, ql = df.div(sin[0], sin[1], safe_h, safe_l)
        return jnp.where(small, 1.0, qh), jnp.where(small, 0.0, ql)

    def op_linearchirp():
        # exact int32 quadratic phase (same ring arithmetic as the f32
        # kernel); the residual polynomial and the constant phase run in
        # df (dh/dl are f32-exact: |dh| < 2^13 after the 11-bit split)
        dh = di >> 11
        dl = di - (dh << 11)
        turns = (q32(0) * dh * dh + q32(1) * dh * dl + q32(2) * dl * dl
                 + q32(3) * di)
        dhf = dh.astype(jnp.float32)
        dlf = dl.astype(jnp.float32)
        r = df.mul_f(*a_df(2), dhf)
        r = df.add(*r, *df.mul_f(*a_df(3), dlf))
        r = df.mul_f(*r, dhf)
        r = df.add(*r, *df.mul_f(*df.mul_f(*a_df(4), dlf), dlf))
        r = df.add(*r, *df.mul(*a_df(5), *di_df))
        # constant phase [0, 2pi) -> int32 turns + small df residual.
        # cturns is exact int32; its turn value scales by 2^-32 exactly
        # (power of two), so the residual phi - cturns*2pi/2^32 computes
        # in pure df with no integer-to-f32 rounding.
        ph, plo = a_df(6)
        inv2pi_h, inv2pi_l = df._c(1 / (2 * np.pi))
        c = df.mul(ph, plo, inv2pi_h, inv2pi_l)
        ci = jnp.round((c[0] - jnp.round(c[0]))
                       * np.float32(2**31)).astype(jnp.int32)
        cturns = ci * 2
        th, tl = df.from_int(cturns)               # exact split
        two_pi_h, two_pi_l = df._TWO_PI_H, df._TWO_PI_L
        sub = df.mul(th * np.float32(2.0**-32), tl * np.float32(2.0**-32),
                     two_pi_h, two_pi_l)
        crh, crl = df.add(ph, plo, -sub[0], -sub[1])
        # wrap near zero (the un-quantized integer-turn part remains)
        k2 = jnp.round(crh * inv2pi_h)
        crh, crl = df.add(crh, crl, *df.mul_f(-two_pi_h, -two_pi_l, k2))
        r = df.add(*r, crh, crl)
        return df.sincos_turns(turns + cturns, r[0], r[1],
                               need_cos=False)[0]

    def op_drag():
        xh, xl = x_df()
        sin_x, cos_x = df.sincos_rad(xh, xl)
        env_x = df.sqr(*sin_x)
        # sin(2x) = 2 sin x cos x (one range reduction serves both)
        sin2 = df.mul_f(*df.mul(*sin_x, *cos_x), np.float32(2.0))
        env_y = df.mul(*a_df(5), *sin2)
        sin_t, cos_t = _carrier(3, 4, True, True)
        out = df.mul(*env_x, *cos_t)
        return df.add(*out, *df.mul(*env_y, *sin_t))

    return {
        OP_LINEAR: op_linear,
        OP_GAUSSIAN: op_gaussian,
        OP_COS: op_cos,
        OP_EXP: op_exp,
        OP_SINC: op_sinc,
        OP_DRAG: op_drag,
        OP_LINEARCHIRP: op_linearchirp,
        OP_ERF: op_erf,
        OP_COSH: op_cosh,
        OP_SINH: op_sinh,
        OP_POLY_GAUSS: op_poly_gauss,
        OP_MOLLIFIER: op_mollifier,
        OP_DRAG_SIN: op_drag_sin,
        OP_DRAG_SINX: op_drag_sinx,
    }


def _tile_walker_hi(idx, base, tile, R, seg_lo_ref, seg_hi_ref, nterm_ref,
                    nfac_ref, amp_ref, amplo_ref, op_ref, pw_ref, sh_ref,
                    q32_ref, args_ref, argslo_ref, ext_ref, extlo_ref,
                    clip_ref, *, T, F, ops_present):
    """df analog of pallas_synth._tile_walker (real schedules only)."""

    def factor_value(flat_idx):
        op = op_ref[0, 0, 0, flat_idx]
        di = idx - sh_ref[0, 0, 0, flat_idx]
        aoff = flat_idx * W_ARGS

        def arg(k):
            return args_ref[0, 0, 0, aoff + k]

        def arglo(k):
            return argslo_ref[0, 0, 0, aoff + k]

        def q32(j):
            return q32_ref[0, 0, 0, 4 * flat_idx + j]

        def eread(k):
            return ext_ref[0, 0, 0, arg(7).astype(jnp.int32) + k]

        def ereadlo(k):
            return extlo_ref[0, 0, 0, arg(7).astype(jnp.int32) + k]

        builders = op_builders_hi(di, arg, arglo, q32, eread, ereadlo)
        branches = [builders[o] for o in ops_present]
        if len(branches) == 1:
            vh, vl = branches[0]()
        else:
            vh, vl = jax.lax.switch(op, branches)

        p = pw_ref[0, 0, 0, flat_idx]

        def raise_power(v):
            ap = jnp.abs(p)

            def body(_, acc):
                return df.mul(*acc, *v)

            out = jax.lax.fori_loop(1, ap, body, v)
            inv = df.div(jnp.ones_like(out[0]), jnp.zeros_like(out[1]),
                         *out)
            return jax.lax.cond(p < 0, lambda: inv, lambda: out)

        return jax.lax.cond(p == 1, lambda v: v, raise_power, (vh, vl))

    zeros = jnp.zeros((R, 128), jnp.float32)
    cmin = clip_ref[0, 0, 0, 0]
    cmax = clip_ref[0, 0, 0, 1]

    def clip_df(h, l):
        over = h > cmax
        under = h < cmin
        h2 = jnp.clip(h, cmin, cmax)
        l2 = jnp.where(over | under, 0.0, l)
        return h2, l2

    def segment_at(s, acc):
        lo = seg_lo_ref[0, 0, 0, s]
        hi = seg_hi_ref[0, 0, 0, s]
        nt = nterm_ref[0, 0, 0, s]

        def add_segment(acc):
            def term_body(t, seg):
                flat_t = s * T + t
                prod = (jnp.full((R, 128), amp_ref[0, 0, 0, flat_t],
                                 jnp.float32),
                        jnp.full((R, 128), amplo_ref[0, 0, 0, flat_t],
                                 jnp.float32))

                def fac_body(f, pr):
                    return df.mul(*pr, *factor_value(flat_t * F + f))

                prod = jax.lax.fori_loop(0, nfac_ref[0, 0, 0, flat_t],
                                         fac_body, prod)
                return df.add(*seg, *prod)

            sh_, sl_ = jax.lax.fori_loop(0, nt, term_body, (zeros, zeros))
            mask = (idx >= lo) & (idx < hi)
            ch_, cl_ = clip_df(sh_, sl_)
            return df.add(*acc, jnp.where(mask, ch_, 0.0),
                          jnp.where(mask, cl_, 0.0))

        overlap = (hi > base) & (lo < base + tile) & (nt > 0)
        return jax.lax.cond(overlap, add_segment, lambda a: a, acc)

    return segment_at, (zeros, zeros)


def _hi_kernel(row0_ref, seg_lo_ref, seg_hi_ref, s0_ref, s1_ref, nterm_ref,
               nfac_ref, amp_ref, amplo_ref, op_ref, pw_ref, sh_ref,
               q32_ref, args_ref, argslo_ref, ext_ref, extlo_ref, clip_ref,
               out_ref, out2_ref, *, S, T, F, R, G, ops_present):
    tile = R * 128
    base = row0_ref[0, 0, 0, 0] + pl.program_id(1) * tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    idx = base + rows * 128 + cols

    segment_at, acc0 = _tile_walker_hi(
        idx, base, tile, R, seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref,
        amp_ref, amplo_ref, op_ref, pw_ref, sh_ref, q32_ref, args_ref,
        argslo_ref, ext_ref, extlo_ref, clip_ref, T=T, F=F,
        ops_present=ops_present)

    g = pl.program_id(1) % G
    acc = jax.lax.fori_loop(s0_ref[0, 0, 0, g], s1_ref[0, 0, 0, g],
                            segment_at, acc0)
    out_ref[0] = acc[0]
    out2_ref[0] = acc[1]


@functools.partial(jax.jit,
                   static_argnames=('S', 'T', 'F', 'R', 'n_rows',
                                    'tiles_per_bucket', 'ops_present',
                                    'interpret'))
def _run_kernel_hi(row0, seg_lo, seg_hi, seg_hmax, nterm, nfac, amp,
                   amp_lo, op, pw, sh, q32, args, args_lo, ext, ext_lo,
                   clip, *, S, T, F, R, n_rows, tiles_per_bucket,
                   ops_present, interpret=False):
    C = seg_lo.shape[0]
    grid = (C, n_rows // R)
    G = tiles_per_bucket
    NB = seg_lo.shape[1]
    if NB == 1:
        G = max(n_rows // R, 1)
    tile_sz = R * 128
    bases = (row0.reshape(()) +
             jnp.arange(NB * G, dtype=jnp.int32) * tile_sz).reshape(NB, G)

    def ranges(hmax_row, lo_row, base_row):
        s0 = jnp.searchsorted(hmax_row, base_row, side='right')
        s1 = jnp.searchsorted(lo_row, base_row + tile_sz, side='left')
        return s0.astype(jnp.int32), s1.astype(jnp.int32)

    per_bucket = jax.vmap(ranges, in_axes=(0, 0, 0))
    s0t, s1t = jax.vmap(per_bucket, in_axes=(0, 0, None))(
        seg_hmax.reshape(C, NB, S), seg_lo.reshape(C, NB, S), bases)
    s0t = s0t.reshape(C, NB, 1, G)
    s1t = s1t.reshape(C, NB, 1, G)

    def smem(k, bcast=False):
        if bcast:
            return pl.BlockSpec((1, 1, 1, k), lambda c, j: (0, 0, 0, 0),
                                memory_space=pltpu.SMEM)
        return pl.BlockSpec((1, 1, 1, k), lambda c, j: (c, j // G, 0, 0),
                            memory_space=pltpu.SMEM)

    kernel = functools.partial(_hi_kernel, S=S, T=T, F=F, R=R, G=G,
                               ops_present=ops_present)
    out_spec = pl.BlockSpec((1, R, 128), lambda c, j: (c, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, n_rows, 128), jnp.float32)
    # interpret (XLA:CPU) traces carry the anti-fma-contraction barriers;
    # the Mosaic trace stays barrier-free (df32.exact_sum_guard banner)
    with df.exact_sum_guard(interpret):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                smem(1, bcast=True),                      # row0
                smem(S), smem(S),                         # seg_lo, seg_hi
                smem(G), smem(G),                         # per-tile s0, s1
                smem(S),                                  # nterm
                smem(S * T), smem(S * T), smem(S * T),    # nfac, amp, amp_lo
                smem(S * T * F), smem(S * T * F),         # op, power
                smem(S * T * F), smem(S * T * F * 4),     # shift_hi, q32
                smem(S * T * F * W_ARGS),                 # args
                smem(S * T * F * W_ARGS),                 # args_lo
                smem(ext.shape[-1], bcast=True),          # ext hi plane
                smem(ext.shape[-1], bcast=True),          # ext lo plane
                pl.BlockSpec((1, 1, 1, 2), lambda c, j: (c, 0, 0, 0),
                             memory_space=pltpu.SMEM),    # clip
            ],
            out_specs=(out_spec, out_spec),
            out_shape=(out_shape, out_shape),
            interpret=interpret,
        )(row0, seg_lo, seg_hi, s0t, s1t, nterm, nfac, amp, amp_lo, op,
          pw, sh, q32, args, args_lo, ext, ext_lo, clip)


def _hi_panel_kernel(start_ref, wt_ref, wo_ref, ws0_ref, ws1_ref,
                     seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref, amp_ref,
                     amplo_ref, op_ref, pw_ref, sh_ref, q32_ref, args_ref,
                     argslo_ref, ext_ref, extlo_ref, clip_ref, out_ref,
                     out2_ref, *, S, T, F, Rs, P, NP, ops_present):
    """Panel-kernel analog for the hi tier (see sparse_synth._panel_kernel):
    one fat grid step per (channel, panel), zero-filled (hi, lo) planes,
    all the slot's live subtiles walked from the SMEM-resident worklist.
    Single-bucket schedules only (bucketed hi runs the dense grid)."""
    c = pl.program_id(0)
    p = pl.program_id(1)
    out_ref[0] = jnp.zeros((P, 128), jnp.float32)
    out2_ref[0] = jnp.zeros((P, 128), jnp.float32)
    tile = Rs * 128
    rows = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 1)
    slot = c * NP + p
    k0 = start_ref[slot]
    k1 = start_ref[slot + 1]

    def item(k, carry):
        base = wt_ref[k] * tile
        idx = base + rows * 128 + cols
        seg_at, a0 = _tile_walker_hi(
            idx, base, tile, Rs, seg_lo_ref, seg_hi_ref, nterm_ref,
            nfac_ref, amp_ref, amplo_ref, op_ref, pw_ref, sh_ref, q32_ref,
            args_ref, argslo_ref, ext_ref, extlo_ref, clip_ref, T=T, F=F,
            ops_present=ops_present)
        acc = jax.lax.fori_loop(ws0_ref[k], ws1_ref[k], seg_at, a0)
        sl = pl.ds(wo_ref[k] * Rs - p * P, Rs)
        out_ref[0, sl, :] = acc[0]
        out2_ref[0, sl, :] = acc[1]
        return carry

    jax.lax.fori_loop(k0, k1, item, 0)


@functools.partial(jax.jit,
                   static_argnames=('S', 'T', 'F', 'Rs', 'P', 'NP',
                                    'ops_present', 'interpret'))
def _run_panels_hi(start, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac,
                   amp, amp_lo, op, pw, sh, q32, args, args_lo, ext,
                   ext_lo, clip, *, S, T, F, Rs, P, NP, ops_present,
                   interpret=False):
    C = seg_lo.shape[0]

    def smem(k, bcast=False):
        if bcast:
            return pl.BlockSpec(
                (1, 1, 1, k), lambda c, p, *pf: (0, 0, 0, 0),
                memory_space=pltpu.SMEM)
        return pl.BlockSpec(
            (1, 1, 1, k), lambda c, p, *pf: (c, 0, 0, 0),
            memory_space=pltpu.SMEM)

    out_spec = pl.BlockSpec((1, P, 128), lambda c, p, *pf: (c, p, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(C, NP),
        in_specs=[
            smem(S), smem(S), smem(S),               # seg_lo, seg_hi, nterm
            smem(S * T), smem(S * T), smem(S * T),   # nfac, amp, amp_lo
            smem(S * T * F), smem(S * T * F),        # op, power
            smem(S * T * F), smem(S * T * F * 4),    # shift_hi, q32
            smem(S * T * F * W_ARGS),                # args
            smem(S * T * F * W_ARGS),                # args_lo
            smem(ext.shape[-1], bcast=True),         # ext hi plane
            smem(ext.shape[-1], bcast=True),         # ext lo plane
            pl.BlockSpec((1, 1, 1, 2), lambda c, p, *pf: (c, 0, 0, 0),
                         memory_space=pltpu.SMEM),   # clip
        ],
        out_specs=(out_spec, out_spec),
    )
    kernel = functools.partial(_hi_panel_kernel, S=S, T=T, F=F, Rs=Rs,
                               P=P, NP=NP, ops_present=ops_present)
    out_shape = jax.ShapeDtypeStruct((C, NP * P, 128), jnp.float32)
    # see _run_kernel_hi: barriers on the interpret (XLA:CPU) trace only
    with df.exact_sum_guard(interpret):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(out_shape, out_shape),
            interpret=interpret,
        )(start, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac, amp,
          amp_lo, op, pw, sh, q32, args, args_lo, ext, ext_lo, clip)


def synthesize_hi_panels(dev, low=None, plan=None, Rs=32,
                         interpret: bool | None = None,
                         combine: bool = True):
    """Panel-kernel hi-tier synthesis (sparse/mid-occupancy schedules).

    Same contract as :func:`synthesize_hi`; single-bucket real schedules
    whose worklist fits the panel SMEM budget.  The (hi, lo) planes are
    stored per live subtile only, so factor math scales with occupancy
    exactly like the f32 panel kernel (162 vs 29 GS/s on v5e)."""
    from .sparse_synth import build_panel_plan, panels_eligible
    if not isinstance(dev, HiSchedule):
        low = low or dev
        dev = HiSchedule(dev)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    C, NB, S, T, F = dev.shape
    if NB != 1:
        raise UnsupportedFactor("hi panel synthesis is single-bucket; "
                                "bucketed schedules run the dense hi grid")
    if plan is None:
        if low is None:
            raise ValueError("synthesize_hi_panels needs `low` or `plan`")
        plan = build_panel_plan(low, Rs=Rs)
    else:
        # same stale-plan guard as the f32 twin: a cached plan from a
        # different lowering silently synthesizes garbage (or reads the
        # descriptor block out of bounds)
        from .sparse_synth import _validate_panel_plan
        _validate_panel_plan(plan, dev)
    if not panels_eligible(plan, jnp.float32):
        raise UnsupportedFactor("worklist exceeds the panel SMEM budget")
    tensors = dev.tensors[:2] + dev.tensors[3:]
    hi, lo = _run_panels_hi(
        jnp.asarray(plan.start), jnp.asarray(plan.work_t),
        jnp.asarray(plan.work_o), jnp.asarray(plan.work_s0),
        jnp.asarray(plan.work_s1), *tensors,
        S=S, T=T, F=F, Rs=plan.Rs, P=plan.P, NP=plan.n_panels,
        ops_present=dev.ops_present, interpret=interpret)
    hi = hi.reshape(C, -1)[:, :plan.window_samples]
    lo = lo.reshape(C, -1)[:, :plan.window_samples]
    if not combine:
        return hi, lo
    return _combine_f64(hi, lo)


def synthesize_hi_routed(low, combine: bool = True):
    """Occupancy-routed hi tier: panel kernel below the panel threshold
    (the same crossover the f32 engine uses -- including the padded-row
    occupancy correction and the short-window preference), dense hi grid
    otherwise."""
    if low.shape[1] == 1 and low.pallas_ok and low.amp_im is None:
        from ..engine import _panel_threshold
        from .pallas_synth import default_rows_per_tile
        from .sparse_synth import (build_panel_plan, build_sparse_plan,
                                   panels_eligible)
        try:
            sp = build_sparse_plan(low)
            # mirror classify_pallas_route: dense pads the row count to
            # its tile height and padding rows are real work, so compare
            # against the PADDED tile count; short windows (<= 2 dense
            # steps) prefer panels outright
            R = default_rows_per_tile(low.n_samples, low.bucket_samples,
                                      low.shape[1])
            n_rows = -(-low.n_samples // 128)
            padded_rows = -(-n_rows // R) * R
            occ = sp.occupied_fraction * n_rows / padded_rows
            small = padded_rows <= 2 * R
            if small or occ < _panel_threshold():
                pp = build_panel_plan(low, base=sp)
                if panels_eligible(pp, jnp.float32):
                    return synthesize_hi_panels(low, plan=pp,
                                                combine=combine)
                from .sparse_synth import plan_panel_windows
                wins = plan_panel_windows(low, base=sp)
                if wins is not None:
                    dev = HiSchedule(low)
                    outs = [synthesize_hi_panels(dev, low, plan=p,
                                                 combine=False)
                            for p in wins]
                    hi = jnp.concatenate([o[0] for o in outs], axis=-1)
                    lo = jnp.concatenate([o[1] for o in outs], axis=-1)
                    if not combine:
                        return hi, lo
                    return _combine_f64(hi, lo)
        except UnsupportedFactor:
            pass
    return synthesize_hi(low, combine=combine)


class HiSchedule:
    """Device-resident hi-tier descriptors (lower with keep_f64=True)."""

    def __init__(self, low: LoweredSchedule):
        if low.args_lo is None:
            raise ValueError(
                "hi-tier synthesis needs lower_schedule(..., keep_f64=True)")
        if low.amp_im is not None:
            raise UnsupportedFactor("hi tier is real-only; use engine="
                                    "'xla' under x64 for complex")
        live = np.arange(low.shape[4]) < low.nfac[..., None]
        used = set(int(o) for o in np.unique(low.op[live]))
        bad = used - set(HI_OPS)
        if bad:
            raise UnsupportedFactor(
                f"opcodes {sorted(bad)} have no double-f32 lowering; "
                "use engine='xla' under x64 (4.4e-10 measured)")
        if not low.pallas_ok:
            raise UnsupportedFactor("schedule exceeds the kernel's "
                                    "descriptor budget")
        from .lowering import (PALLAS_EXT_MAX, PALLAS_SMEM_BUDGET,
                               _pallas_desc_bytes)
        # the residual planes (args_lo, amp_lo) nearly double the SMEM
        # descriptor block; apply the budget to the hi-tier footprint
        if 2 * _pallas_desc_bytes(*low.shape[2:]) > PALLAS_SMEM_BUDGET:
            raise UnsupportedFactor(
                "hi-tier descriptor block (with residual planes) exceeds "
                "the SMEM budget; use engine='xla' under x64 or smaller "
                "bucket_samples")
        n_ext = int(low.ext.size) if low.ext is not None else 0
        if 2 * n_ext > PALLAS_EXT_MAX:
            raise UnsupportedFactor(
                "hi-tier ext buffer (with its residual plane) exceeds the "
                "SMEM budget; use engine='xla' under x64")
        C, NB, S, T, F = low.shape
        self.shape = low.shape
        self.n_samples = low.n_samples
        self.bucket_samples = low.bucket_samples
        clip = np.stack([low.clip_min, low.clip_max], axis=1)
        # LIVE slots only: op_builders_hi covers HI_OPS alone, so a
        # dead/padded slot carrying any other opcode must not reach the
        # branch table (the all-slots np.unique the f32 DeviceSchedule
        # uses is safe only because its builders dict is total)
        self.ops_present = tuple(sorted(used)) or (OP_LINEAR,)
        remap = np.zeros(max(self.ops_present) + 1, np.int32)
        for i, o in enumerate(self.ops_present):
            remap[o] = i
        hmax = np.maximum.accumulate(low.seg_hi, axis=-1)
        self.tensors = (
            jnp.asarray(low.seg_lo.reshape(C, NB, 1, S)),
            jnp.asarray(low.seg_hi.reshape(C, NB, 1, S)),
            jnp.asarray(hmax.reshape(C, NB, 1, S)),
            jnp.asarray(low.nterm.reshape(C, NB, 1, S)),
            jnp.asarray(low.nfac.reshape(C, NB, 1, S * T)),
            jnp.asarray(low.amp.reshape(C, NB, 1, S * T)),
            jnp.asarray(low.amp_lo.reshape(C, NB, 1, S * T)),
            jnp.asarray(remap[low.op].reshape(C, NB, 1, S * T * F)),
            jnp.asarray(low.power.reshape(C, NB, 1, S * T * F)),
            jnp.asarray(low.shift_hi.reshape(C, NB, 1, S * T * F)),
            jnp.asarray(low.q32.reshape(C, NB, 1, S * T * F * 4)),
            jnp.asarray(low.args.reshape(C, NB, 1, S * T * F * W_ARGS)),
            jnp.asarray(low.args_lo.reshape(C, NB, 1, S * T * F * W_ARGS)),
        ) + self._ext_planes(low) + (
            jnp.asarray(clip.reshape(C, 1, 1, 2)),
        )

    @staticmethod
    def _ext_planes(low):
        """The f64 ext side-buffer as (hi, lo) f32 SMEM planes.

        Padded to a 256 multiple like the f32 engine so similar
        schedules share compiled kernels."""
        n_ext = int(low.ext.size) if low.ext is not None else 0
        e_pad = -(-max(n_ext, 1) // 256) * 256
        ext_hi = np.zeros(e_pad, np.float32)
        ext_lo = np.zeros(e_pad, np.float32)
        if n_ext:
            e64 = np.asarray(low.ext, np.float64)
            ext_hi[:n_ext] = e64.astype(np.float32)
            ext_lo[:n_ext] = (e64 - ext_hi[:n_ext].astype(np.float64)
                              ).astype(np.float32)
        return (jnp.asarray(ext_hi.reshape(1, 1, 1, e_pad)),
                jnp.asarray(ext_lo.reshape(1, 1, 1, e_pad)))


def synthesize_hi(low_or_dev, rows_per_tile: int | None = None,
                  interpret: bool | None = None, combine: bool = True):
    """Double-f32 synthesis -> f64 (C, n_samples) ndarray.

    ``combine=False`` returns the raw (hi, lo) f32 device planes instead
    (their f64 sum is the result; useful on devices where f64 transfers
    are unavailable).  Cache the :class:`HiSchedule` for repeated runs.
    """
    dev = (low_or_dev if isinstance(low_or_dev, HiSchedule)
           else HiSchedule(low_or_dev))
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    C, NB, S, T, F = dev.shape
    if rows_per_tile is None:
        from .pallas_synth import default_rows_per_tile
        rows_per_tile = default_rows_per_tile(dev.n_samples,
                                              dev.bucket_samples, NB)
    R = rows_per_tile
    tile = R * 128
    if NB > 1 and dev.bucket_samples % tile != 0:
        raise ValueError(
            f"bucket_samples {dev.bucket_samples} must be a multiple of "
            f"the tile ({tile})")
    G = max(dev.bucket_samples // tile, 1)
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    hi, lo = _run_kernel_hi(
        jnp.zeros((1, 1, 1, 1), jnp.int32), *dev.tensors,
        S=S, T=T, F=F, R=R, n_rows=n_rows, tiles_per_bucket=G,
        ops_present=dev.ops_present, interpret=interpret)
    hi = hi.reshape(C, n_rows * 128)[:, :dev.n_samples]
    lo = lo.reshape(C, n_rows * 128)[:, :dev.n_samples]
    if not combine:
        return hi, lo
    return _combine_f64(hi, lo)

"""Double-f32 ("two-float") arithmetic for the high-precision kernel tier.

TPU VPUs have no f64 datapath; Mosaic kernels are f32-only.  This module
represents a value as an unevaluated sum ``hi + lo`` of two f32 (~49
significand bits, rel ~1e-15 headroom -- far past the 1e-9 contract) using
the classic error-free transformations (Dekker 1971, Knuth TAOCP 2):
``two_sum`` needs no fma; ``two_prod`` uses the Veltkamp split, so every
operation lowers to plain VPU mul/add.

The transcendentals use a *leading-terms-in-df, tail-in-f32* split: for a
series whose tail contributes < ~1e-3 of the result, evaluating the tail
in f32 keeps its error below 1e-10 relative while paying df cost only on
the 2-4 leading terms.  That is what keeps the hi tier within a small
multiple of the f32 kernel's transcendental cost instead of the ~20x of a
full df Horner.

Used by :mod:`waveforms_tpu.ops.pallas_synth`'s ``hi`` kernel mode
(engine ``precision='double'``), which fills the gap between the f32
kernels (~7.7e-7, 130+ GS/s) and the XLA x64 engine (4.4e-10, 1.7 GS/s)
measured in docs/PRECISION.md.  Reference parity target: the numpy f64
oracle (reference ``waveforms/waveform.py`` semantics) to <= 1e-9.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)          # 2^12 + 1 (Veltkamp split for f32)
_PHASE_H = np.float32(2 * np.pi / 2**32)
_PHASE_L = np.float32(2 * np.pi / 2**32 - float(np.float32(2 * np.pi
                                                           / 2**32)))
_LN2_H = np.float32(0.6931471805599453)
_LN2_L = np.float32(0.6931471805599453 - float(np.float32(
    0.6931471805599453)))
_INV_LN2 = np.float32(1.4426950408889634)
_TWO_PI_H = np.float32(2 * np.pi)
_TWO_PI_L = np.float32(2 * np.pi - float(np.float32(2 * np.pi)))
_INV_TWO_PI = np.float32(1 / (2 * np.pi))


def _c(x: float):
    """A non-representable coefficient as a df constant pair."""
    hi = np.float32(x)
    return hi, np.float32(x - float(hi))


_C16 = _c(1 / 6.)
_C13 = _c(1 / 3.)
_C120 = _c(1 / 120.)


# XLA:CPU's LLVM backend (opt level >= 1) FMA-contracts a multiply that
# feeds an add within one fusion: `s = p + e` with `p = a * b` recompiles
# as fma(a, b, e), using the UNROUNDED product, while sibling fusions
# re-materialize the rounded p -- which silently breaks the error-free
# transforms (the r5 poly_gauss 5.2e-8 regression; the faithful HLO
# replays at 8e-16, --xla_backend_optimization_level=0 fixes it, and
# lax.optimization_barrier does NOT survive to fusion/codegen).  Mosaic
# (the TPU path) does no such contraction -- hi-tier silicon rows
# measure 1e-10.  The fix is scoped to where the hazard lives: under
# ``exact_sum_guard`` (set by the interpret/XLA entry points at trace
# time) the EFT primitives compute their exact results through single
# f64 roundings -- bit-identical semantics, immune to contraction, and
# native-speed on CPU.  Requires x64 (tests enable it); without x64 the
# plain f32 EFTs remain, carrying the (pattern-dependent) XLA:CPU
# contraction hazard.
# ContextVar, not a module global: traces may run concurrently (the
# freethreaded CI lane soaks exactly this); a thread-local guard cannot
# leak f64 ops into another thread's Mosaic trace or strip the guard
# from another thread's interpret trace.
import contextvars as _contextvars

_SUM_GUARD_VAR = _contextvars.ContextVar('wftpu_df32_sum_guard',
                                         default=False)


class exact_sum_guard:
    """Context manager: trace df EFTs through exact f64 single-roundings.

    Use around XLA-compiled (interpret-mode) traces on CPU; the Mosaic
    TPU trace must stay guard-free (no f64 datapath on the VPU).
    Requires x64; when requested without it, the plain f32 EFTs trace
    with a warning (the XLA:CPU contraction hazard applies -- banner).
    """

    def __init__(self, enable: bool = True):
        self.enable = bool(enable) and bool(jax.config.jax_enable_x64)
        if enable and not self.enable:
            import warnings
            warnings.warn(
                "df32.exact_sum_guard needs jax_enable_x64: the "
                "interpret-path EFTs trace unguarded and XLA:CPU's fma "
                "contraction may cost ~1e-7 of the 1e-9 contract "
                "(df32.py banner); enable x64 for CPU hi-tier parity")

    def __enter__(self):
        self._tok = _SUM_GUARD_VAR.set(self.enable)

    def __exit__(self, *exc):
        _SUM_GUARD_VAR.reset(self._tok)


def _exact_sum64(a, b):
    s64 = a.astype(jnp.float64) + b.astype(jnp.float64)   # exact
    s = s64.astype(jnp.float32)
    e = (s64 - s.astype(jnp.float64)).astype(jnp.float32)  # representable
    return s, e


def two_sum(a, b):
    """Exact a + b = s + e (Knuth; no magnitude ordering required)."""
    if _SUM_GUARD_VAR.get():
        return _exact_sum64(a, b)
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Exact a + b = s + e, REQUIRES |a| >= |b| (3 flops)."""
    if _SUM_GUARD_VAR.get():
        return _exact_sum64(a, b)
    s = a + b
    return s, b - (s - a)


def split(a):
    """Veltkamp split: a == hi + lo with 12/12 significand bits each."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact a * b = p + e via splits (no fma dependency)."""
    if _SUM_GUARD_VAR.get():
        p64 = a.astype(jnp.float64) * b.astype(jnp.float64)   # exact
        p = p64.astype(jnp.float32)
        e = (p64 - p.astype(jnp.float64)).astype(jnp.float32)
        return p, e
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(ah, al, bh, bl):
    """df + df -> df (accurate to ~1e-14 rel; Dekker add)."""
    sh, se = two_sum(ah, bh)
    te = al + bl + se
    return quick_two_sum(sh, te)


def add_f(ah, al, b):
    """df + f32 -> df."""
    sh, se = two_sum(ah, b)
    return quick_two_sum(sh, se + al)


def mul(ah, al, bh, bl):
    """df * df -> df."""
    ph, pe = two_prod(ah, bh)
    pe = pe + ah * bl + al * bh
    return quick_two_sum(ph, pe)


def mul_f(ah, al, b):
    """df * f32 -> df."""
    ph, pe = two_prod(ah, b)
    return quick_two_sum(ph, pe + al * b)


def neg(ah, al):
    return -ah, -al


def sqr(ah, al):
    ph, pe = two_prod(ah, ah)
    return quick_two_sum(ph, pe + 2.0 * ah * al)


def div(ah, al, bh, bl):
    """df / df -> df (one Newton correction on the f32 quotient)."""
    q1 = ah / bh
    # r = a - q1*b in df
    r = add(ah, al, *neg(*mul_f(bh, bl, q1)))
    q2 = r[0] / bh
    return quick_two_sum(q1, q2)


def from_int(i):
    """Exact int32 -> df (|i| may exceed f32's 2^24 integer range)."""
    hi_i = (i >> 12) << 12
    lo_i = i - hi_i
    return two_sum(hi_i.astype(jnp.float32), lo_i.astype(jnp.float32))


def exp(xh, xl):
    """df exp: rel error ~1e-10 over the kernels' clamp range |x|<=80.

    Range-reduce x = k*ln2 + r with |r| <= ln2/2 (k fits f32 exactly:
    |k| <= 116).  Leading series terms (1 + r + r^2/2 + r^3/6) run in df;
    the tail (<= 8e-3 relative) runs as an f32 Horner, so its f32 noise
    lands below 1e-9.  Scaling by 2^k is exact (exponent arithmetic).
    """
    k = jnp.round(xh * _INV_LN2)
    rh, rl = add(xh, xl, *mul_f(-_LN2_H, -_LN2_L, k))
    # tail from r^5 (<= 4.3e-5 rel) in f32: its rounding noise and the
    # truncation after r^9 both land ~1e-11
    r = rh
    r2 = r * r
    tail = (r2 * r2 * r) * (np.float32(1 / 120.) + r * (
        np.float32(1 / 720.) + r * (np.float32(1 / 5040.) + r * (
            np.float32(1 / 40320.) + r * np.float32(1 / 362880.)))))
    # leading: 1 + r + r^2/2 + r^3/6 + r^4/24 in df
    t2 = mul_f(*sqr(rh, rl), np.float32(0.5))      # 0.5 is exact
    t3 = mul(*mul(rh, rl, *t2), *_C13)
    t4 = mul(*sqr(*t2), *_C16)
    s = add(rh, rl, *t2)
    s = add(*s, *t3)
    s = add(*s, *t4)
    s = add_f(*s, np.float32(1.0))
    s = add_f(*s, tail)
    # 2^k exact: bit-assemble the exponent (k in [-127, 127] after clamp)
    kc = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    pow2 = jax_bitcast_pow2(kc)
    return s[0] * pow2, s[1] * pow2


def jax_bitcast_pow2(k):
    """Exact 2^k as f32 from an int32 exponent in [-126, 127]."""
    return jax.lax.bitcast_convert_type(((k + 127) << 23), jnp.float32)


def sincos_turns(turns, resid_h, resid_l, need_sin=True, need_cos=True):
    """df (sin, cos) of ``turns * 2pi/2^32 + resid``.

    Same exact int32-turn quadrant reduction as the f32 kernel
    (pallas_synth._sincos_turns), but the reduced argument and the
    leading polynomial terms are df: |x| <= pi/4 + |resid|, target rel
    error ~1e-10.  Tail terms (x^5 onward for sin, x^6 onward for cos,
    <= 2.5e-3 relative) run in f32.
    """
    q = turns + np.int32(1 << 29)
    quad = (q >> 30) & 3
    r = (q & np.int32(0x3FFFFFFF)) - np.int32(1 << 29)
    # x = r * PHASE + resid in df (r exact via 12-bit split)
    rh_i = (r >> 12) << 12
    rl_i = r - rh_i
    rhf = rh_i.astype(jnp.float32)
    rlf = rl_i.astype(jnp.float32)
    x = add(*mul_f(_PHASE_H, _PHASE_L, rhf), *mul_f(_PHASE_H, _PHASE_L,
                                                    rlf))
    x = add(*x, resid_h, resid_l)
    return _sincos_core(x, quad, need_sin, need_cos)


def _sincos_core(x, quad, need_sin=True, need_cos=True):
    xh, xl = x
    x2 = sqr(xh, xl)
    xf = xh
    x2f = xf * xf
    x4f = x2f * x2f
    x6f = x4f * x2f
    # cos core: 1 - x^2/2 + x^4/24 in df, tail from x^6 (<= 1.8e-4 rel)
    # in f32 through x^12 -- truncation + rounding both ~1e-11
    cos_tail = -x6f * (np.float32(1 / 720.) - x2f * (
        np.float32(1 / 40320.) - x2f * (np.float32(1 / 3628800.)
                                        - x2f * np.float32(
                                            1 / 479001600.))))
    c = add_f(*neg(*mul_f(*x2, np.float32(0.5))), np.float32(1.0))
    c = add(*c, *mul(*sqr(*mul_f(*x2, np.float32(0.5))), *_C16))
    c = add_f(*c, cos_tail)
    # sin core: x - x^3/6 + x^5/120 in df, tail from x^7 (<= 1.8e-5 rel)
    sin_tail = -xf * x6f * (np.float32(1 / 5040.) - x2f * (
        np.float32(1 / 362880.) - x2f * np.float32(1 / 39916800.)))
    x3 = mul(xh, xl, *x2)
    s = add(xh, xl, *neg(*mul(*x3, *_C16)))
    s = add(*s, *mul(*mul(*x3, *x2), *_C120))
    s = add_f(*s, sin_tail)

    swap = (quad & 1) == 1
    out_sin = out_cos = None
    if need_cos:
        csign = jnp.where((quad == 1) | (quad == 2),
                          np.float32(-1.0), np.float32(1.0))
        out_cos = (jnp.where(swap, s[0], c[0]) * csign,
                   jnp.where(swap, s[1], c[1]) * csign)
    if need_sin:
        ssign = jnp.where(quad >= 2, np.float32(-1.0), np.float32(1.0))
        out_sin = (jnp.where(swap, c[0], s[0]) * ssign,
                   jnp.where(swap, c[1], s[1]) * ssign)
    return out_sin, out_cos


def sincos_rad(xh, xl, need_sin=True, need_cos=True):
    """df (sin, cos) of a radian df argument, |x| < ~2^24.

    Reduces by quarter turns: k = round(x * 2/pi); the quadrant is
    k mod 4 and the remainder |x - k*pi/2| <= pi/4 stays df-exact because
    pi/2 is applied as a df constant.
    """
    k = jnp.round(xh * np.float32(2 / np.pi))
    quad = (k.astype(jnp.int32)) & 3
    p_h = np.float32(np.pi / 2)
    p_l = np.float32(np.pi / 2 - float(p_h))
    # third constant term: the 2-term pair leaves ~1.5e-15 * k of pi/2
    # unrepresented, which breaches the 1e-9 contract past k ~ 1e6; the
    # residual correction k * p_ll is tiny, so a single f32 term fixes it
    p_ll = np.float32(np.pi / 2 - float(p_h) - float(p_l))
    ph, pl = mul_f(p_h, p_l, k)
    x = add(xh, xl, -ph, -pl)
    x = add(*x, -p_ll * k, np.float32(0.0))
    return _sincos_core(x, quad, need_sin, need_cos)


# -- erf: three regimes, worst-case 1.8e-12 relative (host df simulation
# over [-7, 7]; tests pin 1e-9 end-to-end vs the f64 oracle) -------------
#
# |x| <  1.25:  erf(x) = x * P(x^2), Taylor with 2/sqrt(pi) folded in --
#               truncation after k=18 is 1.3e-14 relative at the cut;
# |x| in [1.25, 5.9): erf(x) = 1 - exp(-x^2) * G(1/|x|), with G(s) =
#               erfc(1/s) exp(1/s^2) a degree-18 Chebyshev fit on
#               s in [1/5.9, 0.8] (fit residual 1.6e-13 relative,
#               regenerable via scipy: see tests/test_hi_synth.py) --
#               Clenshaw in df, exp via df.exp;
# |x| >= 5.9:   erf(x) = sign(x) exactly (erfc(5.9) = 7.2e-17).
#
# All three branches evaluate on every lane (jnp.where select); the
# Taylor Horner clamps its z = x^2 operand to the cut value so discarded
# lanes stay finite.
_ERF_CUT_LO = np.float32(1.25)
_ERF_CUT_HI = np.float32(5.9)
_ERF_TAY = tuple(_c(v) for v in (
    1.1283791670955126, -0.37612638903183754, 0.11283791670955126,
    -0.026866170645131252, 0.005223977625442188, -0.0008548327023450852,
    0.00012055332981789664, -1.492565035840625e-05, 1.6462114365889246e-06,
    -1.6365844691234924e-07, 1.4807192815879218e-08,
    -1.2290555301717926e-09, 9.422759064650411e-11,
    -6.7113668551641105e-12, 4.4632242632864775e-13,
    -2.7835162072109212e-14, 1.6342614095367152e-15,
    -9.063970842808673e-17, 4.763348040515068e-18))
_ERF_CHEB = tuple(_c(v) for v in (
    0.23985198519720788, 0.13671962529448656, -0.008887045488709378,
    5.609593604678889e-05, 9.860290919264424e-05, -1.7923080011152937e-05,
    1.543146692609241e-06, 7.994156554304595e-08, -5.8135775763389075e-08,
    1.208865942070511e-08, -1.3816659143850888e-09,
    -1.4134664325265994e-11, 5.099808912962864e-11,
    -1.4401981394724294e-11, 2.4430013316507268e-12,
    -1.9904674640126147e-13, -3.428873349278115e-14,
    2.0029633594872294e-14, -5.591362546460717e-15))
_ERF_MAP_M = _c(-0.9694915254237289)       # -(s_lo + s_hi)
_ERF_MAP_R = _c(1.586021505376344)         # 1 / (s_hi - s_lo)


def erf(xh, xl):
    """df erf: rel error <= ~2e-12 over the line (see banner above)."""
    sign = jnp.where(xh < 0, np.float32(-1.0), np.float32(1.0))
    axh = sign * xh
    axl = sign * xl
    zh, zl = sqr(axh, axl)
    # Taylor branch (z clamped so discarded big-|x| lanes stay finite)
    big = zh > np.float32(1.5626)
    zth = jnp.minimum(zh, np.float32(1.5626))
    ztl = jnp.where(big, 0.0, zl)
    ph, pl = _ERF_TAY[-1]
    ph = jnp.full_like(xh, ph)
    pl = jnp.full_like(xh, pl)
    for ch_, cl_ in _ERF_TAY[-2::-1]:
        ph, pl = mul(ph, pl, zth, ztl)
        ph, pl = add_f(*add_f(ph, pl, ch_), cl_)
    th, tl = mul(axh, axl, ph, pl)
    # mid branch: 1 - exp(-z) * G(1/|x|) (|x| clamped >= 1 for dead lanes)
    small = axh < np.float32(1.0)
    dh = jnp.maximum(axh, np.float32(1.0))
    dl = jnp.where(small, 0.0, axl)
    sh_, sl_ = div(jnp.ones_like(xh), jnp.zeros_like(xh), dh, dl)
    uh, ul = mul_f(sh_, sl_, np.float32(2.0))
    uh, ul = add(uh, ul, *_ERF_MAP_M)
    uh, ul = mul(uh, ul, *_ERF_MAP_R)
    b1h = b1l = b2h = b2l = jnp.zeros_like(xh)
    for ch_, cl_ in _ERF_CHEB[:0:-1]:
        wh, wl = mul(uh, ul, b1h, b1l)
        wh, wl = mul_f(wh, wl, np.float32(2.0))
        wh, wl = add(wh, wl, -b2h, -b2l)
        wh, wl = add_f(*add_f(wh, wl, ch_), cl_)
        b2h, b2l = b1h, b1l
        b1h, b1l = wh, wl
    gh, gl = mul(uh, ul, b1h, b1l)
    gh, gl = add(gh, gl, -b2h, -b2l)
    gh, gl = add_f(*add_f(gh, gl, _ERF_CHEB[0][0]), _ERF_CHEB[0][1])
    # exp(-z): z <= CUT_HI^2 = 34.81, inside df.exp's |x| <= 80 range
    zch = jnp.minimum(zh, np.float32(40.0))
    zcl = jnp.where(zh > np.float32(40.0), 0.0, zl)
    eh, el = exp(-zch, -zcl)
    qh, ql = mul(eh, el, gh, gl)
    mh, ml = add_f(*neg(qh, ql), np.float32(1.0))
    use_t = axh < _ERF_CUT_LO
    sat = axh >= _ERF_CUT_HI
    rh = jnp.where(use_t, th, jnp.where(sat, np.float32(1.0), mh))
    rl = jnp.where(use_t, tl, jnp.where(sat, np.float32(0.0), ml))
    return sign * rh, sign * rl

"""IIR filtering on device: associative-scan recurrences instead of C loops.

An IIR filter is a linear recurrence -- sequential in its textbook form (the
reference runs scipy's C ``lfilter``/``sosfilt`` loops, ``/root/reference/
waveforms/waveform.py:199-203``, ``distortion.py:321``).  On TPU the same
recurrence runs in O(log n) depth as a ``jax.lax.associative_scan`` over
affine state maps: each sample contributes an element ``(M, k*x[n])`` of the
monoid ``(M2, v2) . (M1, v1) = (M2 @ M1, M2 @ v1 + v2)`` acting on the
direct-form-II-transposed filter state.  This is the sequence-parallel
formulation: under ``shard_map`` the scan's carry crosses shard boundaries
over ICI collectives.

``sosfilt``/``lfilter`` here match scipy bit-for-bit up to f64 rounding and
accept/return ``zi``/``zf`` for chunked streaming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['sosfilt', 'lfilter', 'filter_zpk', 'iir_apply',
           'predistort_jax']


def _affine_scan_const(M: jax.Array, v: jax.Array) -> jax.Array:
    """s[n] = M @ s[n-1] + v[n] (s[-1] = 0) for a CONSTANT recurrence map.

    Every filter here has a sample-independent M, so at doubling level k
    the scan's operator is the same ``M^(2^k)`` everywhere -- squared once
    per level on the d x d matrix, never materialized per sample.  The
    state sweep is then a weighted prefix sum,

        s_k+1[i] = s_k[i] + M^(2^k) @ s_k[i - 2^k],

    costing O(n d^2 log n) FLOPs through (n, d) arrays: a 2M-sample d=4
    run carries ~64 MB f64 instead of the ~512 MB (n, d, d) sequence the
    general monoid form would (round-2 review finding).
    """
    n, d = v.shape
    s = v
    P = M
    shift = 1
    while shift < n:
        s = s + jnp.concatenate(
            [jnp.zeros((shift, d), dtype=s.dtype), s[:-shift] @ P.T])
        P = P @ P
        shift *= 2
    return s


def _doubling_unstable(M_np: np.ndarray, n: int,
                       limit: float = 1e6) -> bool:
    """Host probe: walk the squarings the doubling scan would perform.

    Clustered near-unit poles (multi-exponential precompensation at
    d >= 3) make the companion matrix highly non-normal: ``M^(2^k)`` has
    a huge transient before decaying, and every squaring amplifies
    rounding error by that transient -- at d = 3 with poles ~1e-4 apart,
    f64 squaring of M^2048 is already wrong in its second digit.  Any
    power-magnitude excursion past ``limit`` routes to the factored
    cascade, whose operators (scalars and normal 2x2 rotations) have
    exactly conditioned powers.
    """
    P = np.asarray(M_np, np.float64)
    shift = 1
    while shift < n:
        if not np.all(np.isfinite(P)) or np.abs(P).max() > limit:
            return True
        P = P @ P
        shift *= 2
    return False


def _ar1_doubling(lam, u: jax.Array) -> jax.Array:
    """Prefix scan of the first-order section s[n] = lam*s[n-1] + u[n].

    Scalar (or complex-scalar) operator powers ``lam^(2^k)`` carry no
    companion-matrix cancellation, so doubling is stable for any
    |lam| <= 1; each level adds true partial sums with coefficients
    bounded by 1.
    """
    s = u
    p = jnp.asarray(lam, u.dtype)
    shift = 1
    n = u.shape[0]
    while shift < n:
        s = s + p * jnp.concatenate(
            [jnp.zeros((shift,), s.dtype), s[:-shift]])
        p = p * p
        shift *= 2
    return s


def filter_zpk(z, p, k, x: jax.Array) -> jax.Array:
    """Numerically stable parallel IIR from the FACTORED (zpk) form.

    H(z) = k * prod (1 - z_i/z) / (1 - p_i/z), applied as a series of
    first-order sections: real poles as real AR1 doubling scans, complex
    pairs as a complex AR1 scan followed by its conjugate (normal
    operators -- perfectly conditioned powers), zeros as 1- or 2-tap FIR
    sections.  Sections are sorted so each pole runs next to the zero
    that nearly cancels it (multi-exponential precompensation pairs a
    pole and zero per decay time), bounding intermediate dynamic range.
    Zero initial state.

    This is THE device path for clustered-pole pre-compensation: keep the
    factored form end-to-end (``exp_decay_filter(..., output='zpk')``) --
    expanding to (b, a) and re-rooting loses ~5 digits at d = 3 because
    the polynomial coefficients are an ill-conditioned encoding of the
    clustered roots, a loss no realization can undo.
    """
    z = np.atleast_1d(np.asarray(z, complex))
    p = np.atleast_1d(np.asarray(p, complex))
    if abs(np.imag(k)) > 1e-12 * max(1.0, abs(k)):
        raise ValueError(f"filter_zpk gain must be real, got {k!r}")
    g = float(np.real(k))

    def split(roots):
        real, cplx, neg = [], [], []
        for r in roots:
            if abs(r.imag) <= 1e-12 * max(1.0, abs(r)):
                real.append(float(r.real))
            elif r.imag > 0:
                cplx.append(complex(r))
            else:
                neg.append(complex(np.conj(r)))
        # a real transfer function needs conjugate symmetry; silently
        # dropping an unpaired root would yield a wrong filter
        key = lambda c: (c.real, c.imag)                     # noqa: E731
        pos_s, neg_s = sorted(cplx, key=key), sorted(neg, key=key)
        if len(pos_s) != len(neg_s) or any(
                abs(a - b) > 1e-9 * max(1.0, abs(a))
                for a, b in zip(pos_s, neg_s)):
            raise ValueError(
                "filter_zpk requires conjugate-symmetric roots (real "
                f"transfer function); got {list(roots)}")
        return real, cplx

    zr, zc = split(z)
    pr, pc = split(p)
    zr.sort(reverse=True)
    pr.sort(reverse=True)
    zc.sort(key=lambda c: -c.real)
    pc.sort(key=lambda c: -c.real)

    def delay(y, k=1):
        return jnp.concatenate([jnp.zeros((k,), y.dtype), y[:-k]])

    y = x * jnp.asarray(g, x.dtype)
    for i in range(max(len(pr), len(zr))):
        if i < len(zr):
            y = y - jnp.asarray(zr[i], y.dtype) * delay(y)
        if i < len(pr):
            y = _ar1_doubling(pr[i], y)
    cdt = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    for i in range(max(len(pc), len(zc))):
        if i < len(zc):
            zeta = zc[i]
            y = (y - np.float64(2 * zeta.real) * delay(y)
                 + np.float64(abs(zeta) ** 2) * delay(y, 2))
        if i < len(pc):
            lam = pc[i]
            yc = _ar1_doubling(lam, y.astype(cdt))
            yc = _ar1_doubling(np.conj(lam), yc)
            y = yc.real.astype(x.dtype)
    return y


def _sequential_filter(bb: np.ndarray, aa: np.ndarray, x: jax.Array,
                       zi0: jax.Array):
    """Direct-form-II-transposed lax.scan: exact scipy semantics including
    zi/zf, O(n) sequential depth.  The correctness fallback when the
    doubling scan is numerically unstable: (b, a) coefficient semantics
    can only be reproduced by direct-form arithmetic (see filter_zpk's
    docstring for why no factored realization can)."""
    b0 = jnp.asarray(bb[0], x.dtype)
    bt = jnp.asarray(bb[1:], x.dtype)
    at = jnp.asarray(aa[1:], x.dtype)

    def step(s, xn):
        yn = b0 * xn + s[0]
        s2 = (jnp.concatenate([s[1:], jnp.zeros((1,), s.dtype)])
              + bt * xn - at * yn)
        return s2, yn

    zf, y = jax.lax.scan(step, zi0, x)
    return y, zf


def _biquad(x: jax.Array, b: jax.Array, a: jax.Array,
            zi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One second-order section (direct form II transposed), parallel-in-n.

    State s = (z0, z1):
        y[n]  = b0 x[n] + z0[n-1]
        z0[n] = b1 x[n] - a1 y[n] + z1[n-1]
        z1[n] = b2 x[n] - a2 y[n]
    which is affine in s with a *constant* M; the scan elements only vary in
    their input-driven offsets.
    """
    b0, b1, b2 = b[0], b[1], b[2]
    a1, a2 = a[1], a[2]
    M = jnp.array([[-a1, 1.0], [-a2, 0.0]], dtype=x.dtype)
    k = jnp.array([b1 - a1 * b0, b2 - a2 * b0], dtype=x.dtype)

    vs = x[:, None] * k[None, :]
    # inject the initial state through the first element
    vs = vs.at[0].add(M @ zi)
    s = _affine_scan_const(M, vs)
    z0_prev = jnp.concatenate([zi[:1], s[:-1, 0]])
    y = b0 * x + z0_prev
    return y, s[-1]


def sosfilt(sos: jax.Array, x: jax.Array, zi: jax.Array | None = None):
    """Cascaded second-order sections, scipy-compatible.

    sos: (n_sections, 6); x: (n,).  With ``zi`` of shape (n_sections, 2),
    returns ``(y, zf)``; without, returns ``y`` (zero initial state).
    """
    # concrete coefficients allow the same stability routing as lfilter:
    # a clustered near-unit double pole makes the doubling scan diverge,
    # so that section runs the sequential fallback instead (traced sos
    # can't be inspected and keeps the parallel path)
    try:
        sos_np = np.asarray(sos, dtype=float)
    except Exception:
        sos_np = None
    sos = jnp.asarray(sos, dtype=x.dtype)
    return_zf = zi is not None
    if zi is None:
        zi = jnp.zeros((sos.shape[0], 2), dtype=x.dtype)
    zf = []
    for k in range(sos.shape[0]):
        if sos_np is not None:
            a_np = sos_np[k, 3:] / sos_np[k, 3]
            M_np = np.array([[-a_np[1], 1.0], [-a_np[2], 0.0]])
            # a DEFECTIVE near-unit section (repeated root at |r| ~ 1,
            # e.g. matched-z of a double pole) grows only linearly --
            # under the norm limit -- yet its non-diagonalizable powers
            # still amplify scan rounding to ~1e-3 over 1e5 samples
            # (measured); catch it by the discriminant
            disc = a_np[1] ** 2 - 4.0 * a_np[2]
            defective = (abs(disc) <= 1e-9 * max(1.0, a_np[1] ** 2)
                         and np.abs(np.roots([1.0, a_np[1], a_np[2]])
                                    ).max() > 1.0 - 1e-4)
            if defective or _doubling_unstable(M_np, x.shape[0]):
                b_np = sos_np[k, :3] / sos_np[k, 3]
                x, z = _sequential_filter(b_np, a_np, x,
                                          jnp.asarray(zi[k],
                                                      dtype=x.dtype))
                zf.append(z)
                continue
        b = sos[k, :3] / sos[k, 3]
        a = sos[k, 3:] / sos[k, 3]
        x, z = _biquad(x, b, a, zi[k])
        zf.append(z)
    if return_zf:
        return x, jnp.stack(zf)
    return x


def lfilter(b, a, x: jax.Array, zi: jax.Array | None = None):
    """General (b, a) IIR via the same parallel affine scan.

    Direct form II transposed with state dimension ``max(len(a), len(b))-1``;
    scipy-compatible ``zi``/``zf``.
    """
    b = np.atleast_1d(np.asarray(b, dtype=float))
    a = np.atleast_1d(np.asarray(a, dtype=float))
    d = max(len(a), len(b)) - 1
    bb = np.zeros(d + 1)
    aa = np.zeros(d + 1)
    bb[:len(b)] = b / a[0]
    aa[:len(a)] = a / a[0]

    return_zf = zi is not None
    if zi is None:
        zi0 = jnp.zeros((d,), dtype=x.dtype)
    else:
        zi0 = jnp.asarray(zi, dtype=x.dtype)

    if d == 0:
        y = bb[0] * x
        return (y, zi0) if return_zf else y

    # s[n] = M s[n-1] + k x[n];  y[n] = b0 x[n] + s0[n-1]
    M = np.zeros((d, d))
    M[:, 0] = -aa[1:]
    M[:-1, 1:] = np.eye(d - 1)
    k = bb[1:] - aa[1:] * bb[0]

    if _doubling_unstable(M, x.shape[0]):
        # Clustered near-unit poles: doubling diverges numerically, and NO
        # factored realization can reproduce (b, a) semantics either --
        # extracting roots from the expanded polynomial is itself
        # ill-conditioned (observed ~4e-5 output error at d=3).  Exact
        # scipy semantics therefore run the direct-form sequential scan;
        # callers who HOLD the factored form (exp_decay_filter produces
        # zpk natively) should use :func:`filter_zpk`, which is both
        # stable and parallel.
        y, zf = _sequential_filter(bb, aa, x, zi0)
        return (y, zf) if return_zf else y

    Mj = jnp.asarray(M, dtype=x.dtype)
    vs = x[:, None] * jnp.asarray(k, dtype=x.dtype)[None, :]
    vs = vs.at[0].add(Mj @ zi0)
    s = _affine_scan_const(Mj, vs)
    s0_prev = jnp.concatenate([zi0[:1], s[:-1, 0]])
    y = bb[0] * x + s0_prev
    return (y, s[-1]) if return_zf else y


def iir_apply(sos: jax.Array, x: jax.Array, initial: float = 0.0):
    """The Waveform.sample() filter contract: subtract/restore a DC level."""
    if initial:
        return sosfilt(sos, x - initial) + initial
    return sosfilt(sos, x)


def predistort_jax(sig: jax.Array, filters=None, ker=None,
                   initial: float = 0.0):
    """Device-side predistortion: cascaded (b, a) filters + FFT kernel.

    Mirrors :func:`waveforms_tpu.distortion.predistort` (steady-state
    ``initial`` handling included) with XLA scan + rfft instead of scipy.
    """
    if filters is not None:
        from ..distortion import _steady_state_zi, combine_filters
        b, a = combine_filters(filters)
        zi = _steady_state_zi(b, a, initial, None, None)
        sig, _ = lfilter(b, a, sig, zi=jnp.asarray(zi, dtype=sig.dtype))
    if ker is None:
        return sig
    from .fft import fft_convolve_centered
    return fft_convolve_centered(sig, jnp.asarray(ker, dtype=sig.dtype))

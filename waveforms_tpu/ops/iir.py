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

__all__ = ['sosfilt', 'lfilter', 'iir_apply', 'predistort_jax']


def _affine_scan(M: jax.Array, v: jax.Array) -> jax.Array:
    """Scan the affine recurrence s[n] = M[n] @ s[n-1] + v[n] (s[-1] = 0).

    M: (n, d, d) static per-sample maps; v: (n, d).  Returns s: (n, d).
    """

    def combine(a, b):
        Ma, va = a
        Mb, vb = b
        return Mb @ Ma, jnp.einsum('...ij,...j->...i', Mb, va) + vb

    _, s = jax.lax.associative_scan(combine, (M, v))
    return s


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

    n = x.shape[0]
    Ms = jnp.broadcast_to(M, (n, 2, 2))
    vs = x[:, None] * k[None, :]
    # inject the initial state through the first element
    vs = vs.at[0].add(M @ zi)
    s = _affine_scan(Ms, vs)
    z0_prev = jnp.concatenate([zi[:1], s[:-1, 0]])
    y = b0 * x + z0_prev
    return y, s[-1]


def sosfilt(sos: jax.Array, x: jax.Array, zi: jax.Array | None = None):
    """Cascaded second-order sections, scipy-compatible.

    sos: (n_sections, 6); x: (n,).  With ``zi`` of shape (n_sections, 2),
    returns ``(y, zf)``; without, returns ``y`` (zero initial state).
    """
    sos = jnp.asarray(sos, dtype=x.dtype)
    return_zf = zi is not None
    if zi is None:
        zi = jnp.zeros((sos.shape[0], 2), dtype=x.dtype)
    zf = []
    for k in range(sos.shape[0]):
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

    Mj = jnp.asarray(M, dtype=x.dtype)
    n = x.shape[0]
    Ms = jnp.broadcast_to(Mj, (n, d, d))
    vs = x[:, None] * jnp.asarray(k, dtype=x.dtype)[None, :]
    vs = vs.at[0].add(Mj @ zi0)
    s = _affine_scan(Ms, vs)
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
        from scipy.signal import lfiltic

        from ..distortion import combine_filters
        b, a = combine_filters(filters)
        zi = lfiltic(b, a, np.full(len(a) - 1, initial),
                     np.full(len(b) - 1, initial))
        sig, _ = lfilter(b, a, sig, zi=jnp.asarray(zi, dtype=sig.dtype))
    if ker is None:
        return sig
    from .fft import fft_convolve_centered
    return fft_convolve_centered(sig, jnp.asarray(ker, dtype=sig.dtype))

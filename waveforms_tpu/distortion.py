"""Transmission-line distortion pre-compensation toolbox (host layer).

Filter *design* (polynomial construction, matched-z transforms, stability
pruning) is tiny host-side math and stays numpy/scipy, mirroring
``/root/reference/waveforms/distortion.py``.  Filter *application* at scale
(IIR over millions of samples, FFT deconvolution) has TPU-resident
implementations in :mod:`waveforms_tpu.ops.iir` and
:mod:`waveforms_tpu.ops.fft`; the scipy paths here are the parity oracles.
"""

from __future__ import annotations

import warnings
from itertools import zip_longest
from typing import Sequence, cast

import numpy as np
from numpy.typing import NDArray
from scipy.fftpack import fft, fftfreq, ifft, ifftshift
from scipy.signal import fftconvolve, lfilter, lfiltic, tf2zpk, zpk2sos, zpk2tf

from .utils.signal import shift  # noqa: F401  (re-export, reference parity)

__all__ = [
    'shift', 'extractKernel', 'zDistortKernel', 'high_pass_filter',
    'exp_decay_filter', 'exp_decay_filter_old', 'reflection_filter',
    'reflection',
    'correct_reflection', 'combine_filters', 'factor_filter', 'stable_filter',
    'predistort', 'distort', 'phase_curve',
]


def extractKernel(sig_in, sig_out, sample_rate, bw=None, skip=0):
    """Deconvolve a measured response: FFT-domain ratio, optional smoothing."""
    corr = fft(sig_in) / fft(sig_out)
    ker = np.real(ifftshift(ifft(corr)))
    if bw is not None and bw < 0.5 * sample_rate:
        k = np.exp(-0.5 * np.linspace(-3.0, 3.0, int(2 * sample_rate / bw))**2)
        ker = np.convolve(ker, k / k.sum(), mode='same')
    return ker[int(skip):len(ker) - int(skip)]


def zDistortKernel(dt: float, params: Sequence[tuple]) -> np.ndarray:
    """Inverse kernel for a sum of single-pole Z-line distortions."""
    t = 3 * np.asarray(params)[:, 0].max()
    omega = 2 * np.pi * fftfreq(int(t / dt) + 1, dt)

    H = 1
    for tau, A in params:
        H += (1j * A * omega * tau) / (1j * omega * tau + 1)

    return cast(NDArray[np.complex128], ifftshift(ifft(1 / H))).real


def high_pass_filter(tau, sample_rate):
    """First-order high-pass (b, a) via the bilinear transform."""
    k = 2.0 * tau * sample_rate
    a = [1.0, (1 - k) / (1 + k)]
    b = [k / (1 + k), -k / (1 + k)]
    return b, a


def exp_decay_filter_old(amp, tau, sample_rate):
    """Legacy single-exponential design (kept for reference API parity).

    H(w) = A / (1 - 1j/(w*tau)); superseded by :func:`exp_decay_filter`.
    """
    alpha = 1 - np.exp(-1 / (abs(sample_rate * tau) * (1 + amp)))

    if amp >= 0:
        k = amp / (1 + amp - alpha)
        a = [(1 - k + k * alpha), -(1 - k) * (1 - alpha)]
    else:
        k = -amp / (1 + amp) / (1 - alpha)
        a = [(1 + k - k * alpha), -(1 + k) * (1 - alpha)]

    b = [1 / a[0], -(1 - alpha) / a[0]]
    a = [1, a[1] / a[0]]
    return b, a


def exp_decay_filter(
    amp: float | Sequence[float],
    tau: float | Sequence[float],
    sample_rate: float,
    inv: bool = False,
    output='ba',
):
    """Multi-exponential-decay IIR filter (or its inverse pre-compensation).

    Step response ``1 - sum_i A_i exp(-t/tau_i)``; continuous-time zeros and
    poles map to Z via the matched-z transform, poles outside the unit circle
    are pruned for stability, and ``inv=True`` swaps zeros and poles to build
    the *pre*-compensation filter.  ``output`` selects 'ba', 'sos', or 'zpk'.
    (cf. /root/reference/waveforms/distortion.py:102-185)
    """
    if isinstance(amp, (int, float, complex)):
        amp = [amp]
        tau = [cast(float, tau)]
    amp = cast(Sequence[float], amp)
    tau = cast(Sequence[float], tau)

    # H(s) numerator/denominator as polynomials in s.
    numerator, denominator = np.poly1d([0.0]), np.poly1d([1.0])
    for i, (A, t) in enumerate(zip(amp, tau)):
        denominator = denominator * np.poly1d([1, -1 / t])
        n = np.poly1d([-A, 0.0])
        for j, t_ in enumerate(tau):
            if j != i:
                n = n * np.poly1d([1, -1 / t_])
        numerator = numerator + n
    numerator = numerator + denominator

    z = cast(NDArray[np.float64], np.exp(-numerator.roots / sample_rate))
    p = np.exp(-1 / (np.asarray(tau) * sample_rate))

    if inv:
        z, p = p, z
    p = p[np.abs(p) < 1]  # stability pruning
    k = cast(float, (np.prod(1 - p) / np.prod(1 - z)).real)

    if output == 'sos':
        return cast(NDArray[np.float64], zpk2sos(z, p, k))
    if output == 'ba':
        return cast(tuple[NDArray[np.float64], NDArray[np.float64]],
                    zpk2tf(z, p, k))
    if output == 'zpk':
        return z, p, k
    raise ValueError(f"Invalid output type: {output}")


def reflection_filter(f, A, tau):
    """Transfer function of an impedance reflection of amplitude A, delay tau."""
    return (1 - A) / (1 - A * np.exp(-2j * np.pi * f * tau))


def reflection(sig, A, tau, sample_rate):
    """Apply a reflection to a sampled signal (FFT domain)."""
    freq = np.fft.fftfreq(len(sig), 1 / sample_rate)
    return np.fft.ifft(np.fft.fft(sig) * reflection_filter(freq, A, tau)).real


def correct_reflection(sig, A, tau, sample_rate=None):
    """Undo a reflection; symbolic on a Waveform, FFT-domain on samples."""
    from .core import Waveform

    if isinstance(sig, Waveform):
        return 1 / (1 - A) * sig - A / (1 - A) * (sig >> tau)
    if sample_rate is not None:
        freq = np.fft.fftfreq(len(sig), 1 / sample_rate)
        return np.fft.ifft(np.fft.fft(sig) /
                           reflection_filter(freq, A, tau)).real
    raise ValueError('sample_rate is not given')


def combine_filters(
    filters: list[tuple[np.ndarray, np.ndarray]]
) -> tuple[np.ndarray, np.ndarray]:
    """Cascade (b, a) filters by polynomial multiplication."""
    b, a = np.poly1d([1.0]), np.poly1d([1.0])
    for b_, a_ in filters:
        b = b * np.poly1d(b_)
        a = a * np.poly1d(a_)
    return b.coeffs, a.coeffs


def factor_filter(b, a):
    """Split a (b, a) filter into first-order sections by root pairing."""
    b, a = np.poly1d(b), np.poly1d(a)
    p = a.roots
    q = b.roots
    b_amp = (b[0] / a[0]) ** (1 / max(len(q), len(p)))
    sections = []
    for a_, b_ in zip_longest(p, q, fillvalue=0):
        sections.append(([b_amp, -b_amp * b_], [1, -a_]))
    return sections


def stable_filter(exp_decay_filters: list, sample_rate: float) -> bool:
    """True iff the cascaded exp-decay filters have all poles inside |z|<1."""
    filters = []
    for amp, tau in exp_decay_filters:
        a, b = cast(tuple[NDArray[np.float64], NDArray[np.float64]],
                    exp_decay_filter(amp, tau, sample_rate))
        filters.append((b, a))
    b, a = combine_filters(filters)
    z, p, k = tf2zpk(b, a)
    return bool(np.all(np.abs(p) < 1))


def predistort(
    sig: np.ndarray,
    filters: list | None = None,
    ker: np.ndarray | None = None,
    initial: float = 0.0,
    initial_x: np.ndarray | None = None,
    initial_y: np.ndarray | None = None,
    zi: np.ndarray | None = None,
    return_zf: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Apply IIR pre-compensation filters and/or an FFT deconvolution kernel.

    Initial conditions are built from steady-state ``initial`` (or explicit
    ``initial_x``/``initial_y`` histories) via ``lfiltic``; ``return_zf``
    yields the final filter state for chunked streaming.
    """
    if filters is not None:
        b, a = combine_filters(filters)
        z, p, k = tf2zpk(b, a)
        if not np.all(np.abs(p) < 1):
            warnings.warn('Warning: filter is unstable')

        if zi is None:
            if initial_x is None:
                initial_x = np.full((len(b) - 1,), initial)
            else:
                initial_x = np.asarray(initial_x)[:len(b) - 1]
            if initial_y is None:
                initial_y = np.full((len(a) - 1,), initial)
            else:
                initial_y = np.asarray(initial_y)[:len(a) - 1]
            zi = lfiltic(b, a, initial_y, initial_x)
        sig, zf = lfilter(b, a, sig, zi=zi)

    if ker is None:
        return (sig, zf) if return_zf else sig

    size = len(sig)
    padded = np.hstack((np.zeros_like(sig), sig, np.zeros_like(sig)))
    start = size + len(ker) // 2
    points = fftconvolve(padded, ker, mode='full')[start:start + size]
    return (points, zf) if return_zf else points


def distort(points, params, sample_rate, initial=0.0):
    """Apply the *forward* exp-decay distortion described by (amp, tau) pairs."""
    filters = []
    for amp, tau in np.asarray(params).reshape(-1, 2):
        b, a = cast(tuple[NDArray[np.float64], NDArray[np.float64]],
                    exp_decay_filter(amp, abs(tau), sample_rate))
        filters.append((b, a))
    return predistort(points, filters, initial=initial)


def phase_curve(t, params, df_dphi, pulse_width, start, wav, sample_rate):
    """Model of a measured phase-vs-delay curve for distortion-parameter fits."""
    lim = max(np.max(np.abs(t)), 20e-6)
    num = round(2 * lim * sample_rate)
    tlist = np.arange(num) / sample_rate - lim
    points = wav(tlist)

    pulse_points = round(pulse_width * sample_rate)
    start_points = round((start + pulse_width) * sample_rate) - 1

    ker = np.hstack(
        [np.ones(pulse_points) / sample_rate, np.zeros(start_points)])

    points = np.convolve(
        2 * np.pi * df_dphi * distort(points, params, sample_rate),
        ker, mode='same')
    return np.interp(t, tlist, points)

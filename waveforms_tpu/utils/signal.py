"""Small host-side signal helpers (sub-sample delay, demodulation matrix).

cf. /root/reference/waveforms/utils.py:35-114.
"""

from __future__ import annotations

from itertools import repeat
from typing import Optional, Sequence

import numpy as np


def shift(signal: np.ndarray, delay: float, dt: float) -> np.ndarray:
    """Delay a sampled signal by an arbitrary (sub-sample) time.

    Fractional part via a 3-tap linear-interpolation kernel, integer part by
    zero-filled roll.
    """
    points = int(delay // dt)
    delta = delay / dt - points

    if delta > 0:
        ker = np.array([0, 1 - delta, delta])
        signal = np.convolve(signal, ker, mode='same')

    if points == 0:
        return signal

    ret = np.zeros_like(signal)
    if points < 0:
        ret[:points] = signal[-points:]
    else:
        ret[points:] = signal[:-points]
    return ret


def getFTMatrix(fList: Sequence[float],
                numOfPoints: int,
                phaseList: Optional[Sequence[float]] = None,
                weight: Optional[np.ndarray] = None,
                sampleRate: float = 1e9) -> np.ndarray:
    """Demodulation matrix projecting a signal frame onto a set of tones.

    Column j is ``weight * exp(-1j*(2*pi*f_j*t + phase_j))``; multiplying a
    ``(shots, numOfPoints)`` signal by it yields per-tone IQ values.

    >>> shots, numOfPoints, sampleRate = 100, 1000, 1e9
    >>> f1, f2 = -12.7e6, 32.8e6
    >>> signal = np.random.randn(shots, numOfPoints)
    >>> e = getFTMatrix([f1, f2], numOfPoints, sampleRate=sampleRate)
    >>> ret = signal @ e
    >>> ret.shape
    (100, 2)
    >>> t = np.arange(numOfPoints) / sampleRate
    >>> signal = 0.8 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.cos(2 * np.pi * f2 * t)
    >>> signal @ e
    array([-0.00766509-0.79518987j,  0.19531432+0.00207068j])
    >>> spec = 2 * np.fft.fft(signal) / numOfPoints
    >>> freq = np.fft.fftfreq(numOfPoints)
    >>> e = getFTMatrix(freq, numOfPoints, sampleRate=1)
    >>> np.allclose(spec, signal @ e)
    True
    """
    e = []
    t = np.linspace(0, numOfPoints / sampleRate, numOfPoints, endpoint=False)
    if weight is None or len(weight) == 0:
        weight = np.full(numOfPoints, 2 / numOfPoints)
    if phaseList is None or len(phaseList) == 0:
        phase_list = np.zeros_like(fList)
    else:
        phase_list = phaseList
    if weight.ndim == 1:
        weight_list = repeat(weight)
    else:
        weight_list = weight
    for f, phase, w in zip(fList, phase_list, weight_list):
        e.append(w * np.exp(-1j * (2 * np.pi * f * t + phase)))
    return np.asarray(e).T

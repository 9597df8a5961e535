"""Symbolic derivative D() against high-accuracy numerical differentiation.

The reference never tests D() directly; here every basis with a derivative
rule is checked by central differences on a smooth interior region.
"""

import numpy as np
import pytest

from waveforms_tpu import (D, chirp, cos, cosh, exp, gaussian, interp,
                           mollifier, poly, sin, sinc, sinh, square, step)
from waveforms_tpu.models.shapes import samplingPoints


def numeric_derivative(wav, t, h=1e-6):
    return (wav(t + h) - wav(t - h)) / (2 * h)


@pytest.mark.parametrize("name,wav,t", [
    ("gaussian", gaussian(4), np.linspace(-1.2, 1.2, 41)),
    ("cos", cos(3.0, 0.7), np.linspace(-1, 1, 41)),
    ("sin", sin(2.0), np.linspace(-1, 1, 41)),
    ("exp", exp(-0.5), np.linspace(-1, 1, 41)),
    ("cosh", cosh(1.1), np.linspace(-1, 1, 41)),
    ("sinh", sinh(0.9), np.linspace(-1, 1, 41)),
    ("poly", poly([1.0, 2.0, -0.3, 0.05]), np.linspace(-1, 1, 41)),
    ("erf-step", step(2.0), np.linspace(-0.8, 0.8, 41)),
    ("chirp-lin", chirp(1, 2, 10, 0.3, 'linear'), np.linspace(1, 9, 41)),
    ("chirp-exp", chirp(1, 2, 10, 0.3, 'exponential'), np.linspace(1, 9, 41)),
    ("chirp-hyp", chirp(1, 2, 10, 0.3, 'hyperbolic'), np.linspace(1, 9, 41)),
    ("sinc", sinc(1.5), np.linspace(0.3, 2.0, 41)),
    ("mollifier", mollifier(4.0), np.linspace(-1.5, 1.5, 41)),
    ("gaussian-d1", gaussian(4, d=1), np.linspace(-1.2, 1.2, 41)),
])
def test_derivative_matches_numeric(name, wav, t):
    dw = D(wav)
    expected = numeric_derivative(wav, t)
    got = dw(t)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_higher_order():
    t = np.linspace(-1, 1, 21)
    w = cos(2.0)
    d2 = D(w, 2)
    np.testing.assert_allclose(d2(t), -4 * np.cos(2 * t), rtol=1e-9)
    assert D(w, 0) is w


def test_interp_derivative():
    x = np.linspace(0, 10, 11)
    y = x**2
    w = samplingPoints(0, 10, y)
    dw = D(w)
    t = np.linspace(1.2, 8.8, 20)
    # derivative of the linear interpolant of x^2 ~ 2x (gradient-based)
    np.testing.assert_allclose(dw(t), 2 * t, atol=1.2)


def test_mixing_drag_correction_reduces_leakage():
    """DRAG correction must suppress spectral weight at the blocked freq."""
    from waveforms_tpu import cosPulse, mixing

    width = 20e-9
    pulse = cosPulse(width)
    # NB: avoid multiples of 1/width -- exact zeros of the Hann spectrum.
    f_block = 225e6
    t = np.linspace(-width, width, 4001)
    dt = t[1] - t[0]

    I0, Q0 = mixing(pulse, freq=0.0)
    I1, Q1 = mixing(pulse, freq=0.0, block_freq=f_block)

    def leakage(I, Q):
        z = I(t) - 1j * Q(t)
        return np.abs(np.sum(z * np.exp(-2j * np.pi * f_block * t)) * dt)

    assert leakage(I1, Q1) < 1e-3 * leakage(I0, Q0)


def test_d_sinc_stable_at_center():
    """D(sinc) is finite everywhere including the removable singularity
    (the earlier pole representation was NaN at the center)."""
    from waveforms_tpu import sinc
    from waveforms_tpu.models.mixing import D

    w = sinc(1.3)
    t = np.linspace(-2, 2, 4001)        # includes exact 0
    v = np.asarray(D(w)(t), float)
    assert np.isfinite(v).all() and v[2000] == 0.0
    num = np.gradient(np.asarray(w(t), float), t)
    assert np.abs(v - num)[100:-100].max() < 1e-5

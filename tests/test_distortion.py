"""Distortion toolbox tests (a coverage gap in the reference: 0%).

Checks the exp-decay IIR design against its defining step response, the
inverse filter as a true inverse, reflections, kernel deconvolution, and
streaming-state continuity.
"""

import numpy as np
import pytest
from scipy.signal import lfilter

from waveforms_tpu import square
from waveforms_tpu.distortion import (combine_filters, correct_reflection,
                                      distort, exp_decay_filter,
                                      extractKernel, factor_filter,
                                      high_pass_filter, predistort,
                                      reflection, stable_filter,
                                      zDistortKernel)
from waveforms_tpu.utils.signal import shift


def test_exp_decay_step_response():
    """Step through the filter ~ 1 - A*exp(-t/tau) (the defining property)."""
    fs = 1e9
    A, tau = 0.1, 50e-9
    b, a = exp_decay_filter(A, tau, fs)
    n = 2000
    u = np.ones(n)
    y = lfilter(b, a, u)
    t = np.arange(n) / fs
    expected = 1 - A * np.exp(-t / tau)
    np.testing.assert_allclose(y[50:], expected[50:], rtol=2e-2)


def test_exp_decay_inverse_roundtrip():
    """Pre-compensation then distortion must reproduce the input."""
    fs = 2e9
    params = [(0.05, 100e-9), (-0.02, 30e-9)]
    fwd = [exp_decay_filter(A, tau, fs) for A, tau in params]
    inv = [exp_decay_filter(A, tau, fs, inv=True) for A, tau in params]

    n = 5000
    sig = np.zeros(n)
    sig[1000:3000] = 1.0
    pre = predistort(sig, inv)
    back = predistort(pre, fwd)
    np.testing.assert_allclose(back, sig, atol=1e-8)


def test_exp_decay_outputs():
    fs = 1e9
    sos = exp_decay_filter(0.1, 50e-9, fs, output='sos')
    assert sos.shape[1] == 6
    z, p, k = exp_decay_filter(0.1, 50e-9, fs, output='zpk')
    assert np.all(np.abs(p) < 1)
    with pytest.raises(ValueError):
        exp_decay_filter(0.1, 50e-9, fs, output='nope')


def test_multi_exponential():
    fs = 2e9
    amp = [0.05, -0.02, 0.01]
    tau = [100e-9, 30e-9, 300e-9]
    b, a = exp_decay_filter(amp, tau, fs)
    n = 4000
    y = lfilter(b, a, np.ones(n))
    t = np.arange(n) / fs
    expected = 1 - sum(A * np.exp(-t / T) for A, T in zip(amp, tau))
    np.testing.assert_allclose(y[100:], expected[100:], rtol=5e-2)


def test_stability_check_and_combine():
    fs = 1e9
    assert stable_filter([(0.1, 50e-9), (-0.05, 20e-9)], fs) in (True, False)
    b, a = combine_filters([exp_decay_filter(0.1, 50e-9, fs),
                            exp_decay_filter(-0.05, 20e-9, fs)])
    assert len(b) == 3 and len(a) == 3
    sections = factor_filter(b, a)
    assert len(sections) == 2


def test_high_pass():
    fs = 1e9
    b, a = high_pass_filter(1e-6, fs)
    # DC is blocked
    y = lfilter(b, a, np.ones(100000))
    assert abs(y[-1]) < 0.1


def test_reflection_roundtrip():
    fs = 2e9
    n = 4096
    sig = np.zeros(n)
    sig[1000:2000] = 1.0
    A, tau = 0.2, 5e-9
    distorted = reflection(sig, A, tau, fs)
    recovered = correct_reflection(distorted, A, tau, fs)
    np.testing.assert_allclose(recovered, sig, atol=1e-9)


def test_correct_reflection_symbolic():
    """On a Waveform the correction is symbolic: (sig - A*(sig>>tau))/(1-A)."""
    wav = square(2e-6)
    A, tau = 0.1, 10e-9
    corrected = correct_reflection(wav, A, tau)
    t = np.linspace(-2e-6, 2e-6, 1001)
    expected = (wav(t) - A * (wav >> tau)(t)) / (1 - A)
    np.testing.assert_allclose(corrected(t), expected, atol=1e-12)


def test_zdistort_kernel_and_extract():
    dt = 0.5e-9
    params = [(50e-9, 0.05)]
    ker = zDistortKernel(dt, params)
    assert np.isfinite(ker).all()

    rng = np.random.default_rng(0)
    sig_in = rng.standard_normal(1024)
    impulse = np.zeros(31)
    impulse[15] = 1.0
    impulse[16] = 0.3
    sig_out = np.convolve(sig_in, impulse, mode='same')
    ker2 = extractKernel(sig_in, sig_out, 2e9)
    assert np.isfinite(ker2).all()


def test_predistort_kernel_path_and_zf():
    fs = 2e9
    filters = [exp_decay_filter(0.05, 100e-9, fs, inv=True)]
    sig = np.zeros(2048)
    sig[500:1500] = 1.0
    ker = np.zeros(17)
    ker[8] = 1.0  # identity kernel

    out1 = predistort(sig, filters)
    out2, zf = predistort(sig, filters, ker=ker, return_zf=True)
    np.testing.assert_allclose(out1, out2, atol=1e-10)
    assert zf.shape[0] == 1

    # streaming: filtering two halves with carried zf == filtering whole
    a, zf = predistort(sig[:1024], filters, return_zf=True)
    b = predistort(sig[1024:], filters, zi=zf)
    np.testing.assert_allclose(np.concatenate([a, b]), out1, atol=1e-12)


def test_distort_and_subsample_shift():
    fs = 2e9
    sig = np.zeros(1000)
    sig[200:800] = 1.0
    out = distort(sig, [0.05, 100e-9], fs)
    assert out.shape == sig.shape

    delayed = shift(sig.astype(float), 2.5e-9, 1 / fs)
    # integer part: 5 samples; fractional part spreads the edge
    assert np.argmax(delayed > 0.5) > np.argmax(sig > 0.5)


def test_phase_curve_model():
    """phase_curve: accumulated phase from integrating the (distorted) flux
    over the probe window; also usable inside scipy.optimize.curve_fit."""
    from waveforms_tpu import square
    from waveforms_tpu.distortion import phase_curve

    fs = 2e9
    df_dphi = 4.3e9
    wav = 0.1 * (square(2e-6) << 1e-6)       # flux step ends at t=0
    delays = np.array([50e-9, 200e-9, 1e-6, 5e-6])

    # no distortion: long after the pulse the phase must vanish, and with
    # a 10 ns probe window the curve is ~flat while the pulse is on
    base = phase_curve(delays, [], df_dphi, 10e-9, 25e-9, wav, fs)
    on = phase_curve(np.array([-1.5e-6, -1.0e-6]), [], df_dphi, 10e-9,
                     25e-9, wav, fs)
    expected_on = 2 * np.pi * df_dphi * 0.1 * 10e-9   # phase per window
    assert abs(on[0] - expected_on) / expected_on < 0.05
    assert np.all(np.abs(base) < 0.05 * expected_on)

    # with an exp-decay distortion the post-pulse tail is nonzero and decays
    tail = phase_curve(delays, [-0.03, 0.5e-6], df_dphi, 10e-9, 25e-9,
                       wav, fs)
    assert abs(tail[0]) > 10 * abs(base[0] - base[0])  # nonzero tail
    assert abs(tail[0]) > abs(tail[2]) > abs(tail[3])  # decaying

    # the model is fit-friendly: recover injected parameters
    from scipy.optimize import curve_fit
    true = [-0.02, 0.3e-6]
    x = np.geomspace(20e-9, 4e-6, 25)
    y = phase_curve(x, true, df_dphi, 10e-9, 25e-9, wav, fs)

    def model(t, amp, tau):
        return phase_curve(t, [amp, tau], df_dphi, 10e-9, 25e-9, wav, fs)

    popt, _ = curve_fit(model, x, y, p0=[-0.03, 0.5e-6])
    assert np.allclose(popt, true, rtol=0.05)


def test_factor_filter_roundtrips():
    """Factoring then recombining reproduces (b, a) including the gain
    (fixed reference bug: poly1d[0] indexed the constant coefficient)."""
    from waveforms_tpu.distortion import (combine_filters,
                                          exp_decay_filter, factor_filter)

    b, a = combine_filters([exp_decay_filter(0.1, 50e-9, 1e9),
                            exp_decay_filter(-0.05, 20e-9, 1e9)])
    br, ar = combine_filters(factor_filter(b, a))
    np.testing.assert_allclose(np.real(np.asarray(br, complex)), b,
                               rtol=1e-12)
    np.testing.assert_allclose(np.real(np.asarray(ar, complex)), a,
                               rtol=1e-12)
    # a zero at the origin must not zero out the whole cascade
    br2, ar2 = combine_filters(factor_filter([2.0, 0.0], [1.0, 0.5]))
    np.testing.assert_allclose(np.real(np.asarray(br2, complex)), [2.0, 0.0],
                               atol=1e-12)


def test_demod_matrix_per_tone_weights():
    """getFTMatrix compatibility includes 2-D (n_tones, n_samples)
    integration weights (round-4 review finding)."""
    from waveforms_tpu.ops.demod import demod_matrix

    fs, n, sr = [-12.7e6, 32.8e6], 500, 1e9
    rng = np.random.default_rng(1)
    w2 = rng.uniform(0.5, 1.5, (2, n))
    m = np.asarray(demod_matrix(fs, n, sr, weight=w2))
    t = np.linspace(0, n / sr, n, endpoint=False)
    for k, f in enumerate(fs):
        want = w2[k] * np.exp(-1j * 2 * np.pi * f * t)
        np.testing.assert_allclose(m[:, k], want.astype(np.complex64),
                                   rtol=2e-6)

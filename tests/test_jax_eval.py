"""XLA evaluator parity vs the numpy float64 oracle (1e-9 relative).

Every basis function, segment layout, complex amplitude path, filter, and
the WaveVStack batch path must agree with the host oracle under x64.
"""

import numpy as np
import pytest

import jax

from waveforms_tpu import (D, WaveVStack, chirp, cos, cosPulse, coshPulse,
                           drag, drag_sin, drag_sinx, exp, gaussian, mixing,
                           mollifier, poly, sin, sinc, square, step, zero)
from waveforms_tpu.models.shapes import samplingPoints
from waveforms_tpu.ops import evaluate, sample_waveform

RTOL = 1e-9
ATOL = 1e-12


def check(wav, t, rtol=RTOL, atol=ATOL):
    oracle = wav(t)
    device = np.asarray(evaluate(wav, t))
    np.testing.assert_allclose(device, oracle, rtol=rtol, atol=atol)


def test_x64_active():
    assert jax.config.jax_enable_x64


@pytest.mark.parametrize("name,wav", [
    ("gaussian", gaussian(4)),
    ("gaussian-plateau", gaussian(4, plateau=2)),
    ("gaussian-d2", gaussian(4, d=2)),
    ("cos", cos(3.0, 0.7)),
    ("square-erf", square(2, edge=0.5)),
    ("square-cos", square(2, edge=0.5, type='cos')),
    ("square-linear", square(2, edge=0.5, type='linear')),
    ("cosPulse", cosPulse(2.0)),
    ("coshPulse", coshPulse(2.0, eps=3.0, plateau=1.0)),
    ("sinc", sinc(1.5)),
    ("exp", exp(-0.3)),
    ("exp-complex", exp(-0.3 + 2j)),
    ("chirp-lin", chirp(1, 2, 10, 0.3, 'linear')),
    ("chirp-exp", chirp(1, 2, 10, 0.3, 'exponential')),
    ("chirp-hyp", chirp(1, 2, 10, 0.3, 'hyperbolic')),
    ("mollifier", mollifier(4.0, d=1)),
    ("poly", poly([1.0, 0.5, -0.25])),
    ("drag", drag(0.5, 2.0, plateau=1.0, delta=0.05, block_freq=1.3,
                  phase=0.2)),
    ("step", step(1.0)),
    ("sum", gaussian(4) + 0.5 * cos(7.0) * square(3)),
    ("derivative", D(gaussian(4) * cos(5.0))),
])
def test_parity_basis(name, wav):
    t = np.linspace(-6, 12, 4001)
    check(wav, t)


def test_parity_multitone_drag():
    t = np.linspace(-10e-9, 50e-9, 2001)
    w1 = drag_sin(0.2e9, 22e-9, plateau=6e-9, delta=3e6,
                  block_freq=(150e6, -80e6), phase=0.1)
    check(w1, t, rtol=1e-9, atol=1e-9)
    w2 = drag_sinx(0.2e9, 22e-9, plateau=6e-9, delta=3e6,
                   block_freq=(150e6, -80e6), phase=0.1, tab=0.5)
    check(w2, t, rtol=1e-9, atol=1e-9)


def test_parity_mixing_demo():
    pulse = cosPulse(20e-9)
    x_wav = zero()
    y_wav = zero()
    for amp, dt, ph in [(0.5, 0, 0), (1.0, 1e-6, np.pi / 2), (0.5, 2e-6, 0)]:
        I, Q = mixing((amp * pulse) >> dt, freq=-20e6, phase=ph,
                      DRAGScaling=0.2)
        x_wav += I
        y_wav += Q
    t = np.linspace(-1e-6, 9e-6, 10001)
    # amplitudes are huge (~2.6e7) so compare relative to scale
    oracle = x_wav(t)
    device = np.asarray(evaluate(x_wav, t))
    np.testing.assert_allclose(device, oracle, rtol=1e-9,
                               atol=1e-9 * np.abs(oracle).max())


def test_parity_clip():
    wav = 2 * gaussian(4)
    wav.max = 1.0
    wav.min = 0.5
    t = np.linspace(-4, 4, 1001)
    check(wav, t)


def test_parity_interp_basis():
    w = samplingPoints(0, 10, np.linspace(0, 10, 11) ** 2)
    t = np.linspace(-1, 11, 500)
    check(w, t)


def test_sample_waveform_with_filters():
    from scipy.signal import butter, tf2sos
    sample_rate = 1000
    b, a = butter(3, 4.0, 'lowpass', fs=sample_rate)

    wav = step(0) * cos(20)
    wav.sample_rate = sample_rate
    wav.start = -1
    wav.stop = 1
    wav.filters = (tf2sos(b, a), 0.0)

    oracle = wav.sample()
    device = np.asarray(sample_waveform(wav))
    np.testing.assert_allclose(device, oracle, rtol=1e-9, atol=1e-12)


def test_sample_waveform_initial_filter():
    from scipy.signal import butter, tf2sos
    sample_rate = 1000
    b, a = butter(2, 8.0, 'highpass', fs=sample_rate)
    wav = step(0) + 1
    wav.sample_rate = sample_rate
    wav.start = -1
    wav.stop = 1
    wav.filters = (tf2sos(b, a), 1.0)
    oracle = wav.sample()
    device = np.asarray(sample_waveform(wav))
    np.testing.assert_allclose(device, oracle, rtol=1e-9, atol=1e-12)


def test_vstack_parity():
    wlist = [cos(1), sin(2), gaussian(3) >> 1, poly([1, -0.5, 0.1])]
    stack = WaveVStack(wlist)
    stack = (stack >> 0.25) + 0.5
    t = np.linspace(-10, 10, 2001)
    oracle = stack(t)
    device = np.asarray(evaluate(stack, t))
    np.testing.assert_allclose(device, oracle, rtol=1e-9, atol=1e-12)


def test_user_function_callback():
    """Unregistered user basis functions run via pure_callback."""
    from waveforms_tpu import function

    wav = function(lambda t, a: np.tanh(a * t), 2.0, start=-1, stop=1)
    t = np.linspace(-2, 2, 401)
    check(wav, t)


def test_compile_cache_hits():
    from waveforms_tpu.ops.jax_eval import compile_waveform
    w1 = gaussian(4) * cos(5.0)
    w2 = gaussian(4) * cos(5.0)
    f1 = compile_waveform(w1.bounds, w1.seq, w1.min, w1.max)
    f2 = compile_waveform(w2.bounds, w2.seq, w2.min, w2.max)
    assert f1 is f2  # structurally equal IR -> same compiled program


def test_complex_user_basis_keeps_imaginary_part():
    """A complex-valued user basis function must keep its imaginary part
    through the pure_callback fallback (round-4 review: forcing t.dtype
    truncated it with only a ComplexWarning)."""
    import jax.numpy as jnp

    from waveforms_tpu import function
    from waveforms_tpu.ops.jax_eval import evaluate

    w = function(lambda t: np.exp(1j * t))
    w.start, w.stop, w.sample_rate = 0.0, 1.0, 100.0
    t = np.linspace(0, 1, 50)
    host = np.asarray(w(t))
    dev = np.asarray(evaluate(w, jnp.asarray(t)))
    assert np.iscomplexobj(dev)
    np.testing.assert_allclose(dev, host.astype(dev.dtype), rtol=2e-6)

"""Oracle tests for the Waveform API against closed-form numpy.

Assertions (and the golden serialization vectors) follow the reference's own
test suite (/root/reference/tests/test_waveform.py) so parity is checked
behavior-for-behavior, plus additional coverage the reference lacks.
"""

import numpy as np
import pytest
from scipy.signal import butter, lfilter, lfiltic, tf2sos

from waveforms_tpu import *
from waveforms_tpu import wave_eval


def test_waveform():
    t = np.linspace(-10, 10, 1001)

    wav = cos(1)
    assert np.allclose(wav(t), np.cos(t), atol=1e-04)

    wav.start = -10
    wav.stop = 10.02
    wav.sample_rate = 50
    assert np.allclose(wav.sample(), np.cos(t), atol=1e-04)

    wav = sin(1)
    assert np.allclose(wav(t), np.sin(t), atol=1e-04)

    width = 2
    wav = gaussian(width)
    std_sq2 = width / (4 * np.sqrt(np.log(2)))
    assert np.allclose(wav(t), np.exp(-(t / std_sq2)**2), atol=5e-03)

    wav = poly([1, -1 / 2, 1 / 6, -1 / 12])
    assert np.allclose(wav(t), np.poly1d([-1 / 12, 1 / 6, -1 / 2, 1])(t))

    sample_rate = 4e9
    width = 20e-9
    time_line = np.linspace(0, width * 100, int(width * 100 * sample_rate))
    wave = square(width) >> (width * 2)
    points = wave(time_line)
    assert isinstance(points, np.ndarray)


def test_tolist():
    pulse = gaussian(10) >> 5
    pulse += gaussian(10) >> 50
    pulse = pulse * cos(200)

    l = pulse.tolist()
    assert l == [
        np.inf, -np.inf, None, None, None, None, 5, -2.5, 0, 12.5, 1, 1.0, 2,
        1, 3, 2, 3.0028060219661246, 5, 1, 3, 4, 200, 0.0, 42.5, 0, 57.5, 1,
        1.0, 2, 1, 3, 2, 3.0028060219661246, 50, 1, 3, 4, 200, 0.0, np.inf, 0
    ]

    assert Waveform.fromlist(l) == pulse


def test_totree():
    pulse = gaussian(10) >> 5
    pulse += gaussian(10) >> 50
    pulse = pulse * cos(200)

    tr = pulse.totree()
    assert tr == ((np.inf, -np.inf, None, None, None, None),
                  ((-2.5, ()), (12.5, ((1.0, ((1, (2, 3.0028060219661246, 5)),
                                              (1, (4, 200, 0.0)))),)),
                   (42.5, ()), (57.5, ((1.0, ((1, (2, 3.0028060219661246,
                                                   50)),
                                              (1, (4, 200, 0.0)))),)),
                   (np.inf, ())))
    assert Waveform.fromtree(tr) == pulse


def test_op():
    t = np.linspace(-10, 10, 1001)

    wav = cos(1) + sin(2)
    assert np.allclose(wav(t), np.cos(t) + np.sin(2 * t))
    wav = cos(1) - sin(2)
    assert np.allclose(wav(t), np.cos(t) - np.sin(2 * t))
    wav = cos(1) * sin(2)
    assert np.allclose(wav(t), np.cos(t) * np.sin(2 * t))
    wav = cos(1) / 2
    assert np.allclose(wav(t), np.cos(t) / 2)


def test_simplify():
    t = np.linspace(-10, 10, 1001)
    wav = cos(1) * sin(2) * cos(3, 4)
    wav2 = wav.simplify()

    assert np.allclose(wav(t), np.cos(t) * np.sin(2 * t) * np.cos(3 * t + 4))
    assert np.allclose(wav2(t), np.cos(t) * np.sin(2 * t) * np.cos(3 * t + 4))


def test_simplify2():
    t = np.linspace(-2, 2, 1001)
    wav = 1j * (cos(9) >> 1) + 1 * (cos(9) >> 2) - 1j * (cos(9) >> 3)
    assert np.allclose(wav(t), wav.simplify()(t))


def test_simplify3():
    t = np.linspace(-2, 2, 1001)
    wav = 2 * (exp(1.01 + 22j)**2 << 1) * exp(1.01 + 22j)
    wav2 = wav.simplify()
    points = 2 * np.exp((1.01 + 22j) * (t + 1))**2 * np.exp((1.01 + 22j) * t)

    assert np.allclose(wav(t), points)
    assert np.allclose(wav2(t), points)


def test_shift():
    t = np.linspace(-10, 10, 1001)
    width = 2
    wav = gaussian(width) >> 3
    std_sq2 = width / (4 * np.sqrt(np.log(2)))
    assert np.allclose(wav(t), np.exp(-((t - 3) / std_sq2)**2), atol=5e-03)


def test_chirp():
    t = np.linspace(0, 10, 1000, endpoint=False)

    def _chirp(t, f0, f1, T, phi0=0, type='linear'):
        if type == 'linear':
            return np.sin(phi0 + 2 * np.pi * ((f1 - f0) /
                                              (2 * T) * t**2 + f0 * t))
        elif type == 'exponential':
            return np.sin(phi0 + 2 * np.pi * f0 * T *
                          ((f1 / f0)**(t / T) - 1) / np.log((f1 / f0)))
        elif type == 'hyperbolic':
            return np.sin(phi0 - 2 * np.pi * f0 * f1 * T /
                          (f1 - f0) * np.log(1 - (f1 - f0) * t / (f1 * T)))
        raise ValueError(type)

    assert np.allclose(chirp(1, 2, 10, 4, 'linear')(t),
                       _chirp(t, 1, 2, 10, 4, 'linear'))
    assert np.allclose(chirp(1, 2, 10, 4, 'exponential')(t),
                       _chirp(t, 1, 2, 10, 4, 'exponential'))
    assert np.allclose(chirp(1, 2, 10, 4, 'hyperbolic')(t),
                       _chirp(t, 1, 2, 10, 4, 'hyperbolic'))


def test_parser():
    assert wave_eval("one()") == one()
    assert wave_eval("zero()") == zero()
    assert wave_eval("pi") == pi
    assert wave_eval("e") == e

    w1 = (gaussian(10) <<
          100) + square(20, edge=5, type='linear') * cos(2 * pi * 23.1)
    w2 = wave_eval(
        "(gaussian(10) << 100) + square(20, edge=5, type='linear') * cos(2*pi*23.1)"
    )
    w3 = wave_eval(
        "((gaussian(10) << 50) + ((square(20, 5, type='linear') * cos(2*pi*23.1)) >> 50)) << 50"
    )
    w4 = wave_eval(
        "(gaussian(10) << 100) + square(20, 5, 'linear') * cos(2*pi*23.1)")
    assert w1 == w2
    assert w1 == w3
    assert w1 == w4

    w1 = poly([1, -1 / 2, 1 / 6, -1 / 12])
    w2 = wave_eval("poly([1, -1/2, 1/6, -1/12])")
    w3 = wave_eval("poly((1, -1/2, 1/6, -1/12))")

    assert w1 == w2
    assert w1 == w3


def test_parser_errors():
    with pytest.raises(SyntaxError):
        wave_eval("x = gaussian(10)")
    with pytest.raises(SyntaxError):
        wave_eval("unknown_fn(1)")
    with pytest.raises(SyntaxError):
        wave_eval("gaussian(10")
    with pytest.raises(SyntaxError):
        wave_eval("gaussian(10) $ 2")


def test_parser_numbers_and_imag():
    assert wave_eval("const(1j)") == const(1j)
    assert wave_eval("const(2.5e-3)") == const(2.5e-3)
    assert wave_eval("2") == const(2)
    # power is left-associative per the grammar: 2**3**2 == (2**3)**2
    assert wave_eval("const(2**3**2)") == const(64)
    assert wave_eval("const(2^3)") == const(8)


def test_filters():
    sample_rate = 1000

    b, a = butter(3, 4.0, 'lowpass', fs=sample_rate)
    init_y = 0
    zi = lfiltic(b, a, [init_y])

    t = np.linspace(-1, 1, 2000, endpoint=False)

    wav = step(0)
    wav.sample_rate = sample_rate
    wav.start = -1
    wav.stop = 1
    wav.filters = (tf2sos(b, a), init_y)

    points = lfilter(b, a, np.heaviside(t, 1), zi=zi)[0]

    assert np.allclose(wav.sample(), points)

    l = wav.tolist()
    wav2 = Waveform.fromlist(l)
    assert np.allclose(wav2.sample(), points)

    d = wav.totree()
    wav3 = Waveform.fromtree(d)
    assert np.allclose(wav3.sample(), points)


def test_chunked_sampling():
    """Chunked streaming must agree with one-shot sampling, filters included."""
    sample_rate = 1000
    b, a = butter(3, 4.0, 'lowpass', fs=sample_rate)

    wav = step(0) * cos(20)
    wav.sample_rate = sample_rate
    wav.start = -1
    wav.stop = 1
    wav.filters = (tf2sos(b, a), 0)

    dense = wav.sample()
    chunks = np.concatenate(list(wav.sample(chunk_size=256)))
    assert len(chunks) == len(dense)
    assert np.allclose(chunks, dense, atol=1e-12)


def test_call_scalar_and_frag():
    wav = gaussian(2) + square(1)
    assert np.isclose(wav(0.0), wav(np.array([0.0]))[0])

    parts = wav(np.linspace(-3, 3, 101), frag=True)
    assert isinstance(parts, list)
    dense = wav(np.linspace(-3, 3, 101))
    out = np.zeros(101)
    for start, stop, part in parts:
        out[start:stop] += part
    assert np.allclose(out, dense)


def test_cut_and_clip():
    t = np.linspace(-5, 5, 1001)
    wav = cut(gaussian(4), start=-1, stop=1)
    vals = wav(t)
    assert np.all(vals[t < -1] == 0)
    assert np.all(vals[t > 1] == 0)

    wav = cut(2 * gaussian(4), max=1.0)
    assert np.max(wav(t)) <= 1.0 + 1e-12


def test_marker_mask_or_and():
    w = square(2)
    m = w.marker
    t = np.linspace(-3, 3, 601)
    # segments are right-open: bounds[i-1] <= t < bounds[i]
    assert np.allclose(m(t), (t >= -1) & (t < 1))

    masked = w.mask(edge=0.5)
    vals = masked(t)
    assert np.all(vals[np.abs(t) < 0.4] == 1)

    a = square(2)
    b = square(2) >> 2
    both = a | b
    assert np.allclose(both(np.array([0.0, 2.0, 10.0])), [1, 1, 0])
    either = a & b
    # overlap is the single shared boundary region
    assert either(np.array([10.0]))[0] == 0


def test_begin_end():
    w = square(2) >> 3
    assert w.begin == 2
    assert w.end == 4
    assert zero().begin == np.inf
    assert zero().end == -np.inf


def test_pow_and_div():
    t = np.linspace(-2, 2, 401)
    w = (gaussian(3) + 1) ** 2
    ref = (gaussian(3)(t) + 1) ** 2
    assert np.allclose(w(t), ref)
    with pytest.raises(TypeError):
        gaussian(3) / gaussian(3)


def test_mixing_demo():
    """The README demo: DRAG-corrected cosPulse pair, numerically sane."""
    pulse = cosPulse(20e-9)
    I, Q = mixing(0.5 * pulse, freq=-20e6, DRAGScaling=0.2)
    t = np.linspace(-1e-6, 9e-6, 10001)
    xi, xq = I(t), Q(t)
    assert xi.shape == t.shape and xq.shape == t.shape
    assert np.max(np.abs(xi)) > 0 and np.max(np.abs(xq)) > 0

    # block_freq branch
    I2, Q2 = mixing(pulse, freq=50e6, block_freq=250e6)
    assert np.max(np.abs(I2(t))) > 0

    # envelope mixing with phase rotates I into Q
    I3, Q3 = mixing(pulse, phase=np.pi / 2)
    assert np.allclose(I3(t), np.cos(-np.pi / 2) * pulse(t), atol=1e-12)


def test_mixing_ssb_oracle():
    """SSB mixing equals the closed-form I/Q rotation."""
    t = np.linspace(-30e-9, 30e-9, 2001)
    pulse = cosPulse(20e-9)
    freq = 25e6
    I, Q = mixing(pulse, freq=freq, phase=0.3, phaseDiff=0.1, ratioIQ=1.2)
    w = 2 * np.pi * freq
    env = pulse(t)
    np.testing.assert_allclose(I(t), env * np.cos(w * t - 0.3), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(
        Q(t), -1.2 * env * np.sin(w * t - 0.3 + 0.1), rtol=1e-9, atol=1e-12)

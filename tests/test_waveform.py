"""Waveform API tests: parametrized closed-form oracles + golden wire pins.

Reference-behavior parity is primarily covered by running the reference's
own suite unmodified (test_reference_suite.py); this file checks the same
surface with independently written assertions -- piecewise closed forms
with explicit support masks and tight tolerances -- plus coverage the
reference suite lacks (chunked sampling, frag mode, cut/clip, markers,
error paths, t(), mixing oracles).
"""

import numpy as np
import pytest
from scipy.signal import butter, sosfilt, tf2sos

from waveforms_tpu import *
from waveforms_tpu import t as t_wave, wave_eval

T = np.linspace(-10, 10, 1001)


# ---------------------------------------------------------------------------
# constructors vs piecewise closed forms

def _support(t, lo, hi):
    return (t >= lo) & (t < hi)   # segments are right-open: [lo, hi)


def _gauss(t, width):
    sigma = width / 3.3302184446307908   # wire-format-pinned width constant
    return np.where(_support(t, -0.75 * width, 0.75 * width),
                    np.exp(-(t / sigma) ** 2), 0.0)


def _cos_pulse(t, width):
    return np.where(_support(t, -width / 2, width / 2),
                    0.5 * (1 + np.cos(2 * np.pi * t / width)), 0.0)


ORACLES = {
    'cos': (lambda: cos(2.0), lambda t: np.cos(2.0 * t)),
    'cos_phase': (lambda: cos(3.0, 0.7), lambda t: np.cos(3.0 * t + 0.7)),
    'sin': (lambda: sin(1.5), lambda t: np.sin(1.5 * t)),
    'gaussian': (lambda: gaussian(2.0), lambda t: _gauss(t, 2.0)),
    'gauss_shift': (lambda: gaussian(2.0) >> 3, lambda t: _gauss(t - 3, 2.0)),
    'cosPulse': (lambda: cosPulse(3.0), lambda t: _cos_pulse(t, 3.0)),
    'poly': (lambda: poly([0.5, -1.0, 0.25]),
             lambda t: 0.5 - t + 0.25 * t * t),
    'sinc': (lambda: sinc(1.2), lambda t: np.sinc(1.2 * t)),
    'square': (lambda: square(2.0), lambda t: 1.0 * _support(t, -1.0, 1.0)),
    't': (lambda: t_wave(), lambda t: t),
    'exp': (lambda: exp(0.3), lambda t: np.exp(0.3 * t)),
}


@pytest.mark.parametrize('name', sorted(ORACLES))
def test_constructor_oracle(name):
    build, closed_form = ORACLES[name]
    np.testing.assert_allclose(build()(T), closed_form(T),
                               rtol=1e-9, atol=1e-12)


def test_sample_grid():
    w = cos(1.0)
    w.start, w.stop, w.sample_rate = -10, 10.02, 50
    grid = np.arange(-10, 10.02, 1 / 50)
    np.testing.assert_allclose(w.sample(), np.cos(grid), rtol=1e-9)


# ---------------------------------------------------------------------------
# operator algebra vs numpy arithmetic

@pytest.mark.parametrize('op', ['add', 'sub', 'mul', 'div', 'pow', 'neg',
                                'radd', 'rsub'])
def test_operator_algebra(op):
    a, fa = gaussian(4.0), lambda t: _gauss(t, 4.0)
    b, fb = cos(2.5, 0.2), lambda t: np.cos(2.5 * t + 0.2)
    pairs = {
        'add': (a + b, lambda t: fa(t) + fb(t)),
        'sub': (a - b, lambda t: fa(t) - fb(t)),
        'mul': (a * b, lambda t: fa(t) * fb(t)),
        'div': (b / 4.0, lambda t: fb(t) / 4.0),
        'pow': ((a + 1.0) ** 3, lambda t: (fa(t) + 1.0) ** 3),
        'neg': (-a, lambda t: -fa(t)),
        'radd': (2.0 + a, lambda t: 2.0 + fa(t)),
        'rsub': (2.0 - a, lambda t: 2.0 - fa(t)),
    }
    wav, closed_form = pairs[op]
    np.testing.assert_allclose(wav(T), closed_form(T), rtol=1e-9, atol=1e-12)


def test_pow_and_div_errors():
    with pytest.raises(TypeError):
        gaussian(3) / gaussian(3)


# ---------------------------------------------------------------------------
# simplify: a numeric no-op on the simplifier's hard paths

SIMPLIFY_CASES = {
    'trig_product': lambda: cos(1.0) * sin(2.0) * cos(3.0, 4.0),
    'phasor_cancel': lambda: (1j * (cos(7.0) >> 1) + (cos(7.0) >> 2)
                              - 1j * (cos(7.0) >> 3)),
    'exp_merge': lambda: 2 * (exp(0.4 + 9j) ** 2 << 1) * exp(0.4 + 9j),
    'cos_power': lambda: cos(2.0) ** 4,
    'gauss_power': lambda: gaussian(6.0) ** 2 * gaussian(6.0),
}


@pytest.mark.parametrize('name', sorted(SIMPLIFY_CASES))
def test_simplify_invariance(name):
    t = np.linspace(-2, 2, 801)
    wav = SIMPLIFY_CASES[name]()
    np.testing.assert_allclose(np.asarray(wav.simplify()(t), complex),
                               np.asarray(wav(t), complex),
                               rtol=1e-8, atol=1e-9)


# ---------------------------------------------------------------------------
# chirps vs their phase integrals

def _chirp_oracle(t, f0, f1, T_, phi0, kind):
    if kind == 'linear':
        phase = 2 * np.pi * (0.5 * (f1 - f0) / T_ * t ** 2 + f0 * t)
    elif kind == 'exponential':
        k = (f1 / f0) ** (1 / T_)
        phase = 2 * np.pi * f0 * (k ** t - 1) / np.log(k)
    else:  # hyperbolic
        phase = -2 * np.pi * f0 * f1 * T_ / (f1 - f0) * np.log(
            1 - (f1 - f0) * t / (f1 * T_))
    return np.sin(phi0 + phase)


@pytest.mark.parametrize('kind', ['linear', 'exponential', 'hyperbolic'])
def test_chirp(kind):
    t = np.linspace(0, 10, 1000, endpoint=False)
    np.testing.assert_allclose(
        chirp(1, 2, 10, 4, kind)(t), _chirp_oracle(t, 1, 2, 10, 4, kind),
        rtol=1e-7, atol=1e-9)


# ---------------------------------------------------------------------------
# wire formats: golden vectors (DATA pins -- byte-for-byte reference parity)

def _golden_pulse():
    p = gaussian(10) >> 5
    p += gaussian(10) >> 50
    return p * cos(200)


GOLDEN_TOLIST = [
    np.inf, -np.inf, None, None, None, None, 5, -2.5, 0, 12.5, 1, 1.0, 2,
    1, 3, 2, 3.0028060219661246, 5, 1, 3, 4, 200, 0.0, 42.5, 0, 57.5, 1,
    1.0, 2, 1, 3, 2, 3.0028060219661246, 50, 1, 3, 4, 200, 0.0, np.inf, 0
]

GOLDEN_TOTREE = (
    (np.inf, -np.inf, None, None, None, None),
    ((-2.5, ()),
     (12.5, ((1.0, ((1, (2, 3.0028060219661246, 5)),
                    (1, (4, 200, 0.0)))),)),
     (42.5, ()),
     (57.5, ((1.0, ((1, (2, 3.0028060219661246, 50)),
                    (1, (4, 200, 0.0)))),)),
     (np.inf, ())))


def test_wire_formats_golden():
    pulse = _golden_pulse()
    assert pulse.tolist() == GOLDEN_TOLIST
    assert pulse.totree() == GOLDEN_TOTREE
    assert Waveform.fromlist(GOLDEN_TOLIST) == pulse
    assert Waveform.fromtree(GOLDEN_TOTREE) == pulse


# ---------------------------------------------------------------------------
# parser

def test_parser_equality():
    assert wave_eval("one()") == one()
    assert wave_eval("zero()") == zero()
    assert wave_eval("pi") == pi
    assert wave_eval("e") == e

    built = (gaussian(8) << 40) + square(12, edge=3,
                                         type='linear') * cos(2 * pi * 7.5)
    # same waveform written three syntactically different ways
    for expr in [
        "(gaussian(8) << 40)"
        " + square(12, edge=3, type='linear') * cos(2*pi*7.5)",
        "((gaussian(8) << 15)"
        " + ((square(12, 3, type='linear') * cos(2*pi*7.5)) >> 25)) << 25",
        "(gaussian(8) << 40) + square(12, 3, 'linear') * cos(2*pi*7.5)",
    ]:
        assert wave_eval(expr) == built

    assert wave_eval("poly([2, 0, -1/3])") == poly([2, 0, -1 / 3])
    assert wave_eval("poly((2, 0, -1/3))") == poly([2, 0, -1 / 3])


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


# ---------------------------------------------------------------------------
# SOS filtering through sample(), incl. wire-format round trips

def test_filters():
    fs = 1000.0
    sos = tf2sos(*butter(3, 4.0, 'lowpass', fs=fs))
    level = 0.5

    wav = level + 0.4 * (square(0.8) >> 0.5)
    wav.start, wav.stop, wav.sample_rate = -1, 1, fs
    wav.filters = (sos, level)

    raw = (level + 0.4 * (square(0.8) >> 0.5))(np.arange(-1, 1, 1 / fs))
    expected = sosfilt(sos, raw - level) + level

    np.testing.assert_allclose(wav.sample(), expected, rtol=1e-12)
    # filters survive both wire formats
    np.testing.assert_allclose(Waveform.fromlist(wav.tolist()).sample(),
                               expected, rtol=1e-12)
    np.testing.assert_allclose(Waveform.fromtree(wav.totree()).sample(),
                               expected, rtol=1e-12)


def test_chunked_sampling():
    """Chunked streaming must agree with one-shot sampling, filters included."""
    fs = 1000.0
    sos = tf2sos(*butter(3, 4.0, 'lowpass', fs=fs))

    wav = step(0) * cos(20)
    wav.start, wav.stop, wav.sample_rate = -1, 1, fs
    wav.filters = (sos, 0)

    dense = wav.sample()
    chunks = np.concatenate(list(wav.sample(chunk_size=256)))
    assert len(chunks) == len(dense)
    assert np.allclose(chunks, dense, atol=1e-12)


# ---------------------------------------------------------------------------
# evaluation modes and misc API

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


def test_mask_spans_multisegment_region():
    """The gate must cover a smoothed square's plateau and fall, not just
    its first (rise) segment -- fixed vs the reference walk."""
    w = square(20, edge=5, type='linear') >> 30   # active on (17.5, 42.5)
    m = w.mask(2)
    assert m.bounds == (15.5, 44.5, np.inf)
    t = np.arange(0.0, 60.0, 0.25)
    np.testing.assert_array_equal(m(t), (t >= 15.5) & (t < 44.5))

    # two pulses closer than 2*edge merge into one gate
    twin = (square(4) >> 10) + (square(4) >> 17)
    assert twin.mask(2).bounds == (6.0, 21.0, np.inf)


def test_begin_end():
    w = square(2) >> 3
    assert w.begin == 2
    assert w.end == 4
    assert zero().begin == np.inf
    assert zero().end == -np.inf


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


def test_cut_head_tail_offsets():
    """head/tail re-level the waveform so the value at the cut edge hits
    the requested level."""
    w = t_wave()                       # f(t) = t
    c1 = cut(w, start=2.0, head=0.0)   # offset by -w(2) = -2
    x = np.array([1.0, 2.5, 4.0])
    np.testing.assert_allclose(c1(x), [0.0, 0.5, 2.0], atol=1e-12)

    c2 = cut(w, stop=3.0, tail=10.0)   # offset by 10 - w(3) = +7
    np.testing.assert_allclose(c2(np.array([0.0, 2.0, 5.0])),
                               [7.0, 9.0, 0.0], atol=1e-12)


def test_mask_negative_edge_collapses_region():
    """A negative edge wider than half the region drops the gate instead
    of emitting inverted (non-monotonic) bounds (round-4 review)."""
    from waveforms_tpu import square

    m = square(2).mask(edge=-2)
    bs = [b for b in m.bounds if np.isfinite(b)]
    assert all(b1 < b2 for b1, b2 in zip(bs, bs[1:]))
    t = np.linspace(-3, 3, 101)
    np.testing.assert_array_equal(np.asarray(m(t)), 0.0)
    # a mild negative edge still shrinks, not drops
    m2 = square(2).mask(edge=-0.5)
    v = np.asarray(m2(t))
    assert v.max() == 1.0 and v[np.abs(t) > 0.5 + 1e-9].max() == 0.0


def test_exp_product_cancellation_keeps_constant():
    """exp factors whose exponents cancel leave the residual constant
    e^{-W}, not 1 (fixed reference bug)."""
    from waveforms_tpu import exp

    t = np.linspace(0, 2, 21)
    for w in ((exp(2) >> 1) * exp(-2),
              (exp(2) >> 1) * exp(-2) * (exp(3) >> 5)):
        d = np.real(np.asarray(w(t)))
        s = np.real(np.asarray(w.simplify()(t)))
        np.testing.assert_allclose(s, d, rtol=1e-12)


def test_chirp_constant_frequency_limit():
    """chirp(f0, f0, T) is the continuous f1 -> f0 limit: the windowed
    constant-frequency tone with the chirp's 2-pi convention (fixed
    reference bug: bare sin(f0, phi0), unwindowed, wrong frequency)."""
    from waveforms_tpu import chirp, coshPulse, general_cosine

    t = np.linspace(-0.5, 1.5, 41)
    for kind in ('linear', 'exponential', 'hyperbolic'):
        near = np.asarray(chirp(1.0, 1.0 + 1e-9, 1.0, type=kind)(t), float)
        degen = np.asarray(chirp(1.0, 1.0, 1.0, type=kind)(t), float)
        assert np.abs(near - degen).max() < 1e-6, kind
    # plateau-only coshPulse degenerates like gaussian
    v = np.asarray(coshPulse(0, plateau=1.0)(np.array([0.0, 0.4, 0.6])),
                   float)
    np.testing.assert_array_equal(v, [1.0, 1.0, 0.0])
    with pytest.raises(ValueError, match='general_cosine'):
        general_cosine(1.0, 0.0, 1.0)


def test_simplify_nonpositive_cos_power():
    """cos**-1 survives simplify() (the reference's binomial expansion
    silently zeroed it); fractional powers don't crash."""
    from waveforms_tpu import cos

    t = np.array([0.1, 0.35])
    w = cos(2.0) ** -1
    np.testing.assert_allclose(np.real(np.asarray(w.simplify()(t))),
                               np.real(np.asarray(w(t))), rtol=1e-12)
    w2 = cos(2.0) ** 0.5
    assert np.isfinite(np.real(np.asarray(w2.simplify()(t)))).all()


def test_wave_eval_fresh_headers():
    """Each wave_eval call returns a fresh header over the cached IR --
    two call sites setting sampling metadata must not interact."""
    from waveforms_tpu import wave_eval

    a = wave_eval('gaussian(10)')
    b = wave_eval('gaussian(10)')
    a.sample_rate = 123.0
    assert b.sample_rate is None and a == b and a.seq is b.seq

"""WaveVStack invariants.

The load-bearing property: a stack must sample identically to the eagerly
merged sum of its components, under every operator.  Wire-format golden
vectors are kept as data pins; reference-test parity itself is covered by
test_reference_suite.py.
"""

import pickle

import numpy as np
import pytest
from scipy.signal import butter, sosfilt, tf2sos

from waveforms_tpu import *
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ir.piecewise import wave_sum

T = np.linspace(-10, 10, 1001)

COMPONENTS = [cos(1), sin(2), gaussian(3), poly([1, -1 / 2, 1 / 6, -1 / 12])]


def _eager_sum(ws):
    acc = zero()
    for w in ws:
        acc = acc + w
    return acc


STACK_OPS = {
    'identity': lambda s: s,
    'add_wave': lambda s: s + sin(2),
    'sub_wave': lambda s: s - sin(2),
    'mul_wave_plus': lambda s: s * sin(2) + 3,
    'div_scalar': lambda s: s / 2,
    'rshift': lambda s: s >> 0.6,
    'lshift': lambda s: s << 1.4,
    'scalar_mul': lambda s: 0.7 * s,
    'radd_scalar': lambda s: 1.5 + s,
    'shift_then_add': lambda s: (s >> 0.5) + gaussian(2),
    'shift_then_mul': lambda s: (s >> 0.5) * cos(3),
    'stack_plus_stack': lambda s: s + (WaveVStack([gaussian(2)]) >> 1),
    'shifted_stacks_same': lambda s: (s >> 0.25) + (
        WaveVStack([gaussian(2)]) >> 0.25),
}


@pytest.mark.parametrize('name', sorted(STACK_OPS))
def test_stack_equals_eager_sum(name):
    op = STACK_OPS[name]
    stacked = op(WaveVStack(COMPONENTS))
    eager = op(_eager_sum(COMPONENTS))
    if isinstance(eager, WaveVStack):
        eager = eager.simplify()
    np.testing.assert_allclose(stacked(T), eager(T), rtol=1e-9, atol=1e-9)


def test_stack_types_and_sample():
    s = WaveVStack(COMPONENTS)
    assert isinstance(s + sin(1), WaveVStack)
    assert isinstance(s >> 1, WaveVStack)
    assert s.simplify() == _eager_sum(COMPONENTS)

    s.start, s.stop, s.sample_rate = -10, 10.02, 50
    np.testing.assert_allclose(s.sample(), _eager_sum(COMPONENTS)(T),
                               rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# wire format: golden vector (DATA pin -- byte-for-byte reference parity)

GOLDEN_TOLIST = [
    None, None, 0, 0, None, None, 4, 1, np.inf, 1, 1.0, 1, 1, 3, 4, 1,
    0.0, 1, np.inf, 1, 1.0, 1, 1, 3, 4, 2, 0.7853981633974483, 3, -2.25,
    0, 2.25, 1, 1.0, 1, 1, 3, 2, 0.9008418065898374, 0, np.inf, 0, 1,
    np.inf, 4, 1, 0, -0.5, 1, 1, 2, 1, 0, 0.16666666666666666, 1, 2, 2,
    1, 0, -0.08333333333333333, 1, 3, 2, 1, 0
]


def test_tolist_golden():
    stack = WaveVStack(COMPONENTS)
    assert stack.tolist() == GOLDEN_TOLIST
    restored = WaveVStack.fromlist(GOLDEN_TOLIST)
    assert isinstance(restored, WaveVStack)
    assert restored.wlist == stack.wlist


# ---------------------------------------------------------------------------
# simplify: incremental consistency with the eager sum

def test_simplify_incremental():
    assert WaveVStack([]).simplify() == zero()

    rng = np.random.default_rng(7)
    eager = zero()
    components = []
    # identical pulses at one carrier comb collapse cleanly...
    for freq in np.linspace(6.1, 6.5, 8) * 1e9:
        p = (square(1e-6) >> 95e-6) * cos(2 * pi * freq)
        eager += p
        components.append(p)
        assert WaveVStack(components).simplify() == eager
    # ...and jittered shifts (distinct bounds) still merge consistently
    for freq in np.linspace(6.6, 6.8, 3) * 1e9:
        p = (square(1e-6) >> (95e-6 + rng.normal() * 1e-9)) * cos(
            2 * pi * freq)
        eager += p
        components.append(p)
        assert WaveVStack(components).simplify() == eager
    # an unbounded component spanning every segment
    eager += cos(2 * pi * 5.9e9)
    components.append(cos(2 * pi * 5.9e9))
    assert WaveVStack(components).simplify() == eager


def test_wave_sum_cancellation_collapses_to_zero():
    """Two constants summing to zero must collapse to the canonical empty
    piecewise form (an IR edge case golden-pinned by the reference)."""
    c = ((((), ()),), (0.02,))
    neg_c = ((((), ()),), (-0.02,))
    parts = [((-1.0, np.inf), (((), ()), c)),
             ((-1.0, np.inf), (((), ()), neg_c))]
    assert wave_sum(parts) == ((np.inf,), (((), ()),))


# ---------------------------------------------------------------------------
# filters + serialization through the stack

def test_filters_through_stack():
    fs = 1000.0
    sos = tf2sos(*butter(3, 4.0, 'lowpass', fs=fs))

    stack = WaveVStack([step(0) << 0.5, -step(0)])
    stack.start, stack.stop, stack.sample_rate = -1, 1, fs
    stack.filters = (sos, 0)

    t = np.arange(-1, 1, 1 / fs)
    raw = np.heaviside(t + 0.5, 1) - np.heaviside(t, 1)
    expected = sosfilt(sos, raw)

    np.testing.assert_allclose(stack.sample(), expected, atol=1e-6)
    np.testing.assert_allclose(WaveVStack.fromlist(stack.tolist()).sample(),
                               expected, atol=1e-6)


def test_pickle_roundtrip():
    wlist = [cos(1), gaussian(3) >> 2]
    w = WaveVStack(wlist)
    w.start, w.stop, w.sample_rate = -5, 5, 100
    w2 = pickle.loads(pickle.dumps(w))
    t = np.linspace(-5, 5, 101)
    assert np.allclose(w(t), w2(t))


def test_shift_survives_stack_arithmetic():
    """Regression: adding to a shifted stack must not silently drop the
    shift (the reference zeroes it, waveform.py:776-795)."""
    t = np.linspace(0, 20, 401)
    base = WaveVStack([gaussian(2)]) >> 5

    got = (base + gaussian(2)) (t)
    want = (gaussian(2) >> 5)(t) + gaussian(2)(t)
    np.testing.assert_allclose(got, want, atol=1e-12)

    got2 = (base + (WaveVStack([square(2)]) >> 5))(t)
    want2 = (gaussian(2) >> 5)(t) + (square(2) >> 5)(t)
    np.testing.assert_allclose(got2, want2, atol=1e-12)

    got3 = (base * cos(3))(t)
    want3 = ((gaussian(2) >> 5) * cos(3))(t)
    np.testing.assert_allclose(got3, want3, atol=1e-12)


def test_wave_sum_leading_segments():
    """Both operands' leading segments contribute left of the first bound
    (fixed reference bug; simplify must agree with direct evaluation)."""
    from waveforms_tpu import const, square

    st = WaveVStack([const(1) + (square(2) >> 1), const(2) + (square(2) >> 5)])
    t = np.linspace(-5, 10, 301)
    d = np.asarray(st(t), float)
    s = np.asarray(st.simplify()(t), float)
    np.testing.assert_allclose(s, d, atol=1e-12)
    assert d[0] == 3.0          # 1 + 2 left of every pulse


def test_empty_stack_simplify_keeps_offset():
    """An empty stack with a DC offset keeps its value through
    simplify() (fixed reference bug: bare zero() dropped it)."""
    s = WaveVStack([]) + 5.0
    s.start, s.stop, s.sample_rate = 0.0, 1.0, 10.0
    t = np.array([0.0, 0.5])
    np.testing.assert_allclose(np.asarray(s.simplify()(t), float), 5.0)
    m = s.simplify()
    assert m.start == 0.0 and m.sample_rate == 10.0


def test_stack_bounds_access_raises_helpfully():
    from waveforms_tpu import square

    s = WaveVStack([square(1)])
    with pytest.raises(AttributeError, match='simplify'):
        s | 1
    with pytest.raises(AttributeError, match='simplify'):
        WaveVStack([s])

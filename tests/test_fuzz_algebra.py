"""Randomized property tests over the IR algebra.

For seeded random expression trees built from the public constructors:
* algebraic evaluation is consistent (`(a+b)(t) == a(t)+b(t)`, etc.),
* ``simplify()`` is numerically invariant,
* flat-list and tree serializations round-trip to equal waveforms,
* the descriptor engines agree with the oracle.
"""

import numpy as np
import pytest

from waveforms_tpu import (Waveform, cos, cosPulse, gaussian, sin, square,
                           zero)


def random_leaf(rng):
    kind = rng.integers(0, 5)
    if kind == 0:
        return gaussian(rng.uniform(0.5, 3.0)) >> rng.uniform(-2, 2)
    if kind == 1:
        return cos(rng.uniform(0.5, 20.0), rng.uniform(0, 6.28))
    if kind == 2:
        return sin(rng.uniform(0.5, 20.0)) * rng.uniform(-2, 2)
    if kind == 3:
        return square(rng.uniform(0.5, 2.0),
                      edge=rng.uniform(0, 0.3)) >> rng.uniform(-2, 2)
    return cosPulse(rng.uniform(0.5, 2.0)) >> rng.uniform(-2, 2)


def random_tree(rng, depth):
    if depth == 0:
        return random_leaf(rng)
    a = random_tree(rng, depth - 1)
    b = random_tree(rng, depth - 1)
    op = rng.integers(0, 4)
    if op == 0:
        return a + b
    if op == 1:
        return a - b
    if op == 2:
        return a * b
    return (a + b) >> rng.uniform(-1, 1)


@pytest.mark.parametrize("seed", range(12))
def test_random_expression_properties(seed):
    rng = np.random.default_rng(seed)
    t = np.linspace(-4, 4, 801)

    a = random_tree(rng, 2)
    b = random_tree(rng, 1)

    # operator consistency against numpy arithmetic
    np.testing.assert_allclose((a + b)(t), a(t) + b(t), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose((a * b)(t), a(t) * b(t), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose((a - b)(t), a(t) - b(t), rtol=1e-9,
                               atol=1e-12)
    sft = float(rng.uniform(-1, 1))
    np.testing.assert_allclose((a >> sft)(t), a(t - sft), rtol=1e-9,
                               atol=1e-12)

    # simplify invariance
    scale = max(np.abs(a(t)).max(), 1e-9)
    np.testing.assert_allclose(a.simplify()(t), a(t), rtol=1e-7,
                               atol=1e-9 * scale)

    # serialization round trips (values, not just equality)
    w2 = Waveform.fromlist(a.tolist())
    np.testing.assert_array_equal(w2(t), a(t))
    w3 = Waveform.fromtree(a.totree())
    np.testing.assert_array_equal(w3(t), a(t))


@pytest.mark.parametrize("seed", range(6))
def test_random_expression_engines_agree(seed):
    from waveforms_tpu.engine import synthesize
    rng = np.random.default_rng(100 + seed)
    w = random_tree(rng, 2)
    start, stop, fs = -4.0, 4.0, 100.0
    t = np.arange(start, stop, 1 / fs)
    oracle = np.real(w(t))
    scale = max(np.abs(oracle).max(), 1e-9)
    for eng, tol in [('xla', 1e-9), ('native', 1e-5), ('pallas', 1e-4)]:
        got = np.asarray(synthesize([w], start, stop, fs, engine=eng))[0]
        np.testing.assert_allclose(
            got, oracle, rtol=tol, atol=tol * scale,
            err_msg=f"engine {eng} seed {seed}")


def test_mul_commutes_and_cancels():
    """Multi-term products are canonical: mul(x, y) == mul(y, x)
    structurally, and exact cancellation collapses to ZERO (fixed
    reference bug: the cartesian-product insert reused add's
    ascending-window search)."""
    import itertools

    from waveforms_tpu import cos, exp, gaussian, sin
    from waveforms_tpu.ir import algebra as A

    w1 = (gaussian(1) + cos(3) + 0.5 * sin(7)).simplify()
    w2 = (cos(5) + 2.0 * gaussian(2) + exp(-1)).simplify()
    ex = [s for s in w1.seq + w2.seq if len(s[0]) >= 2]
    assert len(ex) >= 2
    for a, b in itertools.product(ex, ex):
        m1, m2 = A.mul(a, b), A.mul(b, a)
        assert list(m1[0]) == sorted(m1[0])
        assert m1 == m2
        assert A.add(m1, A.mul(A.const(-1.0), m2)) == A.ZERO

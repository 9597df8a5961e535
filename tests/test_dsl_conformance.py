"""Grammar-conformance corpus for the expression DSL.

Pins the hand-written parser (waveforms_tpu/dsl/parser.py) to the
reference's ANTLR grammar (/root/reference/waveforms/Waveform.g4) without
any generated code: every construct and precedence rule the grammar
defines appears here as (expression, explicitly-parenthesized equivalent)
pairs plus literal-IR pins, so a parser change that drifts from the
grammar fails loudly.

Grammar facts encoded below (g4 alternatives, top = tightest):

    1. ``**``/``^``   power, LEFT-associative (ANTLR default)
    2. ``*`` ``/``    multiplicative
    3. ``+`` ``-``    additive
    4. ``<<`` ``>>``  time shift (loosest binary)
    5. unary minus is listed after the binaries => binds WEAKER than all
       of them ("-a + b" == "-(a + b)")
    6. calls: f(), f(args), f(kwargs), f(args, kwargs)
    7. lists ``[...]``; tuples need >= 2 items or a trailing comma
    8. NUMBER: int / real / scientific / imaginary ('j' suffix)
    9. STRING: single or double quotes; CONSTANT: pi, e, inf
   10. assignment ("x = ...") is a parse error at evaluation
"""

import numpy as np
import pytest

from waveforms_tpu import *
from waveforms_tpu import wave_eval

T = np.linspace(-4, 4, 201)


# (expression, fully-parenthesized equivalent) -- equal parse results
PRECEDENCE_PAIRS = [
    # power binds tighter than multiply
    ("2 * gaussian(2) ** 2",      "2 * (gaussian(2) ** 2)"),
    ("gaussian(2) ^ 2 * 3",       "(gaussian(2) ** 2) * 3"),
    # power is left-associative
    ("const(2 ** 3 ** 2)",        "const((2 ** 3) ** 2)"),
    # multiply binds tighter than add
    ("one() + gaussian(2) * 3",   "one() + (gaussian(2) * 3)"),
    ("gaussian(2) * 3 - one()",   "(gaussian(2) * 3) - one()"),
    # divide groups left with multiply
    ("const(8 / 2 * 2)",          "const((8 / 2) * 2)"),
    # shift is the loosest binary operator
    ("gaussian(2) + one() >> 1",  "(gaussian(2) + one()) >> 1"),
    ("gaussian(2) * 2 << 1",      "(gaussian(2) * 2) << 1"),
    ("gaussian(2) >> 1 + 2",      "gaussian(2) >> (1 + 2)"),
    # unary minus binds weaker than every binary
    ("-gaussian(2) + one()",      "-(gaussian(2) + one())"),
    ("-gaussian(2) * 2",          "-(gaussian(2) * 2)"),
    ("-gaussian(2) >> 1",         "-(gaussian(2) >> 1)"),
    # parentheses override
    ("(-gaussian(2)) + one()",    "one() - gaussian(2)"),
]


@pytest.mark.parametrize("expr,paren", PRECEDENCE_PAIRS)
def test_precedence(expr, paren):
    a, b = wave_eval(expr), wave_eval(paren)
    assert a == b, (expr, paren)
    np.testing.assert_allclose(np.asarray(a(T), complex),
                               np.asarray(b(T), complex), atol=1e-12)


# expression -> builder using the Python API (call-form conformance)
CALL_FORMS = [
    ("zero()", lambda: zero()),
    ("one()", lambda: one()),
    ("gaussian(2)", lambda: gaussian(2)),
    ("square(2, 0.5, 'linear')", lambda: square(2, 0.5, 'linear')),
    ('square(2, 0.5, "linear")', lambda: square(2, 0.5, 'linear')),
    ("square(2, edge=0.5, type='cos')",
     lambda: square(2, edge=0.5, type='cos')),
    ("square(2, 0.5, type='cos')", lambda: square(2, 0.5, type='cos')),
    ("poly([1, -1/2, 1/6])", lambda: poly([1, -1 / 2, 1 / 6])),
    ("poly((1, -1/2, 1/6))", lambda: poly((1, -1 / 2, 1 / 6))),
    ("poly((2,))", lambda: poly((2,))),              # 1-tuple, trailing comma
    ("poly([])", lambda: zero()),     # empty list; zero polynomial
    ("cos(2*pi*0.3)", lambda: cos(2 * pi * 0.3)),
    ("const(e)", lambda: const(e)),
    ("cut(2*gaussian(2), max=1.5, min=-inf)",
     lambda: cut(2 * gaussian(2), max=1.5, min=-np.inf)),
    ("const(1j)", lambda: const(1j)),
    ("const(2.5e-3j)", lambda: const(2.5e-3j)),
    ("const(.5)", lambda: const(0.5)),
    ("const(3e2)", lambda: const(300.0)),
    ("2", lambda: const(2)),
]


@pytest.mark.parametrize("expr,build", CALL_FORMS,
                         ids=[e for e, _ in CALL_FORMS])
def test_call_forms(expr, build):
    assert wave_eval(expr) == build(), expr


# absolute IR pins: expression -> exact (bounds, seq) tuples.  These hold
# independently of the Python constructors, so they catch constructor and
# parser drift together.
IR_PINS = [
    ("zero()", (np.inf,), (((), ()),)),
    ("one()", (np.inf,), (((((), ()),), (1.0,)),)),
    ("const(2) * const(3)", (np.inf,), (((((), ()),), (6.0,)),)),
    # gaussian(10) >> 5: GAUSSIAN basis id 2, arg = width-constant, shift 5
    ("gaussian(10) >> 5", (-2.5, 12.5, np.inf),
     (((), ()),
      (((((2, 3.0028060219661246, 5),), (1,)),), (1.0,)),
      ((), ()))),
    # cos(200): COS basis id 4, freq 200, phase->shift 0
    ("cos(200)", (np.inf,),
     (((((((4, 200, 0.0),), (1,)),), (1.0,))),)),
]


@pytest.mark.parametrize("expr,bounds,seq", IR_PINS,
                         ids=[e for e, _, _ in IR_PINS])
def test_ir_pins(expr, bounds, seq):
    w = wave_eval(expr)
    assert w.bounds == bounds, w.bounds
    assert w.seq == seq, w.seq


def test_grammar_errors():
    for bad in ["x = gaussian(10)",        # assignment
                "gaussian(10",             # unbalanced paren
                "gaussian(10) $ 2",        # unknown operator
                "nosuch(1)",               # unknown function
                "import os",               # identifiers aren't values
                "()"]:                     # empty tuple isn't in the grammar
        with pytest.raises(SyntaxError):
            wave_eval(bad)


def test_whitelist_rejects_module_attributes():
    """Only the explicit 31-name whitelist resolves: callables reachable
    as *attributes* of the constructor modules (imported helpers, numpy,
    registered internals) must not be callable from expressions
    (reference parity: waveform_parser.py:30-36)."""
    for bad in ["cast(1, 2)",              # typing.cast via core import
                "np([1])",                 # module alias
                "play(one())",             # public API but not grammar
                "Waveform()",              # class, not whitelisted
                "lower_schedule()",        # internals must stay internal
                "function(1)",             # registers arbitrary callables
                "freeze([1])"]:
        with pytest.raises(SyntaxError, match="Unknown function|Failed"):
            wave_eval(bad)
    # the two post-grammar additions stay resolvable
    from waveforms_tpu.dsl.parser import _resolve_function
    assert callable(_resolve_function('slepian'))
    assert wave_eval("drag_sin(100.0, 1e-2)") is not None


def test_whitelist_D_and_mixing_resolve():
    """Regression: the models/__init__ re-export of `mixing` shadows the
    submodule, which used to make 'D' and 'mixing' (both in the reference
    grammar whitelist) unresolvable from expressions."""
    from waveforms_tpu import D, gaussian
    from waveforms_tpu.dsl.parser import _resolve_function
    from waveforms_tpu.models.mixing import mixing as mixing_fn

    assert _resolve_function('mixing') is mixing_fn
    d = wave_eval("D(gaussian(1e-07))")
    t = np.linspace(-1e-7, 1e-7, 101)
    np.testing.assert_allclose(np.asarray(d(t)),
                               np.asarray(D(gaussian(1e-7))(t)), atol=1e-6)
    # a top-level mixing() call returns a TUPLE; the reference's visitor
    # fails on it identically (waveform_parser.py:286) -- parity
    with pytest.raises(SyntaxError):
        wave_eval("mixing(cosPulse(2e-08), freq=-2e8)")

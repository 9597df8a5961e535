"""Physics property test for multi-tone DRAG.

A multi-tone DRAG pulse is *defined* by its spectral notches: projecting the
complex drive I - jQ onto a fine frequency comb centered on each blocked
transition must put the spectral minimum exactly on the center bin.  The
same property the reference's suite checks (run unmodified via
test_reference_suite.py); here with deterministic blocking combs and a
shared projection helper.
"""

import numpy as np
import pytest

from waveforms_tpu.models.multy_drag import drag_sin, drag_sinx

CARRIER = 5e9
WIDTH = 22.22e-9
DELTA = -13.7e6

# deterministic blocking-frequency sets (Hz, relative to the carrier)
BLOCKS = {
    'multi': (35e6, 128e6, -52e6, -97e6),
    'pair': (64e6, -64e6),
    'single': 83e6,
}


def _drive(builder, block_freq, **kw):
    """Complex drive I - jQ for one blocking configuration."""
    I = builder(CARRIER, WIDTH, 0, DELTA, block_freq, 0, 0, **kw)
    Q = builder(CARRIER, WIDTH, 0, DELTA, block_freq, -np.pi / 2, 0, **kw)
    return I - 1j * Q


def _notch_centered(wav, block):
    """True iff the spectral minimum of wav around CARRIER+block is the
    center bin of a 21-point, +-20 kHz comb."""
    t = np.linspace(-10 * WIDTH, 11 * WIDTH, 500001)
    comb = CARRIER + block + np.linspace(-0.02e6, 0.02e6, 21)
    proj = wav(t) @ np.exp(-2j * np.pi * np.outer(t, comb))
    return int(np.argmin(np.abs(proj))) == 10


@pytest.mark.parametrize('blocks', sorted(BLOCKS))
@pytest.mark.parametrize('kind', ['sin', 'sinx'])
def test_blocked_transitions_are_notched(kind, blocks):
    builder = drag_sin if kind == 'sin' else drag_sinx
    kw = {'tab': 0.55} if kind == 'sinx' else {}
    block_freq = BLOCKS[blocks]
    wav = _drive(builder, block_freq, **kw)
    for b in np.atleast_1d(block_freq):
        assert _notch_centered(wav, b), (kind, blocks, b)


def test_drag_sin_plateau_serialization():
    w = drag_sin(5e9, 20e-9, plateau=10e-9, delta=1e6,
                 block_freq=(100e6,), phase=0.1)
    # round-trips through the flat-list wire format
    from waveforms_tpu import Waveform
    l = w.tolist()
    w2 = Waveform.fromlist(l)
    t = np.linspace(0, 40e-9, 2001)
    assert np.allclose(w(t), w2(t))


def test_blocking_guards():
    """block_freq == delta raises eagerly (silent NaNs before); real
    scalars of any type normalize."""
    from waveforms_tpu import drag_sin

    with pytest.raises(ValueError, match='diverges'):
        drag_sin(5.0, 10.0, delta=0.1, block_freq=(0.1,))
    v = drag_sin(5.0, 10.0, block_freq=6)      # int scalar
    t = np.linspace(0, 10, 11)
    assert np.isfinite(np.asarray(v(t), float)).all()

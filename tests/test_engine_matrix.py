"""Systematic completeness matrix: every pulse constructor through every
engine.

The fuzz suites cover random COMBINATIONS; this file pins the full
constructor inventory (SURVEY.md section 2.2 row 13 + multi-tone DRAG)
one-by-one against the float64 oracle on each execution engine, so a
regression in any (basis, engine) pair names itself.
"""

import numpy as np
import pytest

import waveforms_tpu as wt
from waveforms_tpu.engine import synthesize

FS = 1e9
SPAN = 4.096e-6

# (name, waveform builder) -- every public constructor with analytic
# support inside the window
CASES = [
    ('gaussian', lambda: wt.gaussian(300e-9) >> 1e-6),
    ('gaussian_plateau', lambda: wt.gaussian(200e-9, plateau=150e-9)
     >> 1e-6),
    ('cosPulse', lambda: wt.cosPulse(200e-9) >> 1e-6),
    ('hanning', lambda: wt.hanning(200e-9, plateau=100e-9) >> 1e-6),
    ('coshPulse', lambda: wt.coshPulse(200e-9, eps=3.0) >> 1e-6),
    ('square_erf', lambda: wt.square(300e-9, edge=40e-9) >> 1e-6),
    ('square_cos', lambda: wt.square(300e-9, edge=40e-9, type='cos')
     >> 1e-6),
    ('square_linear', lambda: wt.square(300e-9, edge=40e-9, type='linear')
     >> 1e-6),
    ('step', lambda: (wt.step(50e-9) >> 1e-6) * wt.square(2e-6) >> 1e-6),
    ('sign_windowed', lambda: wt.sign() * (wt.square(400e-9) >> 1e-6)),
    ('cos', lambda: wt.cos(2 * np.pi * 97.3e6, 0.4)),
    ('sin', lambda: wt.sin(2 * np.pi * 53.1e6)),
    ('exp_windowed', lambda: wt.exp(-4e6) * (wt.square(1e-6) >> 1e-6)),
    ('sinc', lambda: wt.sinc(40e6) >> 2e-6),
    ('cosh_windowed', lambda: wt.cosh(2e6) * (wt.square(1e-6) >> 1e-6)),
    ('sinh_windowed', lambda: wt.sinh(2e6) * (wt.square(1e-6) >> 1e-6)),
    ('mollifier', lambda: wt.mollifier(300e-9, d=2) >> 1e-6),
    ('poly_windowed', lambda: (wt.poly([0.2, 1e6, -3e11])
                               * wt.square(1e-6)) >> 1e-6),
    ('drag', lambda: wt.drag(80e6, 150e-9, plateau=100e-9, delta=3e6,
                             block_freq=210e6, phase=0.7, t0=10e-9)
     >> 1e-6),
    ('drag_sin', lambda: wt.drag_sin(90e6, 60e-9, plateau=30e-9,
                                     delta=2e6, block_freq=(260e6,),
                                     phase=0.3) >> 1e-6),
    ('drag_sinx', lambda: wt.drag_sinx(90e6, 60e-9, plateau=30e-9,
                                       delta=2e6, block_freq=(260e6,),
                                       phase=0.3) >> 1e-6),
    ('chirp_linear', lambda: wt.chirp(5e6, 60e6, 1.5e-6, 0.2, 'linear')
     >> 0.5e-6),
    ('chirp_exp', lambda: wt.chirp(5e6, 60e6, 1.5e-6, 0.2, 'exponential')
     >> 0.5e-6),
    ('chirp_hyp', lambda: wt.chirp(5e6, 60e6, 1.5e-6, 0.2, 'hyperbolic')
     >> 0.5e-6),
    ('interp', lambda: wt.interp(np.linspace(1e-6, 2e-6, 9),
                                 [0, .5, 1, .3, -.4, .8, .2, -.1, 0])),
    ('samplingPoints', lambda: wt.samplingPoints(
        1e-6, 2e-6, np.sin(np.linspace(0, 9, 64)))),
    ('cut', lambda: wt.cut(2.0 * (wt.gaussian(400e-9) >> 1e-6), max=1.2,
                           min=-0.5)),
    ('t_windowed', lambda: (wt.t() * 1e6) * (wt.square(1e-6) >> 1e-6)),
    ('general_cosine', lambda: wt.general_cosine(
        400e-9, 0.35875, 0.48829, 0.14128, 0.01168) >> 1e-6),
    ('slepian', lambda: wt.slepian(400e-9, 0.5, 0.3, 0.15) >> 1e-6),
    ('mixing_I', lambda: wt.mixing(0.5 * wt.cosPulse(200e-9) >> 1e-6,
                                   freq=-70e6, DRAGScaling=1e-9)[0]),
    ('D_gaussian', lambda: wt.D(wt.gaussian(300e-9) >> 1e-6) * 1e-7),
]

ENGINES = ['xla', 'native', 'pallas-dense', 'pallas-sparse']


@pytest.mark.parametrize('engine', ENGINES)
@pytest.mark.parametrize('name,build', CASES, ids=[n for n, _ in CASES])
def test_constructor_engine_matrix(name, build, engine):
    if engine == 'native':
        from waveforms_tpu import native
        if not native.available():
            pytest.skip('no toolchain')
    w = build()
    t = np.arange(0, SPAN, 1 / FS)
    oracle = np.asarray(w(t), float)
    scale = max(np.abs(oracle).max(), 1e-30)
    try:
        out = np.asarray(synthesize([w], 0, SPAN, FS, engine=engine))[0]
    except Exception as exc:
        from waveforms_tpu.ops.lowering import UnsupportedFactor
        if isinstance(exc, UnsupportedFactor):
            pytest.skip(f'{name} not lowerable for {engine}: {exc}')
        raise
    tol = 1e-9 if engine == 'xla' else 5e-6
    err = np.abs(out[:len(t)] - oracle).max() / scale
    assert err < tol, f"{name} x {engine}: rel err {err}"


@pytest.mark.parametrize('name,build', [c for c in CASES
                                        if c[0] in ('cosPulse', 'gaussian',
                                                    'drag', 'mixing_I',
                                                    'chirp_linear')],
                         ids=lambda c: c if isinstance(c, str) else '')
def test_constructor_stack_engine(name, build):
    """The pulse-instance batch path through the forced engine, for the
    constructor classes it routes (narrow bounded pulses)."""
    w = build()
    t = np.arange(0, SPAN, 1 / FS)
    oracle = np.asarray(w(t), float)
    scale = max(np.abs(oracle).max(), 1e-30)
    try:
        out = np.asarray(synthesize([w], 0, SPAN, FS,
                                    engine='pallas-stack'))[0]
    except Exception as exc:
        from waveforms_tpu.ops.lowering import UnsupportedFactor
        if isinstance(exc, UnsupportedFactor):
            pytest.skip(f'{name}: {exc}')
        raise
    err = np.abs(out[:len(t)] - oracle).max() / scale
    assert err < 5e-6, f"{name} x stack: rel err {err}"


def test_out_dtype_int16_across_engines():
    """synthesize(out_dtype=int16) must emit the SAME DAC codes on every
    engine (scale -> round-half-even -> clip), to each tier's precision."""
    import jax.numpy as jnp
    rng = np.random.default_rng(51)
    ch = wt.zero()
    for o in rng.uniform(0.2e-6, SPAN - 0.5e-6, 12):
        ch += 0.7 * wt.cosPulse(150e-9) >> float(o)
    chans = [ch]
    codes = {}
    for engine in ('numpy', 'xla', 'pallas', 'pallas-stack',
                   'pallas-dense'):
        codes[engine] = np.asarray(
            synthesize(chans, 0, SPAN, FS, engine=engine,
                       out_dtype=jnp.int16))
        assert codes[engine].dtype == np.int16, engine
    for engine, got in codes.items():
        # engines round independently: a value landing within float
        # noise of a .5 boundary may round apart by one code
        assert np.abs(got.astype(np.int32)
                      - codes['numpy'].astype(np.int32)).max() <= 1, engine


def test_out_dtype_validation():
    import jax.numpy as jnp
    ch = [wt.cosPulse(200e-9) >> 1e-6]
    with pytest.raises(ValueError, match="double"):
        synthesize(ch, 0, SPAN, FS, precision='double',
                   out_dtype=jnp.int16)
    with pytest.raises(ValueError, match="complex"):
        synthesize(ch, 0, SPAN, FS, part='complex', out_dtype=jnp.int16)


def test_out_dtype_per_channel_scale():
    import jax.numpy as jnp
    chans = [wt.cosPulse(200e-9) >> 1e-6, 0.5 * wt.gaussian(300e-9) >> 2e-6]
    scale = np.array([1000.0, 20000.0])
    a = np.asarray(synthesize(chans, 0, SPAN, FS, engine='numpy',
                              out_dtype=jnp.int16, dac_scale=scale))
    f = np.asarray(synthesize(chans, 0, SPAN, FS, engine='numpy'))
    want = np.clip(np.round(f * scale[:, None]), -32768, 32767)
    assert np.array_equal(a, want.astype(np.int16))

"""Coverage for subsystems the reference never tested: utils, LaTeX repr,
registry transport, CLI, engine selection, profiling hooks."""

import subprocess
import sys

import numpy as np
import pytest

import waveforms_tpu
from waveforms_tpu import (Waveform, cos, cosPulse, gaussian, one, square,
                           zero)
from waveforms_tpu.engine import sample, synthesize
from waveforms_tpu.ir.registry import (baseFunc, packBaseFunc,
                                       registerBaseFunc, updateBaseFunc)
from waveforms_tpu.utils import freeze, getFTMatrix
from waveforms_tpu.utils.signal import shift as signal_shift


def test_freeze():
    frozen = freeze({'a': [1, 2], 'b': {3, 4}, 'c': np.zeros(3)})
    assert frozen['a'] == (1, 2)
    assert frozen['b'] == frozenset({3, 4})
    with pytest.raises(ValueError):
        frozen['c'][0] = 1
    with pytest.raises(TypeError):
        frozen['x'] = 1


def test_getFTMatrix_doctest_values():
    numOfPoints, sampleRate = 1000, 1e9
    f1, f2 = -12.7e6, 32.8e6
    t = np.arange(numOfPoints) / sampleRate
    signal = 0.8 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.cos(
        2 * np.pi * f2 * t)
    e = getFTMatrix([f1, f2], numOfPoints, sampleRate=sampleRate)
    got = signal @ e
    np.testing.assert_allclose(
        got, [-0.00766509 - 0.79518987j, 0.19531432 + 0.00207068j],
        atol=1e-7)

    spec = 2 * np.fft.fft(signal) / numOfPoints
    freq = np.fft.fftfreq(numOfPoints)
    e = getFTMatrix(freq, numOfPoints, sampleRate=1)
    assert np.allclose(spec, signal @ e)


def test_signal_shift():
    sig = np.zeros(100)
    sig[50] = 1.0
    out = signal_shift(sig, 3.0, 1.0)
    assert out[53] == 1.0
    out = signal_shift(sig, 2.5, 1.0)
    assert np.isclose(out[52], 0.5) and np.isclose(out[53], 0.5)


def test_latex_repr():
    s = gaussian(2)._repr_latex_()
    assert s.startswith("$$") and "exp" in s
    s2 = (cos(2 * np.pi) + 1)._repr_latex_()
    assert "\\cos" in s2
    s3 = zero()._repr_latex_()
    assert "0" in s3
    # unknown basis ids render generically instead of raising
    from waveforms_tpu.models.shapes import chirp
    assert "Func" in chirp(1, 2, 10)._repr_latex_()


def test_registry_pack_update():
    # registered functions must be picklable for cross-process transport;
    # other tests may have registered unpicklable lambdas via function() --
    # drop those first (pack pickles the whole table, as the reference does)
    import pickle
    for k in [k for k, v in baseFunc.items()
              if getattr(v, '__name__', '') == '<lambda>']:
        del baseFunc[k]
    fid = registerBaseFunc(np.minimum)
    buf = packBaseFunc()
    removed = baseFunc.pop(fid)
    assert fid not in baseFunc
    updateBaseFunc(buf)
    assert fid in baseFunc
    assert baseFunc[fid] is removed


def test_cli_sample(tmp_path):
    out = tmp_path / "o.npy"
    res = subprocess.run(
        [sys.executable, "-m", "waveforms_tpu", "sample", "-S", "1000",
         "-a", "-1", "-b", "1", "cosPulse(0.5)", str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    pts = np.load(out)
    assert pts.shape == (2000,)
    t = np.arange(-1, 1, 1e-3)
    expected = np.where(np.abs(t) < 0.25,
                        0.5 * (1 + np.cos(2 * np.pi * t / 0.5)), 0)
    assert np.allclose(pts, expected, atol=1e-9)


def test_cli_rejects_bad_expression(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "waveforms_tpu", "sample", "gaussian(",
         str(tmp_path / "x.npy")], capture_output=True, text=True)
    assert res.returncode != 0


def test_engine_selection():
    chans = [gaussian(2e-7) * cos(2 * np.pi * 50e6), square(1e-7)]
    ref = synthesize(chans, -5e-7, 5e-7, 1e9, engine='numpy')
    for eng in ('xla', 'auto'):
        got = np.asarray(synthesize(chans, -5e-7, 5e-7, 1e9, engine=eng))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)

    w = cosPulse(4e-7)
    w.start, w.stop, w.sample_rate = -5e-7, 5e-7, 1e9
    np.testing.assert_allclose(np.asarray(sample(w)), w.sample(),
                               rtol=1e-6, atol=1e-7)


def test_engine_rejects_unknown():
    with pytest.raises(ValueError):
        synthesize([one()], 0, 1e-6, 1e9, engine='cuda')


def test_version_and_all():
    assert waveforms_tpu.__version__
    for name in waveforms_tpu.__all__:
        assert hasattr(waveforms_tpu, name), name


def test_demodulate_matches_getFTMatrix():
    import jax.numpy as jnp

    from waveforms_tpu.ops.demod import demod_matrix, demodulate
    numOfPoints, fs = 1000, 1e9
    f1, f2 = -12.7e6, 32.8e6
    t = np.arange(numOfPoints) / fs
    sig = (0.8 * np.sin(2 * np.pi * f1 * t)
           + 0.2 * np.cos(2 * np.pi * f2 * t))
    host = sig @ getFTMatrix([f1, f2], numOfPoints, sampleRate=fs)
    m = demod_matrix([f1, f2], numOfPoints, fs, dtype=jnp.complex128)
    dev = np.asarray(demodulate(jnp.asarray(sig)[None, :], m))[0]
    np.testing.assert_allclose(dev, host, rtol=1e-9, atol=1e-12)


def test_engine_sample_applies_filters():
    from scipy.signal import butter, tf2sos

    from waveforms_tpu import step
    fs = 1000
    b, a = butter(3, 4.0, 'lowpass', fs=fs)
    w = step(0)
    w.start, w.stop, w.sample_rate = -1, 1, fs
    w.filters = (tf2sos(b, a), 0.0)
    host = w.sample()
    for eng in ('numpy', 'xla', 'native'):
        got = np.asarray(sample(w, engine=eng))
        np.testing.assert_allclose(got, host, rtol=1e-7, atol=1e-9,
                                   err_msg=eng)


def test_dsl_unary_minus_precedence():
    """The grammar puts unary minus below every binary operator (the
    reference's ANTLR alternatives order), so -a + b == -(a + b)."""
    from waveforms_tpu import const, wave_eval
    assert wave_eval("const(-2 + 3)") == const(-(2 + 3))
    assert wave_eval("const(2 * -3)") == const(2 * -(3))
    assert wave_eval("const(-2)") == const(-2)
    assert wave_eval("const((-2) + 3)") == const(1)


def test_lowered_schedule_stats():
    import numpy as np

    from waveforms_tpu import cosPulse, zero
    from waveforms_tpu.ops.lowering import lower_schedule

    chans = [cosPulse(100e-9) >> 500e-9, zero()]
    low = lower_schedule(chans, 0, 2e-6, 1e9)
    st = low.stats()
    assert st["channels"] == 2 and st["n_samples"] == 2000
    assert st["pallas_ok"] is True and st["pair_mode"] is False
    # one 100 ns pulse over 2 channels x 2 us -> occupancy 100/4000
    assert abs(st["occupancy"] - 100 / 4000) < 1e-6
    assert st["live_segments"] >= 1
    assert isinstance(low.describe(), str)


def test_reference_export_parity():
    """Every symbol the reference's __init__ exports must exist here."""
    import re

    import pytest

    import waveforms_tpu as w
    ref_init = "/root/reference/waveforms/__init__.py"
    try:
        src = open(ref_init).read()
    except OSError:
        pytest.skip("reference checkout not mounted")
    names = set()
    for m in re.finditer(r'import\s*\(([^)]*)\)|import\s+([\w, ]+)', src):
        blob = (m.group(1) or m.group(2) or '')
        names.update(n.strip() for n in blob.replace('\n', ' ').split(',')
                     if n.strip().isidentifier())
    missing = sorted(n for n in names if not hasattr(w, n))
    assert not missing, missing


def test_device_fault_classifier():
    """Only runtime device faults may degrade to host synthesis; compile-
    phase failures (Mosaic et al.) must surface (review finding r2)."""
    from waveforms_tpu.engine import _is_device_fault

    class XlaRuntimeError(Exception):
        pass

    assert _is_device_fault(XlaRuntimeError("Bad thing: device halted"))
    assert not _is_device_fault(
        XlaRuntimeError("Mosaic lowering failed: bad BlockSpec"))
    assert not _is_device_fault(
        XlaRuntimeError("INTERNAL: Compilation failure in MLIR pass"))
    assert not _is_device_fault(ValueError("shape mismatch"))


def test_device_fault_classifier_nested_same_type():
    """A compile marker buried in a CAUSE of the same exception type must
    still be found (the old name-based cycle guard stopped early)."""
    from waveforms_tpu.engine import _is_device_fault

    class XlaRuntimeError(Exception):
        pass

    inner = XlaRuntimeError("Mosaic compilation failure: bad BlockSpec")
    outer = XlaRuntimeError("error executing computation")
    outer.__cause__ = inner
    assert not _is_device_fault(outer)


def test_auto_engine_routes_accelerator_to_xla(monkeypatch):
    """Routing order is tpu-pallas > accel-xla > native > numpy: on a
    non-TPU accelerator backend the fused XLA trace engine must be
    selected (round-4 fix; previously GPU hosts fell through to host
    synthesis)."""
    import jax
    import numpy as np

    from waveforms_tpu import engine as eng
    from waveforms_tpu.models import shapes as sh
    from waveforms_tpu.ops import jax_eval

    monkeypatch.setattr(jax, 'default_backend', lambda: 'gpu')
    calls = []
    orig = jax_eval.evaluate

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(jax_eval, 'evaluate', spy)
    w = [sh.gaussian(4e-7) * sh.cos(2 * np.pi * 3e7)]
    out = eng.synthesize(w, 0.0, 4.096e-6, 2e9)
    assert calls, "accelerator backend must route engine='auto' to XLA"
    ref = eng.synthesize(w, 0.0, 4.096e-6, 2e9, engine='numpy')
    assert np.abs(np.asarray(out) - ref).max() / np.abs(ref).max() < 2e-6


def _identity_basis(t):
    """Module-level (picklable) dummy basis for the registry tests."""
    return t


def test_registry_thread_safe_registration():
    """Freethreading audit (round 4): concurrent registerBaseFunc calls
    must hand out distinct IDs and lose no table entries -- the invariant
    a GIL used to provide for free."""
    import threading

    from waveforms_tpu.ir import registry

    n_threads, per_thread = 8, 25
    got = [[] for _ in range(n_threads)]

    def worker(i):
        for _ in range(per_thread):
            got[i].append(registry.registerBaseFunc(_identity_basis))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    ids = [x for sub in got for x in sub]
    assert len(set(ids)) == n_threads * per_thread
    assert all(i in registry.baseFunc for i in ids)


def test_update_base_func_bumps_id_counter():
    """A merged remote table must never collide with later local IDs."""
    from waveforms_tpu.ir import registry

    buf = registry.packBaseFunc()
    before = registry.registerBaseFunc(_identity_basis)
    registry.updateBaseFunc(buf)
    after = registry.registerBaseFunc(_identity_basis)
    assert after > before


def test_cli_sample_int16_codes(tmp_path):
    out = tmp_path / "c.npy"
    res = subprocess.run(
        [sys.executable, "-m", "waveforms_tpu", "sample", "-S", "1000",
         "-a", "-1", "-b", "1", "-A", "2", "--dtype", "int16",
         "--dac-scale", "10000", "cosPulse(0.5)", str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    codes = np.load(out)
    assert codes.dtype == np.int16
    t = np.arange(-1, 1, 1e-3)
    cp = np.where(np.abs(t) < 0.25, 0.5 * (1 + np.cos(2 * np.pi * t / 0.5)),
                  0.0)
    # amplitude folds into the DAC scale so codes round once
    want = np.clip(np.round(cp * 20000.0), -32768, 32767)
    assert np.abs(codes - want).max() <= 1


def test_degenerate_interp_and_chirp_lowering():
    """1-point interp tables lower as constants; alpha/k == 0 chirps
    route to the XLA fallback instead of ZeroDivisionError (round-4
    high-effort review findings)."""
    from waveforms_tpu import chirp, samplingPoints
    from waveforms_tpu.engine import synthesize

    w = samplingPoints(0.0, 1e-6, [0.5])
    t = np.arange(0, 2e-6, 1e-9)
    want = np.asarray(w(t), float)
    for eng in ('numpy', 'xla', 'pallas'):
        out = np.asarray(synthesize([w], 0, 2e-6, 1e9, engine=eng))
        assert np.abs(out[0][:len(want)] - want).max() < 1e-6, eng
    # degenerate sweep endpoint: must not crash lowering
    c = chirp(1e6, 1e6, 1e-6, type='exponential')
    out = synthesize([c], 0, 1e-6, 1e9, engine='auto')
    assert np.asarray(out).shape == (1, 1000)


def test_shifted_stack_lowers_per_component():
    """stack >> delay bakes the shift per component (O(N)) instead of
    simplify-merging everything into one mega-segment; engine parity and
    pallas_ok preserved (round-4 high-effort review finding)."""
    from waveforms_tpu import cosPulse
    from waveforms_tpu.core import WaveVStack
    from waveforms_tpu.engine import synthesize
    from waveforms_tpu.ops.lowering import lower_schedule

    rng = np.random.default_rng(8)
    st = WaveVStack([float(a) * cosPulse(50e-9) >> o
                     for a, o in zip(rng.uniform(.2, 1, 30),
                                     rng.uniform(0, 6e-6, 30))])
    w = (st >> 1e-6) + 0.25
    FS, STOP = 2e9, 8.192e-6
    t = np.arange(0, STOP, 1 / FS)
    want = np.asarray(w(t), float)
    low = lower_schedule([w], 0, STOP, FS)
    assert low.pallas_ok and low.shape[3] <= 4      # no term blow-up
    for eng in ('numpy', 'xla', 'pallas'):
        out = np.asarray(synthesize([w], 0, STOP, FS, engine=eng))
        err = np.abs(out[0][:len(want)] - want).max()
        assert err / np.abs(want).max() < 1e-6, eng


def test_ext_blocks_dedup_across_instances():
    """drag_sin/sinx ext coefficient blocks depend only on the pulse
    SHAPE (width/plateau/delta/block_freq), not on shift/t0/phase, so an
    XY line of same-shape gates at distinct phases must share ONE block
    -- without the bytes-keyed dedup, 64 ch x 24 gates x 29 words blew
    past PALLAS_EXT_MAX (the r5_hi_ext_ops capture failure)."""
    import numpy as np

    from waveforms_tpu.models.multy_drag import drag_sin
    from waveforms_tpu.ops.lowering import lower_schedule

    rng = np.random.default_rng(7)
    dur, fs = 32.768e-6, 2e9
    chans = [sum((drag_sin(2e8, 22e-9, plateau=6e-9, delta=3e6,
                           block_freq=(2.5e8,), phase=float(p),
                           t0=float(o)))
                 for o, p in zip(rng.uniform(2e-6, dur - 1e-6, 6),
                                 rng.uniform(0, 6.28, 6)))
             for _ in range(4)]
    for kw in ({}, {'keep_f64': True}):
        low = lower_schedule(chans, 0.0, dur, fs, **kw)
        assert low.ext.size == 29, (kw, low.ext.size)   # one shared block
        assert low.pallas_ok
    # distinct shapes keep distinct blocks
    two = [drag_sin(2e8, 22e-9, plateau=6e-9, delta=3e6,
                    block_freq=(2.5e8,), t0=1e-6)
           + drag_sin(2e8, 30e-9, plateau=6e-9, delta=3e6,
                      block_freq=(2.5e8,), t0=3e-6)]
    low2 = lower_schedule(two, 0.0, 8.192e-6, fs)
    assert low2.ext.size == 58

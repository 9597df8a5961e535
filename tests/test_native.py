"""Native C++ engine parity vs the numpy float64 oracle.

The native engine consumes the same descriptor tensors as the TPU kernel;
residual error comes only from the f32 quantization of descriptor args
(~1e-7 worst case), below the f32 kernel's own noise floor.
"""

import numpy as np
import pytest

from waveforms_tpu import (chirp, cos, cosPulse, cosh, drag, gaussian,
                           mixing, mollifier, poly, sinc, sinh, square, zero)
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import lower_schedule

native = pytest.importorskip("waveforms_tpu.native")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"no toolchain: {native.build_error()}")


def check(chans, start, stop, fs, rtol=2e-7):
    low = lower_schedule(chans, start, stop, fs)
    out = native.synthesize_native(low)
    t = np.arange(start, stop, 1 / fs)
    for i, ch in enumerate(chans):
        oracle = ch(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        err = np.abs(out[i] - oracle).max() / scale
        assert err < rtol, f"channel {i}: rel err {err}"


def test_native_basis_parity():
    check([gaussian(1e-6), cosPulse(1e-6), square(1e-6, edge=0.2e-6),
           sinc(20e6), cosh(1e6) * square(2e-6), sinh(1e6) * square(2e-6),
           gaussian(1e-6, d=2),
           poly([0.5, 1e5, -1e11]) * square(3e-6)],
          -2e-6, 2e-6, 1e9)
    # mollifier derivative coefficients quantize to f32 with partial
    # cancellation near the bump edge: ~1e-6 relative
    check([mollifier(1e-6, d=2)], -2e-6, 2e-6, 1e9, rtol=5e-6)


def test_native_carriers_and_drag():
    pulse = cosPulse(20e-9)
    I, Q = mixing(0.5 * pulse, freq=-20e6, DRAGScaling=1e-10)
    check([I, Q,
           gaussian(3e-3) * cos(2 * np.pi * 250e6, 0.3),
           drag(100e6, 20e-9, plateau=10e-9, delta=2e6, block_freq=250e6,
                phase=0.4, t0=3e-9) >> 0.1e-6],
          -0.1e-6, 0.4e-6, 2e9)


def test_native_chirps():
    check([chirp(1e6, 50e6, 1e-5, 0.3, 'linear')], 0, 1e-5, 2e9, rtol=1e-6)
    # exotic chirps lower as adaptively-windowed exact quadratic phases
    # (see ops/lowering._expand_exotic_chirps): ~1e-6 tier on all engines
    check([chirp(1e6, 50e6, 1e-5, 0.3, 'exponential'),
           chirp(1e6, 50e6, 1e-5, 0.3, 'hyperbolic')],
          0, 1e-5, 2e9, rtol=2e-6)


def test_native_clip_and_silence():
    w = 2 * gaussian(1e-6)
    w.max = 1.0
    w.min = 0.2
    low = lower_schedule([w], -4e-6, 4e-6, 1e9)
    out = native.synthesize_native(low)
    t = np.arange(-4e-6, 4e-6, 1e-9)
    oracle = w(t)
    np.testing.assert_allclose(out[0], oracle, atol=2e-7)
    # silence outside segments stays exactly zero despite min=0.2
    assert out[0, 0] == 0.0


def test_native_bucketed_vstack():
    rng = np.random.default_rng(3)
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 8e-6, 200)]
    stack = WaveVStack(wl)
    low = lower_schedule([stack], 0, 8.192e-6, 2e9, bucket_samples=2048)
    out = native.synthesize_native(low)
    t = np.arange(0, 8.192e-6, 0.5e-9)
    oracle = stack(t)
    np.testing.assert_allclose(out[0], oracle, atol=2e-7)


def test_native_interp_table():
    from waveforms_tpu.models.shapes import samplingPoints
    y = np.sin(np.linspace(0, 3, 33))
    w = samplingPoints(0, 10e-6, y)
    low = lower_schedule([w], -1e-6, 12e-6, 1e9)
    # linear interpolation expands to affine segments: every engine runs it
    assert low.pallas_ok
    out = native.synthesize_native(low)
    t = np.arange(-1e-6, 12e-6, 1e-9)
    np.testing.assert_allclose(out[0], w(t), atol=2e-7)


def test_native_multitone_drag():
    from waveforms_tpu import drag_sin, drag_sinx
    bf = (151e6, -83e6, 217e6)
    # plateau edges off the sample grid (the reference's construction is
    # discontinuous at the plateau edge, so on-grid edges tie-break)
    w1 = drag_sin(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                  block_freq=bf, phase=0.1)
    w2 = drag_sinx(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                   block_freq=bf, phase=0.1, tab=0.5)
    low = lower_schedule([w1, w2], -5e-9, 40e-9, 2e9)
    out = native.synthesize_native(low)
    t = np.arange(-5e-9, 40e-9, 0.5e-9)
    for i, w_ in enumerate([w1, w2]):
        scale = np.abs(w_(t)).max()
        assert np.abs(out[i] - w_(t)).max() / scale < 5e-7


def test_native_lowering_matches_python_for_drag_sin():
    """The C++ walker's drag_sin/sinx descriptors match the Python path.

    Covers the ext side-buffer ABI: channel-local offsets rebase into the
    shared buffer and identical static blocks dedup across channels.
    """
    from waveforms_tpu import cos, drag_sin, drag_sinx, gaussian
    import waveforms_tpu.ops.lowering as L

    if not native.lower_available():
        pytest.skip(f"no lowering extension: {native._lower_error}")
    bf = (151e6, -83e6, 217e6)
    w1 = drag_sin(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                  block_freq=bf, phase=0.1)
    w2 = drag_sinx(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                   block_freq=bf, phase=0.1, tab=0.5)
    chans = [w1, w2, gaussian(20e-9) * cos(2 * np.pi * 250e6), w1 >> 5e-9]
    low = L.lower_schedule(chans, -5e-9, 40e-9, 2e9)
    orig = L._lower_schedule_native
    L._lower_schedule_native = lambda *a, **k: None
    try:
        low_py = L.lower_schedule(chans, -5e-9, 40e-9, 2e9)
    finally:
        L._lower_schedule_native = orig
    for name in ('seg_lo', 'seg_hi', 'nterm', 'amp', 'nfac', 'op',
                 'power', 'shift_hi', 'q32'):
        np.testing.assert_array_equal(getattr(low, name),
                                      getattr(low_py, name), err_msg=name)
    # args/ext carry independent f64 reductions: bit-level noise only
    np.testing.assert_allclose(low.args, low_py.args, atol=1e-12)
    assert low.ext.size == low_py.ext.size
    np.testing.assert_allclose(low.ext, low_py.ext, rtol=1e-10, atol=1e-18)
    # the shifted copy of w1 must share its ext block (dedup), and the
    # sinx blend tables fit the pallas SMEM budget
    assert low.pallas_ok


def test_native_complex_pair():
    """part='complex' runs the C++ engine in one pair-mode pass."""
    from waveforms_tpu import synthesize
    I, Q = mixing(0.5 * cosPulse(50e-9), freq=-80e6, DRAGScaling=1e-10)
    chans = [(1 + 0.5j) * gaussian(2e-7) * cos(2 * np.pi * 150e6),
             I + 1j * Q]
    low = lower_schedule(chans, -1e-7, 1e-7, 2e9, part='complex')
    assert low.amp_im is not None
    out = native.synthesize_native(low)
    assert out.dtype == np.complex128
    ora = synthesize(chans, -1e-7, 1e-7, 2e9, engine='numpy', part='complex')
    err = np.abs(out - ora).max() / np.abs(ora).max()
    assert err < 2e-7, f"rel err {err}"


def test_native_boundary_conditions():
    """Sub-sample pulses, high powers, near-Nyquist carriers."""
    w1 = gaussian(0.4e-9) >> 3.7e-9          # narrower than a sample
    w2 = (gaussian(50e-9) ** 6) >> 100e-9    # integer power 6
    w3 = cosPulse(2e-9) * cos(2 * np.pi * 400e6) >> 200e-9
    low = lower_schedule([w1, w2, w3], 0, 0.4e-6, 1e9)
    out = native.synthesize_native(low)
    t = np.arange(0, 0.4e-6, 1e-9)
    for i, w in enumerate([w1, w2, w3]):
        ora = np.asarray(w(t))
        scale = max(np.abs(ora).max(), 1e-12)
        assert np.abs(out[i] - ora).max() / scale < 1e-6, f"ch{i}"


def test_lowered_schedule_save_load(tmp_path):
    from waveforms_tpu import cos, gaussian
    from waveforms_tpu.ops.lowering import LoweredSchedule
    chans = [gaussian(2e-7) * cos(2 * np.pi * 150e6)]
    low = lower_schedule(chans, -5e-7, 5e-7, 2e9)
    path = tmp_path / "sched.npz"
    low.save(path)
    low2 = LoweredSchedule.load(path)
    a = native.synthesize_native(low)
    b = native.synthesize_native(low2)
    np.testing.assert_array_equal(a, b)
    assert low2.pallas_ok == low.pallas_ok


def test_native_lowering_malformed_ir_falls_back():
    """Malformed user-built IR must trigger the Unsupported->None fallback
    in the native walker, never crash the interpreter (ADVICE r1)."""
    import numpy as np

    from waveforms_tpu.native import lower_available, lower_channel_flat

    if not lower_available():
        import pytest
        pytest.skip("native lowering unavailable")

    grid = np.arange(0.0, 1e-6, 5e-10)
    bad_pieces = [
        # bounds/seq length mismatch
        ((1e-7, np.inf), ((((4, 1e8, 0.0),), (1,)),)),
        # expr not a (terms, amps) pair
        ((np.inf,), ("nonsense",)),
        # factors/powers length mismatch
        ((np.inf,), (((((4, 1e8, 0.0), (2, 1.0, 0.0)), (1,)), (1.0,)),)),
        # factor too short for its opcode's argument count
        ((np.inf,), (((((13, 0.0),), (1,)),), (1.0,))),
        # factor not a tuple
        ((np.inf,), ((((42.0,), (1,)),), (1.0,))),
    ]
    for pieces in bad_pieces:
        res = lower_channel_flat([pieces], grid, 0.0, 5e-10, 0)
        assert res is None, pieces


def test_package_degrades_without_toolchain():
    """pip install on a host without g++ must still work end-to-end:
    available() goes False and engine='auto' lands on numpy (the wheel /
    macOS / Windows story, reference workflow.yml parity)."""
    import os
    import subprocess
    import sys
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np\n"
        "from waveforms_tpu import native, gaussian\n"
        "from waveforms_tpu.engine import synthesize\n"
        "assert not native.available(), 'native must be disabled'\n"
        "assert not native.lower_available()\n"
        "assert 'WFTPU_DISABLE_NATIVE' in (native.build_error() or '')\n"
        "out = synthesize([gaussian(1e-6) >> 1e-6], 0, 2e-6, 1e9,\n"
        "                 engine='auto')\n"
        "w = gaussian(1e-6) >> 1e-6\n"
        "t = np.arange(0, 2e-6, 1e-9)\n"
        "assert np.abs(np.asarray(out)[0] - w(t)).max() < 2e-6\n"
        "print('degraded-ok')\n")
    env = dict(os.environ, WFTPU_DISABLE_NATIVE='1')
    env.pop('WFTPU_TEST_TPU', None)
    r = subprocess.run([sys.executable, '-c', code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    assert 'degraded-ok' in r.stdout


def test_native_lowering_interleaved_ext_dedup():
    """Dedup HIT after another block was appended: the re-used factor's
    length slot must be the original block's length, not the buffer tail
    (round-4 review -- the tail length spanned both blocks, defeating
    cross-channel dedup and corrupting the merged slices)."""
    from waveforms_tpu import drag_sin, drag_sinx
    from waveforms_tpu.core import WaveVStack
    import waveforms_tpu.ops.lowering as L

    if not native.lower_available():
        pytest.skip(f"no lowering extension: {native._lower_error}")
    bf = (151e6,)
    a = drag_sin(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                 block_freq=bf, phase=0.1)
    b = drag_sinx(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                  block_freq=bf, phase=0.1, tab=0.5)
    # one channel: A, then B (new key), then A again (dedup hit)
    ch = WaveVStack([a, b >> 60e-9, a >> 120e-9])
    low = L.lower_schedule([ch], -5e-9, 160e-9, 2e9)
    orig = L._lower_schedule_native
    L._lower_schedule_native = lambda *a_, **k_: None
    try:
        low_py = L.lower_schedule([ch], -5e-9, 160e-9, 2e9)
    finally:
        L._lower_schedule_native = orig
    # args slot 8 carries the ext block length -- must match Python's
    np.testing.assert_allclose(low.args, low_py.args, atol=1e-12)
    assert low.ext.size == low_py.ext.size
    np.testing.assert_allclose(low.ext, low_py.ext, rtol=1e-10, atol=1e-18)

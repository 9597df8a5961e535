"""Descriptor lowering + Pallas synthesis kernel parity (interpret mode).

The kernel runs in interpreter mode on CPU here; the same code path runs
compiled on TPU (bench.py).  Accuracy contract: f32-level (~1e-6 relative
against the float64 oracle), including carrier phase at 2 GS/s over long
spans (the int32 fixed-point phase accumulator).
"""

import numpy as np
import pytest

from waveforms_tpu import (chirp, cos, cosPulse, cosh, drag, gaussian,
                           mixing, mollifier, poly, sinc, sinh, square, step,
                           zero)
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import UnsupportedFactor, lower_schedule
from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
    synthesize, synthesize_device, synthesize_lowered
from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

RTOL = 2e-6


def check(chans, start, stop, fs, rtol=RTOL):
    out = np.asarray(synthesize(chans, start, stop, fs, interpret=True))
    t = np.arange(start, stop, 1 / fs)
    for i, ch in enumerate(chans):
        oracle = ch(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        err = np.abs(out[i] - oracle).max() / scale
        assert err < rtol, f"channel {i}: rel err {err}"
    return out


def test_basic_shapes():
    check([gaussian(1e-6), cosPulse(1e-6), square(1e-6, edge=0.2e-6),
           square(1e-6, edge=0.2e-6, type='cos'),
           square(1e-6, edge=0.2e-6, type='linear'),
           sinc(20e6), cosh(1e6) * square(2e-6), sinh(1e6) * square(2e-6),
           mollifier(1e-6, d=2), poly([0.5, 1e5, -1e11]) * square(3e-6)],
          -2e-6, 2e-6, 1e9)


def test_carriers_and_phase_accuracy_long_span():
    """Carrier phase must stay accurate over 2M samples (int32 phase)."""
    chans = [cos(2 * np.pi * 137.137e6, 0.3),
             gaussian(2.5e-3) * cos(2 * np.pi * 250e6)]
    out = np.asarray(synthesize(chans, 0, 1e-3, 2e9, interpret=True))
    t = np.arange(0, 1e-3, 0.5e-9)
    tail = slice(-100000, None)
    for i, ch in enumerate(chans):
        oracle = ch(t[tail])
        err = np.abs(out[i][tail] - oracle).max()
        assert err < 2e-6, f"channel {i} phase drift: {err}"


def test_drag_and_mixing():
    pulse = cosPulse(20e-9)
    I, Q = mixing(0.5 * pulse, freq=-20e6, DRAGScaling=1e-10)
    chans = [I, Q, drag(100e6, 20e-9, plateau=10e-9, delta=2e6,
                        block_freq=250e6, phase=0.4, t0=3e-9) >> 0.1e-6]
    check(chans, -0.1e-6, 0.4e-6, 2e9)


def test_chirps():
    check([chirp(1e6, 50e6, 1e-5, 0.3, 'linear')], 0, 1e-5, 2e9, rtol=5e-6)
    # exponential/hyperbolic chirps lower as adaptively-windowed exact
    # quadratic phases (_expand_exotic_chirps): fit tolerance 3e-8 rad plus
    # the usual f32 eps slots
    check([chirp(1e6, 50e6, 1e-5, 0.3, 'exponential'),
           chirp(1e6, 50e6, 1e-5, 0.3, 'hyperbolic')],
          0, 1e-5, 2e9, rtol=2e-6)


def test_bf16_output():
    """bf16 stores halve write bandwidth; accumulation stays f32."""
    import jax.numpy as jnp

    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                synthesize_device)
    low = lower_schedule([gaussian(2e-7) * cos(2 * np.pi * 1e8)],
                         -3e-7, 3e-7, 2e9)
    dev = DeviceSchedule(low)
    o32 = np.asarray(synthesize_device(dev, rows_per_tile=8, interpret=True))
    ob = np.asarray(synthesize_device(dev, rows_per_tile=8, interpret=True,
                                      out_dtype=jnp.bfloat16))
    assert ob.dtype == jnp.bfloat16
    # bf16 has 8 mantissa bits: only the final store quantizes
    assert np.abs(ob.astype(np.float32) - o32).max() < 1 / 128
    cx = lower_schedule([(1 + 1j) * gaussian(2e-7)], -3e-7, 3e-7, 2e9,
                        part='complex')
    with pytest.raises(ValueError, match="f32"):
        synthesize_device(DeviceSchedule(cx), out_dtype=jnp.bfloat16)


def test_complex_pair_fused():
    """part='complex' runs ONE kernel pass with two amplitude planes."""
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                synthesize_device)
    I, Q = mixing(0.5 * cosPulse(50e-9), freq=-80e6, DRAGScaling=1e-10)
    chans = [(1 + 0.5j) * gaussian(2e-7) * cos(2 * np.pi * 150e6),
             I + 1j * Q]
    low = lower_schedule(chans, -1e-7, 1e-7, 2e9, part='complex')
    assert low.amp_im is not None
    out = np.asarray(synthesize_device(DeviceSchedule(low), interpret=True))
    assert out.dtype == np.complex64
    t = np.arange(-1e-7, 1e-7, 0.5e-9)
    for i, w in enumerate(chans):
        ora = np.asarray(w(t)).astype(complex)
        err = np.abs(out[i] - ora).max() / np.abs(ora).max()
        assert err < 5e-7, f"channel {i}: rel err {err}"


def test_hermite_envelope():
    check([gaussian(1e-6, d=2), gaussian(1e-6, plateau=0.5e-6, d=1)],
          -2e-6, 2e-6, 1e9)


def test_clip_limits():
    w = 2 * gaussian(1e-6)
    w.max = 1.0
    w.min = 0.2
    check([w], -1e-6, 1e-6, 1e9)


def test_vstack_channel():
    stack = WaveVStack([0.5 * cosPulse(50e-9) >> (k * 200e-9)
                        for k in range(5)])
    check([stack], 0, 1.2e-6, 2e9)


def test_segment_boundaries_match_oracle_exactly():
    """Bound -> sample-index conversion must match np.searchsorted."""
    w = square(1e-6) >> 0.25e-6
    out = np.asarray(synthesize([w], 0, 2e-6, 1e9, interpret=True))
    t = np.arange(0, 2e-6, 1e-9)
    oracle = w(t)
    np.testing.assert_array_equal(out[0] != 0, oracle != 0)


def test_unsupported_factor_raises():
    from waveforms_tpu import function
    w = function(lambda t, a: np.tanh(a * t), 2.0)
    with pytest.raises(UnsupportedFactor):
        lower_schedule([w], 0, 1e-6, 1e9)


def test_sharded_matches_unsharded():
    chans = [0.5 * cosPulse(50e-9) >> (k * 100e-9) for k in range(6)]
    start, stop, fs = 0, 0.8e-6, 2e9
    mesh = channel_mesh(n_channel=2, n_time=4)
    sharded = np.asarray(synthesize_on_mesh(chans, start, stop, fs, mesh,
                                            rows_per_tile=8, interpret=True))
    single = np.asarray(synthesize(chans, start, stop, fs, rows_per_tile=8,
                                   interpret=True))
    np.testing.assert_allclose(sharded, single, atol=1e-7)


def test_sharded_complex_pair():
    """part='complex' pair mode under shard_map matches single-device."""
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                synthesize_device)
    chans = [(0.5 + 0.3j) * cosPulse(50e-9) >> (k * 100e-9)
             for k in range(6)]
    start, stop, fs = 0, 0.8e-6, 2e9
    mesh = channel_mesh(n_channel=2, n_time=4)
    sharded = np.asarray(synthesize_on_mesh(chans, start, stop, fs, mesh,
                                            part='complex', rows_per_tile=8,
                                            interpret=True))
    assert sharded.dtype == np.complex64
    low = lower_schedule(chans, start, stop, fs, part='complex')
    single = np.asarray(synthesize_device(DeviceSchedule(low),
                                          rows_per_tile=8, interpret=True))
    np.testing.assert_allclose(sharded, single, atol=1e-7)


def test_sharded_bf16_output():
    import jax.numpy as jnp
    chans = [0.5 * cosPulse(50e-9) >> (k * 100e-9) for k in range(4)]
    mesh = channel_mesh(n_channel=2, n_time=4)
    ob = np.asarray(synthesize_on_mesh(chans, 0, 0.8e-6, 2e9, mesh,
                                       rows_per_tile=8, interpret=True,
                                       out_dtype=jnp.bfloat16))
    o32 = np.asarray(synthesize_on_mesh(chans, 0, 0.8e-6, 2e9, mesh,
                                        rows_per_tile=8, interpret=True))
    assert ob.dtype == jnp.bfloat16
    assert np.abs(ob.astype(np.float32) - o32).max() < 1 / 128


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
    import jax

    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.dtype == np.float32


def test_bucketed_time_sharded_matches_single():
    """Bucket axis shards across 'time' with per-shard descriptor windows."""
    rng = np.random.default_rng(5)
    stacks = [WaveVStack([(0.3 * cosPulse(40e-9) >> o)
                          for o in rng.uniform(0, 7e-6, 60)])
              for _ in range(4)]
    from waveforms_tpu.ops.lowering import lower_schedule as _ls
    from waveforms_tpu.ops.pallas_synth import synthesize_lowered
    from waveforms_tpu.parallel.mesh import synthesize_sharded
    low = _ls(stacks, 0, 8.192e-6, 2e9, bucket_samples=2048)
    assert low.n_buckets > 1
    mesh = channel_mesh(n_channel=2, n_time=4)
    sharded = np.asarray(synthesize_sharded(low, mesh, rows_per_tile=8,
                                            interpret=True))
    single = np.asarray(synthesize_lowered(low, rows_per_tile=8,
                                           interpret=True))
    np.testing.assert_allclose(sharded, single, atol=1e-7)


def test_interp_expansion_in_kernel():
    """samplingPoints lowers to affine segments -- full kernel support."""
    from waveforms_tpu.models.shapes import samplingPoints
    y = np.sin(np.linspace(0, 3, 33)) + 0.1
    w = samplingPoints(1e-7, 10e-6, y)
    w2 = samplingPoints(0, 8e-6, np.linspace(-1, 1, 9)) * gaussian(12e-6)
    check([w, w2], -1e-6, 12e-6, 1e9)


def test_multitone_drag_in_kernel():
    """drag_sin/drag_sinx run in the kernel via the ext side-buffer."""
    from waveforms_tpu import drag_sin, drag_sinx
    bf = (151e6, -83e6, 217e6)
    w1 = drag_sin(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                  block_freq=bf, phase=0.1)
    w2 = drag_sinx(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                   block_freq=bf, phase=0.1, tab=0.5)
    from waveforms_tpu.ops.lowering import lower_schedule as _ls
    low = _ls([w1, w2], -5e-9, 40e-9, 2e9)
    assert low.pallas_ok
    check([w1, w2], -5e-9, 40e-9, 2e9, rtol=5e-6)


def test_production_step_pipeline():
    """Sharded synthesis -> IIR precompensation -> demod in one step."""
    from waveforms_tpu.distortion import exp_decay_filter
    from waveforms_tpu.parallel.pipeline import run_step

    chans = [0.5 * cosPulse(50e-9) >> (k * 100e-9) for k in range(4)]
    mesh = channel_mesh(n_channel=4, n_time=2)
    sig, iq = run_step(chans, 0, 0.8192e-6, 2e9, mesh,
                       ba_filters=[exp_decay_filter(0.05, 100e-9, 2e9,
                                                    inv=True)],
                       demod_freqs=[50e6, 100e6],
                       rows_per_tile=8, interpret=True)
    sig = np.asarray(sig)
    iq = np.asarray(iq)
    assert sig.shape == (4, 1639)
    assert iq.shape == (4, 2)
    assert np.isfinite(sig).all() and np.isfinite(np.abs(iq)).all()

    # parity: same filtering applied on the host oracle
    from waveforms_tpu.distortion import predistort
    t = np.arange(0, 0.8192e-6, 0.5e-9)
    oracle = predistort(
        chans[0](t), [exp_decay_filter(0.05, 100e-9, 2e9, inv=True)])
    np.testing.assert_allclose(sig[0], oracle, atol=2e-6)


def test_imag_part_lowering():
    """part='imag' selects the imaginary amplitude component."""
    from waveforms_tpu import exp as wexp
    w = wexp(2j * np.pi * 40e6) * cosPulse(2e-7)
    t = np.arange(-2e-7, 2e-7, 1e-9)
    oracle = np.imag(w(t))
    from waveforms_tpu.ops.lowering import lower_schedule as _ls
    from waveforms_tpu.ops.pallas_synth import synthesize_lowered
    low = _ls([w], -2e-7, 2e-7, 1e9, part='imag')
    got = np.asarray(synthesize_lowered(low, interpret=True))[0]
    np.testing.assert_allclose(got, oracle, atol=2e-7)


def test_int16_dac_codes():
    """out_dtype=int16 emits exact DAC codes: round(f32 * scale) to within
    one code, clamped to the int16 range, honoring per-channel scales."""
    import jax.numpy as jnp

    chans = [0.9 * cosPulse(100e-9) >> 300e-9,
             1.2 * (square(200e-9) >> 300e-9)]   # overdrive: clamps
    low = lower_schedule(chans, 0, 1.024e-6, 2e9)
    dev = DeviceSchedule(low)

    f32 = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                       interpret=True))
    scales = np.array([32767.0, 16000.0], np.float32)
    codes = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True,
                                         out_dtype=jnp.int16,
                                         dac_scale=scales))
    assert codes.dtype == np.int16
    expected = np.clip(np.round(f32 * scales[:, None]), -32768, 32767)
    assert np.abs(codes.astype(np.int64)
                  - expected.astype(np.int64)).max() <= 1
    # the overdriven channel really clamps
    assert codes[1].max() == 32767 or expected[1].max() < 32767

    # scalar scale broadcast + misuse errors
    c2 = np.asarray(synthesize_device(dev, rows_per_tile=8, interpret=True,
                                      out_dtype=jnp.int16))
    assert c2.dtype == np.int16
    with pytest.raises(ValueError):
        synthesize_device(dev, out_dtype=jnp.int32)


def test_overlap_stress_drag():
    """Segment blow-up behavior (BASELINE.md 'overlap100' analog).

    ~40 fully-overlapping DRAG pulses fit the kernel's proven SMEM budget
    and must match the oracle; 120 exceed it (T~100 terms share one
    segment), so the schedule must be marked pallas_ok=False and the
    engine chain must still synthesize it on a host engine.
    """
    def build(n_pulses):
        rng = np.random.default_rng(11)
        ch = zero()
        for _ in range(n_pulses):
            ch += drag(100e6, 300e-9, plateau=200e-9, delta=2e6,
                       block_freq=None, phase=rng.uniform(0, 6),
                       t0=0.0) >> rng.uniform(0, 0.6e-6)
        return ch

    start, stop, fs = 0.0, 1.1e-6, 2e9
    t = np.arange(start, stop, 1 / fs)

    ch = build(40)
    low = lower_schedule([ch], start, stop, fs)
    assert low.pallas_ok
    got = np.asarray(synthesize_lowered(low, rows_per_tile=8,
                                        interpret=True))[0]
    oracle = ch(t)
    assert np.abs(got - oracle).max() / np.abs(oracle).max() < 2e-5

    from waveforms_tpu.engine import synthesize as engine_synthesize
    dense = build(120)
    low_d = lower_schedule([dense], start, stop, fs)
    assert not low_d.pallas_ok          # over the SMEM budget
    with pytest.raises(UnsupportedFactor):
        DeviceSchedule(low_d)
    out = np.asarray(engine_synthesize([dense], start, stop, fs,
                                       engine='auto'))[0]
    oracle_d = dense(t)
    assert np.abs(out - oracle_d).max() / np.abs(oracle_d).max() < 1e-6


def test_interp_blowup_guard():
    """A many-knot interp table expands past the kernel's SMEM budget:
    the schedule must mark pallas_ok=False (DeviceSchedule refuses with a
    clear error) while bucketing restores a pallas-legal layout."""
    from waveforms_tpu import interp

    n_knots = 12000
    x = np.linspace(0, 6e-6, n_knots)
    rng = np.random.default_rng(3)
    y = rng.normal(size=n_knots)
    w = interp(x, y)
    low = lower_schedule([w], 0, 6e-6, 2e9, bucket_samples=None)
    assert not low.pallas_ok
    with pytest.raises(UnsupportedFactor):
        DeviceSchedule(low)

    # bucketing spreads the knots: the same table becomes pallas-legal
    # and synthesizes correctly
    low_b = lower_schedule([w], 0, 6e-6, 2e9, bucket_samples=1024)
    assert low_b.pallas_ok
    got = np.asarray(synthesize_lowered(low_b, rows_per_tile=8,
                                        interpret=True))[0]
    t = np.arange(0, 6e-6, 1 / 2e9)
    np.testing.assert_allclose(got, w(t), rtol=1e-5, atol=1e-6)


def test_stack_bucketed_vs_oracle():
    """Stack channels emit overlapping per-component segments in piece
    order; the kernel's bisect/early-exit walk must still hit every one
    (lowering sorts bucket lists, seg_hmax keys the bisect).  Anchored to
    the numpy oracle, not kernel-vs-kernel."""
    rng = np.random.default_rng(9)
    stack = WaveVStack([(0.4 * cosPulse(40e-9) >> o)
                        for o in rng.uniform(0, 7e-6, 60)])
    low = lower_schedule([stack], 0, 8.192e-6, 2e9, bucket_samples=2048)
    assert low.n_buckets > 1
    got = np.asarray(synthesize_lowered(low, rows_per_tile=8,
                                        interpret=True))[0]
    t = np.arange(0, 8.192e-6, 1 / 2e9)
    oracle = stack(t)
    scale = np.abs(oracle).max()
    assert np.abs(got - oracle).max() / scale < 2e-6


def test_sharded_int16_codes():
    """int16 DAC output through the sharded mesh path matches the
    single-device codes (per-channel scales shard by 'channel')."""
    import jax.numpy as jnp

    from waveforms_tpu.parallel.mesh import synthesize_sharded

    chans = [0.7 * cosPulse(100e-9) >> (0.3e-6 + 0.2e-6 * k)
             for k in range(4)]
    low = lower_schedule(chans, 0, 2.048e-6, 2e9)
    scales = np.array([32767.0, 16000.0, 8000.0, 32767.0], np.float32)

    single = np.asarray(synthesize_device(DeviceSchedule(low),
                                          rows_per_tile=8, interpret=True,
                                          out_dtype=jnp.int16,
                                          dac_scale=scales))
    mesh = channel_mesh(n_channel=4, n_time=2)
    sharded = np.asarray(synthesize_sharded(low, mesh, rows_per_tile=8,
                                            interpret=True,
                                            out_dtype=jnp.int16,
                                            dac_scale=scales))
    assert sharded.dtype == np.int16
    np.testing.assert_array_equal(sharded, single)

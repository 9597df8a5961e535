"""Real-hardware smoke tests (pytest -m tpu, WFTPU_TEST_TPU=1).

The default suite pins jax to a virtual CPU mesh (conftest.py); these
tests compile and execute the actual Mosaic kernel on the attached TPU --
the failure modes interpret mode cannot see (SMEM BlockSpec rules,
scalar-dispatched switch lowering, fixed-point phase on real VPU
transcendentals).  A committed pass log lives in
``benchmarks/tpu_pytest_r3.log``; re-run on a healthy chip with:

    WFTPU_TEST_TPU=1 python -m pytest tests/test_tpu_hw.py -m tpu -v
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    not os.environ.get('WFTPU_TEST_TPU'),
    reason='set WFTPU_TEST_TPU=1 to run against real TPU hardware')


def _tpu_or_skip():
    import jax
    if jax.default_backend() != 'tpu':
        pytest.skip('no TPU backend attached')
    return jax


@requires_tpu
def test_compiled_kernel_parity():
    """Non-interpret kernel output vs the numpy oracle at f32 tolerance."""
    jax = _tpu_or_skip()
    from waveforms_tpu import cosPulse, mixing, square, zero
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device

    rng = np.random.default_rng(21)
    chans = []
    for c in range(4):
        x = zero()
        if c % 2 == 0:
            I, _ = mixing(0.5 * cosPulse(50e-9) >> rng.uniform(0, 10e-6),
                          freq=-120e6, DRAGScaling=1e-10)
            x += I
        else:
            x += 0.4 * (square(300e-9, edge=30e-9)
                        >> rng.uniform(0, 10e-6))
        chans.append(x)
    start, stop, fs = 0.0, 16.384e-6, 2e9
    low = lower_schedule(chans, start, stop, fs)
    dev = DeviceSchedule(low)
    out = np.asarray(synthesize_device(dev))     # compiled, tuned defaults

    t = np.arange(start, stop, 1 / fs)
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(out[c] - oracle).max() / scale < 1e-5, c


@requires_tpu
def test_compiled_int16_codes():
    """int16 DAC codes on hardware match round(f32 * scale) exactly."""
    jax = _tpu_or_skip()
    import jax.numpy as jnp

    from waveforms_tpu import cosPulse
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device

    chans = [0.8 * cosPulse(100e-9) >> 500e-9]
    low = lower_schedule(chans, 0, 2.048e-6, 2e9)
    dev = DeviceSchedule(low)
    f32 = np.asarray(synthesize_device(dev, rows_per_tile=8))
    codes = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         out_dtype=jnp.int16))
    expected = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    assert np.abs(codes.astype(np.int64)
                  - expected.astype(np.int64)).max() <= 1


@requires_tpu
def test_compiled_sequencer_play():
    """Sequencer table gather + kernel on hardware."""
    jax = _tpu_or_skip()
    from waveforms_tpu import cosPulse, gaussian
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    fs, span = 2e9, 4.096e-6
    lows = [lower_schedule([gaussian(200e-9) >> 1e-6], 0, span, fs),
            lower_schedule([cosPulse(160e-9) >> 2e-6], 0, span, fs)]
    seq = Sequencer(lows)
    t = np.arange(0, span, 1 / fs)
    for k, w in enumerate([gaussian(200e-9) >> 1e-6,
                           cosPulse(160e-9) >> 2e-6]):
        got = np.asarray(seq.play(k))[0]
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(got - oracle).max() / scale < 1e-5, k


def _sparse_chans(n=4, seed=17):
    from waveforms_tpu import cosPulse, mixing, zero
    rng = np.random.default_rng(seed)
    chans = []
    for c in range(n):
        x = zero()
        for _ in range(3):
            I, _ = mixing(0.5 * cosPulse(30e-9) >> rng.uniform(0, 14e-6),
                          freq=-150e6 - 2e6 * c, DRAGScaling=1e-10)
            x += I
        chans.append(x)
    return chans


@requires_tpu
def test_compiled_sparse_kernel_parity():
    """Sparse worklist kernel ON SILICON equals the dense kernel and the
    oracle (interpret-mode equality alone misses Mosaic-only failures)."""
    _tpu_or_skip()
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device
    from waveforms_tpu.ops.sparse_synth import synthesize_sparse

    chans = _sparse_chans()
    start, stop, fs = 0.0, 16.384e-6, 2e9
    low = lower_schedule(chans, start, stop, fs)
    dev = DeviceSchedule(low)
    dense = np.asarray(synthesize_device(dev))
    sparse = np.asarray(synthesize_sparse(dev, low))
    np.testing.assert_array_equal(sparse, dense)
    t = np.arange(start, stop, 1 / fs)
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(sparse[c] - oracle).max() / scale < 1e-5, c


@requires_tpu
def test_streaming_chunks_equal_single_shot():
    """Chunked streaming with carried filter state on hardware."""
    _tpu_or_skip()
    from waveforms_tpu import gaussian
    from waveforms_tpu.engine import synthesize
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.streaming import synthesize_stream

    chans = [0.7 * (gaussian(3e-6) >> 4e-6)]
    fs, stop = 2e9, 8.192e-6
    whole = np.asarray(synthesize(chans, 0, stop, fs,
                                  engine='pallas-dense'))
    dev = DeviceSchedule(lower_schedule(chans, 0, stop, fs))
    chunks = [np.asarray(c) for c in synthesize_stream(dev, chunk_rows=32)]
    got = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(got, whole, atol=2e-6)


@requires_tpu
def test_bucketed_schedule_on_chip():
    """Multi-bucket descriptor layout compiled on hardware."""
    _tpu_or_skip()
    from waveforms_tpu import cosPulse
    from waveforms_tpu.core import WaveVStack
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device

    rng = np.random.default_rng(5)
    stack = WaveVStack([(0.4 * cosPulse(40e-9) >> o)
                        for o in rng.uniform(0, 14e-6, 48)])
    low = lower_schedule([stack], 0, 16.384e-6, 2e9, bucket_samples=8192)
    assert low.n_buckets > 1
    out = np.asarray(synthesize_device(DeviceSchedule(low),
                                       rows_per_tile=8))
    t = np.arange(0, 16.384e-6, 1 / 2e9)
    oracle = stack(t)
    assert np.abs(out[0] - oracle).max() / np.abs(oracle).max() < 1e-5


@requires_tpu
def test_row0_windowed_synthesis():
    """Time-windowed (row0-offset) launches concatenate to the full
    result -- the mechanism both the 1 ms bench and time sharding use."""
    _tpu_or_skip()
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, _run_kernel

    from waveforms_tpu.ops.pallas_synth import synthesize_device

    chans = _sparse_chans(2, seed=31)
    low = lower_schedule(chans, 0, 16.384e-6, 2e9)
    dev = DeviceSchedule(low)
    whole = np.asarray(synthesize_device(dev, rows_per_tile=8))
    C, NB, S, T, F = dev.shape
    half_rows = 128
    kw = dict(S=S, T=T, F=F, R=8, n_rows=half_rows, tiles_per_bucket=16,
              ops_present=dev.ops_present, interpret=False)
    parts = []
    for wdx in range(2):
        row0 = jnp.full((1, 1, 1, 1), wdx * half_rows * 128, jnp.int32)
        parts.append(np.asarray(_run_kernel(row0, *dev.tensors, None, None,
                                            **kw)).reshape(C, -1))
    got = np.concatenate(parts, axis=1)[:, :low.n_samples]
    np.testing.assert_array_equal(got, whole)


@requires_tpu
def test_stack_path_on_chip():
    """Pulse-instance batched path (einsum scatter) on hardware."""
    _tpu_or_skip()
    from waveforms_tpu import cosPulse
    from waveforms_tpu.core import WaveVStack
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.stack_synth import build_stack_plan, \
        synthesize_stack

    rng = np.random.default_rng(41)
    stack = WaveVStack([(0.5 * cosPulse(50e-9) >> o)
                        for o in rng.uniform(0, 14e-6, 100)])
    low = lower_schedule([stack], 0, 16.384e-6, 2e9)
    plan = build_stack_plan(low)
    assert plan is not None
    out = np.asarray(synthesize_stack(low, plan))
    t = np.arange(0, 16.384e-6, 1 / 2e9)
    oracle = stack(t)
    assert np.abs(out[0] - oracle).max() / np.abs(oracle).max() < 1e-5


@requires_tpu
def test_engine_auto_routing_on_chip():
    """engine='pallas' routes sparse schedules to the worklist kernel and
    produces oracle-level output on hardware."""
    _tpu_or_skip()
    from waveforms_tpu.engine import synthesize

    chans = _sparse_chans(2, seed=47)
    got = np.asarray(synthesize(chans, 0, 16.384e-6, 2e9,
                                engine='pallas'))
    want = synthesize(chans, 0, 16.384e-6, 2e9, engine='numpy')
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


@requires_tpu
def test_compiled_sparse_pair_and_int16():
    """Sparse kernel's pair-mode and DAC-code outputs on hardware.

    Runs LAST: complex64 transfers are UNIMPLEMENTED on the axon dev
    tunnel, and one failed complex device_put poisons every subsequent
    transfer in-process -- so complex support is probed in a SUBPROCESS
    and the pair section skips cleanly where unsupported (real TPU
    runtimes support complex64; this is a tunnel limitation).
    """
    _tpu_or_skip()
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import synthesize_sparse

    chans = _sparse_chans(2, seed=23)
    low = lower_schedule(chans, 0, 8.192e-6, 2e9)
    dev = DeviceSchedule(low)
    f32 = np.asarray(synthesize_sparse(dev, low))
    codes = np.asarray(synthesize_sparse(dev, low, out_dtype=jnp.int16))
    expected = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    assert np.abs(codes.astype(np.int64)
                  - expected.astype(np.int64)).max() <= 1

    lowc = lower_schedule(chans, 0, 8.192e-6, 2e9, part='complex')
    devc = DeviceSchedule(lowc)
    # combine_pair=False keeps the kernel's two f32 planes separate, so
    # the comparison never touches a complex dtype on the device or the
    # wire -- this pins the pair-mode KERNEL on silicon even on tunnels
    # where complex64 transfers are unimplemented (round-4 fix: this was
    # the hw tier's one skip in round 3)
    re_p, im_p = synthesize_sparse(devc, lowc, combine_pair=False)
    re_p = np.asarray(re_p)
    im_p = np.asarray(im_p)
    assert re_p.dtype == np.float32 and im_p.dtype == np.float32
    assert np.abs(re_p - f32).max() < 1e-5

    # complex amplitudes: both planes live, pinned against the f64 oracle
    from waveforms_tpu.core import WaveVStack
    cchans = [(0.6 + 0.8j) * w for w in chans]
    lowi = lower_schedule(cchans, 0, 8.192e-6, 2e9, part='complex')
    re_i, im_i = synthesize_sparse(DeviceSchedule(lowi), lowi,
                                   combine_pair=False)
    re_i, im_i = np.asarray(re_i), np.asarray(im_i)
    t = np.arange(0, 8.192e-6, 1 / 2e9)
    for c, w in enumerate(cchans):
        oracle = np.asarray(
            (w.simplify() if isinstance(w, WaveVStack) else w)(t)
        ).astype(complex)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(re_i[c] - oracle.real).max() / scale < 1e-5, c
        assert np.abs(im_i[c] - oracle.imag).max() / scale < 1e-5, c


@requires_tpu
def test_packed_sequence_play_on_chip():
    """Shot-packed playback ON SILICON == per-shot plays (round 4: one
    panel launch per sequence; the amortized-shot surface)."""
    _tpu_or_skip()
    import jax.numpy as jnp

    from waveforms_tpu import cosPulse, gaussian
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    fs, span = 2e9, 4.096e-6
    lows = [lower_schedule([gaussian(200e-9) >> 1e-6], 0, span, fs),
            lower_schedule([cosPulse(160e-9) >> 2e-6], 0, span, fs)]
    seq = Sequencer(lows)
    ks = jnp.asarray([1, 0, 1, 1, 0], jnp.int32)
    outs = np.asarray(seq.play_packed(ks, Rs=8, interpret=False))
    for i, k in enumerate([1, 0, 1, 1, 0]):
        single = np.asarray(seq.play(k))
        assert np.abs(outs[i] - single).max() == 0.0, i


@requires_tpu
def test_hi_panels_on_chip():
    """Hi-tier panel kernel ON SILICON keeps the <=1e-9 contract."""
    _tpu_or_skip()
    from waveforms_tpu import cos, gaussian, zero
    from waveforms_tpu.ops.hi_synth import synthesize_hi_panels
    from waveforms_tpu.ops.lowering import lower_schedule

    fs, span = 2e9, 16.384e-6
    rng = np.random.default_rng(5)
    chans = []
    for c in range(4):
        wv = zero()
        for _ in range(3):
            wv = wv + ((gaussian(60e-9) >> float(rng.uniform(0, 15e-6)))
                       * cos(2 * np.pi * (1e8 + 1e6 * c), 0.3))
        chans.append(wv)
    low = lower_schedule(chans, 0.0, span, fs, keep_f64=True)
    out = synthesize_hi_panels(low, interpret=False)
    t = np.arange(0.0, span, 1 / fs)
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(out[c] - oracle).max() / scale < 1e-9, c


@requires_tpu
def test_replay_sequence_on_chip():
    """Waveform-memory replay ON SILICON == per-shot plays, bitwise."""
    _tpu_or_skip()
    import jax.numpy as jnp

    from waveforms_tpu import cosPulse, gaussian
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    fs, span = 2e9, 4.096e-6
    lows = [lower_schedule([gaussian(200e-9) >> 1e-6], 0, span, fs),
            lower_schedule([cosPulse(160e-9) >> 2e-6], 0, span, fs)]
    seq = Sequencer(lows)
    ks = jnp.asarray([1, 0, 0, 1], jnp.int32)
    outs = np.asarray(seq.play_replay(ks))
    for i, k in enumerate([1, 0, 0, 1]):
        np.testing.assert_array_equal(outs[i], np.asarray(seq.play(k)))

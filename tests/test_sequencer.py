"""Sequence tables: K schedules stacked on device, played by traced index."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveforms_tpu import cos, cosPulse, drag_sin, gaussian, square
from waveforms_tpu.ops.lowering import lower_schedule
from waveforms_tpu.ops.pallas_synth import DeviceSchedule, synthesize_device
from waveforms_tpu.ops.sequencer import Sequencer

SPAN, FS = 1e-6, 2e9


def build_lows(part='real'):
    schemes = [
        [gaussian(100e-9) >> 0.3e-6, cosPulse(80e-9) >> 0.7e-6],
        [0.7 * square(200e-9, edge=20e-9) >> 0.5e-6,
         drag_sin(0.2e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                  block_freq=(151e6,), phase=0.1) >> 0.4e-6],
        [gaussian(60e-9) * cos(2 * np.pi * 150e6) >> 0.2e-6,
         cosPulse(50e-9) >> 0.8e-6],
    ]
    return [lower_schedule(ch, 0, SPAN, FS, part=part) for ch in schemes]


def test_play_matches_individual_schedules():
    lows = build_lows()
    seq = Sequencer(lows)
    for k in range(3):
        a = np.asarray(seq.play(k, rows_per_tile=8, interpret=True))
        b = np.asarray(synthesize_device(DeviceSchedule(lows[k]),
                                         rows_per_tile=8, interpret=True))
        np.testing.assert_array_equal(a, b)


def test_traced_index_shot_loop():
    seq = Sequencer(build_lows())

    @jax.jit
    def shots(idx):
        def body(i, acc):
            return acc + seq.play(idx[i], rows_per_tile=8,
                                  interpret=True).sum()
        return jax.lax.fori_loop(0, idx.shape[0], body, jnp.float32(0))

    expect = sum(float(np.asarray(seq.play(k, rows_per_tile=8,
                                           interpret=True)).sum())
                 for k in [0, 1, 2, 1])
    got = float(shots(jnp.asarray([0, 1, 2, 1], jnp.int32)))
    assert abs(got - expect) < 1e-2 * max(abs(expect), 1)


def test_complex_table():
    lows = build_lows(part='complex')
    seq = Sequencer(lows)
    assert seq.pair
    out = np.asarray(seq.play(1, rows_per_tile=8, interpret=True))
    ref = np.asarray(synthesize_device(DeviceSchedule(lows[1]),
                                       rows_per_tile=8, interpret=True))
    assert out.dtype == np.complex64
    np.testing.assert_array_equal(out, ref)


def test_bucketed_table():
    """NB>1 tables: bucket index maps survive the table gather."""
    from waveforms_tpu.core import WaveVStack
    lows = []
    for seed in (1, 2, 3):
        r = np.random.default_rng(seed)
        st = WaveVStack([(0.4 * cosPulse(40e-9) >> o)
                         for o in r.uniform(0, 7e-6, 60)])
        lows.append(lower_schedule([st], 0, 8.192e-6, 2e9,
                                   bucket_samples=2048))
    seq = Sequencer(lows)
    assert seq.shape[1] == 8  # buckets
    for k in range(3):
        a = np.asarray(seq.play(k, rows_per_tile=8, interpret=True))
        b = np.asarray(synthesize_device(DeviceSchedule(lows[k]),
                                         rows_per_tile=8, interpret=True))
        np.testing.assert_array_equal(a, b)


def test_run_sequence_shot_pipeline():
    """Shot table -> per-shot IQ via scan: selective demodulation."""
    from waveforms_tpu.parallel import run_sequence
    lows = [lower_schedule([gaussian(100e-9) * cos(2 * np.pi * 100e6)
                            >> 0.3e-6], 0, SPAN, FS),
            lower_schedule([cosPulse(80e-9) * cos(2 * np.pi * 150e6)
                            >> 0.5e-6], 0, SPAN, FS)]
    seq = Sequencer(lows)
    iq = np.asarray(run_sequence(seq, [0, 1, 0], demod_freqs=[100e6, 150e6],
                                 rows_per_tile=8, interpret=True))
    assert iq.shape == (3, 1, 2)
    # each shot's schedule demodulates onto its own tone, not the other
    assert np.abs(iq[0, 0, 0]) > 100 * np.abs(iq[0, 0, 1])
    assert np.abs(iq[1, 0, 1]) > 100 * np.abs(iq[1, 0, 0])
    np.testing.assert_allclose(iq[2], iq[0], atol=1e-9)
    # no demod -> stacked signals
    sig = np.asarray(run_sequence(seq, [0, 1], rows_per_tile=8,
                                  interpret=True))
    assert sig.shape == (2, 1, int(SPAN * FS))


def test_run_sequence_filter_matches_scipy():
    """run_sequence's IIR path pins the lfiltic-zero initial-condition
    convention (reference predistort semantics)."""
    from scipy.signal import lfiltic, lfilter as sp_lfilter

    from waveforms_tpu.ops.demod import demod_matrix
    from waveforms_tpu.parallel import run_sequence
    lows = [lower_schedule([gaussian(100e-9) * cos(2 * np.pi * 100e6)
                            >> 0.3e-6], 0, SPAN, FS)]
    seq = Sequencer(lows)
    ba = ([1.0, -0.3], [1.0, -0.05])
    iq = np.asarray(run_sequence(seq, [0], ba_filters=[ba],
                                 demod_freqs=[100e6], rows_per_tile=8,
                                 interpret=True))
    sig = np.asarray(seq.play(0, rows_per_tile=8, interpret=True))[0]
    zi = lfiltic(ba[0], ba[1], np.zeros(1), np.zeros(1))
    ref = (sp_lfilter(ba[0], ba[1], sig.astype(float), zi=zi)[0]
           @ demod_matrix([100e6], seq.n_samples, FS))
    assert abs(iq[0, 0, 0] - ref[0]) / abs(ref[0]) < 1e-6


def test_table_shape_mismatch_rejected():
    a = lower_schedule([gaussian(100e-9) >> 0.3e-6], 0, SPAN, FS)
    b = lower_schedule([gaussian(100e-9) >> 0.3e-6], 0, SPAN / 2, FS)
    with pytest.raises(ValueError, match="share"):
        Sequencer([a, b])
    with pytest.raises(ValueError, match="empty"):
        Sequencer([])


def test_mixed_real_complex_rejected():
    a = lower_schedule([gaussian(100e-9) >> 0.3e-6], 0, SPAN, FS)
    b = lower_schedule([gaussian(100e-9) >> 0.3e-6], 0, SPAN, FS,
                       part='complex')
    with pytest.raises(ValueError, match="mix"):
        Sequencer([a, b])


def test_sequencer_int16_codes():
    """play(k, out_dtype=int16) emits the same DAC codes as the direct
    device path for each table entry."""
    import jax.numpy as jnp

    from waveforms_tpu import cosPulse, gaussian
    lows = [lower_schedule([0.8 * gaussian(200e-9) >> 1e-6], 0, SPAN, FS),
            lower_schedule([0.5 * cosPulse(160e-9) >> 2e-6], 0, SPAN, FS)]
    seq = Sequencer(lows)
    for k, low in enumerate(lows):
        want = np.asarray(synthesize_device(DeviceSchedule(low),
                                            rows_per_tile=8, interpret=True,
                                            out_dtype=jnp.int16))
        got = np.asarray(seq.play(k, rows_per_tile=8, interpret=True,
                                  out_dtype=jnp.int16))
        assert got.dtype == np.int16
        np.testing.assert_array_equal(got, want)


def test_play_sparse_matches_play_and_traced_index():
    """Sparse sequence play: same output as the dense play, and usable
    with a traced index inside jit (one compilation per table)."""
    import jax
    import jax.numpy as jnp

    from waveforms_tpu import cosPulse, gaussian
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    fs, span = 2e9, 4.096e-6
    lows = [lower_schedule([gaussian(200e-9) >> 1e-6,
                            0.5 * cosPulse(100e-9) >> 3e-6], 0, span, fs),
            lower_schedule([cosPulse(160e-9) >> 2e-6,
                            0.3 * gaussian(150e-9) >> 0.5e-6], 0, span, fs)]
    seq = Sequencer(lows)
    for k in range(2):
        dense = np.asarray(seq.play(k, rows_per_tile=8, interpret=True))
        sparse = np.asarray(seq.play_sparse(k, Rs=8, interpret=True))
        np.testing.assert_array_equal(sparse, dense)

    @jax.jit
    def total(ks):
        def body(i, acc):
            return acc + seq.play_sparse(ks[i], Rs=8, interpret=True)
        return jax.lax.fori_loop(0, ks.shape[0], body,
                                 jnp.zeros((2, seq.n_samples)))

    got = np.asarray(total(jnp.asarray([0, 1, 0])))
    want = (2 * np.asarray(seq.play_sparse(0, Rs=8, interpret=True))
            + np.asarray(seq.play_sparse(1, Rs=8, interpret=True)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_play_sparse_rejects_unsupported_tables():
    import pytest as _pytest

    from waveforms_tpu import cosPulse, gaussian
    from waveforms_tpu.ops.lowering import UnsupportedFactor, lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    fs, span = 2e9, 4.096e-6
    bucketed = Sequencer([lower_schedule([gaussian(200e-9) >> 1e-6], 0,
                                         span, fs, bucket_samples=2048)])
    with _pytest.raises(UnsupportedFactor, match="single-bucket"):
        bucketed.play_sparse(0, interpret=True)

    pair = Sequencer([lower_schedule([(0.5 + 0.5j) * cosPulse(100e-9)
                                      >> 1e-6], 0, span, fs,
                                     part='complex')])
    with _pytest.raises(UnsupportedFactor, match="real-only"):
        pair.play_sparse(0, interpret=True)


def test_play_many_matches_single_shots():
    """vmapped shot batch == per-shot plays, dense and sparse (round 4:
    the amortized shot-loop surface)."""
    lows = build_lows()
    seq = Sequencer(lows)
    ks = np.array([2, 0, 1, 2])
    outs = np.asarray(seq.play_many(ks, rows_per_tile=8, interpret=True))
    assert outs.shape[0] == 4
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(
            outs[i], np.asarray(seq.play(int(k), rows_per_tile=8,
                                         interpret=True)))
    outs_s = np.asarray(seq.play_many(ks, sparse=True, Rs=8,
                                      interpret=True))
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(
            outs_s[i], np.asarray(seq.play_sparse(int(k), Rs=8,
                                                  interpret=True)))


def test_play_packed_matches_play():
    """Shot-packed panel playback == per-shot plays (round 4: one kernel
    launch for the whole sequence; grid steps scale with output panels,
    not shots)."""
    lows = build_lows()
    seq = Sequencer(lows)
    ks = np.array([2, 0, 1, 2, 1])
    outs = np.asarray(seq.play_packed(ks, Rs=8, interpret=True))
    assert outs.shape == (5, seq.shape[0], seq.n_samples)
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(
            outs[i], np.asarray(seq.play(int(k), rows_per_tile=8,
                                         interpret=True)))


def test_play_packed_traced_ks_and_clamp():
    """ks may be traced (measurement feedback); out-of-range indices clamp
    to the table edges exactly like play()."""
    seq = Sequencer(build_lows())

    @jax.jit
    def run(ks):
        return seq.play_packed(ks, Rs=8, interpret=True)

    got = np.asarray(run(jnp.asarray([1, 99, -3], jnp.int32)))
    for i, k in enumerate([1, 2, 0]):
        np.testing.assert_array_equal(
            got[i], np.asarray(seq.play(k, rows_per_tile=8,
                                        interpret=True)))


def test_play_packed_int16_codes():
    seq = Sequencer(build_lows())
    ks = np.array([0, 2])
    f32 = np.asarray(seq.play_packed(ks, Rs=8, interpret=True))
    codes = np.asarray(seq.play_packed(ks, Rs=8, interpret=True,
                                       out_dtype=jnp.int16))
    want = np.clip(np.round(f32 * 32767.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(codes, want)


def test_play_packed_rejects_unsupported_tables():
    from waveforms_tpu.ops.lowering import UnsupportedFactor
    lows_c = build_lows(part='complex')
    with pytest.raises(UnsupportedFactor, match='real-only'):
        Sequencer(lows_c).play_packed(np.array([0]), interpret=True)
    lows_b = [lower_schedule([gaussian(100e-9) >> 0.3e-6], 0, SPAN, FS,
                             bucket_samples=1024) for _ in range(2)]
    with pytest.raises(UnsupportedFactor, match='single-bucket'):
        Sequencer(lows_b).play_packed(np.array([0]), interpret=True)


def test_play_replay_matches_play():
    """Waveform-memory replay (round 4): palette gathers == per-shot
    plays, bitwise (the palette IS play()'s output)."""
    seq = Sequencer(build_lows())
    ks = np.array([2, 0, 1, 1])
    outs = np.asarray(seq.play_replay(ks, interpret=True))
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(
            outs[i], np.asarray(seq.play(int(k), interpret=True)))
    # traced ks + clamp semantics
    got = np.asarray(jax.jit(lambda k: seq.play_replay(k, interpret=True))(
        jnp.asarray([99, -1], jnp.int32)))
    np.testing.assert_array_equal(got[0], np.asarray(
        seq.play(2, interpret=True)))
    np.testing.assert_array_equal(got[1], np.asarray(
        seq.play(0, interpret=True)))
    # palette budget gate
    from waveforms_tpu.ops.lowering import UnsupportedFactor
    with pytest.raises(UnsupportedFactor, match='palette'):
        seq.play_replay(ks, max_palette_bytes=16)


def test_play_replay_per_channel_dac_scale():
    """The palette cache must key per-channel dac_scale vectors, not
    crash on float() (round-4 review finding)."""
    seq = Sequencer(build_lows())
    C = seq.shape[0]
    scales = np.linspace(500.0, 1500.0, C)
    ks = np.array([1, 0])
    got = np.asarray(seq.play_replay(ks, interpret=True,
                                     out_dtype=jnp.int16,
                                     dac_scale=scales))
    for i, k in enumerate(ks):
        want = np.asarray(seq.play(int(k), interpret=True,
                                   out_dtype=jnp.int16,
                                   dac_scale=scales))
        np.testing.assert_array_equal(got[i], want)
    # scalar and vector keys coexist in the cache
    got2 = np.asarray(seq.play_replay(ks, interpret=True,
                                      out_dtype=jnp.int16,
                                      dac_scale=1000.0))
    assert got2.dtype == np.int16


def test_play_many_sparse_rejects_out_dtype():
    seq = Sequencer(build_lows())
    with pytest.raises(NotImplementedError, match='f32-only'):
        seq.play_many(np.array([0, 1]), sparse=True,
                      out_dtype=jnp.int16, interpret=True)

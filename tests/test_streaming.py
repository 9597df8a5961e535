"""Streaming synthesis: chunked output must equal one-shot, filters included."""

import numpy as np
from scipy.signal import butter, tf2sos

from waveforms_tpu import cos, cosPulse, step
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import lower_schedule
from waveforms_tpu.ops.pallas_synth import DeviceSchedule, synthesize_device
from waveforms_tpu.ops.streaming import synthesize_stream


def test_stream_equals_oneshot():
    chans = [0.5 * cosPulse(50e-9) >> (k * 300e-9) for k in range(4)]
    low = lower_schedule(chans, 0, 1.31072e-6, 2e9)  # 2621 samples
    dev = DeviceSchedule(low)
    whole = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    chunks = [np.asarray(c) for c in
              synthesize_stream(dev, chunk_rows=8, rows_per_tile=8,
                                interpret=True)]
    got = np.concatenate(chunks, axis=1)
    assert got.shape == whole.shape
    np.testing.assert_array_equal(got, whole)


def test_stream_bucketed():
    rng = np.random.default_rng(1)
    stack = WaveVStack([(0.3 * cosPulse(40e-9) >> o)
                        for o in rng.uniform(0, 7e-6, 100)])
    low = lower_schedule([stack], 0, 8.192e-6, 2e9, bucket_samples=2048)
    dev = DeviceSchedule(low)
    whole = np.asarray(synthesize_device(dev, rows_per_tile=16,
                                         interpret=True))
    chunks = [np.asarray(c) for c in
              synthesize_stream(dev, chunk_rows=32, rows_per_tile=16,
                                interpret=True)]
    got = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(got, whole)


def test_stream_with_filters_matches_host():
    """Chunked device filtering carries zi exactly like the host path."""
    sample_rate = 2e9
    b, a = butter(3, 0.02)
    sos = tf2sos(b, a)

    wav = (step(0) >> 50e-9) * cos(2 * np.pi * 20e6)
    wav.start, wav.stop, wav.sample_rate = 0, 1.048576e-6, sample_rate
    wav.filters = (sos, 0.0)
    host = wav.sample()

    low = lower_schedule([wav], wav.start, wav.stop, sample_rate)
    dev = DeviceSchedule(low)
    chunks = [np.asarray(c) for c in
              synthesize_stream(dev, chunk_rows=4, rows_per_tile=4,
                                filters=(sos, 0.0), interpret=True)]
    got = np.concatenate(chunks, axis=1)[0]
    np.testing.assert_allclose(got, host, atol=2e-7)


def test_stream_complex_pair_with_filters():
    """Complex (pair-mode) streaming: chunks equal one-shot; SOS filtering
    applies to the planes independently with carried state."""
    from scipy.signal import sosfilt as sp_sosfilt

    from waveforms_tpu import mixing
    I, Q = mixing(0.5 * cosPulse(50e-9), freq=-80e6, DRAGScaling=1e-10)
    rng = np.random.default_rng(2)
    stack = WaveVStack([((I + 1j * Q) >> o)
                        for o in rng.uniform(0, 7e-6, 30)])
    low = lower_schedule([stack], 0, 8.192e-6, 2e9, part='complex',
                         bucket_samples=2048)
    dev = DeviceSchedule(low)
    whole = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    chunks = [np.asarray(c) for c in
              synthesize_stream(dev, chunk_rows=32, rows_per_tile=8,
                                interpret=True)]
    got = np.concatenate(chunks, axis=1)
    assert got.dtype == np.complex64
    np.testing.assert_array_equal(got, whole)

    b, a = butter(3, 0.05)
    sos = tf2sos(b, a)
    fchunks = [np.asarray(c) for c in
               synthesize_stream(dev, chunk_rows=32, rows_per_tile=8,
                                 filters=(sos, 0), interpret=True)]
    fgot = np.concatenate(fchunks, axis=1)
    ref = (sp_sosfilt(sos, whole[0].real.astype(float))
           + 1j * sp_sosfilt(sos, whole[0].imag.astype(float)))
    scale = np.abs(ref).max()
    assert np.abs(fgot[0] - ref).max() / scale < 2e-6


def test_stream_complex_pair_filters_two_channels():
    """Regression (ADVICE r1): with exactly C==2 channels, the pair-mode
    state used to be re-stacked on the second chunk (inferred from
    zi.shape[0] == C) and sosfilt raised a broadcast error."""
    from scipy.signal import sosfilt as sp_sosfilt

    from waveforms_tpu import mixing
    I, Q = mixing(0.5 * cosPulse(50e-9), freq=-60e6, DRAGScaling=1e-10)
    chans = [(I + 1j * Q) >> 0.2e-6, (I + 1j * Q) >> 1.1e-6]
    low = lower_schedule(chans, 0, 2.097152e-6, 2e9, part='complex')
    dev = DeviceSchedule(low)
    b, a = butter(3, 0.05)
    sos = tf2sos(b, a)
    # 3 chunks: the bug fired on chunk 2
    chunks = [np.asarray(c) for c in
              synthesize_stream(dev, chunk_rows=8, rows_per_tile=8,
                                filters=(sos, 0), interpret=True)]
    got = np.concatenate(chunks, axis=1)
    whole = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    for c in range(2):
        ref = (sp_sosfilt(sos, whole[c].real.astype(float))
               + 1j * sp_sosfilt(sos, whole[c].imag.astype(float)))
        scale = np.abs(ref).max()
        assert np.abs(got[c] - ref).max() / scale < 2e-6


def test_stream_complex_pair_nonzero_initial():
    """The DC 'initial' setpoint shifts the REAL plane only, matching the
    host path's sosfilt(sos, sig - initial) where complex minus a real
    scalar leaves imag untouched (round-4 review finding)."""
    from scipy.signal import sosfilt as sp_sosfilt

    from waveforms_tpu import mixing
    I, Q = mixing(0.5 * cosPulse(50e-9), freq=-80e6, DRAGScaling=1e-10)
    rng = np.random.default_rng(7)
    stack = WaveVStack([((I + 1j * Q) >> o)
                        for o in rng.uniform(0, 7e-6, 20)])
    low = lower_schedule([stack], 0, 8.192e-6, 2e9, part='complex',
                         bucket_samples=2048)
    dev = DeviceSchedule(low)
    whole = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    b, a = butter(3, 0.05)
    sos = tf2sos(b, a)
    initial = 0.25
    chunks = [np.asarray(c) for c in
              synthesize_stream(dev, chunk_rows=32, rows_per_tile=8,
                                filters=(sos, initial), interpret=True)]
    got = np.concatenate(chunks, axis=1)
    # host semantics: (sig - initial) shifts the real plane only
    ref_re = sp_sosfilt(sos, whole[0].real.astype(float) - initial) + initial
    ref_im = sp_sosfilt(sos, whole[0].imag.astype(float))
    ref = ref_re + 1j * ref_im
    scale = max(np.abs(ref).max(), 1e-30)
    assert np.abs(got[0] - ref).max() / scale < 1e-5


def test_stream_int16_dac_codes():
    """Streaming with out_dtype=int16 yields in-kernel DAC codes chunk by
    chunk, matching the one-shot engine's codes exactly."""
    import jax.numpy as jnp
    import pytest

    from waveforms_tpu import cosPulse, gaussian
    from waveforms_tpu.ops.pallas_synth import synthesize_device

    w = gaussian(100e-9) >> 0.3e-6
    low = lower_schedule([w, 0.5 * cosPulse(80e-9) >> 0.7e-6],
                         0, 1e-6, 2e9)
    dev = DeviceSchedule(low)
    want = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                        interpret=True,
                                        out_dtype=jnp.int16,
                                        dac_scale=1000.0))
    chunks = [np.asarray(c) for c in
              synthesize_stream(dev, chunk_rows=8, rows_per_tile=8,
                                interpret=True, out_dtype=jnp.int16,
                                dac_scale=1000.0)]
    got = np.concatenate(chunks, axis=1)
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match='quantized streaming'):
        next(iter(synthesize_stream(dev, chunk_rows=8, rows_per_tile=8,
                                    interpret=True, out_dtype=jnp.int16,
                                    filters=(tf2sos(*butter(3, 0.1)), 0))))

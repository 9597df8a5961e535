"""Real-hardware smoke tests (pytest -m tpu, WFTPU_TEST_TPU=1).

The default suite pins jax to a virtual CPU mesh (conftest.py); these
tests compile and execute the actual Mosaic kernel on the attached TPU --
the failure modes interpret mode cannot see (SMEM BlockSpec rules,
scalar-dispatched switch lowering, fixed-point phase on real VPU
transcendentals).  A committed pass log lives in
``benchmarks/tpu_pytest_r2.log``; re-run on a healthy chip with:

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

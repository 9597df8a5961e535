"""Cross-engine fuzz: random schedules must agree across all engines.

Each seed builds a random multi-channel schedule from the full pulse
palette (envelopes, carriers, DRAG variants, chirps, stacks, clipping,
large shifts) and checks the native C++ engine -- and for a subset of
seeds the Pallas kernel in interpret mode -- against the float64 numpy
oracle.  This is the broad-coverage safety net behind the targeted parity
tests: descriptor lowering, bucketing, ext-buffer plumbing and clipping
all get exercised in random combinations.
"""

import numpy as np
import pytest

from waveforms_tpu import (chirp, cos, cosPulse, drag, drag_sin, gaussian,
                           mixing, poly, sinc, square, zero)
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import lower_schedule

native = pytest.importorskip("waveforms_tpu.native")
pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"no toolchain: {native.build_error()}")

FS = 2e9
SPAN = 8e-6   # 16k samples


def random_pulse(rng):
    kind = rng.integers(0, 8)
    shift = rng.uniform(0.1e-6, SPAN - 0.1e-6)
    amp = rng.uniform(0.2, 1.5) * rng.choice([-1, 1])
    if kind == 0:
        return amp * (gaussian(rng.uniform(20e-9, 200e-9)) >> shift)
    if kind == 1:
        return amp * (cosPulse(rng.uniform(20e-9, 200e-9)) >> shift)
    if kind == 2:
        return amp * (square(rng.uniform(50e-9, 300e-9),
                             edge=rng.uniform(5e-9, 20e-9),
                             type=rng.choice(['erf', 'cos', 'linear']))
                      >> shift)
    if kind == 3:
        w = drag(rng.uniform(50e6, 300e6), 20e-9, plateau=rng.uniform(0, 1e-8),
                 delta=rng.uniform(-5e6, 5e6), block_freq=None,
                 phase=rng.uniform(0, 2 * np.pi), t0=0.0)
        return amp * (w >> shift)
    if kind == 4:
        w = drag_sin(rng.uniform(50e6, 300e6), 21.7e-9,
                     plateau=rng.uniform(0, 8e-9) + 0.3e-9,
                     delta=rng.uniform(-5e6, 5e6),
                     block_freq=(211e6, -97e6),
                     phase=rng.uniform(0, 2 * np.pi))
        return amp * (w >> shift)
    if kind == 5:
        return amp * (chirp(rng.uniform(1e6, 20e6), rng.uniform(30e6, 80e6),
                            rng.uniform(0.2e-6, 1e-6), rng.uniform(0, 6),
                            'linear') >> shift)
    if kind == 6:
        I, _ = mixing(0.5 * cosPulse(rng.uniform(20e-9, 80e-9)) >> shift,
                      freq=rng.uniform(-300e6, 300e6),
                      phase=rng.uniform(0, 2 * np.pi), DRAGScaling=1e-10)
        return amp * I
    return amp * ((sinc(rng.uniform(20e6, 80e6))
                   + poly([0.1, rng.uniform(-1e5, 1e5)]))
                  * square(rng.uniform(0.1e-6, 0.4e-6)) >> shift)


def random_channel(rng):
    n = int(rng.integers(1, 6))
    if rng.random() < 0.3:
        ch = WaveVStack([random_pulse(rng) for _ in range(n)])
    else:
        ch = zero()
        for _ in range(n):
            ch = ch + random_pulse(rng)
    if rng.random() < 0.25:
        ch = ch * cos(2 * np.pi * rng.uniform(50e6, 500e6),
                      rng.uniform(0, 2 * np.pi))
    if rng.random() < 0.2:
        ch.max = float(rng.uniform(0.4, 1.0))
        ch.min = -float(rng.uniform(0.4, 1.0))
    return ch


def oracle_and_errs(chans, out):
    t = np.arange(0, SPAN, 1 / FS)
    errs = []
    for i, ch in enumerate(chans):
        ora = np.asarray(ch(t), dtype=float)
        scale = max(np.abs(ora).max(), 1e-3)
        errs.append(np.abs(out[i] - ora).max() / scale)
    return errs


@pytest.mark.parametrize('seed', range(8))
def test_fuzz_native_vs_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    chans = [random_channel(rng) for _ in range(int(rng.integers(1, 5)))]
    bucket = int(rng.choice([0, 2048, 4096]))
    low = lower_schedule(chans, 0, SPAN, FS,
                         bucket_samples=bucket if bucket else None)
    out = native.synthesize_native(low)
    errs = oracle_and_errs(chans, out)
    assert max(errs) < 5e-6, f"seed {seed}: per-channel rel errs {errs}"


@pytest.mark.parametrize('seed', range(2))
def test_fuzz_pallas_vs_oracle(seed):
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                synthesize_device)
    rng = np.random.default_rng(2000 + seed)
    chans = [random_channel(rng) for _ in range(2)]
    low = lower_schedule(chans, 0, SPAN, FS, bucket_samples=4096)
    out = np.asarray(synthesize_device(DeviceSchedule(low), rows_per_tile=8,
                                       interpret=True))
    errs = oracle_and_errs(chans, out)
    assert max(errs) < 5e-6, f"seed {seed}: per-channel rel errs {errs}"


@pytest.mark.parametrize('seed', range(2))
def test_fuzz_complex_pair(seed):
    """Random complex-amplitude schedules: pair engines vs oracle."""
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                synthesize_device)
    rng = np.random.default_rng(3000 + seed)
    chans = [(rng.uniform(0.3, 1.0) + 1j * rng.uniform(0.3, 1.0))
             * random_channel(rng) for _ in range(2)]
    for ch in chans:  # complex clip is a documented divergence: disable
        ch.max, ch.min = np.inf, -np.inf
    low = lower_schedule(chans, 0, SPAN, FS, part='complex')
    t = np.arange(0, SPAN, 1 / FS)
    # WaveVStack.__call__ takes .real (reference convention); complex
    # parity compares against the stack's complex accumulation
    oras = [np.asarray((ch.simplify() if isinstance(ch, WaveVStack)
                        else ch)(t)).astype(complex) for ch in chans]

    out_n = native.synthesize_native(low)
    for i, ora in enumerate(oras):
        scale = max(np.abs(ora).max(), 1e-3)
        assert np.abs(out_n[i] - ora).max() / scale < 5e-6, f"native ch{i}"

    if low.pallas_ok:
        out_p = np.asarray(synthesize_device(DeviceSchedule(low),
                                             rows_per_tile=8,
                                             interpret=True))
        for i, ora in enumerate(oras):
            scale = max(np.abs(ora).max(), 1e-3)
            assert np.abs(out_p[i] - ora).max() / scale < 5e-6, f"pallas ch{i}"


@pytest.mark.parametrize('seed', range(3))
def test_fuzz_sparse_vs_dense(seed):
    """Random schedules: the sparse worklist kernel must equal the dense
    grid bit-for-bit (both interpret mode, same walker)."""
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                synthesize_device)
    from waveforms_tpu.ops.sparse_synth import synthesize_sparse
    rng = np.random.default_rng(4000 + seed)
    chans = [random_channel(rng) for _ in range(2)]
    low = lower_schedule(chans, 0, SPAN, FS, bucket_samples=4096)
    dev = DeviceSchedule(low)
    dense = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    sparse = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    np.testing.assert_array_equal(sparse, dense)


@pytest.mark.parametrize('seed', range(4))
def test_fuzz_stack_vs_oracle(seed):
    """Random schedules through the pulse-instance batched path: narrow
    instances batch, wide ones fall to the kernel residual, the sum must
    match the float64 oracle."""
    from waveforms_tpu.ops.stack_synth import build_stack_plan, \
        synthesize_stack
    rng = np.random.default_rng(5000 + seed)
    chans = [random_channel(rng) for _ in range(2)]
    low = lower_schedule(chans, 0, SPAN, FS)
    plan = build_stack_plan(low)
    if plan is None:
        pytest.skip('no batchable instances this seed')
    out = np.asarray(synthesize_stack(low, plan, interpret=True))
    errs = oracle_and_errs(chans, out)
    assert max(errs) < 5e-6, f"seed {seed}: per-channel rel errs {errs}"

"""Fine-skip (two-level) walk of the dense kernel.

The mid-occupancy valley fix (round 4): inside a live (R, 128) tile the
kernel re-bisects segments at FINE_ROWS granularity and walks only live
strips, chosen per tile by a host-computed flag.  These tests pin

* parity against the numpy oracle on a scattered (mid-occupancy) schedule,
* bit-equality between the fine and full walks (adding a masked-out
  segment contributes exactly 0.0, so the two orders agree bitwise),
* that the flag actually fires on scattered schedules and stays off for
  occupancy-1 schedules (the covers fast path is untouched),
* every output mode (pair, int16 DAC, bf16) through the fine path.

Matches the zero-skip evaluator semantics of the reference
(/root/reference/waveforms/_waveform.pyx:155-169) at device scale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveforms_tpu import engine
from waveforms_tpu.models import shapes as sh
from waveforms_tpu.ops.lowering import lower_schedule
from waveforms_tpu.ops.pallas_synth import (DeviceSchedule, FINE_ROWS,
                                            synthesize_device)

START, STOP, SR = 0.0, 2e-4, 2e9    # 400k samples


def scattered_channels(n_ch=2, n_pulse=12, seed=0, part='real'):
    rng = np.random.default_rng(seed)
    chans = []
    for _ in range(n_ch):
        wv = sh.zero()
        for _ in range(n_pulse):
            t0 = float(rng.uniform(0, 1.9e-4))
            p = ((sh.gaussian(4e-7) >> t0)
                 * sh.cos(2 * np.pi * rng.uniform(1e6, 5e7),
                          rng.uniform(0, 6)))
            wv = wv + p
        chans.append(wv)
    return chans


def fine_flags(low, R=256):
    """Replicate the prologue's per-tile fine/full decision on the host."""
    C, NB, S, T, F = low.shape
    NF = R // FINE_ROWS
    n_rows = -(-low.n_samples // 128)
    G = max(-(-n_rows // R), 1)
    hmax = np.maximum.accumulate(low.seg_hi, axis=-1)
    fine_sz = R * 128 // NF
    bases = np.arange(NB * G * NF, dtype=np.int64) * fine_sz
    flags = []
    for c in range(C):
        for b in range(NB):
            s0 = np.searchsorted(hmax[c, b], bases, side='right')
            s1 = np.searchsorted(low.seg_lo[c, b], bases + fine_sz,
                                 side='left')
            work_f = np.maximum(s1 - s0, 0).reshape(-1, NF).sum(1)
            s0t = s0.reshape(-1, NF)[:, 0]
            s1t = s1.reshape(-1, NF)[:, -1]
            work_c = np.maximum(s1t - s0t, 0) * NF
            flags.append(work_f < work_c)
    return np.concatenate(flags)


def test_fine_flag_fires_on_scattered_schedule():
    low = lower_schedule(scattered_channels(), START, STOP, SR)
    flags = fine_flags(low)
    assert flags.any(), "scattered schedule should trigger the fine walk"


def test_fine_flag_off_at_occupancy_one():
    # infinite support: one segment covers every tile end-to-end, so the
    # fine walk never pays on interior tiles.  The final tile is the grid's
    # row padding past n_samples -- genuinely silent strips, where the
    # flag SHOULD fire (the fine walk skips the padding evaluation).
    chans = [sh.cos(2 * np.pi * 5e7)]
    low = lower_schedule(chans, START, STOP, SR)
    assert not fine_flags(low)[:-1].any()


def test_fine_parity_vs_oracle():
    chans = scattered_channels()
    low = lower_schedule(chans, START, STOP, SR)
    out = np.asarray(synthesize_device(DeviceSchedule(low), interpret=True))
    ref = engine.synthesize(chans, START, STOP, SR, engine='numpy')
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) / scale < 2e-6


def test_fine_equals_full_bitwise():
    low = lower_schedule(scattered_channels(seed=3), START, STOP, SR)
    assert fine_flags(low).any()
    dev = DeviceSchedule(low)
    from waveforms_tpu.ops.pallas_synth import _run_kernel
    C, NB, S, T, F = dev.shape
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // 256) * 256
    kw = dict(S=S, T=T, F=F, R=256, n_rows=n_rows, tiles_per_bucket=1,
              ops_present=dev.ops_present, interpret=True)
    row0 = jnp.zeros((1, 1, 1, 1), jnp.int32)
    a = np.asarray(_run_kernel(row0, *dev.tensors, None, None, fine=True,
                               **kw))
    b = np.asarray(_run_kernel(row0, *dev.tensors, None, None, fine=False,
                               **kw))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize('mode', ['pair', 'int16', 'bf16'])
def test_fine_output_modes(mode):
    chans = scattered_channels(n_ch=1, n_pulse=8, seed=5)
    part = 'complex' if mode == 'pair' else 'real'
    low = lower_schedule(chans, START, STOP, SR, part=part)
    dev = DeviceSchedule(low)
    ref = engine.synthesize(chans, START, STOP, SR, engine='numpy',
                            part=part)
    if mode == 'pair':
        out = np.asarray(synthesize_device(dev, interpret=True))
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(out - ref)) / scale < 2e-6
    elif mode == 'int16':
        out = np.asarray(synthesize_device(dev, interpret=True,
                                           out_dtype=jnp.int16))
        exp = np.clip(np.round(ref * 32767.0), -32768, 32767)
        assert np.max(np.abs(out.astype(np.int64)
                             - exp.astype(np.int64))) <= 1
    else:
        out = np.asarray(synthesize_device(dev, interpret=True,
                                           out_dtype=jnp.bfloat16)
                         .astype(jnp.float32))
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(out - ref)) / scale < 1e-2


def test_fine_multibucket_parity():
    chans = scattered_channels(n_ch=1, n_pulse=10, seed=7)
    low = lower_schedule(chans, START, STOP, SR,
                         bucket_samples=131072)
    assert low.n_buckets > 1
    out = np.asarray(synthesize_device(DeviceSchedule(low), interpret=True))
    ref = engine.synthesize(chans, START, STOP, SR, engine='numpy')
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) / scale < 2e-6

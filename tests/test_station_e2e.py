"""Station-scale end-to-end correctness fixture (round 4).

Models a realistic multi-qubit control station the way the reference's
(dead-code but documenting) ``tests/config.py`` does -- qubits with f01 /
anharmonicity, XY drive lines through IQ mixers with DRAG correction, Z
flux lines with exponential-settling distortion pre-compensation, and a
shared multi-tone readout line -- then drives ONE full pipeline

    gates -> channel waveforms -> mixing -> predistortion -> synthesis
          -> demodulation

through every engine and asserts oracle parity at each stage.  This is
the "does the whole stack compose" test; the per-component suites pin
the parts.

Reference realism anchor: /root/reference/tests/config.py (station,
qubits Q1/Q2 with f01 ~4.35-4.68 GHz, AWG sampleRate 2 GS/s, rfUnitary /
Measure gates).
"""

import numpy as np
import pytest

from waveforms_tpu import engine
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.distortion import exp_decay_filter, predistort
from waveforms_tpu.models.mixing import mixing
from waveforms_tpu.models import shapes as sh
from waveforms_tpu.utils.signal import getFTMatrix

FS = 2e9                       # AWG sample rate (config.py AWG params)
LO = {'Q1': 4.70e9, 'Q2': 4.35e9}      # PSG.LO1 / PSG.LO2
F01 = {'Q1': 4.675808085e9, 'Q2': 4.354224549e9}
READ_LO = 6.99e9
FR = {'Q1': 6.87836e9, 'Q2': 6.92248e9}
SPAN = 4.096e-6                # one shot window (8192 samples)
Z_SETTLE = ([0.02, 0.005], [3e-6, 20e-6])


def _x_half(q, t0, phase=0.0):
    """rfUnitary(pi/2, phase) drive pulse on qubit q's XY line: DRAG-
    corrected cosPulse envelope mixed to the IF = f01 - LO."""
    env = 0.45 * sh.cosPulse(24e-9) >> t0
    I, Q = mixing(env, freq=F01[q] - LO[q], phase=phase,
                  DRAGScaling=0.3e-9)
    return I, Q


def _z_square(t0, width, amp):
    return amp * (sh.square(width, edge=4e-9) >> t0)


def _measure_pulse(q, t0):
    env = 0.3 * (sh.square(1e-6, edge=20e-9) >> t0)
    I, Q = mixing(env, freq=FR[q] - READ_LO)
    return I, Q


def build_station_schedule():
    """A 2-qubit sequence: X/2 on both, CZ-ish flux pulse, measure both.

    Returns the per-channel WaveVStack dict keyed by AWG channel name
    (config.py channel naming)."""
    chans = {k: [] for k in ('X1.I', 'X1.Q', 'X2.I', 'X2.Q', 'Z1', 'Z2',
                             'RI1', 'RQ1')}
    # gate layer 1: X/2 on both qubits
    for q, (ci, cq) in (('Q1', ('X1.I', 'X1.Q')),
                        ('Q2', ('X2.I', 'X2.Q'))):
        I, Q = _x_half(q, 0.1e-6)
        chans[ci].append(I)
        chans[cq].append(Q)
    # gate layer 2: flux pulses (CZ-like) on both Z lines
    chans['Z1'].append(_z_square(0.2e-6, 60e-9, 0.31))
    chans['Z2'].append(_z_square(0.2e-6, 60e-9, -0.18))
    # second drive layer with a phase (virtual-Z tracked in software)
    for q, (ci, cq) in (('Q1', ('X1.I', 'X1.Q')),
                        ('Q2', ('X2.I', 'X2.Q'))):
        I, Q = _x_half(q, 0.35e-6, phase=np.pi / 3)
        chans[ci].append(I)
        chans[cq].append(Q)
    # readout: both tones summed on the shared line
    for q in ('Q1', 'Q2'):
        I, Q = _measure_pulse(q, 2.2e-6)
        chans['RI1'].append(I)
        chans['RQ1'].append(Q)
    return {k: WaveVStack(v) if v else sh.zero() for k, v in chans.items()}


ENGINES = ['numpy', 'xla', 'pallas']
try:
    from waveforms_tpu import native
    if native.available():
        ENGINES.append('native')
except Exception:
    pass


@pytest.fixture(scope='module')
def station():
    chans = build_station_schedule()
    names = sorted(chans)
    t = np.arange(0, SPAN, 1 / FS)
    oracle = np.stack([np.asarray(
        (chans[n].simplify() if isinstance(chans[n], WaveVStack)
         else chans[n])(t)).real for n in names])
    return chans, names, t, oracle


@pytest.mark.parametrize('eng', ENGINES)
def test_station_synthesis_every_engine(station, eng):
    chans, names, t, oracle = station
    out = np.asarray(engine.synthesize([chans[n] for n in names],
                                       0, SPAN, FS, engine=eng))
    scale = np.abs(oracle).max()
    assert np.abs(out - oracle).max() / scale < 2e-6, eng


def test_station_flux_predistortion_device_matches_host(station):
    """Z-line pre-compensation: the device associative-scan IIR must match
    scipy's application of the same exp-settling inverse filter."""
    import jax.numpy as jnp
    from scipy.signal import lfilter as sp_lfilter

    from waveforms_tpu.ops.iir import lfilter as dev_lfilter

    chans, names, t, oracle = station
    z1 = oracle[names.index('Z1')]
    filters = [exp_decay_filter(a, tau, FS, inv=True)
               for a, tau in zip(*Z_SETTLE)]
    want = z1.copy()
    for b, a in filters:
        want = sp_lfilter(b, a, want)
    got = jnp.asarray(z1, jnp.float32)
    for b, a in filters:
        got = dev_lfilter(jnp.asarray(b, jnp.float32),
                          jnp.asarray(a, jnp.float32), got)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(got) - want).max() / scale < 5e-5


def test_station_predistort_pipeline_matches_scipy(station):
    """distortion.predistort (the reference API) over the flux channel."""
    chans, names, t, oracle = station
    z1 = oracle[names.index('Z1')]
    out = predistort(z1, [exp_decay_filter(0.02, 3e-6, FS, inv=True)])
    assert np.isfinite(out).all() and out.shape == z1.shape


def test_station_readout_demodulation_consistent(station):
    """Demodulate the readout line synthesized by each engine: the IQ
    points must agree to engine tolerance (MXU demod twin vs host FT)."""
    import jax.numpy as jnp

    from waveforms_tpu.ops.demod import demod_matrix, demodulate

    chans, names, t, oracle = station
    ri = names.index('RI1')
    freqs = [FR[q] - READ_LO for q in ('Q1', 'Q2')]
    n = len(t)
    # host reference: getFTMatrix (reference utils API)
    ft = getFTMatrix(freqs, n, sampleRate=FS)
    iq_host = oracle[ri] @ np.asarray(ft)
    out = np.asarray(engine.synthesize([chans['RI1']], 0, SPAN, FS,
                                       engine='pallas'))
    m = demod_matrix(freqs, n, FS)
    iq_dev = np.asarray(demodulate(jnp.asarray(out), m))[0]
    assert np.abs(iq_dev - iq_host).max() / np.abs(iq_host).max() < 1e-4
    # the tones must actually separate: each qubit's own tone dominates
    assert np.abs(iq_host).min() > 0


def test_station_full_pipeline_int16_dac(station):
    """The AWG upload path: int16 DAC codes of every channel equal
    round(f32 * full_scale) -- the exactness contract labs rely on."""
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                synthesize_device)

    chans, names, t, oracle = station
    low = lower_schedule([chans[n] for n in names], 0, SPAN, FS)
    dev = DeviceSchedule(low)
    f32 = np.asarray(synthesize_device(dev, interpret=True))
    codes = np.asarray(synthesize_device(dev, interpret=True,
                                         out_dtype=jnp.int16))
    exp = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    assert np.abs(codes.astype(np.int64) - exp.astype(np.int64)).max() <= 1


def test_station_hi_tier_erf_edges(station):
    """The full station schedule -- erf-edged flux squares included
    (``sh.square(edge=...)`` defaults to type='erf') -- through the
    double-f32 tier: 1e-9 relative against the f64 oracle.  Round 5
    closed the hi-tier erf exclusion (df32.erf), so no channel falls
    back to x64."""
    chans, names, t, oracle = station
    out = np.asarray(engine.synthesize([chans[n] for n in names],
                                       0, SPAN, FS, engine='pallas',
                                       precision='double'))
    assert out.dtype == np.float64
    scale = np.abs(oracle).max()
    assert np.abs(out - oracle).max() / scale < 1e-9


def test_station_synthesis_on_mesh(station):
    """The same station schedule through the multi-chip entry point: the
    ('channel','time') mesh run must match the host oracle like every
    single-chip engine (routing included -- whatever path the classifier
    picks for this schedule shape must hold parity per shard)."""
    import jax

    from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    chans, names, t, oracle = station
    mesh = channel_mesh(n_channel=4, n_time=2)
    out = np.asarray(synthesize_on_mesh([chans[n] for n in names],
                                        0, SPAN, FS, mesh, interpret=True))
    scale = np.abs(oracle).max()
    assert np.abs(out - oracle).max() / scale < 2e-6

"""Double-f32 (hi) kernel tier: the <=1e-9 contract at kernel speed.

Anchored to the numpy f64 oracle (reference waveform.py semantics); every
assertion is scale-relative (max|err| / max|oracle|), the same metric
docs/PRECISION.md reports.  The on-chip twin of these tests is
tools/tpu_capture.py task r4_hi_*.
"""

import numpy as np
import pytest

from waveforms_tpu import engine
from waveforms_tpu.models import shapes as sh
from waveforms_tpu.ops.hi_synth import HiSchedule, synthesize_hi
from waveforms_tpu.ops.lowering import UnsupportedFactor, lower_schedule

FS = 2e9
SPAN = 8.192e-6
TOL = 1e-9


def _check(chans, span=SPAN, tol=TOL, **lower_kw):
    low = lower_schedule(chans, 0.0, span, FS, keep_f64=True, **lower_kw)
    out = synthesize_hi(low)
    ref = engine.synthesize(chans, 0.0, span, FS, engine='numpy')
    scale = max(np.max(np.abs(ref)), 1e-30)
    err = np.max(np.abs(out - ref)) / scale
    assert err < tol, err
    return err


def test_gaussian_cos_pulses():
    rng = np.random.default_rng(0)
    chans = []
    for _ in range(2):
        wv = sh.zero()
        for _ in range(6):
            wv = wv + ((sh.gaussian(4e-7) >> float(rng.uniform(0, 7e-6)))
                       * sh.cos(2 * np.pi * rng.uniform(1e6, 5e7),
                                rng.uniform(0, 6)))
        chans.append(wv)
    _check(chans)


def test_long_carrier_phase_accumulation():
    # 2M samples of pure carrier: int32-turn phase + df residual must hold
    # 1e-9 END-TO-END (f32 naive phase would be ~1e-3 rad off here)
    _check([sh.cos(2 * np.pi * 123.456789e6, 0.7)], span=1.048576e-3,
           tol=2e-9)


def test_exp_decay_and_sinc():
    chans = [(sh.exp(-2e6) >> 1e-6) * sh.square(3e-6, edge=0) >> 2e-6,
             sh.sinc(8e6) >> 4e-6]
    _check(chans)


def test_drag_envelope():
    w = sh.drag(freq=50e6, width=100e-9, plateau=40e-9, delta=1e6,
                block_freq=None, phase=0.3)
    _check([w >> 2e-6])


def test_powers_route_through_df():
    _check([(sh.gaussian(1e-6) ** 3) >> 3e-6])


def test_clip_rails_f32_contract():
    # finite clip rails apply at f32 precision by contract -- tolerance
    # loosens to f32 scale exactly at the rails
    w = (2.0 * sh.gaussian(2e-6)) >> 4e-6
    w.min, w.max = -1.0, 1.0
    _check([w], tol=2e-7)


def test_erf_edged_flux_schedule():
    # step(type='erf')-edged flux/square schedules -- the reference's
    # bread-and-butter shapes (waveform.py:1082-1107) -- run the hi tier
    # through df32.erf (three-regime, ~2e-12 rel; round 5 closed the
    # exclusion).  Mixed with a carrier so the product path exercises
    # df mul of the erf pair.
    chans = [sh.square(2e-6, edge=1e-7, type='erf') >> 3e-6,
             (sh.step(2e-7) >> 1e-6) * sh.cos(2 * np.pi * 1.5e7, 0.4)]
    _check(chans)


def test_erf_full_argument_range():
    # one erf edge sampled densely across all three df32.erf regimes
    # (|x| < 1.25 Taylor, the Chebyshev-erfc band, and saturation): the
    # wide edge keeps |x| small over many samples, the narrow edge
    # saturates within a few
    chans = [sh.step(4e-6) >> 4e-6, sh.step(1e-8) >> 4e-6]
    _check(chans)


def test_requires_keep_f64_lowering():
    low = lower_schedule([sh.gaussian(1e-6)], 0.0, SPAN, FS)
    with pytest.raises(ValueError):
        synthesize_hi(low)


def test_engine_precision_double_routing():
    w = [sh.gaussian(4e-7) * sh.cos(2 * np.pi * 3e7)]
    out = engine.synthesize(w, 0.0, SPAN, FS, engine='pallas',
                            precision='double')
    assert out.dtype == np.float64
    ref = engine.synthesize(w, 0.0, SPAN, FS, engine='numpy')
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < TOL
    # numpy/native engines are f64 already and pass through
    out2 = engine.synthesize(w, 0.0, SPAN, FS, engine='numpy',
                             precision='double')
    np.testing.assert_array_equal(out2, ref)
    with pytest.raises(ValueError):
        engine.synthesize(w, 0.0, SPAN, FS, engine='pallas-sparse',
                          precision='double')


def test_args_lo_checkpoint_roundtrip(tmp_path):
    low = lower_schedule([sh.gaussian(4e-7) * sh.cos(2 * np.pi * 3e7)],
                         0.0, SPAN, FS, keep_f64=True)
    p = tmp_path / "hi.npz"
    low.save(p)
    from waveforms_tpu.ops.lowering import LoweredSchedule
    low2 = LoweredSchedule.load(p)
    assert low2.args_lo is not None and low2.amp_lo is not None
    np.testing.assert_array_equal(low.args_lo, low2.args_lo)
    out = synthesize_hi(low2)
    ref = engine.synthesize([sh.gaussian(4e-7) * sh.cos(2 * np.pi * 3e7)],
                            0.0, SPAN, FS, engine='numpy')
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < TOL


def test_hischedule_reuse():
    low = lower_schedule([sh.gaussian(4e-7) >> 2e-6], 0.0, SPAN, FS,
                         keep_f64=True)
    dev = HiSchedule(low)
    a = synthesize_hi(dev)
    b = synthesize_hi(dev)
    np.testing.assert_array_equal(a, b)


def test_linear_chirp_hi_tier():
    """Chirp quadratic phase at 1e-9: exact int32 ring + df residuals."""
    from bench import build_dense_schedule
    chans = build_dense_schedule(n_channels=2, duration=3.2768e-5)
    _check(chans, span=3.2768e-5)


def test_linear_chirp_hi_tier_1M_samples():
    from bench import build_dense_schedule
    chans = build_dense_schedule(n_channels=1, duration=5.24288e-4)
    _check(chans, span=5.24288e-4, tol=2e-9)


def test_cosh_sinh_hi_tier():
    # coshPulse edges (the reference's sech-flattop family) through the
    # df exp form; sinh near zero exercises the benign df cancellation
    chans = [sh.coshPulse(8e-7, plateau=4e-7) >> 3e-6,
             (sh.sinh(2e6) * sh.gaussian(1e-6)) >> 3e-6]
    _check(chans)


def test_poly_gauss_hi_tier():
    # d_gaussian derivative family: df coefficients recover the ~1e-6
    # f32 coefficient-rounding floor to 1e-9
    chans = [sh.gaussian(6e-7, d=d) >> 3e-6 for d in (1, 2, 3)]
    _check(chans)


def test_mollifier_hi_tier():
    # the d = 0 bump runs df (div + exp); d >= 1 evaluates the
    # bump / (x^2-1)^(2d) * P_d(x) form with df polynomial coefficients
    # (round 5 closed the derivative exclusion; the (-1)^k k! coefficient
    # cancellation at the bump edge sits ~8 digits below df resolution)
    _check([sh.mollifier(2e-6, plateau=5e-7) >> 3e-6])
    _check([sh.mollifier(2e-6, d=d) >> 3e-6 for d in (1, 2, 3)])


def test_drag_sin_hi_tier():
    # multi-tone DRAG (OP_DRAG_SIN/SINX, ext-block coefficient reads):
    # round 5 closed the exclusion by carrying the f64 ext side-buffer as
    # (hi, lo) SMEM planes.  Reference semantics:
    # /root/reference/waveforms/multy_drag.py drag_sin/drag_sinx.
    from waveforms_tpu.models import drag_sin, drag_sinx
    chans = [
        drag_sin(0.2e9, 22e-9, plateau=6e-9, delta=3e6,
                 block_freq=(250e6, 280e6), phase=0.4, t0=2e-6),
        drag_sinx(0.2e9, 22e-9, plateau=6e-9, delta=3e6,
                  block_freq=(250e6,), phase=0.1, t0=4e-6),
    ]
    _check(chans, tol=2e-9)


@pytest.mark.parametrize('kind', ['exponential', 'hyperbolic'])
def test_exotic_chirp_hi_tier(kind):
    """keep_f64 lowering tightens the exotic-chirp quadratic fit to
    _CHIRP_TOL_HI (5e-10 rad), so the expanded LINEARCHIRP windows keep
    the hi tier's 1e-9 contract (round 5; previously fit-limited at
    ~3e-8).  Reference transcendental forms:
    /root/reference/waveforms/waveform.py chirp bases."""
    w = sh.chirp(1e6, 8e7, SPAN, type=kind) * sh.gaussian(4e-6) >> 4e-6
    _check([w])


def test_exotic_chirp_default_lowering_unchanged():
    # non-hi lowering keeps the 3e-8 tolerance (the f32 kernels' 1e-6
    # contract doesn't pay for ~4x windows); keep_f64 lowering splits
    # finer AND stays within the tolerance-scaled window cap (no
    # cap-breach warning => the fit really met 5e-10 everywhere)
    import warnings

    from waveforms_tpu.ops.lowering import lower_schedule as ls
    w = sh.chirp(1e6, 8e7, SPAN, type='exponential') >> 0
    s_f32 = ls([w], 0.0, SPAN, FS).shape[2]
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        s_hi = ls([w], 0.0, SPAN, FS, keep_f64=True).shape[2]
    assert s_hi > s_f32     # the hi fit really is finer


def test_hi_panels_match_oracle_and_dense():
    """Panel-kernel hi tier (round 4): sparse schedules keep the <=1e-9
    contract while factor math scales with occupancy."""
    from waveforms_tpu.ops.hi_synth import (synthesize_hi_panels,
                                            synthesize_hi_routed)
    rng = np.random.default_rng(3)
    chans = []
    for c in range(3):
        wv = sh.zero()
        for _ in range(4):
            wv = wv + ((sh.gaussian(3e-8) >> float(rng.uniform(0, 7e-6)))
                       * sh.cos(2 * np.pi * (1e8 + 1e6 * c), 0.3))
        chans.append(wv)
    low = lower_schedule(chans, 0.0, SPAN, FS, keep_f64=True)
    out = synthesize_hi_panels(low)
    ref = engine.synthesize(chans, 0.0, SPAN, FS, engine='numpy')
    scale = max(np.max(np.abs(ref)), 1e-30)
    assert np.max(np.abs(out - ref)) / scale < TOL
    # panel result == dense hi result bit-for-bit (same walker, same df
    # math; only the iteration order over subtiles differs -- each output
    # sample is still produced by exactly one walk)
    dense = synthesize_hi(low)
    np.testing.assert_array_equal(out, dense)
    # the router picks panels for this occupancy
    routed = synthesize_hi_routed(low)
    np.testing.assert_array_equal(routed, out)


def test_hi_routed_windows_over_budget_worklists(monkeypatch):
    """The hi router windows over-budget worklists like the f32 engine
    (one launch per window, hi/lo planes concatenated)."""
    from waveforms_tpu.ops import sparse_synth as sp
    from waveforms_tpu.ops.hi_synth import (synthesize_hi,
                                            synthesize_hi_routed)
    rng = np.random.default_rng(9)
    chans = []
    for c in range(2):
        wv = sh.zero()
        for _ in range(4):
            wv = wv + ((sh.gaussian(3e-8) >> float(rng.uniform(0, 7e-6)))
                       * sh.cos(2 * np.pi * 1e8, 0.2))
        chans.append(wv)
    low = lower_schedule(chans, 0.0, SPAN, FS, keep_f64=True)
    dense = synthesize_hi(low)
    base = sp.build_sparse_plan(low)
    budget = (4 * sp.next_pow2(-(-base.n_live // 2)) + 64) * 4
    monkeypatch.setattr(sp, 'PANEL_WORK_SMEM_BUDGET', budget)
    routed = synthesize_hi_routed(low)
    np.testing.assert_array_equal(routed, dense)

"""Panel kernel (grid = channel x panel x bucket) parity and gating.

The panel kernel is the round-4 redesign of the sparse path: the
grid-overhead and walker-cost probes (benchmarks/tpu_state.json:
r4_grid_overhead_probe, r4_walker_cost_probe) measured ~0.5 us of pure
step machinery per 32-row subtile against ~1-7 ns for the walker's
actual scalar work, so the fix is FEWER, FATTER steps: one grid step per
(channel, panel, bucket) walks all of its live subtiles in-kernel.
Parity is asserted against the numpy oracle (kernel-vs-kernel alone
would miss missed segments) and against the worklist kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveforms_tpu import cos, gaussian, zero
from waveforms_tpu.ops.lowering import UnsupportedFactor, lower_schedule
from waveforms_tpu.ops.pallas_synth import DeviceSchedule
from waveforms_tpu.ops.sparse_synth import (build_panel_plan,
                                            build_sparse_plan,
                                            panels_eligible,
                                            synthesize_panels,
                                            synthesize_sparse)

FS = 2e9


def _chans(n=4, pulses=12, span=6e-5, seed=1, part_freq=5e7):
    rng = np.random.default_rng(seed)
    out = []
    for c in range(n):
        w = zero()
        for _ in range(pulses):
            w += (0.3 * gaussian(3e-7) * cos(2 * np.pi * (part_freq + 1e6 * c))
                  >> float(rng.uniform(1e-6, span)))
        out.append(w)
    return out


def _oracle_worst(chans, out, stop):
    t = np.arange(0.0, stop, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans):
        o = w(t)
        s = max(np.abs(o).max(), 1e-30)
        worst = max(worst, float(np.abs(np.asarray(out[c]) - o).max() / s))
    return worst


def test_panels_match_oracle_and_worklist():
    chans = _chans()
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS)
    dev = DeviceSchedule(low)
    plan = build_panel_plan(low, Rs=8, panel_rows=512)
    assert plan.n_panels > 1          # exercise the multi-panel path
    out = synthesize_panels(dev, plan=plan, interpret=True)
    ref = synthesize_sparse(dev, low=low, Rs=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert _oracle_worst(chans, out, stop) < 1e-6


def test_panels_multibucket_accumulates_straddles():
    chans = _chans(n=2, pulses=20, span=2.5e-4, seed=2)
    stop = 2.62144e-4
    low = lower_schedule(chans, 0.0, stop, FS, bucket_samples=65536)
    assert low.shape[1] > 1
    dev = DeviceSchedule(low)
    out = synthesize_panels(dev, low=low, interpret=True)
    assert _oracle_worst(chans, out, stop) < 1e-6


def test_panels_pair_mode_planes():
    chans = _chans(n=2)
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS, part='complex')
    dev = DeviceSchedule(low)
    re, im = synthesize_panels(dev, low=low, interpret=True,
                               combine_pair=False)
    re2, im2 = synthesize_sparse(dev, low=low, interpret=True,
                                 combine_pair=False)
    np.testing.assert_array_equal(np.asarray(re), np.asarray(re2))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(im2))


def test_panels_int16_single_bucket():
    chans = _chans()
    low = lower_schedule(chans, 0.0, 6.5536e-5, FS)
    dev = DeviceSchedule(low)
    codes = synthesize_panels(dev, low=low, interpret=True,
                              out_dtype=jnp.int16)
    ref = synthesize_sparse(dev, low=low, interpret=True,
                            out_dtype=jnp.int16)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))


def test_panels_gate_narrow_multibucket():
    chans = _chans(n=2, pulses=20, span=2.5e-4, seed=2)
    low = lower_schedule(chans, 0.0, 2.62144e-4, FS, bucket_samples=65536)
    dev = DeviceSchedule(low)
    plan = build_panel_plan(low)
    assert not panels_eligible(plan, jnp.int16)
    with pytest.raises(UnsupportedFactor):
        synthesize_panels(dev, plan=plan, interpret=True,
                          out_dtype=jnp.int16)


def test_panels_windowed_tiles_reassemble():
    """A big schedule run as tile windows must reassemble bit-for-bit to
    the full-range panel run (the >0.6 GB-output headline path)."""
    chans = _chans()
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS)
    dev = DeviceSchedule(low)
    full = np.asarray(synthesize_panels(dev, low=low, Rs=8, interpret=True))
    n_rows = -(-low.n_samples // 128)
    n_tiles = -(-n_rows // 8)
    cut = n_tiles // 2
    parts = []
    for win in ((0, cut), (cut, n_tiles)):
        plan = build_panel_plan(low, Rs=8, panel_rows=512, tile_window=win)
        parts.append(np.asarray(synthesize_panels(dev, plan=plan,
                                                  interpret=True)))
    joined = np.concatenate(parts, axis=1)[:, :low.n_samples]
    np.testing.assert_array_equal(joined, full)


def test_panels_reject_foreign_plan():
    low = lower_schedule(_chans(), 0.0, 6.5536e-5, FS)
    other = lower_schedule(_chans(n=2), 0.0, 3.2768e-5, FS)
    plan = build_panel_plan(other)
    with pytest.raises(ValueError):
        synthesize_panels(DeviceSchedule(low), plan=plan, interpret=True)


def _mesh_or_skip():
    import jax
    from waveforms_tpu.parallel.mesh import channel_mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    return channel_mesh(n_channel=4, n_time=2)


def test_panels_sharded_matches_unsharded():
    """Panel kernel over a ('channel','time') mesh: per-shard panel
    segmentations must reproduce the single-device result exactly."""
    from waveforms_tpu.ops.sparse_synth import synthesize_panels_sharded
    mesh = _mesh_or_skip()
    chans = _chans(n=6, seed=8)
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS, bucket_samples=None)
    dev = DeviceSchedule(low)
    want = np.asarray(synthesize_sparse(dev, low=low, Rs=8, interpret=True))
    got = np.asarray(synthesize_panels_sharded(low, mesh, Rs=8,
                                               interpret=True))
    np.testing.assert_array_equal(got, want)


def test_panels_sharded_pair_mode():
    from waveforms_tpu.ops.sparse_synth import synthesize_panels_sharded
    mesh = _mesh_or_skip()
    chans = [(0.4 + 0.6j) * c for c in _chans(n=6, seed=9)]
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS, part='complex',
                         bucket_samples=None)
    dev = DeviceSchedule(low)
    want = np.asarray(synthesize_sparse(dev, low=low, Rs=8, interpret=True))
    got = np.asarray(synthesize_panels_sharded(low, mesh, Rs=8,
                                               interpret=True))
    np.testing.assert_array_equal(got, want)


def test_panels_sharded_bucketed():
    from waveforms_tpu.ops.sparse_synth import synthesize_panels_sharded
    mesh = _mesh_or_skip()
    chans = _chans(n=6, pulses=20, span=2.5e-4, seed=2)
    stop = 2.62144e-4
    low = lower_schedule(chans, 0.0, stop, FS, bucket_samples=65536)
    assert low.shape[1] > 1
    got = np.asarray(synthesize_panels_sharded(low, mesh, Rs=32,
                                               interpret=True))
    assert _oracle_worst(chans, got, stop) < 1e-6


def test_panels_sharded_int16():
    import jax.numpy as jnp

    from waveforms_tpu.ops.sparse_synth import synthesize_panels_sharded
    mesh = _mesh_or_skip()
    chans = _chans(n=6, seed=15)
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS, bucket_samples=None)
    f32 = np.asarray(synthesize_panels_sharded(low, mesh, Rs=8,
                                               interpret=True))
    codes = np.asarray(synthesize_panels_sharded(low, mesh, Rs=8,
                                                 interpret=True,
                                                 out_dtype=jnp.int16))
    expected = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    np.testing.assert_array_equal(codes, expected.astype(np.int16))


def test_panel_plan_covers_every_live_subtile():
    """The panel worklist must contain exactly the sparse plan's live
    items (re-segmented, not re-derived)."""
    low = lower_schedule(_chans(), 0.0, 6.5536e-5, FS)
    sp = build_sparse_plan(low, Rs=8)
    pp = build_panel_plan(low, Rs=8, panel_rows=512)
    assert pp.n_live == sp.n_live
    assert int(pp.start[-1]) == pp.n_live
    np.testing.assert_array_equal(np.sort(pp.work_t[:pp.n_live]),
                                  np.sort(sp.work_t[:sp.n_live]))


def test_panels_windowed_matches_whole():
    """Item-balanced windowed panels == single-plan panels (round 4:
    the over-budget-worklist regime runs as one launch per window)."""
    from waveforms_tpu.ops import sparse_synth as sp

    chans = _chans()
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS)
    dev = DeviceSchedule(low)
    whole = np.asarray(synthesize_panels(dev, low=low, interpret=True))
    base = sp.build_sparse_plan(low)
    n_tiles = base.n_tiles
    plans = [sp.build_panel_plan(low, tile_window=(0, n_tiles // 2)),
             sp.build_panel_plan(low, tile_window=(n_tiles // 2, n_tiles))]
    win = np.asarray(sp.synthesize_panels_windowed(dev, low, plans=plans,
                                                   interpret=True))
    np.testing.assert_array_equal(win, whole)
    # the auto splitter covers every live item exactly once
    auto = sp.plan_panel_windows(low)
    if auto is not None:
        assert sum(p.n_live for p in auto) == base.n_live


def test_engine_routes_panel_windowed(monkeypatch):
    """classify_pallas_route returns 'panel-windowed' when the whole-plan
    worklist exceeds the SMEM budget, and the engine output still matches
    the single-plan panels."""
    from waveforms_tpu import engine
    from waveforms_tpu.ops import sparse_synth as sp

    chans = _chans(pulses=4)          # well below the panel threshold
    stop = 6.5536e-5
    low = lower_schedule(chans, 0.0, stop, FS)
    dev = DeviceSchedule(low)
    whole = np.asarray(synthesize_panels(dev, low=low, interpret=True))
    base = sp.build_sparse_plan(low)
    budget = (4 * sp.next_pow2(-(-base.n_live // 2)) + 64) * 4
    monkeypatch.setattr(sp, 'PANEL_WORK_SMEM_BUDGET', budget)
    kind, plans = engine.classify_pallas_route(low)
    if kind == 'panel-windowed':
        win = np.asarray(sp.synthesize_panels_windowed(
            dev, low, plans=plans, interpret=True))
        np.testing.assert_array_equal(win, whole)
    else:
        # plan small enough that halving the budget still fits: the
        # plain panel route must have been chosen
        assert kind == 'panel'


def test_panel_height_exact_fit():
    """Panels shrink to the smallest Rs-multiple covering the window in
    NP panels (store-bound kernel: padding rows past the window are
    wasted bandwidth -- the pow2 height taxed the 1 ms flagship 4.7%).
    Padding stays below NP * Rs rows, and placement still matches the
    worklist kernel exactly."""
    chans = _chans()
    stop = 6.5536e-5          # 131072 samples = 1024 rows
    low = lower_schedule(chans, 0.0, stop, FS)
    dev = DeviceSchedule(low)
    # 1024 rows at Rs=8, panel_rows=384: NP=3, exact-fit P=344 (the pow2
    # legacy would have kept P=384 and stored 1152 rows)
    plan = build_panel_plan(low, Rs=8, panel_rows=384)
    n_rows_win = -(-low.n_samples // 128)
    n_tiles = -(-n_rows_win // 8)
    rows = n_tiles * 8
    assert plan.P % 8 == 0
    assert plan.n_panels * plan.P >= rows
    assert plan.n_panels * plan.P - rows < plan.n_panels * 8
    out = synthesize_panels(dev, plan=plan, interpret=True)
    ref = synthesize_sparse(dev, low=low, Rs=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

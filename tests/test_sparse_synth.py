"""Sparse worklist kernel: must equal the dense-grid kernel and oracle."""

import numpy as np
import pytest

from waveforms_tpu import cosPulse, gaussian, mixing, square, zero
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import lower_schedule
from waveforms_tpu.ops.pallas_synth import DeviceSchedule, synthesize_device
from waveforms_tpu.ops.sparse_synth import build_sparse_plan, \
    synthesize_sparse

FS = 2e9


def _sparse_schedule(n=6, seed=0):
    rng = np.random.default_rng(seed)
    chans = []
    for c in range(n):
        x = zero()
        if c % 2 == 0:
            for _ in range(3):
                I, _ = mixing(
                    0.5 * cosPulse(20e-9) >> rng.uniform(0, 7e-6),
                    freq=-150e6 - 2e6 * c, DRAGScaling=1e-10)
                x += I
        else:
            for _ in range(2):
                x += 0.3 * (square(80e-9, edge=10e-9)
                            >> rng.uniform(0, 7e-6))
        chans.append(x)
    return chans


def test_sparse_matches_dense_and_oracle():
    chans = _sparse_schedule()
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS)
    dev = DeviceSchedule(low)

    dense = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    sparse = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    np.testing.assert_array_equal(sparse, dense)

    t = np.arange(0, stop, 1 / FS)
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(sparse[c] - oracle).max() / scale < 2e-6, c


def test_sparse_plan_counts():
    chans = _sparse_schedule()
    low = lower_schedule(chans, 0, 8.192e-6, FS)
    plan = build_sparse_plan(low, Rs=8)
    n_tiles_total = len(chans) * plan.n_tiles
    assert 0 < plan.n_live < n_tiles_total // 4   # genuinely sparse
    # padding points at the scratch tile
    assert np.all(plan.work_t[plan.n_live:] == plan.n_tiles)
    # all live ranges non-empty and sorted inputs respected
    assert np.all(plan.work_s1[:plan.n_live] > plan.work_s0[:plan.n_live])


def test_sparse_bucketed_stack():
    rng = np.random.default_rng(5)
    stack = WaveVStack([(0.4 * cosPulse(40e-9) >> o)
                        for o in rng.uniform(0, 7e-6, 40)])
    low = lower_schedule([stack], 0, 8.192e-6, FS, bucket_samples=2048)
    assert low.n_buckets > 1
    dev = DeviceSchedule(low)
    dense = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    sparse = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    np.testing.assert_array_equal(sparse, dense)


def test_sparse_dense_schedule_still_correct():
    """occupancy ~1: every subtile live; still exact."""
    chans = [gaussian(6e-6) >> 3e-6]
    low = lower_schedule(chans, 0, 6e-6, FS)
    dev = DeviceSchedule(low)
    sparse = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    t = np.arange(0, 6e-6, 1 / FS)
    oracle = chans[0](t)
    assert np.abs(sparse[0] - oracle).max() < 2e-6


def test_sparse_windowed():
    """tile_window plans emit window-relative outputs that concatenate to
    the full-range result."""
    chans = _sparse_schedule()
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS)
    dev = DeviceSchedule(low)

    whole = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    n_tiles = -(-(-(-low.n_samples // 128)) // 8)
    half = n_tiles // 2
    p1 = build_sparse_plan(low, Rs=8, tile_window=(0, half))
    p2 = build_sparse_plan(low, Rs=8, tile_window=(half, n_tiles))
    w1 = np.asarray(synthesize_sparse(dev, plan=p1, interpret=True))
    w2 = np.asarray(synthesize_sparse(dev, plan=p2, interpret=True))
    got = np.concatenate([w1, w2], axis=1)
    np.testing.assert_array_equal(got, whole)


def test_sparse_plan_occupied_fraction_bounds():
    """occupied_fraction normalizes by channels x tiles (<= 1 even dense)."""
    chans = [gaussian(6e-6) >> 3e-6 for _ in range(4)]
    low = lower_schedule(chans, 0, 6e-6, FS)
    plan = build_sparse_plan(low, Rs=8)
    assert 0.5 < plan.occupied_fraction <= 1.0


def test_checkpoint_v1_const_phase_upgrades():
    """v1 checkpoints stored carrier const phase as f32 radians; load()
    must split it into int32 turns + residual (descriptor format v2)."""
    import tempfile

    import waveforms_tpu as wt
    from waveforms_tpu.ops.lowering import _TWO_PI, LoweredSchedule

    chans = [wt.cos(2 * np.pi * 137e6, 0.7),
             wt.drag(100e6, 40e-9, plateau=20e-9, delta=2e6,
                     block_freq=250e6, phase=0.4, t0=3e-9) >> 0.2e-6]
    low = lower_schedule(chans, 0, 1.024e-6, FS)
    want = np.asarray(synthesize_device(DeviceSchedule(low),
                                        rows_per_tile=8, interpret=True))

    # forge the v1 layout: fold q32 slot 1 back into radians in the arg
    # slot, zero the turns, and save without the version meta entry
    import waveforms_tpu.ops.lowering as lowmod
    for op_code, slot in ((lowmod.OP_COS, 3), (lowmod.OP_DRAG, 4)):
        sel = low.op == op_code
        rad = (low.q32[..., 1][sel].astype(np.float64) * (_TWO_PI / 2**32)
               + low.args[..., slot][sel]) % _TWO_PI
        low.args[..., slot][sel] = rad.astype(np.float32)
        low.q32[..., 1][sel] = 0
    with tempfile.NamedTemporaryFile(suffix='.npz') as f:
        low.save(f.name)
        # rewrite meta to the 5-entry v1 form
        z = dict(np.load(f.name).items())
        z['meta'] = z['meta'][:5]
        np.savez_compressed(f.name, **z)
        restored = LoweredSchedule.load(f.name)
    got = np.asarray(synthesize_device(DeviceSchedule(restored),
                                       rows_per_tile=8, interpret=True))
    # v1 storage quantized the const to f32 radians (~3.7e-7); the upgrade
    # must reproduce the synthesis to that storage precision
    assert np.abs(got - want).max() < 2e-6


def test_sparse_pair_mode_matches_dense():
    """part='complex' schedules run the worklist kernel in one fused
    pass, equal to the dense pair-mode kernel."""
    chans = _sparse_schedule(4, seed=2)
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS, part='complex')
    assert low.amp_im is not None
    dev = DeviceSchedule(low)
    dense = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         interpret=True))
    sparse = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    assert sparse.dtype == np.complex64
    np.testing.assert_array_equal(sparse, dense)


def test_sparse_int16_dac_codes():
    import jax.numpy as jnp
    chans = _sparse_schedule(4, seed=4)
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS)
    dev = DeviceSchedule(low)
    f32 = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    codes = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True,
                                         out_dtype=jnp.int16))
    assert codes.dtype == np.int16
    expected = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    np.testing.assert_array_equal(codes, expected.astype(np.int16))
    # per-channel scales
    scales = np.linspace(1000.0, 30000.0, len(chans))
    codes2 = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True,
                                          out_dtype=jnp.int16,
                                          dac_scale=scales))
    expected2 = np.clip(np.round(f32 * scales[:, None]), -32768, 32767)
    np.testing.assert_array_equal(codes2, expected2.astype(np.int16))


def test_sparse_bf16_store():
    import jax.numpy as jnp
    chans = _sparse_schedule(4, seed=6)
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS)
    dev = DeviceSchedule(low)
    f32 = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    b16 = synthesize_sparse(dev, low, Rs=8, interpret=True,
                            out_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(b16, np.float32),
                                  f32.astype(jnp.bfloat16).astype(np.float32))


def test_sparse_plan_validation_rejects_mismatched_plan():
    chans = _sparse_schedule(4, seed=0)
    low4 = lower_schedule(chans, 0, 8.192e-6, FS)
    low2 = lower_schedule(chans[:2], 0, 8.192e-6, FS)
    plan4 = build_sparse_plan(low4, Rs=8)
    dev2 = DeviceSchedule(low2)
    with pytest.raises(ValueError, match="channels"):
        synthesize_sparse(dev2, plan=plan4)
    # same channel count, shorter window: subtile indices out of range
    low_short = lower_schedule(chans, 0, 2.048e-6, FS)
    plan_long = build_sparse_plan(low4, Rs=8)
    with pytest.raises(ValueError):
        synthesize_sparse(DeviceSchedule(low_short), plan=plan_long)


def test_engine_auto_routes_by_occupancy():
    """engine='pallas' picks the worklist kernel for sparse schedules and
    the dense grid for dense ones; both match the numpy oracle."""
    from waveforms_tpu.engine import synthesize as engine_synthesize
    chans = _sparse_schedule(2, seed=1)
    stop = 8.192e-6
    got = np.asarray(engine_synthesize(chans, 0, stop, FS,
                                       engine='pallas'))
    want = np.asarray(engine_synthesize(chans, 0, stop, FS,
                                        engine='numpy'))
    assert np.abs(got - want).max() < 2e-6
    forced = np.asarray(engine_synthesize(chans, 0, stop, FS,
                                          engine='pallas-sparse'))
    np.testing.assert_array_equal(got, forced)
    dense = np.asarray(engine_synthesize(chans, 0, stop, FS,
                                         engine='pallas-dense'))
    assert np.abs(dense - want).max() < 2e-6


def test_checkpoint_load_renormalizes_legacy_layout():
    """Pre-invariant checkpoints (zero-padded, unsorted bucket lists) must
    synthesize correctly after load (code-review finding r2)."""
    import tempfile

    from waveforms_tpu.ops.lowering import SEG_SENTINEL, LoweredSchedule

    chans = _sparse_schedule(4, seed=3)
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS)
    want = np.asarray(synthesize_device(DeviceSchedule(low),
                                        rows_per_tile=8, interpret=True))

    # forge a legacy-layout schedule: shuffle each bucket's slots and
    # zero-fill the padding (what the old format stored)
    rng = np.random.default_rng(0)
    C, NB, Sb, T, F = low.shape
    for c in range(C):
        for b in range(NB):
            perm = rng.permutation(Sb)
            for name in ('seg_lo', 'seg_hi', 'nterm', 'amp', 'nfac', 'op',
                         'power', 'shift_hi', 'q32', 'args'):
                arr = getattr(low, name)
                arr[c, b] = arr[c, b][perm]
    dead = low.nterm == 0
    low.seg_lo[dead] = 0
    low.seg_hi[dead] = 0

    with tempfile.NamedTemporaryFile(suffix='.npz') as f:
        low.save(f.name)
        restored = LoweredSchedule.load(f.name)

    # invariant re-established: sorted by lo, sentinels in dead slots
    assert np.all(restored.seg_lo[restored.nterm == 0] == SEG_SENTINEL)
    got = np.asarray(synthesize_device(DeviceSchedule(restored),
                                       rows_per_tile=8, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_sparse_sharded_matches_unsharded():
    """Worklist kernel over a ('channel','time') mesh: per-shard local
    worklists must reproduce the single-device result exactly."""
    import jax
    from waveforms_tpu.parallel.mesh import channel_mesh
    from waveforms_tpu.ops.sparse_synth import synthesize_sparse_sharded

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    chans = _sparse_schedule(6, seed=8)
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS, bucket_samples=None)
    assert low.n_buckets == 1
    dev = DeviceSchedule(low)
    want = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    mesh = channel_mesh(n_channel=4, n_time=2)
    got = np.asarray(synthesize_sparse_sharded(low, mesh, Rs=8,
                                               interpret=True))
    np.testing.assert_array_equal(got, want)


def test_synthesize_on_mesh_routes_panels(monkeypatch):
    import jax
    from waveforms_tpu.ops import sparse_synth
    from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    # a LONG quiet span makes occupied_fraction genuinely sparse (< 0.2)
    chans = _sparse_schedule(6, seed=12)
    stop = 65.536e-6
    mesh = channel_mesh(n_channel=4, n_time=2)

    calls = []
    orig = sparse_synth.synthesize_panels_sharded

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(sparse_synth, 'synthesize_panels_sharded', spy)
    got = np.asarray(synthesize_on_mesh(chans, 0, stop, FS, mesh,
                                        interpret=True))
    assert calls, "expected the panel route to be taken"
    t = np.arange(0, stop, 1 / FS)
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(got[c] - oracle).max() / scale < 2e-6, c


def test_synthesize_on_mesh_worklist_fallback(monkeypatch):
    """When a shard's panel worklist exceeds the SMEM budget, the mesh
    route must fall back to the sharded worklist kernel, not dense."""
    import jax
    from waveforms_tpu.ops import sparse_synth
    from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    chans = _sparse_schedule(6, seed=12)
    stop = 65.536e-6
    mesh = channel_mesh(n_channel=4, n_time=2)
    calls = []
    orig = sparse_synth.synthesize_sparse_sharded

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(sparse_synth, 'synthesize_sparse_sharded', spy)
    monkeypatch.setattr(sparse_synth, 'PANEL_WORK_SMEM_BUDGET', 64)
    got = np.asarray(synthesize_on_mesh(chans, 0, stop, FS, mesh,
                                        interpret=True))
    assert calls, "expected the worklist fallback to be taken"
    t = np.arange(0, stop, 1 / FS)
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        assert np.abs(got[c] - oracle).max() / scale < 2e-6, c


def test_engine_complex_part_routes_sparse():
    """engine='pallas' with part='complex' runs the pair-mode worklist
    kernel on sparse schedules and matches the numpy engine."""
    from waveforms_tpu.engine import synthesize

    chans = [(0.4 + 0.6j) * ch for ch in _sparse_schedule(2, seed=6)]
    stop = 8.192e-6
    got = np.asarray(synthesize(chans, 0, stop, FS, engine='pallas-sparse',
                                part='complex'))
    want = synthesize(chans, 0, stop, FS, engine='numpy', part='complex')
    assert got.dtype == np.complex64
    scale = max(np.abs(want).max(), 1e-30)
    assert np.abs(got - want).max() / scale < 2e-6


def test_sparse_sharded_int16_codes():
    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.sparse_synth import synthesize_sparse_sharded
    from waveforms_tpu.parallel.mesh import channel_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    chans = _sparse_schedule(6, seed=15)
    low = lower_schedule(chans, 0, 8.192e-6, FS, bucket_samples=None)
    mesh = channel_mesh(n_channel=4, n_time=2)
    f32 = np.asarray(synthesize_sparse_sharded(low, mesh, Rs=8,
                                               interpret=True))
    codes = np.asarray(synthesize_sparse_sharded(low, mesh, Rs=8,
                                                 interpret=True,
                                                 out_dtype=jnp.int16))
    expected = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    np.testing.assert_array_equal(codes, expected.astype(np.int16))


def test_engine_routing_precedence_per_workload_class():
    """The measured routing order (rounds 3-4): panel kernel first
    whenever subtile occupancy is low and the plan fits its budgets
    (worklist kernel when it does not); the stack path only for
    high-occupancy narrow-pulse schedules or un-lowerable ones; dense
    otherwise.  A regression here silently moves the flagship off its
    162 GS/s path.  Exercises the engine's OWN classifier."""
    from waveforms_tpu import chirp, drag, gaussian
    from waveforms_tpu.engine import classify_pallas_route

    def route(chans, start, stop, fs, bucket='auto', part='real'):
        low = lower_schedule(chans, start, stop, fs, part=part,
                             bucket_samples=bucket)
        return classify_pallas_route(low)[0]

    # flagship-class: many channels, pulse-sparse -> panel kernel
    assert route(_sparse_schedule(8), 0, 32.768e-6, FS) == 'panel'
    # vstack-class: one channel FULL of short pulses -> instance batch
    rng = np.random.default_rng(1)
    stack = WaveVStack([(0.5 * cosPulse(50e-9) >> o)
                        for o in rng.uniform(0, 99e-6, 400)])
    assert route([stack], 0, 100e-6, FS) == 'stack'
    # overlap-class: merged DRAGs beyond the SMEM budget -> instance batch
    ch = zero()
    for _ in range(100):
        ch += drag(100e6, 300e-9, plateau=200e-9, delta=2e6,
                   block_freq=None, phase=rng.uniform(0, 6),
                   t0=0.0) >> rng.uniform(0, 0.6e-6)
    assert route([ch], 0, 1.1e-6, FS) == 'stack'
    # dense-class: occupancy 1.0 wide envelope -> dense grid
    assert route([gaussian(3e-3) * chirp(1e6, 500e6, 1e-3, 0.0, 'linear')],
                 0, 64e-6, FS) == 'dense'
    # worklist fallback: a low-occupancy plan whose worklist exceeds the
    # panel SMEM budget must still reach the sparse worklist kernel
    from waveforms_tpu.engine import _sparse_threshold
    from waveforms_tpu.ops import sparse_synth as sp
    low = lower_schedule(_sparse_schedule(8), 0, 32.768e-6, FS,
                         bucket_samples='auto')
    plan = build_sparse_plan(low)
    assert plan.occupied_fraction < _sparse_threshold()
    orig = sp.PANEL_WORK_SMEM_BUDGET
    try:
        sp.PANEL_WORK_SMEM_BUDGET = 64        # force ineligibility
        assert classify_pallas_route(low)[0] == 'sparse'
    finally:
        sp.PANEL_WORK_SMEM_BUDGET = orig


def test_sparse_sharded_pair_mode_matches_unsharded():
    """Round-4 routing parity: pair-mode (complex) schedules run the
    sharded worklist kernel and must equal the single-device result."""
    import jax
    from waveforms_tpu.parallel.mesh import channel_mesh
    from waveforms_tpu.ops.sparse_synth import synthesize_sparse_sharded

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    rng = np.random.default_rng(41)
    chans = [WaveVStack([((0.4 + 0.6j) * cosPulse(60e-9) >> o)
                         for o in rng.uniform(0, 7e-6, 5)])
             for _ in range(6)]
    low = lower_schedule(chans, 0, 8.192e-6, FS, part='complex',
                         bucket_samples=None)
    dev = DeviceSchedule(low)
    want = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    mesh = channel_mesh(n_channel=4, n_time=2)
    got = np.asarray(synthesize_sparse_sharded(low, mesh, Rs=8,
                                               interpret=True))
    np.testing.assert_array_equal(got, want)


def test_sparse_sharded_bucketed_matches_unsharded():
    """Bucketed descriptors shard whole bucket windows along 'time'; the
    worklist's wt // tps map must respect bucket boundaries exactly."""
    import jax
    from waveforms_tpu.parallel.mesh import channel_mesh
    from waveforms_tpu.ops.sparse_synth import synthesize_sparse_sharded

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    chans = _sparse_schedule(6, seed=9)
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS, bucket_samples=4096)
    assert low.n_buckets > 1
    dev = DeviceSchedule(low)
    want = np.asarray(synthesize_sparse(dev, low, Rs=8, interpret=True))
    mesh = channel_mesh(n_channel=4, n_time=2)
    got = np.asarray(synthesize_sparse_sharded(low, mesh, Rs=8,
                                               interpret=True))
    np.testing.assert_array_equal(got, want)


def test_sharded_work_and_bytes_scale_with_devices():
    """Scaling assertions (round 4): per-shard worklist lengths and
    descriptor bytes must track ~1/P with bounded skew on a uniformly
    scattered schedule."""
    from waveforms_tpu.ops.sparse_synth import shard_sparse_work

    rng = np.random.default_rng(7)
    chans = []
    for c in range(8):
        wl = [(cosPulse(50e-9) >> float(rng.uniform(0, 7.9e-6)))
              for _ in range(40)]
        chans.append(WaveVStack(wl))
    low = lower_schedule(chans, 0, 8.192e-6, FS, bucket_samples=None)
    plan = build_sparse_plan(low, Rs=8)
    nc, nt = 4, 2
    cs = len(chans) // nc
    n_rows = -(-low.n_samples // 128)
    n_tiles = -(-n_rows // 8)
    tps = -(-n_tiles // nt)
    _, counts, K = shard_sparse_work(plan, nc, nt, cs, tps)
    total = counts.sum()
    assert total == plan.n_live
    mean = total / (nc * nt)
    assert counts.max() <= 2.5 * mean, (
        f"worklist skew {counts.max()}/{mean} too high: {counts}")
    # descriptor bytes per channel shard: exactly C/nc channels' rows
    from waveforms_tpu.parallel.mesh import channel_mesh, shard_schedule
    import jax
    if len(jax.devices()) >= 8:
        mesh = channel_mesh(n_channel=4, n_time=2)
        tensors, c_pad = shard_schedule(low, mesh)
        shard_bytes = tensors['args'].addressable_shards[0].data.nbytes
        assert shard_bytes * nc == tensors['args'].nbytes


def test_on_mesh_routing_parity_int16_and_pair(monkeypatch):
    """synthesize_on_mesh must route int16 and pair-mode sparse schedules
    to the sparse family (panel kernel; single-bucket int16 is eligible)
    exactly like the single-chip engine."""
    import jax
    import jax.numpy as jnp
    import waveforms_tpu.ops.sparse_synth as sp
    from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    calls = []
    orig = sp.synthesize_panels_sharded

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(sp, 'synthesize_panels_sharded', spy)
    mesh = channel_mesh(n_channel=4, n_time=2)
    # long quiet span -> genuinely sparse (occupied_fraction < threshold)
    chans = _sparse_schedule(6, seed=12)
    stop = 65.536e-6
    got16 = np.asarray(synthesize_on_mesh(chans, 0, stop, FS, mesh,
                                          interpret=True,
                                          out_dtype=jnp.int16))
    assert calls, "int16 sparse schedule must take the panel kernel"
    assert got16.dtype == np.int16
    low = lower_schedule(chans, 0, stop, FS)
    want = np.asarray(synthesize_sparse(DeviceSchedule(low), low,
                                        interpret=True,
                                        out_dtype=jnp.int16))
    np.testing.assert_array_equal(got16, want)


def test_force_sparse_selects_worklist_kernel():
    """engine='pallas-sparse' promises ONE path: the per-subtile worklist
    kernel, even where panels are eligible (the panel kernel would
    otherwise win the route everywhere -- round-4 review finding)."""
    from waveforms_tpu.engine import classify_pallas_route
    from waveforms_tpu.ops.lowering import lower_schedule

    chans = _sparse_schedule(4, seed=3)
    low = lower_schedule(chans, 0, 8.192e-6, FS)
    kind_auto, _ = classify_pallas_route(low)
    assert kind_auto in ('panel', 'panel-windowed')
    kind_forced, plan = classify_pallas_route(low, force='sparse')
    assert kind_forced == 'sparse' and plan is not None


def test_windowed_routing_respects_out_dtype():
    """A dtype rule windowing cannot cure (narrowed multi-bucket stores)
    must fall through to the worklist kernel, not route to
    'panel-windowed' and raise at launch (round-4 review finding)."""
    import jax.numpy as jnp

    from waveforms_tpu.engine import classify_pallas_route
    from waveforms_tpu.ops.lowering import lower_schedule

    chans = _sparse_schedule(4, seed=5)
    stop = 65.536e-6
    low = lower_schedule(chans, 0, stop, FS, bucket_samples=8192)
    assert low.shape[1] > 1                    # multi-bucket
    kind_f32, _ = classify_pallas_route(low, out_dtype=jnp.float32)
    kind_i16, plan = classify_pallas_route(low, out_dtype=jnp.int16)
    if kind_f32 in ('panel', 'panel-windowed'):
        # int16 + NB>1 is panel-ineligible: the sparse worklist kernel
        # (which supports that combination) must take the route
        assert kind_i16 == 'sparse' and plan is not None


def test_sharded_combine_pair_false_planes():
    """Pair-mode sharded synthesis as two f32 planes (no complex dtype
    anywhere -- the tunnel-safe escape the single-chip paths have)."""
    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.parallel.mesh import channel_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    from waveforms_tpu.ops.sparse_synth import (
        synthesize_panels_sharded, synthesize_sparse_sharded)

    chans = [(0.4 + 0.6j) * ch for ch in _sparse_schedule(4, seed=9)]
    stop = 8.192e-6
    low = lower_schedule(chans, 0, stop, FS, part='complex')
    mesh = channel_mesh(n_channel=4, n_time=2)
    for fn in (synthesize_panels_sharded, synthesize_sparse_sharded):
        z = np.asarray(fn(low, mesh, Rs=8, interpret=True))
        re, im = fn(low, mesh, Rs=8, interpret=True, combine_pair=False)
        re, im = np.asarray(re), np.asarray(im)
        assert re.dtype == np.float32 and im.dtype == np.float32
        np.testing.assert_array_equal(re, z.real)
        np.testing.assert_array_equal(im, z.imag)


def test_on_mesh_dac_scale_forwarded():
    """synthesize_on_mesh must forward dac_scale to its routes (round-4
    review: int16 through the mesh entry was locked to 32767)."""
    import jax
    import jax.numpy as jnp

    from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    chans = _sparse_schedule(4, seed=2)
    stop = 8.192e-6
    mesh = channel_mesh(n_channel=4, n_time=2)
    f32 = np.asarray(synthesize_on_mesh(chans, 0, stop, FS, mesh,
                                        interpret=True))
    codes = np.asarray(synthesize_on_mesh(chans, 0, stop, FS, mesh,
                                          interpret=True,
                                          out_dtype=jnp.int16,
                                          dac_scale=1000.0))
    assert codes.dtype == np.int16
    want = np.clip(np.round(f32.astype(np.float64) * 1000.0), -32768, 32767)
    assert np.abs(codes.astype(np.int64) - want.astype(np.int64)).max() <= 1

"""Stacked-table sequence playback: one launch must equal per-schedule
stack synthesis and the numpy oracle for every shot."""

import numpy as np
import pytest

from waveforms_tpu import cosPulse, gaussian, square, zero
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import UnsupportedFactor, lower_schedule
from waveforms_tpu.ops.stack_seq import StackSequencer

FS = 2e9
STOP = 8.192e-6


def _table(n_schedules=3, n_pulses=40, seed=11):
    """n_schedules single-channel vstack schedules from one pulse family."""
    rng = np.random.default_rng(seed)
    lows, chans = [], []
    for _ in range(n_schedules):
        wl = [(float(a) * cosPulse(50e-9) >> o)
              for a, o in zip(rng.uniform(0.2, 1.0, n_pulses),
                              rng.uniform(0, STOP - 1e-7, n_pulses))]
        ch = WaveVStack(wl)
        chans.append(ch)
        lows.append(lower_schedule([ch], 0, STOP, FS))
    return lows, chans


def _oracle(ch):
    t = np.arange(0, STOP, 1 / FS)
    return np.asarray(ch(t), float)


def test_play_packed_matches_oracle_per_shot():
    lows, chans = _table()
    seq = StackSequencer(lows)
    ks = [2, 0, 1, 1, 0]
    out = np.asarray(seq.play_packed(ks))
    assert out.shape == (len(ks), 1, lows[0].n_samples)
    for i, k in enumerate(ks):
        want = _oracle(chans[k])
        scale = max(np.abs(want).max(), 1e-30)
        assert np.abs(out[i, 0] - want).max() / scale < 2e-6, f"shot {i}"


def test_play_single_and_clamping():
    lows, chans = _table(n_schedules=2, n_pulses=25, seed=3)
    seq = StackSequencer(lows)
    one = np.asarray(seq.play(1))
    want = _oracle(chans[1])
    assert np.abs(one[0] - want).max() / np.abs(want).max() < 2e-6
    # out-of-range indices clamp to the table edges like Sequencer.play
    hi = np.asarray(seq.play_packed([99]))[0]
    assert np.allclose(hi, np.asarray(seq.play(1)))


def test_traced_shot_indices_inside_jit():
    import jax
    import jax.numpy as jnp
    lows, chans = _table(n_schedules=2, n_pulses=20, seed=7)
    seq = StackSequencer(lows)

    @jax.jit
    def run(ks):
        return seq.play_packed(ks)

    out = np.asarray(run(jnp.asarray([1, 0], jnp.int32)))
    for i, k in enumerate([1, 0]):
        want = _oracle(chans[k])
        assert np.abs(out[i, 0] - want).max() / np.abs(want).max() < 2e-6


def test_mixed_family_unions_group_sets():
    """Schedules with DIFFERENT factor structures stack via the group-set
    union: the missing group's slice is all padding (zero counts)."""
    rng = np.random.default_rng(5)
    a = WaveVStack([0.5 * cosPulse(50e-9) >> o
                    for o in rng.uniform(0, 7e-6, 10)])
    b = WaveVStack([0.5 * gaussian(50e-9) >> o
                    for o in rng.uniform(0, 7e-6, 10)])
    seq = StackSequencer([lower_schedule([a], 0, STOP, FS),
                          lower_schedule([b], 0, STOP, FS)])
    out = np.asarray(seq.play_packed([1, 0]))
    for i, ch in enumerate([b, a]):
        want = _oracle(ch)
        assert np.abs(out[i, 0] - want).max() / np.abs(want).max() < 2e-6


def test_wide_residual_rejected():
    rng = np.random.default_rng(9)
    narrow = WaveVStack([0.5 * cosPulse(50e-9) >> o
                         for o in rng.uniform(0, 7e-6, 10)])
    wide = zero()
    wide += 0.3 * square(6e-6) >> 4e-6     # a long plateau stays wide
    wide += 0.5 * cosPulse(50e-9) >> 1e-6
    lows = [lower_schedule([narrow], 0, STOP, FS),
            lower_schedule([wide], 0, STOP, FS)]
    with pytest.raises(UnsupportedFactor, match="wide"):
        StackSequencer(lows)


def test_transposed_tables_mode(monkeypatch):
    monkeypatch.setenv('WFTPU_STACK_TABLE_T', '1')
    lows, chans = _table(n_schedules=2, n_pulses=30, seed=13)
    seq = StackSequencer(lows)
    out = np.asarray(seq.play_packed([0, 1]))
    for i, k in enumerate([0, 1]):
        want = _oracle(chans[k])
        assert np.abs(out[i, 0] - want).max() / np.abs(want).max() < 2e-6


def test_multichannel_table():
    rng = np.random.default_rng(17)
    lows, chans = [], []
    for _ in range(2):
        per = [WaveVStack([0.5 * cosPulse(50e-9) >> o
                           for o in rng.uniform(0, 7e-6, 15)])
               for _ in range(3)]
        chans.append(per)
        lows.append(lower_schedule(per, 0, STOP, FS))
    seq = StackSequencer(lows)
    out = np.asarray(seq.play_packed([1, 0]))
    assert out.shape == (2, 3, lows[0].n_samples)
    for i, k in enumerate([1, 0]):
        for c in range(3):
            want = _oracle(chans[k][c])
            scale = max(np.abs(want).max(), 1e-30)
            assert np.abs(out[i, c] - want).max() / scale < 2e-6


def test_play_packed_int16_codes():
    import jax.numpy as jnp
    lows, chans = _table(n_schedules=2, n_pulses=20, seed=23)
    seq = StackSequencer(lows)
    f32 = np.asarray(seq.play_packed([0, 1]))
    codes = np.asarray(seq.play_packed([0, 1], out_dtype=jnp.int16,
                                       dac_scale=1000.0))
    assert codes.dtype == np.int16
    want = np.clip(np.round(f32.astype(np.float64) * 1000.0),
                   -32768, 32767)
    assert np.abs(codes - want).max() <= 1


# ---- sharded stacked-table path (multi-chip twin of the stack route) ----

def _vstack_channels(n_channels, n_pulses=30, seed=3):
    rng = np.random.default_rng(seed)
    return [WaveVStack([float(a) * cosPulse(50e-9) >> o
                        for a, o in zip(rng.uniform(0.2, 1.0, n_pulses),
                                        rng.uniform(0, STOP - 1e-7,
                                                    n_pulses))])
            for _ in range(n_channels)]


def _need_mesh():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')


def test_stack_sharded_matches_oracle():
    """Channel x time mesh: every shard renders only its table slice."""
    from waveforms_tpu.ops.stack_seq import synthesize_stack_sharded
    from waveforms_tpu.parallel.mesh import channel_mesh

    _need_mesh()
    chans = _vstack_channels(4)
    mesh = channel_mesh(n_channel=4, n_time=2)
    got = np.asarray(synthesize_stack_sharded(chans, 0, STOP, FS, mesh,
                                              interpret=True))
    for c, ch in enumerate(chans):
        want = _oracle(ch)
        scale = max(np.abs(want).max(), 1e-30)
        assert np.abs(got[c] - want).max() / scale < 2e-6, c


def test_stack_sharded_time_only_single_channel():
    """The vstack headline shape (C=1): the 'time' axis alone carries the
    split -- each device renders a contiguous superchunk run."""
    from waveforms_tpu.ops.stack_seq import synthesize_stack_sharded
    from waveforms_tpu.parallel.mesh import channel_mesh

    _need_mesh()
    chans = _vstack_channels(1, n_pulses=60, seed=9)
    mesh = channel_mesh(n_channel=1, n_time=8)
    got = np.asarray(synthesize_stack_sharded(chans, 0, STOP, FS, mesh,
                                              interpret=True))
    want = _oracle(chans[0])
    assert got.shape == (1, want.size)
    assert np.abs(got[0] - want).max() / np.abs(want).max() < 2e-6


def test_stack_sharded_int16_codes():
    import jax.numpy as jnp

    from waveforms_tpu.ops.stack_seq import synthesize_stack_sharded
    from waveforms_tpu.parallel.mesh import channel_mesh

    _need_mesh()
    chans = _vstack_channels(2, seed=21)
    mesh = channel_mesh(n_channel=2, n_time=4)
    f32 = np.asarray(synthesize_stack_sharded(chans, 0, STOP, FS, mesh,
                                              interpret=True))
    codes = np.asarray(synthesize_stack_sharded(
        chans, 0, STOP, FS, mesh, interpret=True, out_dtype=jnp.int16,
        dac_scale=1000.0))
    assert codes.dtype == np.int16
    want = np.clip(np.round(f32.astype(np.float64) * 1000.0),
                   -32768, 32767)
    assert np.abs(codes - want).max() <= 1


def test_stack_sharded_work_scales_inverse_p():
    """Per-shard table bytes are exactly 1/P of the stacked total: the
    leading operand axis splits evenly over channel x time."""
    from waveforms_tpu.ops.lowering import lower_schedule as _ls
    from waveforms_tpu.ops.stack_seq import StackSequencer
    from waveforms_tpu.parallel.mesh import channel_mesh

    _need_mesh()
    nc, nt = 4, 2
    chans = _vstack_channels(nc, seed=5)
    lows = [_ls([c], 0, STOP, FS) for c in chans]
    seq = StackSequencer(lows, n_super_multiple=nt)
    P = nc * nt
    for cnts, tab in seq._operands:
        assert cnts.shape[0] % P == 0
        assert tab.shape[0] % P == 0
        # the local slice each device receives is exactly total/P
        assert (tab.nbytes // P) * P == tab.nbytes


def test_synthesize_on_mesh_routes_stack(monkeypatch):
    """A vstack-class schedule (high occupancy, narrow pulses) takes the
    sharded stacked-table path from the top-level mesh entry point."""
    from waveforms_tpu.ops import stack_seq
    from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

    _need_mesh()
    chans = _vstack_channels(4, n_pulses=100, seed=7)
    mesh = channel_mesh(n_channel=4, n_time=2)

    calls = []
    orig = stack_seq.synthesize_stack_sharded

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(stack_seq, 'synthesize_stack_sharded', spy)
    got = np.asarray(synthesize_on_mesh(chans, 0, STOP, FS, mesh,
                                        interpret=True))
    assert calls, "expected the stack route to be taken"
    for c, ch in enumerate(chans):
        want = _oracle(ch)
        scale = max(np.abs(want).max(), 1e-30)
        assert np.abs(got[c] - want).max() / scale < 2e-6, c


def test_prebuilt_plans_must_pair_with_lows():
    from waveforms_tpu.ops.stack_synth import build_stack_plan

    lows, _ = _table(n_schedules=2, n_pulses=10, seed=31)
    plans = [build_stack_plan(low) for low in lows]
    with pytest.raises(ValueError):
        StackSequencer(lows, plans=plans[:1])
    with pytest.raises(ValueError):
        StackSequencer(lows[:1], plans=plans)


def test_play_packed_sharded_matches_play_packed():
    """Shot fan-out over the whole mesh: each device plays its slice of
    the shot vector against replicated tables; result equals the
    single-device launch (padding shots dropped)."""
    from waveforms_tpu.parallel.mesh import channel_mesh

    _need_mesh()
    lows, chans = _table(n_schedules=3, n_pulses=25, seed=29)
    seq = StackSequencer(lows)
    mesh = channel_mesh(n_channel=4, n_time=2)
    ks = [2, 0, 1, 1, 2, 0, 1, 0, 2, 1]      # 10 shots -> pads to 16
    sharded = np.asarray(seq.play_packed_sharded(ks, mesh,
                                                 interpret=True))
    single = np.asarray(seq.play_packed(ks, interpret=True))
    assert sharded.shape == single.shape == (10, 1, lows[0].n_samples)
    assert np.abs(sharded - single).max() == 0.0


def test_play_packed_sharded_int16():
    import jax.numpy as jnp

    from waveforms_tpu.parallel.mesh import channel_mesh

    _need_mesh()
    lows, _ = _table(n_schedules=2, n_pulses=15, seed=37)
    seq = StackSequencer(lows)
    mesh = channel_mesh(n_channel=8, n_time=1)
    ks = [1, 0, 1]
    codes = np.asarray(seq.play_packed_sharded(
        ks, mesh, interpret=True, out_dtype=jnp.int16, dac_scale=500.0))
    want = np.asarray(seq.play_packed(ks, interpret=True,
                                      out_dtype=jnp.int16,
                                      dac_scale=500.0))
    assert codes.dtype == np.int16
    assert np.abs(codes.astype(np.int64) - want.astype(np.int64)).max() == 0


def test_dict_tables_joint_compaction(monkeypatch):
    """WFTPU_STACK_DICT=1 compacts the stacked tables JOINTLY: one
    column layout for every schedule of a group key, decided over the
    union of their valid slots -- output bit-matches the full layout,
    and the device table bytes shrink (the operand stream scales with
    shot-schedule count here, so this is where compaction pays)."""
    lows, chans = _table(n_schedules=3, n_pulses=40, seed=19)
    monkeypatch.setenv('WFTPU_STACK_DICT', '0')   # full-layout baseline
    seq_full = StackSequencer(lows)
    ks = [2, 0, 1, 1]
    base = np.asarray(seq_full.play_packed(ks))
    bytes_full = sum(int(t.nbytes) for _, t in seq_full._operands)
    monkeypatch.setenv('WFTPU_STACK_DICT', '1')
    seq_d = StackSequencer(lows)
    out = np.asarray(seq_d.play_packed(ks))
    assert np.array_equal(out, base)
    bytes_d = sum(int(t.nbytes) for _, t in seq_d._operands)
    assert bytes_d * 4 < bytes_full
    # amplitudes differ per instance here, so the amp column must have
    # stayed in the table while the pure-shape columns baked
    meta = max(seq_d._metas, key=lambda m: m['k_sp'])
    assert meta['off_amp'] in meta['col_pos'] \
        or meta['off_amp'] + 1 in meta['col_pos']
    for i, k in enumerate(ks):
        want = _oracle(chans[k])
        assert np.abs(out[i, 0] - want).max() / np.abs(want).max() < 2e-6


def test_seq_scdot_batched_matches_per_chunk(monkeypatch):
    """The superchunk-batched scatter in the stacked-table kernel feeds
    every output row the same product multiset as the per-chunk walk
    (1-ulp-equivalent -- the wider GEMM reassociates f32 sums), and the
    auto gate keys on the table-build-time waste rule ('scdot_ok')."""
    # a longer window (8 chunks -> SC=4) with dense uniform pulses, one
    # explicit bucket (the stacked-table path is single-bucket)
    rng = np.random.default_rng(17)
    stop = 65.536e-6
    lows, chans = [], []
    for _ in range(3):
        wl = [(float(a) * cosPulse(50e-9) >> o)
              for a, o in zip(rng.uniform(0.2, 1.0, 400),
                              rng.uniform(0, stop - 1e-7, 400))]
        ch = WaveVStack(wl)
        chans.append(ch)
        lows.append(lower_schedule([ch], 0, stop, FS,
                                   bucket_samples=int(stop * FS)))
    ks = [1, 2, 0, 1]

    def _oracle(ch, stop=stop):
        t = np.arange(0, stop, 1 / FS)
        return np.asarray(ch(t), float)

    monkeypatch.setenv('WFTPU_STACK_SCDOT', '0')
    base = np.asarray(StackSequencer(lows).play_packed(ks))
    monkeypatch.setenv('WFTPU_STACK_SCDOT', 'auto')
    seq = StackSequencer(lows)
    assert all(m.get('scdot_ok') for m in seq._metas)
    out = np.asarray(seq.play_packed(ks))
    scale = np.abs(base).max()
    assert np.abs(out - base).max() <= 5e-7 * scale
    # oracle anchor for one shot
    want = _oracle(chans[2])
    s2 = max(np.abs(want).max(), 1e-30)
    assert np.abs(out[1, 0] - want).max() / s2 < 2e-6

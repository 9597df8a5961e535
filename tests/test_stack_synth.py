"""Pulse-instance batched synthesis: must equal the oracle and kernels."""

import numpy as np
import pytest

from waveforms_tpu import cos, cosPulse, drag, gaussian, mixing, square, zero
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import lower_schedule
from waveforms_tpu.ops.stack_synth import build_stack_plan, synthesize_stack

FS = 2e9


def _oracle(chans, start, stop):
    t = np.arange(start, stop, 1 / FS)
    return t, np.stack([np.asarray(ch(t), float) for ch in chans])


def test_vstack_many_pulses_matches_oracle():
    rng = np.random.default_rng(7)
    wl = [(0.5 * cosPulse(50e-9) >> o)
          for o in rng.uniform(0, 9e-6, 200)]
    chans = [WaveVStack(wl)]
    low = lower_schedule(chans, 0, 10e-6, FS)
    plan = build_stack_plan(low)
    assert plan is not None and plan.n_narrow >= 200
    assert plan.wide is None          # every pulse is narrow
    out = np.asarray(synthesize_stack(low, plan))
    t, want = _oracle(chans, 0, 10e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_overlap_drag_stack_rescues_smem_blowup():
    """100 overlapping DRAGs merge into a schedule whose descriptor block
    exceeds the kernels' SMEM budget (pallas_ok=False); the instance path
    reads descriptors from HBM and handles it."""
    rng = np.random.default_rng(3)
    ch = zero()
    for _ in range(40):
        ch += drag(100e6, 300e-9, plateau=200e-9, delta=2e6,
                   block_freq=None, phase=rng.uniform(0, 6),
                   t0=0.0) >> rng.uniform(0, 0.6e-6)
    low = lower_schedule([ch], 0, 1.1e-6, FS)
    plan = build_stack_plan(low)
    assert plan is not None
    out = np.asarray(synthesize_stack(low, plan))
    t, want = _oracle([ch], 0, 1.1e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_mixed_narrow_wide_residual():
    """Short pulses (batched) on top of a long carrier and a DC offset
    (wide -> kernel residual); the two outputs must add exactly."""
    rng = np.random.default_rng(5)
    ch = 0.1 * cos(2 * np.pi * 150e6) + 0.05
    for _ in range(30):
        ch += 0.4 * (cosPulse(40e-9) >> rng.uniform(0, 7e-6))
    chans = [ch, gaussian(7e-6) >> 3.5e-6]
    low = lower_schedule(chans, 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    assert plan is not None and plan.wide is not None
    out = np.asarray(synthesize_stack(low, plan, interpret=True))
    t, want = _oracle(chans, 0, 8.192e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_bucketed_schedule_instances_dedup():
    """NB>1 duplicates bucket-spanning segments; clipping to the bucket
    window must keep the result exact (no double counting)."""
    rng = np.random.default_rng(11)
    stack = WaveVStack([(0.4 * cosPulse(400e-9) >> o)
                        for o in rng.uniform(0, 7e-6, 50)])
    low = lower_schedule([stack], 0, 8.192e-6, FS, bucket_samples=2048)
    assert low.n_buckets > 1
    plan = build_stack_plan(low)
    out = np.asarray(synthesize_stack(low, plan))
    t, want = _oracle([stack], 0, 8.192e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_clipped_channel_goes_to_kernel():
    from waveforms_tpu import cut
    rng = np.random.default_rng(2)
    clipped = cut(2.0 * (gaussian(2e-6) >> 4e-6), max=1.2)
    pulses = zero()
    for _ in range(20):
        pulses += 0.3 * (cosPulse(40e-9) >> rng.uniform(0, 7e-6))
    low = lower_schedule([clipped, pulses], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    assert plan is not None and plan.wide is not None
    out = np.asarray(synthesize_stack(low, plan, interpret=True))
    t, want = _oracle([cut(2.0 * (gaussian(2e-6) >> 4e-6), max=1.2),
                       pulses], 0, 8.192e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_engine_routes_stack_schedules():
    from waveforms_tpu.engine import synthesize
    rng = np.random.default_rng(9)
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 9e-6, 150)]
    chans = [WaveVStack(wl)]
    got = np.asarray(synthesize(chans, 0, 10e-6, FS, engine='pallas'))
    want = synthesize(chans, 0, 10e-6, FS, engine='numpy')
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


def test_mixing_pulses_with_drag_correction():
    """DRAG-corrected IQ pulses (multi-factor terms) through the batch."""
    rng = np.random.default_rng(13)
    x = zero()
    for _ in range(25):
        I, _ = mixing(0.5 * cosPulse(20e-9) >> rng.uniform(0, 7e-6),
                      freq=-150e6, DRAGScaling=1e-10)
        x += I
    low = lower_schedule([x], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    assert plan is not None
    out = np.asarray(synthesize_stack(low, plan))
    t, want = _oracle([x], 0, 8.192e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_stack_imag_part():
    """part='imag' lowers the imaginary amplitude plane; the batch path
    must follow it like the kernels do."""
    rng = np.random.default_rng(21)
    wl = [((0.3 + 0.7j) * cosPulse(60e-9) >> o)
          for o in rng.uniform(0, 7e-6, 40)]
    ch = WaveVStack(wl)
    low = lower_schedule([ch], 0, 8.192e-6, FS, part='imag')
    plan = build_stack_plan(low)
    assert plan is not None
    out = np.asarray(synthesize_stack(low, plan))
    t = np.arange(0, 8.192e-6, 1 / FS)
    want = np.imag(np.asarray(ch.simplify()(t)))
    assert np.abs(out[0] - want).max() / max(np.abs(want).max(), 1e-30) \
        < 2e-6


def test_kernel_runner_selected_and_matches_xla_runner():
    """The single-kernel runner (round 4) must engage for plain vstack
    plans and agree with the XLA op-chain runner to float tolerance."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               _build_runner)
    rng = np.random.default_rng(31)
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 7e-6, 120)]
    low = lower_schedule([WaveVStack(wl)], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    kr = _build_kernel_runner(plan, low, True)
    assert kr is not None, "vstack plan should take the kernel runner"
    a = np.asarray(kr())
    b = np.asarray(_build_runner(plan, low)())
    assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-30) < 1e-6


def test_kernel_runner_ext_path_multy_drag():
    """drag_sin instances read the ext side-buffer; the kernel runner
    pregathers those rows on the host and must match the oracle."""
    from waveforms_tpu.models.multy_drag import drag_sin
    from waveforms_tpu.ops.stack_synth import _build_kernel_runner
    rng = np.random.default_rng(33)
    p = drag_sin(5e9, 20e-9, plateau=10e-9, delta=1e6)
    x = zero()
    for _ in range(15):
        x += p >> rng.uniform(0, 7e-6)
    low = lower_schedule([x], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    assert plan is not None
    assert _build_kernel_runner(plan, low, True) is not None
    out = np.asarray(synthesize_stack(low, plan))
    t, want = _oracle([x], 0, 8.192e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_kernel_runner_group_cap_falls_back():
    """Plans beyond KERNEL_MAX_GROUPS use the XLA runner (still correct)."""
    from waveforms_tpu.ops import stack_synth as st
    rng = np.random.default_rng(35)
    x = zero()
    # many distinct factor structures: gaussian powers 1..N via products
    for p in range(1, 12):
        x += (0.1 * gaussian(40e-9) ** p) >> rng.uniform(0, 7e-6)
    low = lower_schedule([x], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    if plan is None:
        return
    old = st.KERNEL_MAX_GROUPS
    st.KERNEL_MAX_GROUPS = 1
    try:
        if len(plan.groups) > 1:
            assert st._build_kernel_runner(plan, low, True) is None
        out = np.asarray(synthesize_stack(low, plan))
    finally:
        st.KERNEL_MAX_GROUPS = old
    t, want = _oracle([x], 0, 8.192e-6)
    assert np.abs(out - want).max() / max(np.abs(want).max(), 1e-30) < 2e-6


@pytest.mark.parametrize("layers", ["0", "2"])
def test_kernel_runner_transposed_tables(layers, monkeypatch):
    """WFTPU_STACK_TABLE_T=1 stores (PW8, k) tables and transposes
    in-kernel; output must be identical work to the row-major layout
    (same instances, same math, only the fetch layout differs)."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)
    rng = np.random.default_rng(41)
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 7e-6, 120)]
    # a second overlapping layer forces identity-layer collisions and a
    # spill strip, exercising the 128-lane spill padding in T mode
    wl += [(0.25 * cosPulse(70e-9) >> o)
           for o in rng.uniform(0, 7e-6, 60)]
    low = lower_schedule([WaveVStack(wl)], 0, 8.192e-6, FS)
    monkeypatch.setenv('WFTPU_STACK_IDENT_LAYERS', layers)
    plan = build_stack_plan(low)
    kr = _build_kernel_runner(plan, low, True)
    assert kr is not None
    base = np.asarray(kr())
    monkeypatch.setenv('WFTPU_STACK_TABLE_T', '1')
    plan_t = build_stack_plan(low)
    kr_t = _build_kernel_runner(plan_t, low, True)
    assert kr_t is not None
    got = np.asarray(kr_t())
    scale = max(np.abs(base).max(), 1e-30)
    assert np.abs(got - base).max() / scale < 1e-6
    t, want = _oracle([WaveVStack(wl).simplify()], 0, 8.192e-6)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


def test_int16_dac_codes_in_kernel_and_epilogue():
    """out_dtype=int16 must match quantizing the f32 output, both for
    pure-narrow plans (in-kernel quantize) and for plans with a wide
    residual (epilogue quantize after the sum)."""
    import jax.numpy as jnp
    from waveforms_tpu.ops.stack_synth import synthesize_stack
    rng = np.random.default_rng(47)
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 7e-6, 80)]
    low = lower_schedule([WaveVStack(wl)], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    assert plan.wide is None
    f32 = np.asarray(synthesize_stack(low, plan))
    codes = np.asarray(synthesize_stack(low, plan, out_dtype=jnp.int16))
    assert codes.dtype == np.int16
    want = np.clip(np.round(f32.astype(np.float64) * 32767.0),
                   -32768, 32767)
    assert np.abs(codes - want).max() <= 1

    # wide residual: add a long plateau so part of the schedule stays on
    # the kernels; codes quantize once, after the sum
    mixed = WaveVStack(wl + [0.25 * square(6e-6) >> 4e-6])
    low2 = lower_schedule([mixed], 0, 8.192e-6, FS)
    plan2 = build_stack_plan(low2)
    assert plan2.wide is not None
    f32b = np.asarray(synthesize_stack(low2, plan2))
    codes2 = np.asarray(synthesize_stack(low2, plan2,
                                         out_dtype=jnp.int16))
    want2 = np.clip(np.round(f32b.astype(np.float64) * 32767.0),
                    -32768, 32767)
    assert np.abs(codes2 - want2).max() <= 1


def test_stack_bf16_is_plain_astype_no_dac_scale():
    """Float narrowing must NOT apply dac_scale (integer codes only) --
    the shared engine convention (_quantize_host, dense/panel stores).
    Regression: the stack stores scaled bf16 by 32767 (round 4)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(41)
    wl = [float(a) * cosPulse(50e-9) >> o
          for a, o in zip(rng.uniform(0.2, 1.0, 30),
                          rng.uniform(0, 8e-6, 30))]
    low = lower_schedule([WaveVStack(wl)], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    assert plan.wide is None
    f32 = np.asarray(synthesize_stack(low, plan))
    bf = np.asarray(synthesize_stack(low, plan,
                                     out_dtype=jnp.bfloat16), np.float32)
    scale = max(np.abs(f32).max(), 1e-30)
    assert np.abs(bf - f32).max() / scale < 1e-2      # bf16 rounding only

    # wide-residual epilogue path: same convention
    mixed = WaveVStack(wl + [0.25 * square(6e-6) >> 4e-6])
    low2 = lower_schedule([mixed], 0, 8.192e-6, FS)
    plan2 = build_stack_plan(low2)
    assert plan2.wide is not None
    f32b = np.asarray(synthesize_stack(low2, plan2))
    bf2 = np.asarray(synthesize_stack(low2, plan2,
                                      out_dtype=jnp.bfloat16), np.float32)
    assert np.abs(bf2 - f32b).max() / max(np.abs(f32b).max(), 1e-30) < 1e-2


def test_spill_width_is_sublane_granular_with_tail_strip():
    """Spill widths pad to the f32 sublane (8), NOT the next power of
    two, and the strip walk is 128-wide strips plus one narrow tail --
    so per-chunk eval/dot work tracks the live count (round-4 session 5:
    pow2 rounding made ~145-live vstack chunks pay 256 slot-evals)."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               _group_table)

    rng = np.random.default_rng(53)
    # ~1000 short pulses over 100 us at 2 GS/s -> ~140 live blocks per
    # 16384-sample chunk, the vstack-row regime
    wl = [(0.5 * cosPulse(100e-9) >> o)
          for o in rng.uniform(0, 95e-6, 1000)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)
    plan = build_stack_plan(low)
    n_chunks = -(-plan.n_channels * plan.n_rows // 128)
    ext_np = np.zeros(1)
    main = max(plan.groups, key=lambda g: len(g.amp))
    meta, tab, cnts = _group_table(main, plan.n_rows, n_chunks, ext_np,
                                   0, False)
    assert meta['k_sp'] % 8 == 0
    assert meta['k_sp'] == max(8, -(-int(cnts[:, 1].max()) // 8) * 8)
    assert sum(meta['sp_widths']) == meta['k_sp']
    assert all(w == 128 for w in meta['sp_widths'][:-1])
    assert meta['sp_widths'][-1] <= 128 and meta['sp_widths'][-1] % 8 == 0
    # the full kernel with the tail strips still matches the oracle
    kr = _build_kernel_runner(plan, low, True)
    assert kr is not None
    out = np.asarray(kr())
    t, want = _oracle([WaveVStack(wl).simplify()], 0, 100e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_merged_operands_single_table_block():
    """All groups' slot tables concatenate into ONE operand (+ one
    counts block): the runner's pallas program takes exactly 2 operands
    however many structure groups the plan has, and group slot bases
    stay sublane-aligned."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    rng = np.random.default_rng(59)
    # three structure groups: cosPulse (const+cos), gaussian, mixed drag
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 7e-6, 40)]
    wl += [(0.3 * gaussian(60e-9) >> o) for o in rng.uniform(0, 7e-6, 40)]
    wl += [(mixing(0.2 * cosPulse(40e-9) >> o, freq=-150e6,
                   DRAGScaling=1e-10)[0]) for o in rng.uniform(0, 7e-6, 8)]
    low = lower_schedule([WaveVStack(wl)], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    assert len(plan.groups) >= 2
    kr = _build_kernel_runner(plan, low, True)
    assert kr is not None
    assert len(kr.kernel_args) == 2           # one counts + one table
    cnts, tab = kr.kernel_args
    assert cnts.shape[1] == 2 * len(plan.groups)
    assert tab.shape[2] % 8 == 0              # merged slot axis
    out = np.asarray(kr())
    t, want = _oracle([WaveVStack(wl).simplify()], 0, 8.192e-6)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_superchunk_env_lever_parity(monkeypatch):
    """WFTPU_STACK_SC changes only the grid shape: any SC (including an
    odd one that forces padding superchunks) must produce identical
    output."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    rng = np.random.default_rng(61)
    wl = [(0.5 * cosPulse(100e-9) >> o)
          for o in rng.uniform(0, 95e-6, 120)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)
    plan = build_stack_plan(low)
    base = np.asarray(_build_kernel_runner(plan, low, True)())
    for sc in ('1', '5', '16'):
        monkeypatch.setenv('WFTPU_STACK_SC', sc)
        plan2 = build_stack_plan(low)
        out = np.asarray(_build_kernel_runner(plan2, low, True)())
        assert np.array_equal(out, base), f"SC={sc} diverged"


def test_dict_table_compaction_parity_and_geometry(monkeypatch):
    """WFTPU_STACK_DICT=1 bakes bitwise-constant table columns into the
    kernel as immediates and streams only the varying columns.  On a
    near-identical-pulse stack (the vstack-row regime) only the
    shift-derived columns vary, so the table narrows from the lane-
    padded 128 to <= 16 columns -- and the output must be BIT-identical
    (same math, same values; only loads become constants)."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    rng = np.random.default_rng(67)
    wl = [(0.5 * cosPulse(100e-9) >> o)
          for o in rng.uniform(0, 95e-6, 300)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)
    monkeypatch.setenv('WFTPU_STACK_DICT', '0')   # full-layout baseline
    plan = build_stack_plan(low)
    kr = _build_kernel_runner(plan, low, True)
    base = np.asarray(kr())
    full_bytes = sum(int(np.prod(o.shape)) * 4 for o in kr.kernel_args)
    monkeypatch.setenv('WFTPU_STACK_DICT', '1')
    plan_d = build_stack_plan(low)
    kr_d = _build_kernel_runner(plan_d, low, True)
    assert kr_d is not None
    got = np.asarray(kr_d())
    assert np.array_equal(got, base)
    dict_bytes = sum(int(np.prod(o.shape)) * 4 for o in kr_d.kernel_args)
    assert dict_bytes * 4 < full_bytes     # the operand stream shrank
    t, want = _oracle([WaveVStack(wl).simplify()], 0, 100e-6)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


def test_dict_table_padding_mask_columns_stay_per_slot():
    """lo/hi (the mask columns) may only bake when constant across ALL
    slots: padding slots rely on their lo=hi=0 empty mask to stay exact
    zeros once amp/args columns are baked to nonzero immediates."""
    from waveforms_tpu.ops.stack_synth import _group_table

    rng = np.random.default_rng(71)
    wl = [(0.5 * cosPulse(100e-9) >> o)
          for o in rng.uniform(0, 95e-6, 300)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)
    plan = build_stack_plan(low)
    n_chunks = -(-plan.n_channels * plan.n_rows // 128)
    main = max(plan.groups, key=lambda g: len(g.amp))
    meta, tab, cnts = _group_table(main, plan.n_rows, n_chunks,
                                   np.zeros(1), 0, False, dict_cols=True)
    assert 'col_pos' in meta
    # mask columns stay in the table (instances start at distinct lo/hi)
    assert 2 in meta['col_pos'] and 3 in meta['col_pos']
    # the amp column baked (every instance has amplitude 0.25) even
    # though padding slots carry amp 0 -- their empty mask protects them
    assert meta['off_amp'] in meta['col_const']
    assert meta['col_const'][meta['off_amp']][0] == np.float32(0.25)
    assert meta['PW'] <= 16
    assert tab.shape[-1] == meta['PW']


def test_dict_table_heterogeneous_groups(monkeypatch):
    """Compaction is per-group: groups with diverse args keep their
    columns while uniform groups shrink, and the merged operand pads to
    the widest kept group -- output still bit-matches the full layout."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    rng = np.random.default_rng(73)
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 7e-6, 40)]
    wl += [(float(a) * gaussian(w) >> o)     # per-instance widths/amps
           for a, w, o in zip(rng.uniform(0.1, 1, 20),
                              rng.uniform(40e-9, 90e-9, 20),
                              rng.uniform(0, 7e-6, 20))]
    low = lower_schedule([WaveVStack(wl)], 0, 8.192e-6, FS)
    plan = build_stack_plan(low)
    base = np.asarray(_build_kernel_runner(plan, low, True)())
    monkeypatch.setenv('WFTPU_STACK_DICT', '1')
    plan_d = build_stack_plan(low)
    kr_d = _build_kernel_runner(plan_d, low, True)
    got = np.asarray(kr_d())
    assert np.array_equal(got, base)
    t, want = _oracle([WaveVStack(wl).simplify()], 0, 8.192e-6)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


def test_onestrip_and_dot3_levers_parity(monkeypatch):
    """WFTPU_STACK_ONESTRIP collapses the predicated spill strips into
    one full-width strip per chunk (padding slots are exact zeros, so
    walking them is safe); WFTPU_STACK_DOT3 swaps the HIGHEST scatter
    dot for the 3-split exact-bf16 dot.  Both must stay within the
    oracle budget, and onestrip alone (same dot) must match the
    predicated walk bit-for-bit on a single-strip-per-chunk schedule."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    rng = np.random.default_rng(79)
    wl = [(0.5 * cosPulse(100e-9) >> o)
          for o in rng.uniform(0, 95e-6, 300)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)
    monkeypatch.setenv('WFTPU_STACK_ONESTRIP', '0')
    plan = build_stack_plan(low)
    # dot3=False explicitly: the env default flipped to dot3 ON in round
    # 4, and the bitwise same-dot comparison below is only meaningful
    # against a HIGHEST-dot baseline
    base = np.asarray(_build_kernel_runner(plan, low, True, dot3=False)())
    t, want = _oracle([WaveVStack(wl).simplify()], 0, 100e-6)
    for oflag, d3 in (('1', False), ('1', True), ('auto', True)):
        monkeypatch.setenv('WFTPU_STACK_ONESTRIP', oflag)
        plan2 = build_stack_plan(low)
        out = np.asarray(_build_kernel_runner(plan2, low, True, dot3=d3)())
        assert np.abs(out - want).max() / np.abs(want).max() < 2e-6, \
            (oflag, d3)
        if not d3:
            # same dot, same slots, different strip partition: the only
            # numeric difference would be HIGHEST-dot accumulation
            # order across the strip boundary -- interpret mode's f32
            # dot is associative-free here, so demand closeness
            assert np.abs(out - base).max() <= 1e-6 * np.abs(want).max()


def test_blocked_counts_path_is_bit_identical(monkeypatch):
    """Plans whose per-chunk counts array exceeds CNT_SMEM_WHOLE_MAX
    stream counts per superchunk ((n_super, SC, W) with a (1, SC, W)
    SMEM window) instead of riding whole-resident; the two layouts feed
    the same scalars to _emit_chunk, so the output must be BIT-identical.
    (The whole-resident layout on an 8192-chunk plan made Mosaic's window
    allocator pad the s32 counts ~16x past SMEM -- the r5_occ_stack_120
    compile failure.)"""
    from waveforms_tpu.ops import stack_synth
    from waveforms_tpu.ops.stack_synth import _build_kernel_runner

    rng = np.random.default_rng(89)
    wl = [(0.5 * cosPulse(100e-9) >> o)
          for o in rng.uniform(0, 95e-6, 300)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)
    plan = build_stack_plan(low)
    kr = _build_kernel_runner(plan, low, True)
    assert kr is not None
    base = np.asarray(kr())
    monkeypatch.setattr(stack_synth, 'CNT_SMEM_WHOLE_MAX', 0)
    plan_b = build_stack_plan(low)
    kr_b = _build_kernel_runner(plan_b, low, True)
    assert kr_b is not None
    # the counts operand really did take the blocked (3-D) layout
    assert any(a.ndim == 3 for a in kr_b.kernel_args)
    got = np.asarray(kr_b())
    assert np.array_equal(got, base)
    t, want = _oracle([WaveVStack(wl).simplify()], 0, 100e-6)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


def test_onestrip_auto_is_occupancy_gated():
    """'auto' collapses strips only when chunk occupancy is uniform:
    a skewed schedule (pulses clustered in one corner of a long window)
    must keep the predicated 128-wide walk."""
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    rng = np.random.default_rng(83)
    # uniform: ~300 pulses spread evenly -> collapse
    wl_u = [(0.5 * cosPulse(100e-9) >> o)
            for o in rng.uniform(0, 95e-6, 300)]
    low_u = lower_schedule([WaveVStack(wl_u)], 0, 100e-6, FS)
    # skewed: same pulse count packed into the first 5% of the window
    wl_s = [(0.5 * cosPulse(100e-9) >> o)
            for o in rng.uniform(0, 5e-6, 300)]
    low_s = lower_schedule([WaveVStack(wl_s)], 0, 100e-6, FS)
    kr_u = _build_kernel_runner(build_stack_plan(low_u), low_u, True)
    kr_s = _build_kernel_runner(build_stack_plan(low_s), low_s, True)
    main_u = max(kr_u.metas, key=lambda m: m['k_sp'])
    main_s = max(kr_s.metas, key=lambda m: m['k_sp'])
    assert len(main_u['sp_widths']) == 1          # collapsed
    assert main_u['sp_widths'][0] == main_u['k_sp']
    assert len(main_s['sp_widths']) > 1           # kept predicated
    assert all(w == 128 for w in main_s['sp_widths'][:-1])
    for kr, wl in ((kr_u, wl_u), (kr_s, wl_s)):
        out = np.asarray(kr())
        t, want = _oracle([WaveVStack(wl).simplify()], 0, 100e-6)
        assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_midband_occupancy_routes_to_stack():
    """The 15-60% occupancy band routes to the pulse-instance stack
    kernel (round 5): many-overlap schedules blow up per-tile segment
    lists in every segment-walk kernel, while stack work scales with
    instance count (on-chip: 2.2-2.8x across the band, r5_occ_stack_*).
    Low-occupancy pulse schedules must KEEP the panel route."""
    from waveforms_tpu import engine, mixing, zero
    from waveforms_tpu.engine import classify_pallas_route

    rng = np.random.default_rng(17)
    dur = 100e-6

    def ladder(n_pulses, n_ch=2):
        chans = []
        for c in range(n_ch):
            x = zero()
            for _ in range(n_pulses):
                I, _ = mixing(0.5 * cosPulse(200e-9)
                              >> rng.uniform(0, dur * 0.9),
                              freq=-150e6 - 2e6 * c, DRAGScaling=1e-10)
                x = x + I
            chans.append(x)
        return chans

    mid = ladder(120)                     # ~39% subtile occupancy
    low_mid = lower_schedule(mid, 0, dur, FS)
    kind, plan = classify_pallas_route(low_mid)
    assert kind == 'stack', kind
    assert plan.n_narrow >= 64

    sparse = ladder(4)                    # ~1% occupancy: panel domain
    low_sp = lower_schedule(sparse, 0, dur, FS)
    kind_sp, _ = classify_pallas_route(low_sp)
    assert kind_sp in ('panel', 'panel-windowed'), kind_sp

    # routed output matches the oracle (the stack path really runs)
    out = np.asarray(engine.synthesize(mid, 0, dur, FS, engine='pallas'))
    t, want = _oracle([c.simplify() for c in mid], 0, dur)
    assert np.abs(out - want).max() / np.abs(want).max() < 2e-6


def test_scdot_batched_scatter_matches_per_chunk(monkeypatch):
    """The superchunk-batched scatter (one widened dot per grid step
    instead of one per chunk x group) feeds every output row the SAME
    product multiset as the per-chunk path: slots of other chunks -- and
    padding slots, whose lrt=128 aliases the next chunk's row 0 in the
    widened lane space -- contribute one-hot hits times exact-zero
    values.  It is NOT bit-identical (the wider GEMM blocks the
    contraction differently, shifting f32 summation order ~1 ulp), so
    demand 1-ulp-class closeness per dot mode plus the oracle anchor."""
    import jax.numpy as jnp

    from waveforms_tpu.ops import stack_synth as st

    rng = np.random.default_rng(21)
    # dense enough that chunk occupancy is uniform (the auto gate's
    # <=60%-waste rule; 400 pulses over the same window skew it past
    # the threshold and the gate declines -- see the companion test)
    wl = [(0.25 * cosPulse(60e-9) >> o)
          for o in rng.uniform(0, 95e-6, 1000)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)

    def build(flag, **kw):
        monkeypatch.setenv('WFTPU_STACK_SCDOT', flag)
        plan = st.build_stack_plan(low)
        return st._build_kernel_runner(plan, low, True, **kw)

    base = build('0')
    assert not base.scdot
    want = np.asarray(base())
    scale = np.abs(want).max()
    for d3 in (False, True):
        run = build('auto', dot3=d3)
        assert run.scdot, "auto gate must engage on the vstack regime"
        ref_d3 = np.asarray(build('0', dot3=d3)())
        assert np.abs(np.asarray(run()) - ref_d3).max() <= 5e-7 * scale
    # oracle anchor (not just self-consistency)
    t, ref = _oracle([WaveVStack(wl).simplify()], 0, 100e-6)
    assert np.abs(want - ref).max() / np.abs(ref).max() < 2e-6
    # int16 codes: the quantizer sees 1-ulp-different f32 accumulators,
    # so codes may differ by at most one level on knife-edge samples
    c16 = np.asarray(build('auto', out_dtype=jnp.int16)())
    c16b = np.asarray(build('0', out_dtype=jnp.int16)())
    assert c16.dtype == np.int16
    assert np.abs(c16.astype(np.int32) - c16b.astype(np.int32)).max() <= 1


def test_scdot_gate_declines_sparse_nonuniform(monkeypatch):
    """A few isolated pulses over a long window fail the <=60% padding
    waste rule (most chunks are empty, predication is what saves them):
    the auto gate must decline, and SCDOT=0 must always decline."""
    from waveforms_tpu.ops import stack_synth as st

    wl = [(0.5 * cosPulse(50e-9) >> (o * 30e-6))
          for o in range(3)]
    low = lower_schedule([WaveVStack(wl)], 0, 100e-6, FS)
    monkeypatch.setenv('WFTPU_STACK_SCDOT', 'auto')
    plan = st.build_stack_plan(low)
    run = st._build_kernel_runner(plan, low, True)
    assert not run.scdot
    # correctness regardless of the gate decision
    out = np.asarray(run())
    t, ref = _oracle([WaveVStack(wl).simplify()], 0, 100e-6)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-6

"""Stacked-table sequence playback: AWG waveform memory on the STACK path.

:class:`~waveforms_tpu.ops.sequencer.Sequencer` plays shot sequences
through the dense/panel kernels, whose per-shot cost is bounded below by
full-subtile factor evaluation over every union-live subtile
(``play_packed`` measured 1.75 us/shot on the dev v5e).  Schedules made of
MANY NARROW pulses -- randomized-benchmarking tables, sparse gate trains --
evaluate far fewer samples on the pulse-instance stack path
(:mod:`waveforms_tpu.ops.stack_synth`), so this module stacks the K
schedules' packed stack-kernel tables along a leading schedule axis, keeps
them device-resident (the upload IS the waveform memory -- it happens once,
at the first play, and is cached), and plays a whole shot sequence in ONE
Pallas launch:

* the grid is ``(n_shots * n_super,)`` -- each step renders one superchunk
  of one shot's output;
* the shot-index vector rides as a SCALAR-PREFETCH operand, and each
  table's BlockSpec index map selects schedule ``ks[shot]``'s slice for the
  step, so Mosaic's pipeline streams exactly the chosen schedule's blocks
  from HBM -- no gathered copies of the tables are ever materialized, and
  ``ks`` may be traced (measurement-dependent feedback);
* per-chunk identity-layer/spill counts ride whole in SMEM, indexed by the
  same prefetched schedule id inside the kernel.

Per-shot device cost is therefore the shot's OWN stack-kernel cost (live
pulse blocks only), not the union footprint, and below ``play_packed``'s
per-item floor for narrow-pulse tables.

Reference parity note: the reference (feihoo87/waveforms) has no sequencer;
like ops/sequencer.py this is new TPU-native surface (SURVEY.md section
2.4 -- the AWG upload/trigger model made a device program).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .lowering import (PALLAS_SMEM_BUDGET, LoweredSchedule,
                       UnsupportedFactor)
from .stack_synth import (KERNEL_MAX_HBM, KERNEL_MAX_VMEM, GroupData,
                          StackPlan, _dict_compact, _group_table,
                          _kernel_runner_viable, _emit_chunk,
                          _scatter_dot, _strip_builder, build_stack_plan)

__all__ = ['StackSequencer', 'synthesize_stack_sharded']


def _group_key(g) -> tuple:
    return (g.ops, g.powers, g.term_nfac)


def _empty_group(key: tuple, W: int) -> GroupData:
    """A zero-instance group for schedules missing a union key.

    One all-zero dummy instance keeps the packed-table gathers shaped
    (``src`` is -1 everywhere, so the dummy row is never selected and
    every count is zero -- the slice is pure padding)."""
    ops, powers, term_nfac = key
    TF, NT = len(ops), len(term_nfac)
    z = np.zeros(1, np.int64)
    return GroupData(ops=ops, powers=powers, term_nfac=term_nfac,
                     amp=np.zeros((1, NT), np.float32),
                     lo=z, hi=z, row0=z, chan=z,
                     shift=np.zeros((1, TF), np.int32),
                     q32=np.zeros((1, TF, 4), np.int32),
                     args=np.zeros((1, TF, W), np.float32))


class StackSequencer:
    """K narrow-pulse schedules stacked into device-resident stack tables.

    All schedules must share channel count, sample count, sample rate and
    single-bucket layout, must lower real (no pair mode), must have NO
    wide residual (every instance narrow, no finite clip rails -- the
    packed launch has nowhere to run a dense residual), and must share
    the same factor-structure group set (tables built from one pulse
    family do).  Raises :class:`UnsupportedFactor` otherwise.

    ``plans`` may be passed pre-built (e.g. reused from single-schedule
    synthesis); otherwise they are built here.
    """

    def __init__(self, lows: list[LoweredSchedule],
                 plans: list[StackPlan] | None = None,
                 n_super_multiple: int = 1):
        if not lows:
            raise ValueError("empty sequence table")
        first = lows[0]
        for low in lows:
            if (low.shape[0], low.n_samples, low.sample_rate,
                    low.shape[1]) != (first.shape[0], first.n_samples,
                                      first.sample_rate, first.shape[1]):
                raise ValueError(
                    "sequence schedules must share channels, samples and "
                    "sample rate")
            if low.shape[1] != 1:
                raise UnsupportedFactor(
                    "stacked-table play is single-bucket")
        if plans is None:
            plans = [build_stack_plan(low) for low in lows]
        elif len(plans) != len(lows):
            raise ValueError(
                f"{len(plans)} pre-built plans for {len(lows)} schedules "
                "-- plans must pair 1:1 with lows")
        for k, plan in enumerate(plans):
            if plan is None:
                raise UnsupportedFactor(
                    f"schedule {k} has no batchable pulse instances "
                    "(complex, clipped, or empty) -- use Sequencer")
            if plan.wide is not None:
                raise UnsupportedFactor(
                    f"schedule {k} has wide instances (plateaus/carriers) "
                    "-- the stacked-table launch is narrow-pulse only; "
                    "use Sequencer.play_packed")
            if not _kernel_runner_viable(plan):
                raise UnsupportedFactor(
                    f"schedule {k}'s plan is outside the fused-kernel "
                    "limits (groups/ext)")
        # UNION the factor-structure group sets: overlap patterns merge
        # same-support terms into multi-term instances, so two schedules
        # from one pulse family can still disagree on group keys (an
        # overlapping pair becomes a (const, cos, const, cos) instance
        # only where overlaps happen).  Schedules missing a group carry
        # an all-padding slice of the stacked tensor: zero counts, so
        # its strips predicate away at run time.
        key_union = sorted({_group_key(g) for p in plans for g in p.groups})
        group_of = [{_group_key(g): g for g in p.groups} for p in plans]
        # each plan passed _kernel_runner_viable individually, but the
        # UNION drives the stacked kernel's operand/strip count -- it
        # must honor the same envelope the single-schedule runner does
        from .stack_synth import KERNEL_MAX_GROUPS
        if len(key_union) > KERNEL_MAX_GROUPS:
            raise UnsupportedFactor(
                f"{len(key_union)} factor-structure groups across the "
                f"sequence (kernel limit {KERNEL_MAX_GROUPS}) -- stack "
                "schedules from one pulse family per table")

        self.n_schedules = K = len(lows)
        self.n_channels = C = first.shape[0]
        self.n_samples = first.n_samples
        self.sample_rate = first.sample_rate
        n_rows = plans[0].n_rows
        for k, (p, low) in enumerate(zip(plans, lows)):
            # cross-reference each plan with ITS schedule: a reordered
            # or foreign plans list silently synthesizes wrong samples
            # (the ext gathers would read low's buffer with the other
            # plan's offsets)
            if (p.n_rows != n_rows or p.n_channels != low.shape[0]
                    or p.n_samples != low.n_samples):
                raise ValueError(
                    f"plans[{k}] does not match lows[{k}] "
                    f"(rows {p.n_rows}/{n_rows}, ch {p.n_channels}/"
                    f"{low.shape[0]}, samples {p.n_samples}/"
                    f"{low.n_samples}) -- plans must pair 1:1 with lows")
        total_rows = C * n_rows
        n_chunks = -(-total_rows // 128)
        self._n_rows = n_rows
        self._total_rows = total_rows

        SC = min(4, n_chunks)
        self._SC = SC
        # n_super_multiple rounds the superchunk count up so a mesh's
        # 'time' axis can split each schedule's superchunk run evenly
        # (synthesize_stack_sharded); padding superchunks carry zero
        # counts and predicate away like ordinary chunk padding
        ns = -(-n_chunks // SC)
        self.n_super = -(-ns // n_super_multiple) * n_super_multiple
        n_chunks_pad = self.n_super * SC
        self._n_chunks_pad = n_chunks_pad
        # one (K * n_chunks_pad, 2) int32 counts block rides in SMEM PER
        # GROUP, so the budget scales with the union size
        if len(key_union) * K * n_chunks_pad * 2 * 4 > PALLAS_SMEM_BUDGET:
            raise UnsupportedFactor(
                f"stacked count tables ({len(key_union)} groups x {K} "
                f"schedules x {n_chunks_pad} chunks) exceed the kernel "
                "SMEM budget -- fewer/smaller schedules per table")

        # one-hot scatter default per the clean-window A/B
        # (r4_stack_layout_ab; see stack_synth._build_kernel_runner)
        n_ident = int(os.environ.get('WFTPU_STACK_IDENT_LAYERS', '0'))
        table_t = os.environ.get('WFTPU_STACK_TABLE_T', '0') == '1'
        W = next(g.args.shape[-1] for p in plans for g in p.groups)

        # pass 1: table-wide identity-layer depth and spill width per
        # group key, so every schedule's table stacks into one tensor
        # (layers trim to the max OBSERVED collision depth -- see
        # _group_table -- and spills pad to the max width)
        from .stack_synth import _chunk_assign_hybrid
        assign_memo = {}

        def assign(g, depth):
            # the O(blocks) placement walk runs once per (group, depth):
            # pass 1b re-reads pass 1's result when the table-wide depth
            # matches the probe depth (the common one-family case)
            mkey = (id(g), depth)
            if mkey not in assign_memo:
                assign_memo[mkey] = _chunk_assign_hybrid(
                    g, n_rows, n_chunks, depth)
            return assign_memo[mkey]

        eff_max = {key: 1 if n_ident else 0 for key in key_union}
        seen_groups = set()
        for plan in plans:
            for g in plan.groups:
                seen_groups.add(id(g))
                *_, lay_cnt, _sp, _k = assign(g, n_ident)
                key = _group_key(g)
                eff_max[key] = max(eff_max[key], int(lay_cnt.max()))
        k_sp_max = {key: 0 for key in key_union}
        for plan in plans:
            for g in plan.groups:
                key = _group_key(g)
                *_, k_sp = assign(g, eff_max[key])
                k_sp_max[key] = max(k_sp_max[key], k_sp)

        # pass 2: build + stack.  Every int/float field is packed into
        # ONE f32 table per (schedule, group); padding chunks/slots are
        # exact zeros, so the padded launch adds nothing.
        self._metas = []
        self._operands = []     # [cnts (K*n_chunks_pad, 2), tab] per group
        vmem = 2 * SC * 2 * 128 * 128 * 4
        hbm = 0
        pad_c = n_chunks_pad - n_chunks
        # dictionary compaction must be JOINT across the K schedules
        # (one column layout per group key), so tables build full first
        # and compact after the loop -- see stack_synth._dict_compact
        dict_cols = (os.environ.get('WFTPU_STACK_DICT', '1') == '1'
                     and not table_t)
        scdot_tot = [0, 0]           # [padded slots, live slots] totals
        for key in key_union:
            tabs, valids, cnts_all = [], [], []
            meta = None
            for k, plan in enumerate(plans):
                g = group_of[k].get(key)
                if g is None:
                    g = _empty_group(key, W)
                meta, tab, cnts = _group_table(
                    g, n_rows, n_chunks, self._ext_of(lows[k]),
                    n_ident, table_t, k_sp_force=k_sp_max[key],
                    n_ident_force=eff_max[key],
                    assignment=(assign(g, eff_max[key])
                                if id(g) in seen_groups else None))
                valids.append(meta.pop('_valid', None))
                tabs.append(tab)
                cnts_all.append(np.pad(cnts, ((0, pad_c), (0, 0))))
            if dict_cols and all(v is not None for v in valids):
                tabs = _dict_compact(meta, tabs, valids)
            else:
                meta.pop('_valid', None)
            # single full-width spill strip when occupancy is uniform
            # ACROSS the whole stacked table (same rule + 512-slot cap
            # as stack_synth._build_kernel_runner; the counts here span
            # all K schedules' chunks)
            onestrip = os.environ.get('WFTPU_STACK_ONESTRIP', 'auto')
            spc_sum = max(int(sum(int(c[:, 1].sum())
                                  for c in cnts_all)), 1)
            if (not table_t and 0 < meta['k_sp'] <= 512
                    and len(meta['sp_widths']) > 1
                    and (onestrip == '1'
                         or (onestrip == 'auto'
                             and K * n_chunks * meta['k_sp']
                             <= 1.6 * spc_sum))):
                meta['sp_widths'] = (meta['k_sp'],)
            # superchunk-batched scatter eligibility (the waste rule
            # needs the counts, which _seq_call never sees): totals
            # accumulate across groups -- the batched dot fuses them
            # all, so a tiny auxiliary group's padding is priced
            # against the whole step's live work (joint flag below)
            scdot_tot[0] += K * n_chunks * meta['k_sp']
            scdot_tot[1] += spc_sum
            tabs = [np.pad(t, ((0, pad_c), (0, 0), (0, 0)))
                    for t in tabs]
            if table_t:
                tabs = [np.ascontiguousarray(t.transpose(0, 2, 1))
                        for t in tabs]
            tabs = [t.reshape(
                (self.n_super, SC, meta['PW'], meta['k_max'])
                if table_t
                else (self.n_super, SC, meta['k_max'], meta['PW']))
                for t in tabs]
            self._metas.append(meta)
            vmem += 2 * 4 * SC * meta['k_max'] * meta['PW']
            # (K, n_super, ...) flattened to (K * n_super, ...): table
            # blocks stay 4-dim so the shared strip evaluator's indexing
            # matches the single-schedule runner's exactly
            stacked_tab = np.concatenate(tabs)
            stacked_cnt = np.concatenate(cnts_all)     # (K*n_chunks_pad, 2)
            hbm += stacked_tab.nbytes + stacked_cnt.nbytes
            # host arrays here; the single-device play path uploads once
            # lazily, and the sharded path device_puts each shard's slice
            # directly (no full-table stop on device 0)
            self._operands.append([stacked_cnt, stacked_tab])
        joint_ok = bool(scdot_tot[0] <= 1.6 * max(scdot_tot[1], 1))
        for meta in self._metas:
            meta['scdot_ok'] = joint_ok
        if vmem > KERNEL_MAX_VMEM:
            raise UnsupportedFactor(
                "stacked group tables exceed the kernel VMEM budget")
        if hbm > KERNEL_MAX_HBM:
            raise UnsupportedFactor(
                f"stacked tables ({hbm >> 20} MiB) exceed the device "
                "table budget -- fewer/smaller schedules per table")
        self._calls = {}
        self._device_ops = None      # lazy one-time upload (first play)
        self._replicated = {}        # mesh -> replicated operand cache

    @staticmethod
    def _ext_of(low: LoweredSchedule) -> np.ndarray:
        return np.asarray(low.ext if low.ext is not None and low.ext.size
                          else np.zeros(1), np.float64)

    def describe(self) -> str:
        """One-line table summary (debugging / logging aid)."""
        bytes_ = sum(int(t.nbytes) for _, t in self._operands)
        return (f"{self.n_schedules} schedules x {self.n_channels} ch x "
                f"{self.n_samples} samples, {len(self._metas)} group(s), "
                f"{self.n_super * self._SC} chunks/shot, "
                f"{bytes_ >> 10} KiB device tables")

    def _build_call(self, n_shots: int, interpret: bool, out_dtype,
                    dac_scale: float):
        return _seq_call(self._metas,
                         [(c.shape, t.shape) for c, t in self._operands],
                         self._SC, self.n_super, self._n_chunks_pad,
                         n_shots, interpret, out_dtype, dac_scale)

    def play_packed(self, ks, interpret: bool | None = None,
                    out_dtype=None, dac_scale: float = 32767.0):
        """Synthesize the shot sequence ``ks`` in ONE kernel launch
        -> (len(ks), C, N).

        ``ks`` may be a traced int32 vector (measurement-dependent);
        out-of-range indices clamp to the table edges.  The kernel
        compiles once per shot COUNT (cached); per-shot device cost is
        the shot's own live pulse blocks.  ``out_dtype=jnp.int16`` emits
        exact DAC codes scaled by the scalar ``dac_scale`` and halves
        the result bytes.  Memory: the result is (n_shots, C, N) --
        size shot batches accordingly."""
        import jax
        import jax.numpy as jnp

        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        ks = jnp.asarray(ks, jnp.int32)
        n_shots = int(ks.shape[0])
        key = (n_shots, interpret,
               str(jnp.dtype(out_dtype or jnp.float32)),
               np.asarray(dac_scale, np.float32).tobytes(),
               os.environ.get('WFTPU_STACK_DOT3', '1'),
               os.environ.get('WFTPU_STACK_SCDOT', 'auto'))
        call = self._calls.get(key)
        if call is None:
            call = self._build_call(n_shots, interpret, out_dtype,
                                    dac_scale)
            self._calls[key] = call
        if self._device_ops is None:    # one-time table upload, cached
            self._device_ops = [jnp.asarray(a) for ops in self._operands
                                for a in ops]
        out = call(jnp.clip(ks, 0, self.n_schedules - 1),
                   *self._device_ops)
        out = out.reshape(n_shots, -1, 128)[:, :self._total_rows]
        out = out.reshape(n_shots, self.n_channels, self._n_rows * 128)
        return out[..., :self.n_samples]

    def play(self, k, interpret: bool | None = None, out_dtype=None,
             dac_scale: float = 32767.0):
        """Synthesize schedule ``k`` -> (C, N) (a 1-shot launch)."""
        import jax.numpy as jnp
        return self.play_packed(jnp.asarray([k], jnp.int32),
                                interpret=interpret, out_dtype=out_dtype,
                                dac_scale=dac_scale)[0]

    def play_packed_sharded(self, ks, mesh, interpret: bool | None = None,
                            out_dtype=None, dac_scale: float = 32767.0):
        """Shot-parallel ``play_packed`` over every device of ``mesh``
        -> (len(ks), C, N).

        The stacked tables replicate (each device holds the full
        waveform memory -- the right trade for shot fan-out, where the
        table is small and the shot batch is what scales) and the shot
        vector splits across ALL mesh axes jointly: device d plays its
        contiguous slice of ``ks`` with the ordinary stacked-table
        program, so throughput scales linearly in devices with no
        collectives.  ``ks`` pads to a multiple of the device count
        (padding shots render schedule 0 and are dropped).  For sharding
        the per-shot WORK instead of the shot axis, see
        :func:`synthesize_stack_sharded`."""
        import functools

        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        ks = jnp.asarray(ks, jnp.int32)
        n_shots = int(ks.shape[0])
        n_dev = int(np.prod(list(mesh.shape.values())))
        n_pad = -(-n_shots // n_dev) * n_dev
        ks_pad = jnp.clip(jnp.pad(ks, (0, n_pad - n_shots)), 0,
                          self.n_schedules - 1)
        n_local = n_pad // n_dev

        key = ('sharded', n_local, interpret,
               str(jnp.dtype(out_dtype or jnp.float32)), float(dac_scale),
               os.environ.get('WFTPU_STACK_DOT3', '1'),
               os.environ.get('WFTPU_STACK_SCDOT', 'auto'))
        call = self._calls.get(key)
        if call is None:
            call = self._build_call(n_local, interpret, out_dtype,
                                    dac_scale)
            self._calls[key] = call

        axes = tuple(mesh.axis_names)
        rep = self._replicated.get(mesh)
        if rep is None:
            # replicate ONCE per mesh: the table set can be hundreds of
            # MiB, and re-uploading per shot batch would contradict the
            # 'upload once' waveform-memory contract
            rep = []
            for cnts, tab in self._operands:
                rep.append(jax.device_put(cnts, NamedSharding(
                    mesh, P(*(None,) * np.ndim(cnts)))))
                rep.append(jax.device_put(tab, NamedSharding(
                    mesh, P(*(None,) * np.ndim(tab)))))
            self._replicated[mesh] = rep
        in_specs = (P(axes),) + tuple(
            P(*(None,) * np.ndim(a)) for a in rep)

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=in_specs,
            out_specs=P(axes, None, None), check_vma=False)
        def run(ks_local, *ops):
            return call(ks_local, *ops)

        out = run(jax.device_put(ks_pad, NamedSharding(mesh, P(axes))),
                  *rep)
        out = out.reshape(n_pad, -1, 128)[:, :self._total_rows]
        out = out.reshape(n_pad, self.n_channels, self._n_rows * 128)
        return out[:n_shots, :, :self.n_samples]


def _seq_call(metas, shapes, SC: int, n_super: int, n_chunks_pad: int,
              n_shots: int, interpret: bool, out_dtype, dac_scale):
    """Build the jitted stacked-table pallas call.

    ``shapes`` lists each group's ``(cnts.shape, tab.shape)`` as the
    call will SEE them: the full stacked shapes for single-device
    playback, or the per-shard local shapes under ``shard_map``
    (:func:`synthesize_stack_sharded`) -- the kernel body is identical,
    only the block geometry differs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # int16 DAC codes quantize in-kernel from an f32 scratch (one
    # full-block store -- dynamic int16 sub-stores crash Mosaic),
    # halving the (n_shots, C, N) result stream
    quant = (out_dtype is not None
             and jnp.dtype(out_dtype) != jnp.dtype(jnp.float32))
    if (out_dtype is not None
            and jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer)
            and jnp.dtype(out_dtype) != jnp.dtype(jnp.int16)):
        raise ValueError("integer output supports int16 only")
    if quant and np.ndim(dac_scale) != 0:
        # UnsupportedFactor so mesh routing can fall back to the dense
        # sharded path (which supports per-channel scales)
        raise UnsupportedFactor(
            "stacked-table int16 supports a scalar dac_scale")

    # superchunk-batched scatter (same lever as stack_synth's scdot,
    # minus the counts-drop: the counts operands stay in the contract so
    # the sharded path's operand slicing is unchanged).  The waste rule
    # was decided at table-build time across all K schedules
    # ('scdot_ok'); '1' forces any structurally-eligible table
    SCDOT = os.environ.get('WFTPU_STACK_SCDOT', 'auto')
    scdot = (SCDOT != '0' and SC > 1
             and all(m['n_ident'] == 0 and m['k_sp'] > 0
                     and len(m['sp_widths']) == 1 for m in metas)
             and (SCDOT == '1'
                  or (all(m.get('scdot_ok') for m in metas)
                      and SC * sum(m['k_sp'] for m in metas) <= 1024)))

    def kernel(ks_ref, *refs):
        if quant:
            out_ref, acc_ref = refs[-2], refs[-1]
        else:
            out_ref = acc_ref = refs[-1]
        acc_ref[0] = jnp.zeros((SC * 128, 128), jnp.float32)
        i = pl.program_id(0)
        sched = ks_ref[i // n_super]
        # dot3 default matches stack_synth (parity proven on the
        # real MXU three times; faster in every measured config)
        dot3 = os.environ.get('WFTPU_STACK_DOT3', '1') == '1'
        if scdot:
            vals_l, oh_l = [], []
            for gi, meta in enumerate(metas):
                tab_ref = refs[2 * gi + 1]
                strip = _strip_builder(meta, tab_ref, None, dot3)
                k_sp = meta['sp_widths'][0]
                for sc in range(SC):
                    vals, ridx = strip(0, k_sp, sc, True, parts=True)
                    lane2 = jax.lax.broadcasted_iota(
                        jnp.int32, (k_sp, SC * 128), 1)
                    oh_l.append(ridx + sc * 128 == lane2)
                    vals_l.append(vals)
            acc_ref[0] += _scatter_dot(jnp.concatenate(oh_l, 0),
                                       jnp.concatenate(vals_l, 0),
                                       dot3)
        else:
            r = 0
            for meta in metas:
                cnt_ref, tab_ref = refs[r:r + 2]
                r += 2
                strip = _strip_builder(meta, tab_ref, None, dot3)
                for sc in range(SC):
                    row = sched * n_chunks_pad + (i % n_super) * SC + sc
                    _emit_chunk(meta, strip, acc_ref, sc,
                                cnt_ref[row, 0], cnt_ref[row, 1])
        if quant:
            # dac_scale is integer-codes-only (float narrowing is a
            # plain astype -- the engines' shared convention)
            if jnp.dtype(out_dtype) == jnp.dtype(jnp.int16):
                scaled = jnp.clip(
                    jnp.round(acc_ref[0] * np.float32(dac_scale)),
                    -32768.0, 32767.0)
            else:
                scaled = acc_ref[0]
            out_ref[0] = scaled.astype(out_dtype)

    in_specs = []
    for meta, (cnts_shape, tab_shape) in zip(metas, shapes):
        in_specs.append(pl.BlockSpec(
            cnts_shape, lambda i, ks: (0, 0),
            memory_space=pltpu.SMEM))
        # the index map picks schedule ks[shot]'s superchunk slice
        # of the (K * n_super, SC, ...) stacked table: Mosaic
        # prefetches exactly the selected blocks from HBM
        in_specs.append(pl.BlockSpec(
            (1,) + tab_shape[1:],
            lambda i, ks, n_super=n_super: (
                ks[i // n_super] * n_super + i % n_super, 0, 0, 0),
            memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_shots * n_super,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SC * 128, 128),
                               lambda i, ks: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([pltpu.VMEM((1, SC * 128, 128), jnp.float32)]
                        if quant else []),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_shots * n_super, SC * 128, 128),
            out_dtype if quant else jnp.float32),
        interpret=interpret,
    )

    # the pallas program jits ALONE (device span 'jit__stack_seq_call'
    # is the launch cost); reshape/slice run as eager device ops
    @jax.jit
    def _stack_seq_call(ks, *ops):
        return call(ks, *ops)

    return _stack_seq_call


def synthesize_stack_sharded(channels, start: float, stop: float,
                             sample_rate: float, mesh,
                             interpret: bool | None = None,
                             out_dtype=None, dac_scale: float = 32767.0):
    """Stack-path synthesis over a ('channel', 'time') device mesh.

    The multi-chip twin of :func:`~waveforms_tpu.ops.stack_synth.
    synthesize_stack` (vstack-class schedules: many NARROW pulse
    instances).  The mesh maps straight onto the stacked-table layout of
    :class:`StackSequencer`:

    * the 'channel' axis shards SCHEDULES -- each channel shard's
      sub-schedule lowers separately and becomes one slice of the
      stacked tables (the union-key machinery absorbs group-set skew
      between shards);
    * the 'time' axis shards each schedule's SUPERCHUNK run -- stack
      chunks are independent output blocks, so a contiguous slice of
      superchunks is a 1/P share of the work with no collectives.

    Because the stacked table is schedule-major then superchunk-major, a
    single ``PartitionSpec(('channel', 'time'))`` on the leading operand
    axis hands every device exactly its (channel block, time slice)
    table slice; the per-shard kernel is the ordinary single-schedule
    stacked-table program on local blocks.  Per-shard table bytes and
    chunk counts scale as 1/P.

    Raises :class:`UnsupportedFactor` for schedules outside the stack
    path (wide instances, pair mode, multi-bucket) or a channel count
    that does not split over the mesh.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .lowering import lower_schedule

    nc, nt = mesh.shape['channel'], mesh.shape['time']
    C = len(channels)
    if C % nc:
        raise UnsupportedFactor(
            f"{C} channels do not split over {nc} channel shards")
    cs = C // nc
    # bucket_samples=None: the stack tables are chunk-indexed directly,
    # so descriptor time-bucketing would only forbid the path (the
    # sequencer is single-bucket)
    lows = [lower_schedule(list(channels[i * cs:(i + 1) * cs]),
                           start, stop, sample_rate, bucket_samples=None)
            for i in range(nc)]
    seq = StackSequencer(lows, n_super_multiple=nt)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    ns_local = seq.n_super // nt
    nchunks_local = ns_local * seq._SC

    # per-shard local shapes drive the kernel's block geometry
    shapes = [((nchunks_local, 2), (ns_local,) + tuple(t.shape[1:]))
              for _, t in seq._operands]
    call = _seq_call(seq._metas, shapes, seq._SC, ns_local, nchunks_local,
                     1, interpret, out_dtype, dac_scale)

    flat, in_specs = [], []
    for cnts, tab in seq._operands:
        flat.append(jax.device_put(cnts, NamedSharding(mesh, P(
            ('channel', 'time'), None))))
        flat.append(jax.device_put(tab, NamedSharding(mesh, P(
            ('channel', 'time'), None, None, None))))
        in_specs += [P(('channel', 'time'), None),
                     P(('channel', 'time'), None, None, None)]

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=P(('channel', 'time'), None, None), check_vma=False)
    def run(*ops):
        return call(jnp.zeros((1,), jnp.int32), *ops)

    out = run(*flat)                       # (nc * n_super, SC*128, 128)
    out = out.reshape(nc, -1, 128)[:, :seq._total_rows]
    out = out.reshape(C, seq._n_rows * 128)
    return out[:, :seq.n_samples]

"""Sparse synthesis: a worklist kernel that touches only live subtiles.

The dense-grid kernel (:mod:`waveforms_tpu.ops.pallas_synth`) visits every
output tile; on pulse-sparse schedules that costs (a) a full store pass
and (b) whole-tile factor evaluation for every tile a pulse lands in, even
when the pulse covers ~1% of it.  Here the schedule's *live subtiles* are
enumerated on the host (descriptor arrays are host-resident at lowering),
and a ``PrefetchScalarGridSpec`` kernel runs one grid step per live
subtile: scalar-prefetched worklist arrays drive the BlockSpec index maps
(channel, bucket, output tile) and carry each subtile's exact segment
range.  The untouched background stays zero via ``input_output_aliases``
with a pre-zeroed buffer, so silent regions cost exactly one roofline
fill and no kernel work at all.

Trade-offs vs the dense grid: the worklist length keys the kernel cache
(padded to powers of two), the plan is per-schedule host work, and the
kernel is single-device (time-sharded runs build one windowed plan per
shard).  Pair-mode (complex) schedules, bf16 stores, and int16 DAC codes
run the same worklist as the f32 path.  ``synthesize_device`` remains the
general dense path; the engine routes to this kernel below an occupancy
threshold (measured breakeven, docs/TUNING.md).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lowering import N_OPS, W_ARGS, LoweredSchedule, UnsupportedFactor
from .pallas_synth import (DeviceSchedule, _tile_walker,
                           validate_out_mode)

__all__ = ['SparsePlan', 'build_sparse_plan', 'synthesize_sparse',
           'synthesize_sparse_sharded', 'SPARSE_OCCUPANCY_THRESHOLD',
           'PanelPlan', 'build_panel_plan', 'synthesize_panels',
           'synthesize_panels_sharded', 'panels_eligible',
           'plan_panel_windows', 'synthesize_panels_windowed',
           'PANEL_OCCUPANCY_THRESHOLD']

DEFAULT_SUBTILE_ROWS = 32


def next_pow2(n: int) -> int:
    """Smallest power of two >= max(n, 1) (kernel-cache-stable lengths)."""
    return 1 << (max(n, 1) - 1).bit_length()


def _compact_ops(low: LoweredSchedule):
    """(ops_present, op_remap) pair: compact opcode branch tables.

    The kernels' lax.switch selects branches by COMPACT index, so any
    path passing a compacted ops_present MUST ship remapped opcode
    descriptors (shard_schedule's op_remap) -- one-op schedules then
    branch not at all (DeviceSchedule applies the same rule)."""
    ops_present = tuple(int(o) for o in np.unique(low.op))
    op_remap = np.zeros(N_OPS, np.int32)
    for i, o in enumerate(ops_present):
        op_remap[o] = i
    return ops_present, op_remap

# Route engine='auto' here below this live-subtile fraction.  Breakeven
# model from v5e device events (benchmarks/tpu_state.json): the worklist
# pays one background fill (~0.8 ms/GB at the 656 GB/s store roofline)
# plus ~0.5 us fixed cost per live subtile, while the dense grid pays the
# per-tile cost on EVERY tile; at the flagship's 0.02% occupancy that is
# 2x (65 -> 133 GS/s post-poly-trig), converging at ~1/5 of tiles live.
# (This threshold now only gates the per-subtile WORKLIST kernel, the
# fallback when a plan is outside the panel kernel's budgets.)
SPARSE_OCCUPANCY_THRESHOLD = 0.2

# The panel kernel (below) replaces per-subtile grid steps with one fat
# step per (channel, panel, bucket); measured v5e crossover vs the dense
# grid: panels win 162 vs 35 GS/s at 0.75% occupancy and 53 vs 19 at 10%
# (r4_panel_* vs r4_*_dense_fine rows).  The provisional 0.35 crossover
# awaits the r4 occupancy-ladder sweep (r4_panel_occ_*); override with
# WFTPU_PANEL_THRESHOLD.
PANEL_OCCUPANCY_THRESHOLD = 0.35


@dataclass
class SparsePlan:
    """Host-enumerated live-subtile worklist (see build_sparse_plan)."""
    Rs: int                 # subtile height in output rows
    n_tiles: int            # OUTPUT subtiles (window; excl. scratch tile)
    work_c: np.ndarray      # i32[K] channel
    work_b: np.ndarray      # i32[K] descriptor bucket
    work_t: np.ndarray      # i32[K] ABSOLUTE subtile index (sample base)
    work_o: np.ndarray      # i32[K] OUTPUT subtile index (window-relative)
    work_s0: np.ndarray     # i32[K] first segment
    work_s1: np.ndarray     # i32[K] one past the last segment
    n_live: int             # un-padded worklist length
    window_samples: int     # samples this plan's output covers
    n_channels: int         # channels covered by the worklist
    bucket_samples: int = 0  # descriptor bucket size the plan was built for

    @property
    def occupied_fraction(self):
        """Live subtiles / total subtiles across all channels."""
        return self.n_live / max(self.n_tiles * self.n_channels, 1)


def build_sparse_plan(low: LoweredSchedule,
                      Rs: int = DEFAULT_SUBTILE_ROWS,
                      tile_window: tuple[int, int] | None = None
                      ) -> SparsePlan:
    """Enumerate live subtiles of a lowered schedule.

    For every (channel, bucket) the segment list is lo-sorted (lowering
    guarantees it); per subtile the overlapping segment range [s0, s1)
    comes from two vectorized searchsorted calls, exactly like the dense
    kernel's prologue -- but evaluated on host, where empty tiles can be
    *dropped* instead of visited.
    """
    C, NB, S, T, F = low.shape
    tile = Rs * 128
    if NB > 1 and low.bucket_samples % tile:
        raise UnsupportedFactor(
            f"bucket_samples {low.bucket_samples} must be a multiple of "
            f"the sparse subtile ({tile})")
    n_rows = -(-low.n_samples // 128)
    n_tiles_abs = -(-n_rows // Rs)
    # optional window: only subtiles in [w_lo, w_hi) are emitted; output
    # indices are window-relative (output buffers above ~0.6 GB abort the
    # tunneled dev chip, so big schedules run as windows)
    w_lo, w_hi = tile_window if tile_window is not None else (0, n_tiles_abs)
    n_tiles = w_hi - w_lo

    cs, bs, ts, s0s, s1s = [], [], [], [], []
    for c in range(C):
        for b in range(NB):
            lo = low.seg_lo[c, b]
            hi = low.seg_hi[c, b]
            nt = low.nterm[c, b]
            if not nt.any():
                continue
            hmax = np.maximum.accumulate(hi)
            # subtiles covered by this bucket
            t0 = max((b * low.bucket_samples) // tile if NB > 1 else 0,
                     w_lo)
            t1 = min(-(-((b + 1) * low.bucket_samples) // tile)
                     if NB > 1 else n_tiles_abs, w_hi)
            if t1 <= t0:
                continue
            t_idx = np.arange(t0, t1, dtype=np.int64)
            bases = t_idx * tile
            s0 = np.searchsorted(hmax, bases, side='right')
            s1 = np.searchsorted(lo, bases + tile, side='left')
            live = s1 > s0
            if not live.any():
                continue
            n = int(live.sum())
            cs.append(np.full(n, c))
            bs.append(np.full(n, b))
            ts.append(t_idx[live])
            s0s.append(s0[live])
            s1s.append(s1[live])

    if cs:
        wc = np.concatenate(cs)
        wb = np.concatenate(bs)
        wt = np.concatenate(ts)
        w0 = np.concatenate(s0s)
        w1 = np.concatenate(s1s)
    else:
        wc = wb = wt = w0 = w1 = np.zeros(0, np.int64)
    n_live = len(wc)
    wo = wt - w_lo                       # window-relative output tiles

    # pad to a power of two (kernel-cache stability); padding entries do
    # zero segments into the scratch tile at t == n_tiles of channel 0
    K = next_pow2(n_live)
    pad = K - n_live
    wc = np.concatenate([wc, np.zeros(pad, np.int64)])
    wb = np.concatenate([wb, np.zeros(pad, np.int64)])
    wt = np.concatenate([wt, np.full(pad, w_lo + n_tiles)])
    wo = np.concatenate([wo, np.full(pad, n_tiles)])
    w0 = np.concatenate([w0, np.zeros(pad, np.int64)])
    w1 = np.concatenate([w1, np.zeros(pad, np.int64)])
    window_samples = min(n_tiles * Rs * 128, low.n_samples - w_lo * Rs * 128)
    return SparsePlan(Rs=Rs, n_tiles=n_tiles,
                      work_c=wc.astype(np.int32),
                      work_b=wb.astype(np.int32),
                      work_t=wt.astype(np.int32),
                      work_o=wo.astype(np.int32),
                      work_s0=w0.astype(np.int32),
                      work_s1=w1.astype(np.int32),
                      n_live=n_live,
                      window_samples=window_samples,
                      n_channels=C,
                      bucket_samples=low.bucket_samples)


def _sparse_kernel(wc_ref, wb_ref, wt_ref, wo_ref, ws0_ref, ws1_ref,
                   seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref, amp_ref,
                   op_ref, pw_ref, sh_ref, q32_ref, args_ref, ext_ref,
                   clip_ref, *rest, S, T, F, Rs, ops_present, pair=False,
                   dac=False):
    # mode-dependent trailing refs; backgrounds are the aliased zero
    # buffers (present only so untouched subtiles keep their zeros)
    scale_ref = amp2_ref = None
    if pair:
        amp2_ref, _bg, _bg2, out_ref, out2_ref = rest
    elif dac:
        scale_ref, _bg, out_ref = rest
    else:
        _bg, out_ref = rest
    del wo_ref  # drives the output index map only
    k = pl.program_id(0)
    tile = Rs * 128
    base = wt_ref[k] * tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 1)
    idx = base + rows * 128 + cols

    segment_at, acc0 = _tile_walker(
        idx, base, tile, Rs, seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref,
        amp_ref, op_ref, pw_ref, sh_ref, q32_ref, args_ref, ext_ref,
        clip_ref, amp2_ref, T=T, F=F, ops_present=ops_present, pair=pair)

    acc = jax.lax.fori_loop(ws0_ref[k], ws1_ref[k], segment_at, acc0)
    if pair:
        out_ref[0] = acc[0].astype(out_ref.dtype)
        out2_ref[0] = acc[1].astype(out2_ref.dtype)
    elif dac:
        # exact DAC codes: round-half-even then clamp to the code range
        code = jnp.round(acc * scale_ref[0, 0, 0, 0])
        out_ref[0] = jnp.clip(code, -32768.0, 32767.0).astype(out_ref.dtype)
    else:
        out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('S', 'T', 'F', 'Rs', 'n_tiles',
                              'ops_present', 'interpret', 'out_dtype'))
def _run_sparse(wc, wb, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac, amp,
                op, pw, sh, q32, args, ext, clip, amp_im=None, scale=None,
                *, S, T, F, Rs, n_tiles,
                ops_present=tuple(range(N_OPS)), interpret=False,
                out_dtype=jnp.float32):
    C = seg_lo.shape[0]
    E = ext.shape[-1]
    K = wc.shape[0]
    pair = amp_im is not None
    dac = jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer)
    # background: zeros incl. one scratch row-block for padding work items
    bg_shape = (C, (n_tiles + 1) * Rs, 128)
    bg = jnp.zeros(bg_shape, out_dtype)

    def smem(k, bcast=False):
        if bcast:
            return pl.BlockSpec(
                (1, 1, 1, k),
                lambda i, wc, wb, wt, wo, ws0, ws1: (0, 0, 0, 0),
                memory_space=pltpu.SMEM)
        return pl.BlockSpec(
            (1, 1, 1, k),
            lambda i, wc, wb, wt, wo, ws0, ws1: (wc[i], wb[i], 0, 0),
            memory_space=pltpu.SMEM)

    def chan_smem(k):
        return pl.BlockSpec(
            (1, 1, 1, k),
            lambda i, wc, wb, wt, wo, ws0, ws1: (wc[i], 0, 0, 0),
            memory_space=pltpu.SMEM)

    out_spec = pl.BlockSpec(
        (1, Rs, 128),
        lambda i, wc, wb, wt, wo, ws0, ws1: (wc[i], wo[i], 0))
    in_specs = [
        smem(S), smem(S), smem(S),                   # seg_lo, seg_hi, nterm
        smem(S * T), smem(S * T),                    # nfac, amp
        smem(S * T * F), smem(S * T * F),            # op, power
        smem(S * T * F), smem(S * T * F * 4),        # shift_hi, q32
        smem(S * T * F * W_ARGS),                    # args
        smem(E, bcast=True),                         # ext
        chan_smem(2),                                # clip
    ]
    operands = [seg_lo, seg_hi, nterm, nfac, amp, op, pw, sh, q32, args,
                ext, clip]
    if pair:
        in_specs.append(smem(S * T))                 # amp_im
        operands.append(amp_im)
    if dac:
        if scale is None:
            raise ValueError("integer out_dtype requires a per-channel "
                             "scale")
        in_specs.append(chan_smem(1))                # DAC scale
        operands.append(scale)
    # aliased zero background(s); operand indices below count the 6
    # scalar-prefetch operands first
    bg_at = 6 + len(operands)
    in_specs.append(out_spec)
    operands.append(bg)
    aliases = {bg_at: 0}
    if pair:
        in_specs.append(out_spec)
        operands.append(bg)
        aliases[bg_at + 1] = 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(K,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec) if pair else out_spec,
    )
    kernel = functools.partial(_sparse_kernel, S=S, T=T, F=F, Rs=Rs,
                               ops_present=ops_present, pair=pair, dac=dac)
    out_shape = jax.ShapeDtypeStruct(bg_shape, out_dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape) if pair else out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(wc, wb, wt, wo, ws0, ws1, *operands)
    return out


def _validate_plan(plan: SparsePlan, dev: DeviceSchedule) -> None:
    """A plan built from a different (or re-lowered) schedule would index
    the wrong descriptor blocks and silently produce wrong samples; check
    every cross-reference before launching (code-review finding r2)."""
    C, NB, S, T, F = dev.shape
    if plan.n_channels != C:
        raise ValueError(
            f"sparse plan covers {plan.n_channels} channels, schedule has "
            f"{C} -- rebuild the plan from this schedule's lowering")
    if plan.bucket_samples and plan.bucket_samples != dev.bucket_samples:
        raise ValueError(
            f"sparse plan bucket_samples {plan.bucket_samples} != "
            f"schedule's {dev.bucket_samples}")
    n_rows = -(-dev.n_samples // 128)
    n_tiles_abs = -(-n_rows // plan.Rs)
    if plan.window_samples > dev.n_samples:
        raise ValueError(
            f"sparse plan window ({plan.window_samples} samples) exceeds "
            f"the schedule ({dev.n_samples})")
    if plan.n_live:
        live = slice(0, plan.n_live)
        if (int(plan.work_c[live].max()) >= C
                or int(plan.work_b[live].max()) >= NB
                or int(plan.work_s1[live].max()) > S
                or int(plan.work_t[live].max()) >= n_tiles_abs):
            raise ValueError(
                "sparse plan indexes outside this schedule's descriptor "
                f"blocks (shape {dev.shape}, {n_tiles_abs} subtiles) -- "
                "it was built from a different lowering")


# ---------------------------------------------------------------------------
# Panel kernel: few fat grid steps instead of one step per live subtile.
#
# Round-4 probes (benchmarks/tpu_state.json: r4_grid_overhead_probe,
# r4_walker_cost_probe) localized the worklist kernel's cost precisely:
# scalar reads / conds / switches inside the walker are ~1-7 ns, but every
# grid step pays ~0.135 us of step machinery plus ~30 ns per dynamically
# index-mapped operand (the SMEM block refetch), i.e. ~0.5 us of pure
# overhead per 32-row subtile.  At mid occupancy (~10% live) that fixed
# cost is ~2 ms of a 5 ms synthesis.  Here the grid is
# (channel, panel, bucket): each step zero-fills its (P, 128) output
# panel once, then walks ALL of its live subtiles in-kernel (worklist
# rides whole in SMEM via scalar prefetch -- no per-step refetch), storing
# each subtile at a dynamic sublane-aligned row offset.  Fixed costs drop
# from n_live * 0.5 us to n_steps * 0.5 us with n_steps ~ C * NP * NB
# (hundreds, not thousands), the aliased zero background disappears (the
# panel store IS the fill), and bucket-straddling subtiles accumulate
# naturally across the innermost bucket axis.
# ---------------------------------------------------------------------------

PANEL_ROWS = 4096                 # (P, 128) f32 block = 2 MB; x2 buffers
PANEL_WORK_SMEM_BUDGET = 256 * 1024   # worklist bytes resident in SMEM


@dataclass
class PanelPlan:
    """Per-(channel, panel, bucket) segmented worklist (build_panel_plan)."""
    Rs: int                  # subtile height in output rows
    P: int                   # panel height in output rows (multiple of Rs)
    n_panels: int            # panels per channel (of the window)
    start: np.ndarray        # i32[C*NP*NB + 1] worklist slice offsets
    work_t: np.ndarray       # i32[K] ABSOLUTE subtile index (sample base)
    work_o: np.ndarray       # i32[K] OUTPUT subtile index (window-relative)
    work_s0: np.ndarray      # i32[K] first segment
    work_s1: np.ndarray      # i32[K] one past the last segment
    n_live: int
    n_channels: int
    n_buckets: int
    window_samples: int
    bucket_samples: int = 0

    @property
    def occupied_fraction(self):
        n_tiles = self.n_panels * (self.P // self.Rs)
        return self.n_live / max(n_tiles * self.n_channels, 1)


def build_panel_plan(low: LoweredSchedule, Rs: int = DEFAULT_SUBTILE_ROWS,
                     panel_rows: int = PANEL_ROWS,
                     tile_window: tuple[int, int] | None = None,
                     base: SparsePlan | None = None) -> PanelPlan:
    """Re-segment the live-subtile worklist by (channel, panel, bucket).

    ``tile_window`` limits the plan to subtiles [w_lo, w_hi) with
    window-relative output placement (big schedules run as windows; see
    build_sparse_plan); ``base`` reuses an already-built worklist."""
    if base is None:
        base = build_sparse_plan(low, Rs=Rs, tile_window=tile_window)
    elif base.Rs != Rs:
        # a base enumerated at another subtile height carries work_t in
        # the wrong tile units -- silently wrong sample bases downstream
        raise ValueError(f"base plan has Rs={base.Rs}, expected {Rs}")
    C, NB, S, T, F = low.shape
    n_rows_win = base.n_tiles * Rs
    P = max(Rs, min(panel_rows, n_rows_win))
    P = (P // Rs) * Rs
    NP = -(-n_rows_win // P)
    # shrink P to the smallest Rs-multiple that still covers the window
    # in NP panels: the kernel is store-bound (write_mfu 0.988), so every
    # padding row past n_rows_win is pure wasted store bandwidth -- the
    # flagship's pow2 panels stored 8192 rows per 7808-row window, a 4.7%
    # tax on the full-schedule rate (bench r5: flagship 154.8 vs window
    # 162.3 GS/s).  Padding is now < NP * Rs rows.
    P = max(Rs, -(-(-(-n_rows_win // NP)) // Rs) * Rs)
    live = slice(0, base.n_live)
    wc = base.work_c[live].astype(np.int64)
    wb = base.work_b[live].astype(np.int64)
    wt = base.work_t[live].astype(np.int64)
    wo = base.work_o[live].astype(np.int64)
    ws0 = base.work_s0[live]
    ws1 = base.work_s1[live]
    pidx = (wo * Rs) // P
    slot = (wc * NP + pidx) * NB + wb
    order = np.argsort(slot, kind='stable')
    n_slots = C * NP * NB
    start = np.zeros(n_slots + 1, np.int64)
    np.add.at(start, slot + 1, 1)
    start = np.cumsum(start)
    K = next_pow2(base.n_live)
    pad = K - base.n_live

    def col(a, fill=0):
        return np.concatenate(
            [np.asarray(a)[order],
             np.full(pad, fill, np.int64)]).astype(np.int32)

    return PanelPlan(
        Rs=Rs, P=P, n_panels=NP,
        start=start.astype(np.int32),
        work_t=col(wt), work_o=col(wo), work_s0=col(ws0),
        work_s1=col(ws1),
        n_live=base.n_live, n_channels=C, n_buckets=NB,
        window_samples=base.window_samples,
        bucket_samples=base.bucket_samples)


def panels_eligible(plan: PanelPlan, out_dtype) -> bool:
    """Static eligibility for the panel kernel.

    Multi-bucket schedules accumulate read-modify-write in the output
    dtype, so narrowed stores (bf16/f16) and int16 DAC codes require a
    single bucket; the worklist must fit the SMEM budget.  (Pair mode
    does not change eligibility: the second amplitude plane doubles
    VMEM, not the SMEM worklist.)"""
    if (4 * len(plan.work_t) + len(plan.start)) * 4 > PANEL_WORK_SMEM_BUDGET:
        return False
    if plan.n_buckets > 1 and jnp.dtype(out_dtype) != jnp.dtype(jnp.float32):
        return False
    return True


def _panel_kernel(start_ref, wt_ref, wo_ref, ws0_ref, ws1_ref,
                  seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref, amp_ref,
                  op_ref, pw_ref, sh_ref, q32_ref, args_ref, ext_ref,
                  clip_ref, *rest, S, T, F, Rs, P, NB, NP, ops_present,
                  pair=False, dac=False):
    scale_ref = amp2_ref = scratch_ref = None
    if pair:
        amp2_ref, out_ref, out2_ref = rest
    elif dac:
        # int16 stores at dynamic sub-panel offsets crash the Mosaic
        # compiler (packed-dtype masked store; real-compile only -- the
        # interpreter accepts them).  DAC mode therefore accumulates in
        # an f32 VMEM scratch panel and converts once per panel with a
        # single full-block static store.  Eligibility pins NB == 1, so
        # each panel is exactly one grid step.
        scale_ref, out_ref, scratch_ref = rest
    else:
        (out_ref,) = rest
    c = pl.program_id(0)
    p = pl.program_id(1)
    b = pl.program_id(2)
    accumulate = NB > 1          # bucket-straddling subtiles add up

    @pl.when(b == 0)
    def _zero_panel():
        if dac:
            scratch_ref[...] = jnp.zeros((P, 128), jnp.float32)
        else:
            out_ref[0] = jnp.zeros((P, 128), out_ref.dtype)
            if pair:
                out2_ref[0] = jnp.zeros((P, 128), out2_ref.dtype)

    tile = Rs * 128
    rows = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 1)
    walker_args = (seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref, amp_ref,
                   op_ref, pw_ref, sh_ref, q32_ref, args_ref, ext_ref,
                   clip_ref, amp2_ref)

    slot = (c * NP + p) * NB + b
    k0 = start_ref[slot]
    k1 = start_ref[slot + 1]

    def item(k, carry):
        base = wt_ref[k] * tile              # ABSOLUTE sample base
        idx = base + rows * 128 + cols
        seg_at, a0 = _tile_walker(idx, base, tile, Rs, *walker_args,
                                  T=T, F=F, ops_present=ops_present,
                                  pair=pair)
        acc = jax.lax.fori_loop(ws0_ref[k], ws1_ref[k], seg_at, a0)
        # placement is window-relative (wo == wt for full-range plans)
        sl = pl.ds(wo_ref[k] * Rs - p * P, Rs)   # multiple of Rs >= 8
        if pair:
            re, im = acc
            if accumulate:
                re = out_ref[0, sl, :] + re
                im = out2_ref[0, sl, :] + im
            out_ref[0, sl, :] = re.astype(out_ref.dtype)
            out2_ref[0, sl, :] = im.astype(out2_ref.dtype)
        elif dac:
            scratch_ref[sl, :] = acc
        else:
            if accumulate:
                acc = out_ref[0, sl, :].astype(jnp.float32) + acc
            out_ref[0, sl, :] = acc.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(k0, k1, item, 0)
    if dac:
        code = jnp.round(scratch_ref[...] * scale_ref[0, 0, 0, 0])
        out_ref[0] = jnp.clip(code, -32768.0, 32767.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('S', 'T', 'F', 'Rs', 'P', 'NP',
                              'ops_present', 'interpret', 'out_dtype'))
def _run_panels(start, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac, amp,
                op, pw, sh, q32, args, ext, clip, amp_im=None, scale=None,
                *, S, T, F, Rs, P, NP,
                ops_present=tuple(range(N_OPS)), interpret=False,
                out_dtype=jnp.float32):
    C = seg_lo.shape[0]
    NB = seg_lo.shape[1]
    E = ext.shape[-1]
    pair = amp_im is not None
    dac = jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer)

    def smem(k, bcast=False):
        if bcast:
            return pl.BlockSpec(
                (1, 1, 1, k),
                lambda c, p, b, *pf: (0, 0, 0, 0),
                memory_space=pltpu.SMEM)
        return pl.BlockSpec(
            (1, 1, 1, k),
            lambda c, p, b, *pf: (c, b, 0, 0),
            memory_space=pltpu.SMEM)

    def chan_smem(k):
        return pl.BlockSpec(
            (1, 1, 1, k),
            lambda c, p, b, *pf: (c, 0, 0, 0),
            memory_space=pltpu.SMEM)

    out_spec = pl.BlockSpec(
        (1, P, 128), lambda c, p, b, *pf: (c, p, 0))
    in_specs = [
        smem(S), smem(S), smem(S),                   # seg_lo, seg_hi, nterm
        smem(S * T), smem(S * T),                    # nfac, amp
        smem(S * T * F), smem(S * T * F),            # op, power
        smem(S * T * F), smem(S * T * F * 4),        # shift_hi, q32
        smem(S * T * F * W_ARGS),                    # args
        smem(E, bcast=True),                         # ext
        chan_smem(2),                                # clip
    ]
    operands = [seg_lo, seg_hi, nterm, nfac, amp, op, pw, sh, q32, args,
                ext, clip]
    if pair:
        in_specs.append(smem(S * T))                 # amp_im
        operands.append(amp_im)
    if dac:
        if scale is None:
            raise ValueError("integer out_dtype requires a per-channel "
                             "scale")
        in_specs.append(chan_smem(1))                # DAC scale
        operands.append(scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(C, NP, NB),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec) if pair else out_spec,
        scratch_shapes=(
            [pltpu.VMEM((P, 128), jnp.float32)] if dac else []),
    )
    kernel = functools.partial(_panel_kernel, S=S, T=T, F=F, Rs=Rs, P=P,
                               NB=NB, NP=NP, ops_present=ops_present,
                               pair=pair, dac=dac)
    out_shape = jax.ShapeDtypeStruct((C, NP * P, 128), out_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape) if pair else out_shape,
        interpret=interpret,
    )(start, wt, wo, ws0, ws1, *operands)


def _validate_panel_plan(plan: PanelPlan, dev: DeviceSchedule) -> None:
    C, NB, S, T, F = dev.shape
    if plan.n_channels != C or plan.n_buckets != NB:
        raise ValueError(
            f"panel plan covers {plan.n_channels}x{plan.n_buckets} "
            f"channel-buckets, schedule has {C}x{NB} -- rebuild the plan "
            "from this schedule's lowering")
    if plan.bucket_samples and plan.bucket_samples != dev.bucket_samples:
        raise ValueError(
            f"panel plan bucket_samples {plan.bucket_samples} != "
            f"schedule's {dev.bucket_samples}")
    if plan.window_samples > dev.n_samples:
        raise ValueError(
            f"panel plan window ({plan.window_samples} samples) exceeds "
            f"the schedule ({dev.n_samples})")
    if plan.n_live:
        live = slice(0, plan.n_live)
        n_rows = -(-dev.n_samples // 128)
        n_tiles_abs = -(-n_rows // plan.Rs)   # work_t is absolute
        if (int(plan.work_s1[live].max()) > S
                or int(plan.work_t[live].max()) >= n_tiles_abs):
            raise ValueError(
                "panel plan indexes outside this schedule's descriptor "
                f"blocks (shape {dev.shape}, {n_tiles_abs} subtiles) -- "
                "it was built from a different lowering")


def _window_sparse_plan(base: SparsePlan, lo_t: int, hi_t: int,
                        n_samples: int) -> SparsePlan:
    """Slice a full-schedule worklist to the tile window [lo_t, hi_t).

    Equivalent to ``build_sparse_plan(low, Rs, tile_window=(lo_t, hi_t))``
    but pure array slicing -- no re-enumeration of the schedule (the
    windowed path targets exactly the big-schedule class, where 16
    windows would otherwise pay 17x one enumeration pass)."""
    Rs = base.Rs
    n_tiles = hi_t - lo_t
    live = slice(0, base.n_live)
    wt = base.work_t[live]
    m = (wt >= lo_t) & (wt < hi_t)
    wc, wb = base.work_c[live][m], base.work_b[live][m]
    wt = wt[m]
    ws0, ws1 = base.work_s0[live][m], base.work_s1[live][m]
    n_live = len(wt)
    K = next_pow2(n_live)
    pad = K - n_live

    def col(a, fill=0):
        return np.concatenate(
            [np.asarray(a, np.int64),
             np.full(pad, fill, np.int64)]).astype(a.dtype
                                                   if hasattr(a, 'dtype')
                                                   else np.int64)

    return SparsePlan(
        Rs=Rs, n_tiles=n_tiles,
        work_c=col(wc), work_b=col(wb),
        work_t=col(wt, lo_t + n_tiles),
        work_o=col(wt - lo_t, n_tiles),
        work_s0=col(ws0), work_s1=col(ws1),
        n_live=n_live,
        window_samples=min(n_tiles * Rs * 128,
                           n_samples - lo_t * Rs * 128),
        n_channels=base.n_channels,
        bucket_samples=base.bucket_samples)


def plan_panel_windows(low: LoweredSchedule, Rs: int = DEFAULT_SUBTILE_ROWS,
                       base: SparsePlan | None = None,
                       max_windows: int = 16,
                       out_dtype=jnp.float32) -> list[PanelPlan] | None:
    """Split a schedule whose worklist exceeds the panel SMEM budget into
    item-balanced tile windows, each an eligible PanelPlan.

    Boundaries come from the CUMULATIVE live-item count (not even tile
    splits), so clustered schedules don't produce one over-budget window.
    Returns None when the schedule can't be windowed (would need more
    than ``max_windows``, or a single subtile column is over budget)."""
    if base is None:
        base = build_sparse_plan(low, Rs=Rs)
    # target HALF the worklist budget per window (16 bytes per padded
    # slot), leaving room for the start table and boundary-tile spill --
    # eligibility is re-checked per window
    if base.Rs != Rs:
        raise ValueError(f"base plan has Rs={base.Rs}, expected {Rs}")
    live = slice(0, base.n_live)
    if not np.array_equal(base.work_o[live], base.work_t[live]):
        raise ValueError("base plan is itself windowed -- window plans "
                         "need the full-schedule worklist")
    per_window = max((PANEL_WORK_SMEM_BUDGET // 16) // 2, 8)
    n_windows = -(-base.n_live // per_window)
    if n_windows > max_windows:
        return None
    # items sorted by output tile; cut where the running count crosses
    # the per-window budget, snapping to tile boundaries
    wo = np.sort(base.work_o[:base.n_live])
    bounds = [0]
    for w in range(1, n_windows):
        t = int(wo[min(w * per_window, base.n_live - 1)])
        bounds.append(min(max(t, bounds[-1] + 1), base.n_tiles))
    bounds.append(base.n_tiles)
    plans = []
    for lo_t, hi_t in zip(bounds[:-1], bounds[1:]):
        if hi_t <= lo_t:
            continue
        p = build_panel_plan(low, Rs=Rs,
                             base=_window_sparse_plan(base, lo_t, hi_t,
                                                      low.n_samples))
        if not panels_eligible(p, out_dtype):
            # a single column over budget -- or a dtype rule windowing
            # can never cure (narrowed multi-bucket stores): give up so
            # the router falls through to the worklist kernel
            return None
        plans.append(p)
    return plans or None


def synthesize_panels_windowed(dev: DeviceSchedule,
                               low: LoweredSchedule,
                               plans: list[PanelPlan] | None = None,
                               Rs: int = DEFAULT_SUBTILE_ROWS,
                               interpret: bool = False,
                               out_dtype=jnp.float32,
                               dac_scale=32767.0,
                               combine_pair: bool = True):
    """Panel synthesis as a sequence of tile windows (one kernel launch
    per window, outputs concatenated along the sample axis).  Extends
    panel coverage to schedules whose whole-window worklist exceeds the
    SMEM budget (the 0.3-0.5 occupancy x large-window regime where the
    dense grid measures 5-12 GS/s, r4_occ_ladder_*)."""
    if plans is None:
        plans = plan_panel_windows(low, Rs=Rs, out_dtype=out_dtype)
        if plans is None:
            raise UnsupportedFactor(
                "schedule cannot be windowed under the panel SMEM budget")
    outs = [synthesize_panels(dev, plan=p, interpret=interpret,
                              out_dtype=out_dtype, dac_scale=dac_scale,
                              combine_pair=combine_pair) for p in plans]
    if isinstance(outs[0], tuple):        # pair planes (combine_pair=False)
        return (jnp.concatenate([o[0] for o in outs], axis=-1),
                jnp.concatenate([o[1] for o in outs], axis=-1))
    return jnp.concatenate(outs, axis=-1)


def synthesize_panels(dev: DeviceSchedule,
                      low: LoweredSchedule | None = None,
                      plan: PanelPlan | None = None,
                      Rs: int = DEFAULT_SUBTILE_ROWS,
                      interpret: bool = False,
                      out_dtype=jnp.float32,
                      dac_scale=32767.0,
                      combine_pair: bool = True):
    """Run the panel kernel on device-resident descriptors."""
    C, NB, S, T, F = dev.shape
    scale = validate_out_mode(out_dtype, dev.amp_im, C, dac_scale)
    if plan is None:
        if low is None:
            raise ValueError("synthesize_panels needs `low` or `plan`")
        plan = build_panel_plan(low, Rs=Rs)
    _validate_panel_plan(plan, dev)
    if not panels_eligible(plan, out_dtype):
        raise UnsupportedFactor(
            "schedule is outside the panel kernel's budgets (worklist "
            "SMEM or narrowed multi-bucket stores) -- use "
            "synthesize_sparse")
    tensors = dev.tensors[:2] + dev.tensors[3:]
    out = _run_panels(
        jnp.asarray(plan.start), jnp.asarray(plan.work_t),
        jnp.asarray(plan.work_o), jnp.asarray(plan.work_s0),
        jnp.asarray(plan.work_s1), *tensors,
        dev.amp_im, scale,
        S=S, T=T, F=F, Rs=plan.Rs, P=plan.P, NP=plan.n_panels,
        ops_present=dev.ops_present, interpret=interpret,
        out_dtype=out_dtype)
    if dev.amp_im is not None:
        re, im = out
        if not combine_pair:
            return (re.reshape(C, -1)[:, :plan.window_samples],
                    im.reshape(C, -1)[:, :plan.window_samples])
        out = re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)
    return out.reshape(C, -1)[:, :plan.window_samples]


def synthesize_sparse(dev: DeviceSchedule, low: LoweredSchedule | None = None,
                      plan: SparsePlan | None = None,
                      Rs: int = DEFAULT_SUBTILE_ROWS,
                      interpret: bool = False,
                      out_dtype=jnp.float32,
                      dac_scale=32767.0,
                      combine_pair: bool = True) -> jax.Array:
    """Run the sparse worklist kernel on device-resident descriptors.

    ``low`` (or a prebuilt ``plan``) supplies the host-side worklist;
    returns (C, n_samples).  Output modes mirror
    :func:`waveforms_tpu.ops.pallas_synth.synthesize_device`: f32
    (default), bf16/f16 stores, int16 DAC codes via ``dac_scale``, and
    pair-mode complex64 when the schedule carries two amplitude planes.
    """
    C, NB, S, T, F = dev.shape
    scale = validate_out_mode(out_dtype, dev.amp_im, C, dac_scale)
    if plan is None:
        if low is None:
            raise ValueError("synthesize_sparse needs `low` or `plan`")
        plan = build_sparse_plan(low, Rs=Rs)
    _validate_plan(plan, dev)
    # dev.tensors = (seg_lo, seg_hi, seg_hmax, nterm, ...): hmax is the
    # dense prologue's bisect key; the sparse plan already encodes it
    tensors = dev.tensors[:2] + dev.tensors[3:]
    out = _run_sparse(
        jnp.asarray(plan.work_c), jnp.asarray(plan.work_b),
        jnp.asarray(plan.work_t), jnp.asarray(plan.work_o),
        jnp.asarray(plan.work_s0), jnp.asarray(plan.work_s1), *tensors,
        dev.amp_im, scale,
        S=S, T=T, F=F, Rs=plan.Rs, n_tiles=plan.n_tiles,
        ops_present=dev.ops_present, interpret=interpret,
        out_dtype=out_dtype)
    if dev.amp_im is not None:
        re, im = out
        if not combine_pair:
            # keep the two f32 planes separate: complex64 transfers are
            # UNIMPLEMENTED on some dev tunnels (poisoning the process on
            # first touch), and labs feeding separate I/Q DAC paths never
            # need the interleaved form at all
            return (re.reshape(C, -1)[:, :plan.window_samples],
                    im.reshape(C, -1)[:, :plan.window_samples])
        out = re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)
    return out.reshape(C, -1)[:, :plan.window_samples]


def shard_sparse_work(plan: SparsePlan, nc: int, nt: int, cs: int,
                      tps: int, nb_local: int = 1):
    """Partition a global worklist by (channel shard, time shard).

    Returns the (nc, nt, K) local worklist arrays (channel/bucket indices
    and output subtiles localized; padding entries target the scratch
    tile) plus the per-shard live counts -- the scaling observability the
    dryrun prints (per-shard work should track ~1/P with bounded skew).
    """
    live = slice(0, plan.n_live)
    wc = plan.work_c[live].astype(np.int64)
    wb = plan.work_b[live].astype(np.int64)
    wt = plan.work_t[live].astype(np.int64)
    ws0 = plan.work_s0[live]
    ws1 = plan.work_s1[live]
    ci = wc // cs
    ti = wt // tps
    counts = np.zeros((nc, nt), np.int64)
    np.add.at(counts, (ci, ti), 1)
    K = next_pow2(int(counts.max()))
    lwc = np.zeros((nc, nt, K), np.int32)
    lwb = np.zeros((nc, nt, K), np.int32)
    lwt = np.zeros((nc, nt, K), np.int32)
    lwo = np.full((nc, nt, K), tps, np.int32)
    lws0 = np.zeros((nc, nt, K), np.int32)
    lws1 = np.zeros((nc, nt, K), np.int32)
    # vectorized scatter (the worklists this path exists for are the
    # ones too big for the panel kernel's SMEM -- a per-item Python loop
    # here would cost minutes of host planning at that scale): stable-
    # sort by shard, rank within shard by position, one fancy-indexed
    # write per field
    shard = ci * nt + ti
    order = np.argsort(shard, kind='stable')
    offs = np.zeros(nc * nt + 1, np.int64)
    np.add.at(offs, shard + 1, 1)
    offs = np.cumsum(offs)
    a, b = ci[order], ti[order]
    p = np.arange(len(order), dtype=np.int64) - offs[shard[order]]
    lwc[a, b, p] = (wc[order] % cs).astype(np.int32)
    lwb[a, b, p] = (wb[order] % nb_local).astype(np.int32)   # local bucket
    lwt[a, b, p] = wt[order].astype(np.int32)   # ABSOLUTE subtile
    lwo[a, b, p] = (wt[order] - b * tps).astype(np.int32)    # local output
    lws0[a, b, p] = ws0[order].astype(np.int32)
    lws1[a, b, p] = ws1[order].astype(np.int32)
    return (lwc, lwb, lwt, lwo, lws0, lws1), counts, K


def shard_panel_work(plan: SparsePlan, nc: int, nt: int, cs: int,
                     tps: int, nb_local: int, Rs: int,
                     panel_rows: int = PANEL_ROWS):
    """Partition a global worklist into per-shard PANEL segmentations.

    Per (channel shard, time shard): group the shard's live subtiles by
    (local channel, panel, local bucket) exactly like
    :func:`build_panel_plan`, producing a common-shape ``start`` array
    (the grid is uniform across shards, so the program stays SPMD) plus
    slot-ordered local worklist columns.  Returns
    ``(starts, wt, wo, ws0, ws1), counts, K, P, NP``.
    """
    (lwc, lwb, lwt, lwo, lws0, lws1), counts, K = shard_sparse_work(
        plan, nc, nt, cs, tps, nb_local)
    n_rows_loc = tps * Rs
    P = max(Rs, min(panel_rows, n_rows_loc))
    P = (P // Rs) * Rs
    NP = -(-n_rows_loc // P)
    # exact-fit panels (same rule as build_panel_plan): the kernel is
    # store-bound, so padding rows past the shard's window waste stores
    P = max(Rs, -(-(-(-n_rows_loc // NP)) // Rs) * Rs)
    n_slots = cs * NP * nb_local
    starts = np.zeros((nc, nt, n_slots + 1), np.int64)
    for a in range(nc):
        for b in range(nt):
            n = int(counts[a, b])
            if not n:
                continue
            slot = ((lwc[a, b, :n].astype(np.int64) * NP
                     + (lwo[a, b, :n].astype(np.int64) * Rs) // P)
                    * nb_local + lwb[a, b, :n])
            order = np.argsort(slot, kind='stable')
            for col in (lwt, lwo, lws0, lws1, lwc, lwb):
                col[a, b, :n] = col[a, b, :n][order]
            np.add.at(starts[a, b], slot[order] + 1, 1)
            starts[a, b] = np.cumsum(starts[a, b])
    return ((starts.astype(np.int32), lwt, lwo, lws0, lws1), counts, K, P,
            NP)


def _run_sharded_common(low, mesh, Rs, plan, out_dtype, dac_scale,
                        combine_pair, interpret, make_worklist, run_local):
    """Shared scaffolding for the two sharded kernels.

    Mesh/bucket setup, descriptor sharding (with opcode compaction +
    remap), stale-plan validation, worklist upload, the shard_map
    plumbing, and the pair/DAC/window epilogue live ONCE here -- the
    two entry points differ only in their worklist builder and local
    kernel call.  ``make_worklist(plan, nc, nt, cs, tps, nb_local) ->
    (work_np, static)`` may raise UnsupportedFactor (budget guards);
    ``run_local(work_locals, descr, pair_op, scale_op, static) ->
    (C_local, rows, 128)-ish local output`` (or an (re, im) pair)."""
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from ..parallel.mesh import shard_schedule

    C, NB, S, T, F = low.shape
    pair = low.amp_im is not None
    scale = validate_out_mode(out_dtype, low.amp_im, C, dac_scale)
    nc, nt = mesh.shape['channel'], mesh.shape['time']
    c_pad = -(-C // nc) * nc
    cs = c_pad // nc
    tile = Rs * 128
    ops_present, op_remap = _compact_ops(low)
    if NB > 1:
        # whole buckets per time shard (dense-mesh layout): tiles map to
        # shards by wt // tps with tps = nb_local * tiles-per-bucket
        if low.bucket_samples % tile:
            raise UnsupportedFactor(
                f"bucket_samples {low.bucket_samples} must be a multiple "
                f"of the sparse subtile ({tile})")
        G_b = low.bucket_samples // tile
        nb_pad = -(-NB // nt) * nt
        nb_local = nb_pad // nt
        tps = nb_local * G_b
        tensors, _ = shard_schedule(low, mesh, nb_pad=nb_pad,
                                    op_remap=op_remap)
        bucket_spec = 'time'
    else:
        n_rows = -(-low.n_samples // 128)
        n_tiles = -(-n_rows // Rs)
        tiles_pad = -(-n_tiles // nt) * nt
        tps = tiles_pad // nt                  # subtiles per time shard
        tensors, _ = shard_schedule(low, mesh, op_remap=op_remap)
        nb_local = 1
        bucket_spec = None

    if plan is None:
        plan = build_sparse_plan(low, Rs=Rs)
    else:
        if plan.Rs != Rs:
            raise ValueError(
                f"prebuilt plan has Rs={plan.Rs}, expected {Rs}")
        # same stale-plan guard as the single-chip paths (a plan from a
        # different lowering silently synthesizes wrong samples)
        _validate_plan(plan, low)
    work_np, static = make_worklist(plan, nc, nt, cs, tps, nb_local)
    static = dict(static, S=S, T=T, F=F, Rs=Rs, tps=tps,
                  ops_present=ops_present, interpret=interpret,
                  out_dtype=out_dtype)
    spec3 = P_('channel', 'time', None)

    def put3(a):
        return jax.device_put(a, NamedSharding(mesh, spec3))

    work = [put3(a) for a in work_np]
    n_work = len(work)
    in_spec = P_('channel', bucket_spec, None, None)
    chan_spec = P_('channel', None, None, None)
    local_samples = tps * tile
    dac = scale is not None
    scale_t = None
    if dac:
        from ..parallel.mesh import _pad_channels
        scale_t = jax.device_put(_pad_channels(np.asarray(scale), c_pad),
                                 NamedSharding(mesh, chan_spec))

    split = pair and not combine_pair
    out_spec = ((P_('channel', 'time'),) * 2 if split
                else P_('channel', 'time'))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec3,) * n_work + (in_spec,) * 10
        + (P_(None, None, None, None), chan_spec)
        + ((in_spec,) if pair else ())
        + ((chan_spec,) if dac else ()),
        out_specs=out_spec,
        check_vma=False)
    def run(*args):
        wl = args[:n_work]
        descr = args[n_work:n_work + 12]
        rest = args[n_work + 12:]
        out = run_local(wl, descr, rest[0] if pair else None,
                        rest[-1] if dac else None, static)

        def window(o):
            return o.reshape(o.shape[0], -1)[:, :local_samples]

        if pair:
            re, im = out
            if not combine_pair:
                return window(re), window(im)
            out = (re.astype(jnp.complex64)
                   + 1j * im.astype(jnp.complex64))
        return window(out)

    out = run(*work, tensors['seg_lo'], tensors['seg_hi'],
              tensors['nterm'], tensors['nfac'], tensors['amp'],
              tensors['op'], tensors['pw'], tensors['sh'], tensors['q32'],
              tensors['args'], tensors['ext'], tensors['clip'],
              *((tensors['amp_im'],) if pair else ()),
              *((scale_t,) if dac else ()))
    if split:
        return (out[0][:C, :low.n_samples], out[1][:C, :low.n_samples])
    return out[:C, :low.n_samples]


def synthesize_panels_sharded(low: LoweredSchedule, mesh,
                              Rs: int = DEFAULT_SUBTILE_ROWS,
                              interpret: bool = False,
                              plan: SparsePlan | None = None,
                              out_dtype=jnp.float32,
                              dac_scale=32767.0,
                              combine_pair: bool = True) -> jax.Array:
    """Panel-kernel synthesis over a ('channel', 'time') device mesh.

    The multi-chip twin of :func:`synthesize_panels` (and the sharded
    mirror of the single-chip engine's production route): each device
    zero-fills and walks only its own (channel block, sample slice)
    panels from an SMEM-resident local worklist -- no collectives, same
    1/P work scaling as the worklist path, but without its ~1 us
    per-live-subtile grid-step cost.  Covers the full output surface
    (pair, int16, bf16, bucketed) under the same eligibility rules as
    the single-chip panel kernel, applied per shard.

    ``combine_pair=False`` returns pair-mode output as two separate f32
    (re, im) plane arrays instead of complex64 -- the same escape the
    single-chip paths offer for runtimes whose complex transfers are
    broken (the tunneled dev chip) and for labs feeding separate DACs.
    """
    def make_worklist(plan, nc, nt, cs, tps, nb_local):
        work_np, counts, K, P, NP = shard_panel_work(plan, nc, nt, cs,
                                                     tps, nb_local, Rs)
        n_slots = cs * NP * nb_local
        if (4 * K + n_slots + 1) * 4 > PANEL_WORK_SMEM_BUDGET:
            raise UnsupportedFactor(
                "per-shard panel worklist exceeds the SMEM budget -- use "
                "synthesize_sparse_sharded")
        if nb_local > 1 and jnp.dtype(out_dtype) != jnp.dtype(jnp.float32):
            raise UnsupportedFactor(
                "narrowed multi-bucket stores are outside the panel "
                "kernel's budgets -- use synthesize_sparse_sharded")
        return work_np, dict(K=K, P=P, NP=NP, n_slots=n_slots)

    def run_local(wl, descr, pair_op, scale_op, st):
        startl, wtl, wol, ws0l, ws1l = wl
        return _run_panels(
            startl.reshape(st['n_slots'] + 1), wtl.reshape(st['K']),
            wol.reshape(st['K']), ws0l.reshape(st['K']),
            ws1l.reshape(st['K']), *descr, pair_op, scale_op,
            S=st['S'], T=st['T'], F=st['F'], Rs=st['Rs'], P=st['P'],
            NP=st['NP'], ops_present=st['ops_present'],
            interpret=st['interpret'], out_dtype=st['out_dtype'])

    return _run_sharded_common(low, mesh, Rs, plan, out_dtype, dac_scale,
                               combine_pair, interpret, make_worklist,
                               run_local)


def synthesize_sparse_sharded(low: LoweredSchedule, mesh,
                              Rs: int = DEFAULT_SUBTILE_ROWS,
                              interpret: bool = False,
                              plan: SparsePlan | None = None,
                              out_dtype=jnp.float32,
                              dac_scale=32767.0,
                              combine_pair: bool = True) -> jax.Array:
    """Sparse worklist synthesis over a ('channel', 'time') device mesh.

    The global worklist partitions by (channel shard, time shard) -- each
    device runs exactly its own live subtiles (padded to a common length
    so the program is SPMD), over its channel block's descriptors, writing
    its sample slice.  Silence on a shard costs that shard one local
    background fill; no collectives are needed at all (basis evaluation is
    pointwise in t).  Covers the single-chip engine's full output surface
    (round-4 routing parity): pair-mode complex, int16 DAC codes, bf16,
    and bucketed descriptors -- bucket windows shard along 'time' exactly
    like :func:`waveforms_tpu.parallel.mesh.synthesize_sharded`, so the
    ``wt // tps`` shard map respects bucket boundaries by construction.
    ``combine_pair=False`` returns pair-mode output as two f32 (re, im)
    planes instead of complex64 (see synthesize_panels_sharded).
    """
    def make_worklist(plan, nc, nt, cs, tps, nb_local):
        work_np, counts, K = shard_sparse_work(plan, nc, nt, cs, tps,
                                               nb_local)
        return work_np, dict(K=K)

    def run_local(wl, descr, pair_op, scale_op, st):
        K = st['K']
        wcl, wbl, wtl, wol, ws0l, ws1l = wl
        return _run_sparse(
            wcl.reshape(K), wbl.reshape(K), wtl.reshape(K),
            wol.reshape(K), ws0l.reshape(K), ws1l.reshape(K), *descr,
            pair_op, scale_op,
            S=st['S'], T=st['T'], F=st['F'], Rs=st['Rs'],
            n_tiles=st['tps'], ops_present=st['ops_present'],
            interpret=st['interpret'], out_dtype=st['out_dtype'])

    return _run_sharded_common(low, mesh, Rs, plan, out_dtype, dac_scale,
                               combine_pair, interpret, make_worklist,
                               run_local)

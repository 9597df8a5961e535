"""Pulse-instance batched synthesis: the stack/overlap path.

The dense and sparse kernels pay per (tile, overlapping segment): every
segment visit evaluates basis functions over a whole (Rs, 128) tile even
when the segment covers a few dozen samples.  Schedules made of MANY SHORT
pulses -- a WaveVStack of 1000 pulses, or 100 overlapping DRAGs merged
into one channel -- degenerate into thousands of such visits
(suite_vstack_1000x200k ran at 0.17 GS/s on the dense grid, round 2).

This path flips the decomposition to be instance-parallel, the way a TPU
wants it:

1. Every (channel, segment, term) of the lowered schedule whose support
   is NARROW becomes a *pulse instance*.  Instances are grouped by factor
   structure (opcodes + powers), so each group evaluates as ONE batched
   jnp expression over an (M, blocks*128) pulse-local sample grid -- no
   per-segment masking of big tiles, no scalar walk, full VPU vectoration
   via the same :func:`waveforms_tpu.ops.pallas_synth.op_builders`
   formulas the kernels run (identical int32-turn phase math).
2. The evaluated 128-wide blocks scatter-add into the output through a
   chunked ONE-HOT MATMUL: for each 128-row output chunk, out[chunk] =
   onehot(local_rows) @ block_values.  Scatter-by-matmul rides the MXU --
   the TPU-native answer to indexed accumulation (XLA's scatter-add
   serializes).
3. WIDE instances (long plateaus, DC segments, whole-window carriers) and
   channels with finite clip limits stay on the dense/sparse kernels as a
   residual schedule; the two outputs add.

Because instances come from the LOWERED descriptors, this works for any
IR shape -- un-merged WaveVStack components and symbolically merged
overlap stacks alike -- and is immune to the kernel's SMEM descriptor
budget (descriptors stream from HBM as plain arrays), which rescues
many-overlap schedules that lower with ``pallas_ok=False``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lowering import (DRAG_SIN_NC, DRAG_SINX_MAXQ, OP_DRAG_SIN,
                       OP_DRAG_SINX, LoweredSchedule, UnsupportedFactor)
from .pallas_synth import op_builders

__all__ = ['StackPlan', 'build_stack_plan', 'synthesize_stack']

# single-kernel runner limits; plans outside them use the XLA op-chain
# runner (correct everywhere, ~15-20 us extra dispatch-chain latency)
KERNEL_MAX_GROUPS = 8
KERNEL_MAX_VMEM = 12 * 2**20      # double-buffered group tables, bytes
KERNEL_MAX_HBM = 512 * 2**20      # packed chunk tables, bytes
# per-chunk counts ride SMEM whole (one fetch for the whole launch) only
# below this raw size; SMEM is ~1 MB and Mosaic's window allocator pads
# s32 scalars ~16x (a (8192, 8) counts array allocated 4 MB -- the
# r5_occ_stack_120 compile failure), so big-output plans (537 MB ladder
# outputs -> 8192 chunks) stream counts per superchunk instead
CNT_SMEM_WHOLE_MAX = 48 * 1024
# ext widths actually read by the drag_sin formulas (eread k range)
_EXT_W = {OP_DRAG_SIN: 3 + 2 * DRAG_SIN_NC,
          OP_DRAG_SINX: 3 + 2 * DRAG_SIN_NC + 2 + 4 * (1 + DRAG_SINX_MAXQ)}

# instances at most this many samples wide run batched; wider ones go to
# the kernels (tile amortization already works there)
DEFAULT_MAX_WIDTH = 2048

# use the stack path when the kernels would touch >= this many times more
# samples than the batched path evaluates (tile-amortization waste)
DEFAULT_ADVANTAGE = 4.0

# ... and only when there are at least this many narrow instances: below
# that the batched launch can't amortize its own fixed costs (table
# build + program floor), regardless of the advantage ratio.  Shared by
# the single-chip router (engine.classify_pallas_route) and the mesh
# router (parallel.mesh.synthesize_on_mesh) so the criterion cannot
# drift between them.
STACK_MIN_NARROW = 64


@dataclass
class GroupData:
    """One structure group of narrow pulse instances (host arrays).

    An instance is a full SEGMENT-support evaluation: the sum over its
    terms of each term's factor product (same-support terms merge into
    one instance at plan build).  Factor arrays pack the LIVE factors of
    every term flat along one axis (TF = sum(term_nfac))."""
    ops: tuple            # flat per-factor opcode, len TF (static)
    powers: tuple         # flat per-factor integer power, len TF (static)
    term_nfac: tuple      # live factors per term (static); len NT
    amp: np.ndarray       # f32[M, NT] per-term amplitude
    lo: np.ndarray        # i64[M] first sample (clipped, global)
    hi: np.ndarray        # i64[M] one past last sample
    row0: np.ndarray      # i64[M] first 128-row
    chan: np.ndarray      # i64[M]
    shift: np.ndarray     # i32[M, TF]
    q32: np.ndarray       # i32[M, TF, 4]
    args: np.ndarray      # f32[M, TF, W]


@dataclass
class StackPlan:
    groups: list[GroupData] = field(default_factory=list)
    wide: LoweredSchedule | None = None   # residual for the kernels
    n_narrow: int = 0
    n_blocks_total: int = 0
    kernel_samples: int = 0    # samples the kernels would walk for narrow
    batch_samples: int = 0     # samples the batched path evaluates
    n_rows: int = 0
    n_channels: int = 0
    n_samples: int = 0

    @property
    def advantage(self) -> float:
        """How many times fewer samples the batched path touches."""
        return self.kernel_samples / max(self.batch_samples, 1)


def build_stack_plan(low: LoweredSchedule,
                     max_width: int = DEFAULT_MAX_WIDTH,
                     subtile: int = 32 * 128) -> StackPlan | None:
    """Enumerate narrow pulse instances of a lowered schedule.

    Returns None when the schedule has no batched work (all wide, complex
    amplitudes, or clipped channels).  ``subtile`` is the sparse kernel's
    tile size, used only for the cost model in ``kernel_samples``.
    """
    if low.amp_im is not None:
        return None
    C, NB, S, T, F = low.shape
    n_rows = -(-low.n_samples // 128)
    clip_finite = (np.isfinite(low.clip_min) | np.isfinite(low.clip_max))

    # vectorized instance enumeration over (c, b, s)
    nt = low.nterm                      # (C, NB, S)
    live = nt > 0
    if not live.any():
        return None
    cs, bs, ss = np.nonzero(live)
    lo = low.seg_lo[cs, bs, ss].astype(np.int64)
    hi = low.seg_hi[cs, bs, ss].astype(np.int64)
    if NB > 1:
        blo = bs.astype(np.int64) * low.bucket_samples
        bhi = np.minimum(blo + low.bucket_samples, low.n_samples)
        lo = np.maximum(lo, blo)
        hi = np.minimum(hi, bhi)
    lo = np.clip(lo, 0, low.n_samples)
    hi = np.clip(hi, 0, low.n_samples)
    keep = hi > lo
    cs, bs, ss, lo, hi = cs[keep], bs[keep], ss[keep], lo[keep], hi[keep]
    nseg_terms = nt[cs, bs, ss]

    # expand EVERY live segment into per-term instances
    rep = np.repeat(np.arange(len(cs)), nseg_terms)   # segment idx per inst
    tj = (np.concatenate([np.arange(k) for k in nseg_terms])
          if len(nseg_terms) else np.zeros(0, np.int64))
    ic, ib, is_ = cs[rep], bs[rep], ss[rep]
    ilo, ihi = lo[rep], hi[rep]
    M0 = len(ic)
    if M0 == 0:
        return None
    nfac = low.nfac[ic, ib, is_, tj]
    ops_arr = low.op[ic, ib, is_, tj].reshape(M0, -1)   # (M0, F)
    pw_arr = low.power[ic, ib, is_, tj].reshape(M0, -1)
    sh_arr = low.shift_hi[ic, ib, is_, tj].reshape(M0, -1)
    q_arr = low.q32[ic, ib, is_, tj].reshape(M0, -1)
    a_arr = low.args[ic, ib, is_, tj].reshape(M0, -1)
    amp_arr = low.amp[ic, ib, is_, tj]

    # COALESCE: a pulse overlapped by others is split by the piecewise
    # merge into many adjacent segments carrying IDENTICAL term
    # descriptors (and bucket splits duplicate them again).  Merging
    # contiguous identical-descriptor instances recovers each pulse's
    # full physical support -- 100 overlapping DRAGs become 100
    # instances, not 20k (segment x term) atoms.  f64 packing is exact
    # for every field (f32 bits, int32, small ints).
    mat = np.column_stack([ic, nfac, ops_arr, pw_arr, sh_arr, q_arr,
                           a_arr.astype(np.float64),
                           amp_arr.astype(np.float64)])
    _, inv = np.unique(mat, axis=0, return_inverse=True)
    order = np.lexsort((ilo, inv))
    sinv, slo, shi = inv[order], ilo[order], ihi[order]
    new_run = np.ones(M0, bool)
    new_run[1:] = (sinv[1:] != sinv[:-1]) | (slo[1:] != shi[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.r_[starts[1:], M0] - 1
    keep = order[starts]                    # representative instance
    mlo = slo[starts]
    mhi = shi[ends]
    gid_of_inst = np.empty(M0, np.int64)    # original -> coalesced id
    gid_of_inst[order] = np.cumsum(new_run) - 1

    width = mhi - mlo
    narrow = (width <= max_width) & ~clip_finite[ic[keep]]
    n_narrow = int(narrow.sum())
    if n_narrow == 0:
        return None

    plan = StackPlan(n_rows=n_rows, n_channels=C, n_samples=low.n_samples)
    # kernel cost proxy: each narrow instance forces its covering
    # subtiles' evaluation in the sparse kernel (dense is worse)
    ktiles = (mhi[narrow] - 1) // subtile - mlo[narrow] // subtile + 1
    plan.kernel_samples = int((ktiles * subtile).sum())

    nk = keep[narrow]
    nlo, nhi = mlo[narrow], mhi[narrow]

    # SAME-SUPPORT TERM MERGE: per-term instances sharing (channel, lo,
    # hi) fuse into ONE multi-term instance (sum of per-term factor
    # products).  A cosPulse's const + cos terms, or a DRAG's three
    # quadrature terms, share their segment's support exactly, so this
    # halves-to-thirds the instance count -- and the probe-measured cost
    # (r4_stack_cost_probe: table/machinery base 17.2 us + one-hot dot
    # 16.9 us on vstack_1000x200k) scales with instance BLOCKS, not with
    # factor math (6.0 us).  Factor tables pack only LIVE factors.
    sh_f = sh_arr.reshape(M0, F)
    q_f = q_arr.reshape(M0, F, 4)
    a_f = a_arr.reshape(M0, F, -1)
    W = a_f.shape[-1]
    order2 = np.lexsort((nhi, nlo, ic[nk]))
    j = 0
    n_sorted = len(order2)
    inst_list = []              # (key, members) in first-seen order
    while j < n_sorted:
        k = j
        a0 = order2[j]
        while (k + 1 < n_sorted
               and ic[nk[order2[k + 1]]] == ic[nk[a0]]
               and nlo[order2[k + 1]] == nlo[a0]
               and nhi[order2[k + 1]] == nhi[a0]):
            k += 1
        members = order2[j:k + 1]
        # canonical term order inside the instance -> stable group keys
        term_keys = []
        for m in members:
            src_i = nk[m]
            nf = int(nfac[src_i])
            term_keys.append((
                tuple(int(o) for o in ops_arr[src_i, :nf]),
                tuple(int(p) for p in pw_arr[src_i, :nf]), m))
        term_keys.sort(key=lambda t: t[:2])
        key = tuple(t[:2] for t in term_keys)
        inst_list.append((key, [t[2] for t in term_keys]))
        j = k + 1

    by_key: dict = {}
    for i, (key, members) in enumerate(inst_list):
        by_key.setdefault(key, []).append((i, members))
    plan.n_narrow = len(inst_list)
    n_blocks_total = 0
    for key, insts in sorted(by_key.items()):
        term_nfac = tuple(len(t[0]) for t in key)
        kops = tuple(o for t in key for o in t[0])
        kpw = tuple(p for t in key for p in t[1])
        NT = len(term_nfac)
        TF = len(kops)
        M = len(insts)
        amp_g = np.zeros((M, NT), np.float32)
        sh_g = np.zeros((M, TF), sh_f.dtype)
        q_g = np.zeros((M, TF, 4), q_f.dtype)
        a_g = np.zeros((M, TF, W), a_f.dtype)
        lo_g = np.zeros(M, np.int64)
        hi_g = np.zeros(M, np.int64)
        ch_g = np.zeros(M, np.int64)
        for r, (i, members) in enumerate(insts):
            m0 = members[0]
            lo_g[r], hi_g[r], ch_g[r] = nlo[m0], nhi[m0], ic[nk[m0]]
            f0 = 0
            for t, m in enumerate(members):
                src_i = nk[m]
                nf = term_nfac[t]
                amp_g[r, t] = amp_arr[src_i]
                sh_g[r, f0:f0 + nf] = sh_f[src_i, :nf]
                q_g[r, f0:f0 + nf] = q_f[src_i, :nf]
                a_g[r, f0:f0 + nf] = a_f[src_i, :nf]
                f0 += nf
        row0_g = lo_g >> 7
        nblk_g = ((hi_g - 1) >> 7) - row0_g + 1
        n_blocks_total += int(nblk_g.sum())
        plan.groups.append(GroupData(
            ops=kops, powers=kpw, term_nfac=term_nfac,
            amp=amp_g, lo=lo_g, hi=hi_g, row0=row0_g, chan=ch_g,
            shift=sh_g, q32=q_g, args=a_g,
        ))
    plan.n_blocks_total = n_blocks_total
    plan.batch_samples = n_blocks_total * 128

    # residual schedule: terms belonging to WIDE coalesced instances (and
    # clipped channels) keep the kernel path.  Per segment, wide terms
    # compact to the front so batched slots vanish from the walk.
    inst_narrow = narrow[gid_of_inst]       # per original instance
    if not inst_narrow.all():
        import copy
        wide = copy.copy(low)
        for name in ('nterm', 'nfac', 'amp', 'op', 'power', 'shift_hi',
                     'q32', 'args', 'seg_lo', 'seg_hi'):
            setattr(wide, name, getattr(low, name).copy())
        # the hi-tier residual planes are NOT compacted below and
        # _normalize_segment_order would permute them IN PLACE on the
        # caller's arrays (shared via copy.copy) -- the wide residual is
        # an f32 dense-kernel schedule, so drop them
        wide.args_lo = None
        wide.amp_lo = None
        from .lowering import SEG_SENTINEL
        seg_first = np.searchsorted(rep, np.arange(len(cs)))
        for j, (c, b, s) in enumerate(zip(cs, bs, ss)):
            k = int(nseg_terms[j])
            sl = slice(seg_first[j], seg_first[j] + k)
            w_terms = np.flatnonzero(~inst_narrow[sl])
            if len(w_terms) == k:
                continue
            if len(w_terms) == 0:
                wide.nterm[c, b, s] = 0
                wide.seg_lo[c, b, s] = SEG_SENTINEL
                wide.seg_hi[c, b, s] = SEG_SENTINEL
                continue
            for name in ('nfac', 'amp'):
                arr = getattr(wide, name)
                arr[c, b, s, :len(w_terms)] = arr[c, b, s, w_terms]
            for name in ('op', 'power', 'shift_hi', 'q32', 'args'):
                arr = getattr(wide, name)
                arr[c, b, s, :len(w_terms)] = arr[c, b, s, w_terms]
            wide.nterm[c, b, s] = len(w_terms)
        wide._normalize_segment_order()
        plan.wide = wide
    return plan


def _eval_blocks(g: GroupData, src: np.ndarray, rowblk: np.ndarray,
                 ext: jax.Array) -> jax.Array:
    """Evaluate one group's 128-sample blocks -> (NK, 128) f32 values.

    ``src`` maps each block slot to its source instance (host gather of
    the descriptor rows -- the device sees only dense arrays), ``rowblk``
    is the block's global 128-row.  Slots with src < 0 are padding:
    amp = 0 and an empty [0, 0) support mask zero them exactly.

    NB: the factor/power/term-product evaluation below is the SAME
    recurrence as _strip_builder's (the fused kernel reads packed-table
    columns where this reads descriptor rows).  Any opcode or power-
    convention change must land in BOTH, or the XLA runner and the
    kernel diverge -- the oracle-parity tests compare each against the
    host oracle, so run both paths after touching either.
    """
    pad = src < 0
    s = np.where(pad, 0, src)
    amp = np.where(pad[:, None], 0.0, g.amp[s]).astype(np.float32)
    lo = np.where(pad, 0, g.lo[s])
    hi = np.where(pad, 0, g.hi[s])
    NK = len(src)
    idx = (jnp.asarray(rowblk, jnp.int32)[:, None] * 128
           + jnp.arange(128, dtype=jnp.int32)[None, :])      # (NK, 128)
    args = jnp.asarray(g.args[s])                            # (NK, TF, W)
    q32a = jnp.asarray(g.q32[s])                             # (NK, TF, 4)
    sh = jnp.asarray(g.shift[s])                             # (NK, TF)
    ampd = jnp.asarray(amp)                                  # (NK, NT)

    def factor(f):
        di = idx - sh[:, f][:, None]

        def arg(k, f=f):
            return args[:, f, k][:, None]

        def q32(j, f=f):
            return q32a[:, f, j][:, None]

        def eread(k, f=f):
            off = args[:, f, 7].astype(jnp.int32) + k
            return ext[off][:, None]

        val = op_builders(di, arg, q32, eread)[g.ops[f]]()
        power = g.powers[f]
        if power != 1:
            ap = abs(int(power))
            v = val
            for _ in range(ap - 1):
                v = v * val
            val = 1.0 / v if power < 0 else v
        return val

    seg = jnp.zeros((NK, 128), jnp.float32)
    f0 = 0
    for t, nf in enumerate(g.term_nfac):
        prod = jnp.broadcast_to(ampd[:, t][:, None], (NK, 128))
        for f in range(f0, f0 + nf):
            prod = prod * factor(f)
        seg = prod if t == 0 else seg + prod
        f0 += nf
    mask = ((idx >= jnp.asarray(lo, jnp.int32)[:, None])
            & (idx < jnp.asarray(hi, jnp.int32)[:, None]))
    return jnp.where(mask, seg, 0.0)


def _chunk_assign(g: GroupData, n_rows: int, n_chunks: int, k_round: int):
    """Assign one group's 128-sample blocks to (chunk, slot) positions.

    Returns ``(src, rb, lr, counts, k_max)`` -- (n_chunks, k_max) arrays
    of source-instance index (-1 pad), 128-row block, local output row
    (128 pad: matches no one-hot row), plus per-chunk live counts.
    ``k_round`` rounds the slot axis up (kernel strip size / pow2).
    """
    nblk_m = ((g.hi - 1) >> 7) - g.row0 + 1
    m_idx = np.repeat(np.arange(len(g.amp)), nblk_m)
    r_off = (np.concatenate([np.arange(k) for k in nblk_m])
             if len(nblk_m) else np.zeros(0, np.int64))
    rowblk = g.row0[m_idx] + r_off                 # per-channel row
    grow = g.chan[m_idx] * n_rows + rowblk         # global row
    chunk = grow // 128
    lr = grow % 128
    counts = np.bincount(chunk, minlength=n_chunks)
    k_max = -(-max(int(counts.max()), 1) // k_round) * k_round
    src = np.full((n_chunks, k_max), -1, np.int64)
    rb = np.zeros((n_chunks, k_max), np.int64)
    lrt = np.full((n_chunks, k_max), 128, np.int64)
    pos = np.zeros(n_chunks, np.int64)
    for j in np.argsort(chunk, kind='stable'):
        q = chunk[j]
        src[q, pos[q]] = m_idx[j]
        rb[q, pos[q]] = rowblk[j]
        lrt[q, pos[q]] = lr[j]
        pos[q] += 1
    return src, rb, lrt, counts.astype(np.int32), k_max


def _chunk_assign_hybrid(g: GroupData, n_rows: int, n_chunks: int,
                         n_ident: int = 2):
    """Assign blocks to (chunk, slot) with IDENTITY placement first.

    Slot r of identity layer l holds the (l+1)-th block targeting output
    row r of that chunk, so its store is a direct row-aligned add -- no
    one-hot dot.  Blocks deeper than ``n_ident`` collisions spill to a
    compact one-hot strip (the measured collision depth is ~1.1 average
    for vstack-class schedules, so spills are rare).

    Returns ``(src, rb, lrt, lay_cnt, sp_cnt, k_sp)``: (n_chunks,
    n_ident*128 + k_sp) slot tables (identity rows first, spill rows
    after), per-chunk live identity-layer counts, per-chunk spill
    counts, and the spill strip width.
    """
    nblk_m = ((g.hi - 1) >> 7) - g.row0 + 1
    m_idx = np.repeat(np.arange(len(g.amp)), nblk_m)
    r_off = (np.concatenate([np.arange(k) for k in nblk_m])
             if len(nblk_m) else np.zeros(0, np.int64))
    rowblk = g.row0[m_idx] + r_off
    grow = g.chan[m_idx] * n_rows + rowblk
    chunk = grow // 128
    lr = grow % 128
    order = np.lexsort((lr, chunk))
    sc_, sl = chunk[order], lr[order]
    # occurrence rank of (chunk, lr): 0 for the first block on a row
    new = np.ones(len(order), bool)
    new[1:] = (sc_[1:] != sc_[:-1]) | (sl[1:] != sl[:-1])
    idx_in_run = np.arange(len(order)) - np.maximum.accumulate(
        np.where(new, np.arange(len(order)), 0))
    depth = idx_in_run

    sp_mask = depth >= n_ident
    n_sp = int(np.bincount(sc_[sp_mask], minlength=n_chunks).max()) \
        if sp_mask.any() else 0
    # pad the spill width to the f32 SUBLANE (8), not the next power of
    # two: strips are pl.ds slices of an already-resident VMEM block, so
    # a 48-row tail strip costs 48 rows of eval + dot, while pow2
    # rounding made every ~145-live vstack chunk pay 256 slot-evals
    # (43% padding waste on the row's critical path -- r4 session 5)
    k_sp = (max(8, -(-n_sp // 8) * 8) if n_sp else 0)
    width = n_ident * 128 + k_sp
    src = np.full((n_chunks, width), -1, np.int64)
    rb = np.zeros((n_chunks, width), np.int64)
    lrt = np.full((n_chunks, width), 128, np.int64)
    lay_cnt = np.zeros(n_chunks, np.int32)
    sp_cnt = np.zeros(n_chunks, np.int32)
    for k in np.flatnonzero(~sp_mask):
        q, r, d = sc_[k], sl[k], depth[k]
        j = order[k]
        src[q, d * 128 + r] = m_idx[j]
        rb[q, d * 128 + r] = rowblk[j]
        lrt[q, d * 128 + r] = r
        lay_cnt[q] = max(lay_cnt[q], d + 1)
    for k in np.flatnonzero(sp_mask):
        q = sc_[k]
        j = order[k]
        pos = n_ident * 128 + sp_cnt[q]
        src[q, pos] = m_idx[j]
        rb[q, pos] = rowblk[j]
        lrt[q, pos] = sl[k]
        sp_cnt[q] += 1
    return src, rb, lrt, lay_cnt, sp_cnt, k_sp


def _build_runner(plan: StackPlan, low: LoweredSchedule):
    """One jitted program for the whole batched path (cached on the plan).

    Per group, every 128-sample block is assigned a (chunk, slot)
    position on the HOST: descriptor rows are gathered host-side into
    dense (n_chunks * K) order, so the device program is just fused
    element-wise evaluation followed by one one-hot matmul per group --
    no device gathers, no concatenation, no scratch rows.
    """
    C, n_rows = plan.n_channels, plan.n_rows
    total_rows = C * n_rows
    n_chunks = -(-total_rows // 128)
    ext_np = (low.ext if low.ext is not None and low.ext.size
              else np.zeros(1))
    ext_arr = jnp.asarray(ext_np, jnp.float32)

    per_group = []
    for g in plan.groups:
        from .sparse_synth import next_pow2
        src, rb, lrt, _counts, k_max0 = _chunk_assign(g, n_rows, n_chunks,
                                                      1)
        k_max = next_pow2(k_max0)
        pad = k_max - k_max0
        if pad:
            src = np.pad(src, ((0, 0), (0, pad)), constant_values=-1)
            rb = np.pad(rb, ((0, 0), (0, pad)))
            lrt = np.pad(lrt, ((0, 0), (0, pad)), constant_values=128)
        # ship the int32 rows and expand the one-hot ON DEVICE inside
        # jit (a host-built dense one-hot would embed a 128x-larger f32
        # constant into the executable)
        lrt_dev = jnp.asarray(lrt, jnp.int32)
        per_group.append((g, src.reshape(-1), rb.reshape(-1), k_max,
                          lrt_dev))

    @jax.jit
    def run_stack():
        out = jnp.zeros((n_chunks, 128, 128), jnp.float32)
        for g, src, rb, k_max, lrt_dev in per_group:
            onehot = (lrt_dev[:, None, :]
                      == jnp.arange(128)[None, :, None]).astype(jnp.float32)
            vals = _eval_blocks(g, src, rb, ext_arr)
            vals = vals.reshape(n_chunks, k_max, 128)
            # HIGHEST-precision f32 einsum.  Two cheaper variants were
            # MEASURED WRONG on silicon and reverted: a HIGH (bf16x3)
            # einsum hit 7.8e-6 (both operands truncated), and a mixed
            # bf16-onehot x f32 dot -- exact in interpret mode -- hit
            # 8.8e-4 on the real MXU (the f32 operand is downcast to a
            # single bf16 pass).  Only the oracle-anchored on-chip parity
            # task catches these; interpret-mode equality does not.
            out = out + jnp.einsum('qrk,qkw->qrw', onehot, vals,
                                   precision=jax.lax.Precision.HIGHEST)
        out = out.reshape(-1, 128)[:total_rows]
        return out.reshape(C, n_rows * 128)[:, :plan.n_samples]

    return run_stack


def _kernel_runner_viable(plan: StackPlan) -> bool:
    """Cheap static eligibility for the single-kernel runner."""
    if len(plan.groups) > KERNEL_MAX_GROUPS:
        return False
    for g in plan.groups:
        if sum(op in _EXT_W for op in g.ops) > 1:
            return False          # one pregathered ext factor per instance
    return True


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _group_table(g: GroupData, n_rows: int, n_chunks: int,
                 ext_np: np.ndarray, n_ident: int, table_t: bool,
                 k_sp_force: int | None = None,
                 n_ident_force: int | None = None,
                 assignment=None, dict_cols: bool = False):
    """Build one group's packed per-chunk slot table (host arrays).

    Returns ``(meta, tab, cnts)``: the static kernel parameters, the
    (n_chunks, k_max, PW) f32 packed table (row-major -- the caller
    transposes for the TABLE_T layout), and (n_chunks, 2) int32
    identity-layer / spill counts.  ``k_sp_force`` pads the spill strip
    region to a table-wide width and ``n_ident_force`` pins the
    identity-layer count so tables from different schedules stack into
    one tensor (see stack_seq.StackSequencer).  ``assignment`` accepts
    a precomputed ``_chunk_assign_hybrid(g, n_rows, n_chunks,
    n_ident_force)`` result so the sequencer's memoized placement walk
    is not re-run here."""
    TF = len(g.ops)
    NT = len(g.term_nfac)
    W = g.args.shape[-1]
    if n_ident_force is not None:
        n_ident = n_ident_force
    src, rb, lrt, lay_cnt, sp_cnt, k_sp = (
        assignment if assignment is not None
        else _chunk_assign_hybrid(g, n_rows, n_chunks, n_ident))
    if n_ident_force is None:
        # TRIM empty identity layers: layer l's 128 slots exist for
        # every chunk, so an all-empty trailing layer is pure table
        # bytes (the fetch-dominated cost).  Re-placing with the
        # observed max depth moves nothing to the spills (no block sits
        # deeper than the max) -- the table just shrinks.
        eff = int(lay_cnt.max()) if lay_cnt.size else 0
        if n_ident > 0:
            eff = max(eff, 1)       # keep k_max > 0 for empty groups
        if eff < n_ident:
            n_ident = eff
            src, rb, lrt, lay_cnt, sp_cnt, k_sp = _chunk_assign_hybrid(
                g, n_rows, n_chunks, n_ident)
    if k_sp_force is not None and k_sp_force < k_sp:
        raise ValueError("k_sp_force below this schedule's spill width")
    k_sp_pad = k_sp if k_sp_force is None else k_sp_force
    if table_t and k_sp_pad:
        # transposed strips slice the LANE axis: pad the spill strip to
        # the 128-lane tile (pad slots: src -1 / amp 0 / empty [0,0)
        # mask / local row 128 -> exact zeros through the dot)
        k_sp_pad = -(-k_sp_pad // 128) * 128
    if k_sp_pad != k_sp:
        padw = k_sp_pad - k_sp
        src = np.pad(src, ((0, 0), (0, padw)), constant_values=-1)
        rb = np.pad(rb, ((0, 0), (0, padw)))
        lrt = np.pad(lrt, ((0, 0), (0, padw)), constant_values=128)
        k_sp = k_sp_pad
    # spill strips: 128-wide walks plus ONE narrow tail (a multiple of
    # the f32 sublane), so per-chunk eval/dot work tracks the live
    # count at 8-slot granularity instead of the strip width
    if table_t:
        sp_widths = (128,) * (k_sp // 128)
    else:
        sp_widths = (128,) * (k_sp // 128) + (
            (k_sp % 128,) if k_sp % 128 else ())
    KSsp = (128 if table_t else min(128, k_sp)) if k_sp else 0
    k_max = n_ident * 128 + k_sp
    valid = src >= 0
    s = np.where(valid, src, 0)
    # factor tables pack every term's LIVE factors flat (TF columns);
    # per-term amplitudes take NT columns
    IW = 4 + TF
    AW = NT + TF * W
    QW = 4 * TF
    f_ext = next((f for f, op in enumerate(g.ops) if op in _EXT_W), None)
    EW = _EXT_W[g.ops[f_ext]] if f_ext is not None else 0
    off_amp = IW
    off_args = IW + NT
    off_q = IW + AW
    off_ext = IW + AW + QW
    PW = (max(8, -(-(off_ext + EW) // 8) * 8) if table_t
          else _pad128(off_ext + EW))
    tab = np.zeros((n_chunks, k_max, PW), np.float32)
    ints = np.zeros((n_chunks, k_max, IW), np.int32)
    ints[..., 0] = rb
    ints[..., 1] = lrt
    ints[..., 2] = np.where(valid, g.lo[s], 0)
    ints[..., 3] = np.where(valid, g.hi[s], 0)
    ints[..., 4:] = g.shift[s]
    tab[..., :IW] = ints.view(np.float32)
    tab[..., off_amp:off_args] = np.where(valid[..., None], g.amp[s], 0.0)
    tab[..., off_args:off_q] = g.args[s].reshape(n_chunks, k_max, TF * W)
    if TF:
        q = np.ascontiguousarray(
            g.q32[s].astype(np.int32).reshape(n_chunks, k_max, 4 * TF))
        tab[..., off_q:off_ext] = q.view(np.float32)
    if f_ext is not None:
        off = g.args[s, f_ext, 7].astype(np.int64)
        cols = off[..., None] + np.arange(EW)
        ok = (cols >= 0) & (cols < len(ext_np))
        tab[..., off_ext:off_ext + EW] = np.where(
            ok, ext_np[np.clip(cols, 0, len(ext_np) - 1)],
            0.0).astype(np.float32)
    meta = dict(ops=g.ops, powers=g.powers, term_nfac=g.term_nfac, W=W,
                n_ident=n_ident, k_sp=k_sp, KSsp=KSsp, k_max=k_max,
                sp_widths=sp_widths,
                IW=IW, AW=AW, QW=QW, EW=EW, PW=PW, off_amp=off_amp,
                off_args=off_args, off_q=off_q, off_ext=off_ext,
                table_t=table_t)
    if dict_cols and not table_t:
        tab = _dict_compact(meta, [tab], [valid])[0]
    else:
        meta['_valid'] = valid       # joint compaction (stack_seq)
    cnts = np.stack([lay_cnt, sp_cnt], axis=1).astype(np.int32)
    return meta, tab, cnts


def _dict_compact(meta: dict, tabs: list, valids: list) -> list:
    """DICTIONARY COMPACTION (round 4, fetch-side lever).

    Stacked schedules are typically many near-identical pulses -- on
    vstack_1000x200k only the shift-derived columns (cos phase offset +
    sub-sample residuals) and the placement ints vary per instance; the
    other ~100 of 128 lane-padded columns repeat one value.  Bake every
    column that is bitwise-constant across the VALID slots into the
    kernel as an immediate (np.float32 / np.int32 -- the strip
    accessors broadcast scalars), keep only the varying columns in the
    table.  This shrinks the HBM operand stream ~PW/kept x WITHOUT the
    in-kernel transpose that sank the TABLE_T layout, and turns table
    loads into constants on the eval path.  Padding slots stay exact
    zeros: their mask columns (lo/hi) may only bake when constant
    across ALL slots (a baked valid-only lo/hi would un-mask padding),
    while every other column is already neutralized by the empty mask /
    zero values the mask forces.

    ``tabs``/``valids`` hold one (n_chunks, k_max, PW) table and its
    (n_chunks, k_max) valid mask per schedule; constancy is decided
    JOINTLY so every schedule of a stacked-table sequencer shares one
    column layout.  Mutates ``meta`` (PW, col_pos, col_const), returns
    the compacted tables.
    """
    PW = meta['PW']
    used = meta['off_ext'] + meta['EW']
    bits = np.concatenate(
        [t.reshape(-1, PW) for t in tabs]).view(np.int32)
    vflat = np.concatenate([v.reshape(-1) for v in valids])
    vb = bits[vflat]
    keep, col_pos, col_const = [], {}, {}
    for c in range(used):
        col = vb[:, c]
        is_const = col.size == 0 or bool(np.all(col == col[0]))
        if is_const and c in (2, 3):
            is_const = bool(np.all(bits[:, c] == bits[:, c]
                                   [0])) if bits.shape[0] else True
        if is_const:
            iv = np.int32(col[0] if col.size else 0)
            col_const[c] = (np.float32(iv.view(np.float32)), iv)
        else:
            col_pos[c] = len(keep)
            keep.append(c)
    if not keep:                # all-constant group: keep one column
        col_const.pop(0)
        col_pos[0] = 0
        keep.append(0)
    PWc = max(8, -(-len(keep) // 8) * 8)
    out = []
    for t in tabs:
        ctab = np.zeros(t.shape[:-1] + (PWc,), np.float32)
        ctab[..., :len(keep)] = t[..., keep]
        out.append(ctab)
    meta['PW'] = PWc
    meta['col_pos'] = col_pos
    meta['col_const'] = col_const
    meta.pop('_valid', None)
    return out


def _scatter_dot(ohb, vals, dot3):
    """One-hot scatter dot: (K, R) bool one-hot x (K, 128) f32 values ->
    (R, 128) f32.  ``dot3`` is the 3-split exact-bf16 form (see the
    in-line note); otherwise a HIGHEST-precision f32 dot."""
    dims = (((0,), (0,)), ((), ()))
    if dot3:
        # split ONLY the values into three exact bf16 pieces (v == v1 +
        # v2 + v3 bitwise for normal f32) and use an exactly-
        # representable bf16 one-hot -- every MXU product is then exact
        # and only the f32 accumulation order differs (<= ~1e-7 rel for
        # <=128-term sums).  3 one-pass bf16 dots vs HIGHEST's 6 passes.
        # NOT the failed round-3 variants: HIGH truncates cross terms of
        # BOTH operands (7.8e-6 measured), and a bf16 x f32 mixed dot
        # downcasts the f32 side (8.8e-4 measured).
        oh = ohb.astype(jnp.bfloat16)
        v1 = vals.astype(jnp.bfloat16)
        r1 = vals - v1.astype(jnp.float32)
        v2 = r1.astype(jnp.bfloat16)
        v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, v1, dims, preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(
            oh, v2, dims, preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(
            oh, v3, dims, preferred_element_type=jnp.float32)
        return out
    return jax.lax.dot_general(
        ohb.astype(jnp.float32), vals, dims,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _strip_builder(meta: dict, tab_ref, probe: str | None, dot3: bool,
                   base: int = 0):
    """Per-(group, table-ref) strip evaluator for the fused kernel.

    ``strip(off, KS, sc, use_dot)`` loads the KS-slot strip at static
    slot offset ``off`` of superchunk lane ``sc``, evaluates every
    slot's 128-sample block, and returns the (128, 128) chunk
    contribution (identity layers return slot-major values directly;
    spill strips scatter through the one-hot MXU dot).  ``base`` is the
    group's slot offset inside a MERGED table operand (all groups'
    tables concatenated on the slot axis -- one block fetch per step
    instead of one per group).

    NB: the factor/power/term-product recurrence here mirrors
    _eval_blocks (accessor-for-accessor); change both together -- see
    the note there."""

    cpos = meta.get('col_pos')       # dict-compacted tables only
    ccon = meta.get('col_const')

    def strip(off, KS, sc, use_dot, parts=False):
        W = meta['W']
        lane = jax.lax.broadcasted_iota(jnp.int32, (KS, 128), 1)
        if meta['table_t']:
            # (PW8, KS) lane-aligned static slice -> slot-major via one
            # in-kernel transpose (tpu.transpose)
            tt = jnp.transpose(tab_ref[0, sc, :, off:off + KS], (1, 0))
        else:
            tt = tab_ref[0, sc, pl.ds(base + off, KS), :]

        def fcol(c):
            """Logical f32 column c: a (KS, 1) table slice, or the baked
            np.float32 immediate when the column was dict-compacted."""
            if cpos is None:
                return tt[:, c:c + 1]
            if c in cpos:
                j = cpos[c]
                return tt[:, j:j + 1]
            return ccon[c][0]

        def icol(c):
            if cpos is not None and c not in cpos:
                return ccon[c][1]
            j = c if cpos is None else cpos[c]
            return jax.lax.bitcast_convert_type(tt[:, j:j + 1], jnp.int32)

        if probe == 'tables':
            # probe: table load + strip machinery only (the row-sum
            # data-depends on the whole loaded block)
            return jnp.broadcast_to(
                jnp.sum(tt, axis=0, keepdims=True), (128, 128))
        idx = icol(0) * 128 + lane

        def factor(f):
            di = idx - icol(4 + f)

            def arg(k, f=f):
                return fcol(meta['off_args'] + f * W + k)

            def q32(jq, f=f):
                return icol(meta['off_q'] + 4 * f + jq)

            def eread(k):
                return fcol(meta['off_ext'] + k)

            val = op_builders(di, arg, q32, eread)[meta['ops'][f]]()
            power = meta['powers'][f]
            if power != 1:
                ap = abs(int(power))
                v = val
                for _ in range(ap - 1):
                    v = v * val
                val = 1.0 / v if power < 0 else v
            return val

        term_nfac = ((0,) * len(meta['term_nfac'])
                     if probe == 'scatter' else meta['term_nfac'])
        seg = None
        f0 = 0
        for t, nf in enumerate(term_nfac):
            prod = jnp.broadcast_to(
                jnp.asarray(fcol(meta['off_amp'] + t), jnp.float32),
                (KS, 128))
            for f in range(f0, f0 + nf):
                prod = prod * factor(f)
            seg = prod if seg is None else seg + prod
            f0 += nf
        mask = (idx >= icol(2)) & (idx < icol(3))
        vals = jnp.where(mask, seg, 0.0)
        if parts:
            # superchunk-batched scatter (see _build_kernel_runner): the
            # caller batches the one-hot dot across SC chunks, so return
            # the raw values plus their output-row column
            return vals, icol(1)
        if probe == 'eval':
            # probe: no scatter dot (row-sum keeps the output shape and
            # data-depends on every evaluated lane)
            return jnp.broadcast_to(
                jnp.sum(vals, axis=0, keepdims=True), (128, 128))
        if not use_dot:
            # identity layer: slot index IS the output row
            return vals
        return _scatter_dot(icol(1) == lane, vals, dot3)

    return strip


def _emit_chunk(meta: dict, strip, out_ref, sc: int, lay, spc):
    """STATIC unrolled walk of one output chunk: identity layers first
    (direct row-aligned adds), then the one-hot spill strips.  The
    per-chunk layer/spill counts ride in SMEM, ``pl.when`` skips empty
    layers/strips, and padding slots are exact zeros (amp 0, empty
    [0,0) mask) so a predicated-in padding strip contributes nothing."""
    for l in range(meta['n_ident']):
        @pl.when(l < lay)
        def _(l=l, sc=sc):
            out_ref[0, sc * 128:(sc + 1) * 128, :] += strip(
                l * 128, 128, sc, False)
    off = 0
    for w in meta['sp_widths']:
        @pl.when(off < spc)
        def _(off=off, w=w, sc=sc):
            out_ref[0, sc * 128:(sc + 1) * 128, :] += strip(
                meta['n_ident'] * 128 + off, w, sc, True)
        off += w


def _build_kernel_runner(plan: StackPlan, low: LoweredSchedule,
                         interpret: bool, probe: str | None = None,
                         dot3: bool | None = None, out_dtype=None,
                         dac_scale: float = 32767.0):
    """The whole batched path as ONE Pallas kernel (cached on the plan).

    The XLA runner's per-group op chain (eval fusions + one-hot einsums +
    adds) costs ~1-2 us of dispatch per op, which dominates sub-100 us
    schedules (vstack_1000x200k measured 36 us device, ~half chain
    overhead, r3).  Here the grid is the output chunk axis (static ->
    Mosaic pipelines stores), each step walks ONLY its chunk's live
    instance blocks in KS-row strips (per-chunk counts ride SMEM, so
    slot-axis skew costs nothing), and the scatter is an in-kernel
    one-hot MXU dot at Precision.HIGHEST -- the one configuration
    measured exact on silicon (bf16 variants were wrong on the real MXU;
    see _build_runner's comment).  Ext side-buffer reads (multi-tone
    DRAG) are pregathered on the host into per-instance rows, so the
    kernel does no dynamic gathers at all.

    Returns None when the plan needs the XLA runner (too many structure
    groups, two ext factors in one term, or tables past the VMEM/HBM
    budgets).

    ``probe`` builds cost-decomposition variants for on-chip timing (the
    outputs are WRONG by construction): 'eval' skips the one-hot dot
    (tables + factor math only), 'scatter' skips the factor math
    (tables + mask + dot only).
    """
    if not _kernel_runner_viable(plan):
        return None
    C, n_rows = plan.n_channels, plan.n_rows
    total_rows = C * n_rows
    n_chunks = -(-total_rows // 128)
    ext_np = np.asarray(low.ext if low.ext is not None and low.ext.size
                        else np.zeros(1), np.float64)

    # SUPERCHUNKS: SC output chunks per grid step.  The floor probe
    # (r4_stack_cost_probe4) priced the launch structure at ~0.7 us per
    # grid step (the same per-step machinery the panel kernel was built
    # to avoid); processing 4 chunks per step with static in-kernel
    # offsets cuts it ~4x.  Padding chunks have zero counts, so their
    # strips predicate away and their output rows stay zero.  The env
    # lever exists for on-chip A/B: larger SC trades per-step machinery
    # against fetch/compute double-buffering granularity (merged tables
    # left the VMEM budget ~10x clear on vstack-class plans).
    SC = min(int(os.environ.get('WFTPU_STACK_SC', '4')), n_chunks)
    n_super = -(-n_chunks // SC)
    n_chunks_pad = n_super * SC

    # TRANSPOSED TABLES (round 4, fetch-side lever): the row-major packed
    # table lane-pads every slot's ~23 used columns to 128 (PW), so the
    # operand stream carries ~5.5x the live bytes -- and the floor probe
    # (r4_stack_cost_probe5: 7.6 us of the row's 24.7) says operand
    # fetch + launch IS the kernel's fixed cost.  Storing each chunk's
    # table as (PW8, k_max) -- used columns padded only to the f32
    # sublane (8), slots on lanes -- shrinks the stream ~5x; each strip
    # then loads (PW8, KS) and recovers slot-major (KS, PW8) with ONE
    # in-kernel tpu.transpose.  Strip offsets stay static, but slot
    # strips must be 128-lane aligned, so spill strips pad to 128 wide
    # (padding slots are exact zeros).  MEASURED NEGATIVE on chip
    # (r4_stack_fetch_ab: row-major 26.7 us vs transposed 37.6 us on
    # vstack_1000x200k -- the in-kernel transpose costs more than the
    # saved operand bytes); kept opt-in for other table shapes.
    TABLE_T = os.environ.get('WFTPU_STACK_TABLE_T', '0') == '1'

    # Identity-layer hybrid scatter: MEASURED NEGATIVE on chip in the
    # clean-window A/B (r4_stack_layout_ab: one-hot 24.8 us vs ident2
    # 26.7 us on vstack_1000x200k -- the HIGHEST one-hot dot overlaps
    # VPU eval, so skipping it buys nothing and the extra strip
    # bookkeeping costs ~7%).  Default is therefore the pure one-hot
    # layout; the hybrid stays opt-in for re-measurement.
    N_IDENT = int(os.environ.get('WFTPU_STACK_IDENT_LAYERS', '0'))

    # Dictionary-compacted tables (see _group_table): bake bitwise-
    # constant columns as kernel immediates, stream only the varying
    # ones.  Orthogonal to TABLE_T (which it supersedes on vstack-class
    # plans: ~12x fewer operand bytes there, with no in-kernel
    # transpose).  Dictionary compaction defaults ON: bit-identical on chip
    # (r4_stack_dict_ab), never measured slower (neutral single-
    # schedule, -8% on the overlap row and the stacked sequencer where
    # table bytes scale with schedule count, r4_seq_stack_dict_ab).
    DICT = os.environ.get('WFTPU_STACK_DICT', '1') == '1' and not TABLE_T

    # 3-split bf16 scatter dot (see _strip_builder), default ON: parity
    # proven on the real MXU three times (7.55e-8 / 7.6e-8 /
    # r4_stack_strip_ab) and faster than the HIGHEST 6-pass dot in
    # every measured config (17.2 vs 18.5 us with onestrip, 20.7 vs
    # 21.4 without).  The env default lets the production path and the
    # A/B harness share one switch; an explicit dot3 argument (the
    # capture tasks) always wins.
    if dot3 is None:
        dot3 = os.environ.get('WFTPU_STACK_DOT3', '1') == '1'

    # SINGLE FULL-WIDTH SPILL STRIPS (round-4 session 6): with operands
    # merged and the floor at ~5 us, the scatter probe (19.1 of 21.4 us,
    # r4_stack_cost_probe8) says per-strip machinery + the per-strip dot
    # chain is the critical path.  When chunk occupancy is UNIFORM (the
    # vstack regime: every chunk ~137 of 176 slots live), predicated
    # 128-wide strips buy nothing -- almost every chunk runs all of
    # them -- so walking the whole spill region as ONE (k_sp, 128) strip
    # halves the strip count and dot count per chunk.  Padding slots are
    # exact zeros by table construction, so evaluating them is safe.
    # 'auto' collapses when the padding waste is <= 60% of live work.
    ONESTRIP = os.environ.get('WFTPU_STACK_ONESTRIP', 'auto')
    metas = []       # static per-group kernel parameters
    tabs = []        # host table arrays, one per group
    cnts_l = []      # host (n_chunks_pad, 2) count arrays, one per group
    vmem = 2 * SC * 2 * 128 * 128 * 4            # double-buffered out
    pad_c = n_chunks_pad - n_chunks
    for g in plan.groups:
        # HYBRID placement (round 4, probe-driven): N_IDENT IDENTITY
        # layers whose slot index IS the output row (direct row-aligned
        # adds, no one-hot dot -- the dot was ~10 us of the vstack row's
        # critical path) plus a compact one-hot spill strip for the rare
        # deeper collisions (~1.1 average depth on vstack-class
        # schedules).  WFTPU_STACK_IDENT_LAYERS=0 degenerates into the
        # pure one-hot layout (every block spills) for A/B timing.
        meta, tab, cnts = _group_table(g, n_rows, n_chunks, ext_np,
                                       N_IDENT, TABLE_T, dict_cols=DICT)
        meta.pop('_valid', None)
        if (not TABLE_T and 0 < meta['k_sp'] <= 512
                and len(meta['sp_widths']) > 1
                and (ONESTRIP == '1'
                     or (ONESTRIP == 'auto'
                         and n_chunks * meta['k_sp']
                         <= 1.6 * max(int(cnts[:, 1].sum()), 1)))):
            # the 512-slot cap bounds the strip's (KS, 128) eval
            # temporaries the predicated 128-wide walk naturally limits
            meta['sp_widths'] = (meta['k_sp'],)
        metas.append(meta)
        tabs.append(np.pad(tab, ((0, pad_c), (0, 0), (0, 0))))
        cnts_l.append(np.pad(cnts, ((0, pad_c), (0, 0))))
    # MERGED OPERANDS (round-4 session 5): the floor probe prices each
    # grid step's machinery at ~0.4 us per operand block; concatenating
    # every group's slot table on the slot axis (and the counts on
    # their column axis) turns 2 blocks per group into 2 blocks total.
    # Group slot bases stay multiples of 8 (k_max is), so the strip
    # slices stay sublane-aligned.  The TABLE_T layout keeps per-group
    # operands (its PW8 differs per group, so slot-axis concat would
    # misalign lanes).
    merged = not TABLE_T
    # SUPERCHUNK-BATCHED SCATTER (round 5): the r4j probe decomposition
    # put the per-strip scatter machinery (one dot -- or 3 under dot3 --
    # per chunk) on the critical path (19.1 of 21.4 us).  When every
    # group is a pure spill layout with ONE strip per chunk (the
    # onestrip/vstack regime), the SC chunks of a grid step can share a
    # single dot: concatenate the SC strips' values on the contraction
    # axis and widen the one-hot to SC*128 output rows (row = sc*128 +
    # lrt).  MXU passes grow SC-fold (the widened one-hot is mostly
    # zeros) but invocations drop SC-fold, and per-dot machinery is what
    # the probe priced.  Numerically equivalent to the per-chunk path:
    # every output row receives the SAME product multiset -- slots of
    # other chunks contribute one-hot hits times EXACT-zero values,
    # including padding slots (lrt 128 aliases the next chunk's row 0 in
    # the widened lane space, but their amp-0/empty-mask values are
    # exact zeros).  NOT bit-identical: the wider GEMM blocks the
    # contraction differently, so f32 summation order shifts (~1-ulp
    # class, same order as the dot3-vs-HIGHEST delta).  Gated off for
    # probes (they need the per-strip decomposition) and capped so the
    # (SC*sum k_sp, SC*128) one-hot temporary stays within VMEM.
    SCDOT = os.environ.get('WFTPU_STACK_SCDOT', 'auto')
    scdot = (probe is None and SC > 1
             and all(m['n_ident'] == 0 and m['k_sp'] > 0
                     and len(m['sp_widths']) == 1 for m in metas)
             and (SCDOT == '1'
                  or (SCDOT == 'auto'
                      # VMEM cap on the widened one-hot temporary, and
                      # the same <=60%-padding-waste rule as ONESTRIP --
                      # summed over groups, since the batched dot fuses
                      # them all (predication is gone, so every slot
                      # evaluates; a tiny auxiliary group's padding is
                      # priced against the whole step's live work)
                      and SC * sum(m['k_sp'] for m in metas) <= 1024
                      and (n_chunks * sum(m['k_sp'] for m in metas)
                           <= 1.6 * max(sum(int(c[:, 1].sum())
                                            for c in cnts_l), 1)))))
    if merged:
        PWmax = max(meta['PW'] for meta in metas)
        bases = []
        b = 0
        for meta, tab in zip(metas, tabs):
            bases.append(b)
            b += meta['k_max']
        k_tot = b
        big_tab = np.concatenate(
            [np.pad(tab, ((0, 0), (0, 0), (0, PWmax - meta['PW'])))
             for meta, tab in zip(metas, tabs)], axis=1)
        big_cnt = np.concatenate(cnts_l, axis=1)
        operands = [[big_cnt,
                     big_tab.reshape(n_super, SC, k_tot, PWmax)]]
    else:
        bases = [0] * len(metas)
        operands = []
        for meta, tab, cnts in zip(metas, tabs, cnts_l):
            tab = np.ascontiguousarray(tab.transpose(0, 2, 1))
            operands.append([cnts,
                             tab.reshape(n_super, SC, meta['PW'],
                                         meta['k_max'])])
    if scdot:
        # the batched path never reads the per-chunk counts (padding
        # slots are exact zeros, so predication buys nothing) -- drop
        # the operand entirely, each shipped SMEM block costs ~0.4 us
        # of step machinery (floor probe)
        operands = [group_ops[1:] for group_ops in operands]
    # the VMEM guard prices the ACTUAL table blocks (the merged block is
    # k_tot x PWmax -- PW padding to the widest group can exceed the
    # per-group sum), double-buffered
    vmem += sum(2 * 4 * SC * ops[-1].shape[2] * ops[-1].shape[3]
                for ops in operands)
    if scdot:
        # the widened one-hot + concatenated values temporaries
        vmem += sum(SC * m['k_sp'] * (SC * 128 + 128) * 4 for m in metas)
    hbm = sum(a.nbytes for group_ops in operands for a in group_ops)
    if vmem > KERNEL_MAX_VMEM or hbm > KERNEL_MAX_HBM:
        return None
    # budgets hold: NOW move the tables to the device (uploading first
    # would burn H2D bandwidth -- and possibly HBM -- on plans the check
    # is about to reject)
    operands = [[jnp.asarray(a) for a in group_ops]
                for group_ops in operands]

    # int16 DAC codes (round-half-even, the convention shared with
    # synthesize_device and _quantize_host -- jnp.round IS half-even):
    # strips accumulate into an f32 VMEM scratch and ONE full-block
    # quantized store writes the output -- dynamic int16 sub-stores
    # crash real Mosaic (round-4 panel lesson), and halving the output
    # stream matters most for stacked shot batches (stack_seq)
    quant = (out_dtype is not None
             and jnp.dtype(out_dtype) != jnp.dtype(jnp.float32))
    if quant and probe is not None:
        raise ValueError("probe variants are f32-only")
    if quant and np.ndim(dac_scale) != 0:
        raise NotImplementedError(
            "stack-path int16 supports a scalar dac_scale (chunks can "
            "straddle channels)")

    # counts layout: whole-resident SMEM below the budget (the measured
    # vstack-class fast path, one fetch total), else blocked per
    # superchunk -- (n_super, SC, W) with a (1, SC, W) window, which
    # divides the array shape so Mosaic accepts it at any n_chunks
    # (the batched-scatter path ships no counts at all)
    cnt_blocked = (not scdot
                   and max(ops[0].nbytes for ops in operands)
                   > CNT_SMEM_WHOLE_MAX)
    if cnt_blocked:
        operands = [[ops[0].reshape(n_super, SC, ops[0].shape[1]),
                     ops[1]] for ops in operands]

    def kernel(*refs):
        if quant:
            out_ref, acc_ref = refs[-2], refs[-1]
        else:
            out_ref = acc_ref = refs[-1]
        acc_ref[0] = jnp.zeros((SC * 128, 128), jnp.float32)
        if scdot:
            # superchunk-batched scatter: ONE widened dot covers all SC
            # chunks of every group (see the gate comment above)
            vals_l, oh_l = [], []
            for gi, meta in enumerate(metas):
                tab_ref = refs[0] if merged else refs[gi]
                strip = _strip_builder(meta, tab_ref, probe, dot3,
                                       base=bases[gi])
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
        elif probe != 'floor':
            # probe 'floor': grid + operand block fetches + epilogue
            # only -- the cost of the launch STRUCTURE with no strips
            r = 0
            for gi, meta in enumerate(metas):
                if merged:
                    cnt_ref, tab_ref = refs[0], refs[1]
                    ccol = 2 * gi
                else:
                    cnt_ref, tab_ref = refs[r:r + 2]
                    r += 2
                    ccol = 0
                strip = _strip_builder(meta, tab_ref, probe, dot3,
                                       base=bases[gi])
                for sc in range(SC):
                    if cnt_blocked:
                        c0 = cnt_ref[0, sc, ccol]
                        c1 = cnt_ref[0, sc, ccol + 1]
                    else:
                        row = pl.program_id(0) * SC + sc
                        c0 = cnt_ref[row, ccol]
                        c1 = cnt_ref[row, ccol + 1]
                    _emit_chunk(meta, strip, acc_ref, sc, c0, c1)
        if quant:
            # dac_scale applies to integer codes only; float narrowing
            # (bf16/f16) is a plain astype, matching _quantize_host and
            # the dense/panel kernels' convention
            if jnp.dtype(out_dtype) == jnp.dtype(jnp.int16):
                scaled = jnp.clip(
                    jnp.round(acc_ref[0] * np.float32(dac_scale)),
                    -32768.0, 32767.0)
            else:
                scaled = acc_ref[0]
            out_ref[0] = scaled.astype(out_dtype)

    in_specs = []
    flat_ops = []
    for group_ops in operands:
        # counts ride whole in SMEM when small (block == array shape; a
        # (1, 1) block over (n, 1) violates Mosaic's divisible-or-full
        # rule for n > 1); big-output plans stream one superchunk's rows
        # per step (see CNT_SMEM_WHOLE_MAX); the batched-scatter path
        # ships the table only
        if not scdot:
            if cnt_blocked:
                in_specs.append(pl.BlockSpec(
                    (1,) + group_ops[0].shape[1:], lambda i: (i, 0, 0),
                    memory_space=pltpu.SMEM))
            else:
                in_specs.append(pl.BlockSpec(group_ops[0].shape,
                                             lambda i: (0, 0),
                                             memory_space=pltpu.SMEM))
        in_specs.append(pl.BlockSpec((1,) + group_ops[-1].shape[1:],
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        flat_ops.extend(group_ops)

    call = pl.pallas_call(
        kernel,
        grid=(n_super,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SC * 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_super, SC * 128, 128),
            out_dtype if quant else jnp.float32),
        scratch_shapes=([pltpu.VMEM((1, SC * 128, 128), jnp.float32)]
                        if quant else []),
        interpret=interpret,
    )

    # the pallas program jits ALONE (its device span is the kernel cost,
    # comparable to the dense/sparse/panel rows); the reshape + tail
    # slice run as eager device ops, exactly like synthesize_panels'
    # epilogue
    @jax.jit
    def _stack_call(*ops):
        return call(*ops)

    def run_stack_kernel():
        out = _stack_call(*flat_ops)
        out = out.reshape(-1, 128)[:total_rows]
        return out.reshape(C, n_rows * 128)[:, :plan.n_samples]

    run_stack_kernel.kernel_span = 'jit__stack_call'
    run_stack_kernel.kernel_jit = _stack_call     # AOT lowering checks
    run_stack_kernel.kernel_args = flat_ops
    run_stack_kernel.metas = metas                # geometry introspection
    run_stack_kernel.scdot = scdot                # batched-scatter engaged?
    return run_stack_kernel


def synthesize_stack(low: LoweredSchedule, plan: StackPlan | None = None,
                     interpret: bool | None = None, out_dtype=None,
                     dac_scale: float = 32767.0) -> jax.Array:
    """Synthesize via the pulse-instance batched path -> (C, n_samples).

    ``interpret`` is forwarded to the kernel run of the wide residual (the
    batched path itself is plain XLA).  The compiled program is cached on
    the plan: lower once, plan once, synthesize many times.

    ``out_dtype=jnp.int16`` emits exact DAC codes scaled by the scalar
    ``dac_scale`` (the other engines' convention): pure-narrow plans
    quantize inside the fused kernel (one f32 scratch, halved output
    stream); plans with a wide residual sum both parts in f32 and
    quantize in the epilogue so codes round once, after the sum.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    if plan is None:
        plan = build_stack_plan(low)
    if plan is None:
        raise UnsupportedFactor(
            "schedule has no batchable pulse instances (complex, clipped, "
            "or all-wide) -- use the kernel engines")
    quant = (out_dtype is not None
             and jnp.dtype(out_dtype) != jnp.dtype(jnp.float32))
    if (out_dtype is not None
            and jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer)
            and jnp.dtype(out_dtype) != jnp.dtype(jnp.int16)):
        raise ValueError("integer output supports int16 only")
    # per-channel dac_scale quantizes in the epilogue (stack chunks can
    # straddle channels, so the in-kernel store takes a scalar only)
    in_kernel_quant = quant and plan.wide is None \
        and np.ndim(dac_scale) == 0
    key = '_runner_interp' if interpret else '_runner'
    if in_kernel_quant:
        key += f"_{jnp.dtype(out_dtype)}_{float(dac_scale)!r}"
    # the table-layout env levers are baked into the compiled kernel at
    # build time; omitting them from the key made A/B harnesses measure
    # a stale cached variant silently
    key += (f"_t{os.environ.get('WFTPU_STACK_TABLE_T', '0')}"
            f"_l{os.environ.get('WFTPU_STACK_IDENT_LAYERS', '0')}"
            f"_s{os.environ.get('WFTPU_STACK_SC', '4')}"
            f"_d{os.environ.get('WFTPU_STACK_DICT', '1')}"
            f"_3{os.environ.get('WFTPU_STACK_DOT3', '1')}"
            f"_o{os.environ.get('WFTPU_STACK_ONESTRIP', 'auto')}")
    runner = getattr(plan, key, None)
    if runner is None:
        runner = _build_kernel_runner(
            plan, low, interpret,
            out_dtype=out_dtype if in_kernel_quant else None,
            dac_scale=dac_scale)
        if runner is not None:
            runner.quantized = in_kernel_quant
        else:
            runner = _build_runner(plan, low)
            runner.quantized = False
        setattr(plan, key, runner)
    in_kernel_quant = getattr(runner, 'quantized', False)
    try:
        out = runner()
    except Exception as exc:
        # a Mosaic compile limitation in the fused kernel (e.g. an
        # unsupported primitive on an older lowering) must not break
        # synthesis: fall back to the XLA op-chain runner once, loudly,
        # and cache it.  Runtime device faults re-raise (the engine's
        # fault classifier owns that policy).
        from ..engine import _is_device_fault
        msg = str(exc).lower()
        if (getattr(plan, '_runner_is_xla_' + key, False)
                or _is_device_fault(exc)   # runtime fault: engine's policy
                or not any(m in msg
                           for m in ('mosaic', 'unimplemented primitive',
                                     'lowering', 'unsupported'))):
            raise
        import warnings
        warnings.warn(
            f"stack kernel runner failed to compile ({exc!s:.120}); "
            "falling back to the XLA op-chain runner")
        runner = _build_runner(plan, low)
        runner.quantized = False
        in_kernel_quant = False
        setattr(plan, key, runner)
        setattr(plan, '_runner_is_xla_' + key, True)
        out = runner()
    if plan.wide is not None:
        from .pallas_synth import DeviceSchedule, synthesize_device
        out = out + synthesize_device(DeviceSchedule(plan.wide),
                                      interpret=interpret)
    if quant and not in_kernel_quant:
        if jnp.dtype(out_dtype) == jnp.dtype(jnp.int16):
            sc = np.asarray(dac_scale, np.float32)
            scaled = out * (sc.reshape(-1, 1) if sc.ndim else sc)
            out = jnp.clip(jnp.round(scaled), -32768.0,
                           32767.0).astype(out_dtype)
        else:        # float narrowing: plain astype, no DAC scale
            out = out.astype(out_dtype)
    return out

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
(padded to powers of two), the plan is per-schedule host work, and only
real-f32 single-device synthesis is supported (pair/int16/sharded stay on
the dense path).  Use for low-occupancy schedules; ``synthesize_device``
remains the general path.
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
from .pallas_synth import DeviceSchedule, _tile_walker

__all__ = ['SparsePlan', 'build_sparse_plan', 'synthesize_sparse']

DEFAULT_SUBTILE_ROWS = 32


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
    K = 1
    while K < max(n_live, 1):
        K *= 2
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
                      n_channels=C)


def _sparse_kernel(wc_ref, wb_ref, wt_ref, wo_ref, ws0_ref, ws1_ref,
                   seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref, amp_ref,
                   op_ref, pw_ref, sh_ref, q32_ref, args_ref, ext_ref,
                   clip_ref, bg_ref, out_ref, *, S, T, F, Rs, ops_present):
    del wo_ref  # drives the output index map only
    del bg_ref  # aliased zero background; present only for aliasing
    k = pl.program_id(0)
    tile = Rs * 128
    base = wt_ref[k] * tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 1)
    idx = base + rows * 128 + cols

    segment_at, acc0 = _tile_walker(
        idx, base, tile, Rs, seg_lo_ref, seg_hi_ref, nterm_ref, nfac_ref,
        amp_ref, op_ref, pw_ref, sh_ref, q32_ref, args_ref, ext_ref,
        clip_ref, None, T=T, F=F, ops_present=ops_present, pair=False)

    acc = jax.lax.fori_loop(ws0_ref[k], ws1_ref[k], segment_at, acc0)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('S', 'T', 'F', 'Rs', 'n_tiles',
                              'ops_present', 'interpret'))
def _run_sparse(wc, wb, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac, amp,
                op, pw, sh, q32, args, ext, clip, *, S, T, F, Rs, n_tiles,
                ops_present=tuple(range(N_OPS)), interpret=False):
    C = seg_lo.shape[0]
    E = ext.shape[-1]
    K = wc.shape[0]
    # background: zeros incl. one scratch row-block for padding work items
    bg = jnp.zeros((C, (n_tiles + 1) * Rs, 128), jnp.float32)

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

    out_spec = pl.BlockSpec(
        (1, Rs, 128),
        lambda i, wc, wb, wt, wo, ws0, ws1: (wc[i], wo[i], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(K,),
        in_specs=[
            smem(S), smem(S), smem(S),                   # seg_lo, seg_hi, nterm
            smem(S * T), smem(S * T),                    # nfac, amp
            smem(S * T * F), smem(S * T * F),            # op, power
            smem(S * T * F), smem(S * T * F * 4),        # shift_hi, q32
            smem(S * T * F * W_ARGS),                    # args
            smem(E, bcast=True),                         # ext
            pl.BlockSpec(
                (1, 1, 1, 2),
                lambda i, wc, wb, wt, wo, ws0, ws1: (wc[i], 0, 0, 0),
                memory_space=pltpu.SMEM),                # clip
            out_spec,                                    # bg (aliased)
        ],
        out_specs=out_spec,
    )
    kernel = functools.partial(_sparse_kernel, S=S, T=T, F=F, Rs=Rs,
                               ops_present=ops_present)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(bg.shape, jnp.float32),
        # bg is input 12 after the 6 scalar-prefetch operands
        input_output_aliases={18: 0},
        interpret=interpret,
    )(wc, wb, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac, amp, op, pw,
      sh, q32, args, ext, clip, bg)
    return out


def synthesize_sparse(dev: DeviceSchedule, low: LoweredSchedule | None = None,
                      plan: SparsePlan | None = None,
                      Rs: int = DEFAULT_SUBTILE_ROWS,
                      interpret: bool = False) -> jax.Array:
    """Run the sparse worklist kernel on device-resident descriptors.

    ``low`` (or a prebuilt ``plan``) supplies the host-side worklist;
    returns (C, n_samples) f32.  Real single-device schedules only.
    """
    if dev.amp_im is not None:
        raise UnsupportedFactor("sparse path supports real schedules only")
    if plan is None:
        if low is None:
            raise ValueError("synthesize_sparse needs `low` or `plan`")
        plan = build_sparse_plan(low, Rs=Rs)
    C, NB, S, T, F = dev.shape
    # dev.tensors = (seg_lo, seg_hi, seg_hmax, nterm, ...): hmax is the
    # dense prologue's bisect key; the sparse plan already encodes it
    tensors = dev.tensors[:2] + dev.tensors[3:]
    out = _run_sparse(
        jnp.asarray(plan.work_c), jnp.asarray(plan.work_b),
        jnp.asarray(plan.work_t), jnp.asarray(plan.work_o),
        jnp.asarray(plan.work_s0), jnp.asarray(plan.work_s1), *tensors,
        S=S, T=T, F=F, Rs=plan.Rs, n_tiles=plan.n_tiles,
        ops_present=dev.ops_present, interpret=interpret)
    return out.reshape(C, -1)[:, :plan.window_samples]

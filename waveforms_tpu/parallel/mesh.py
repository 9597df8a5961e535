"""Multi-chip synthesis: shard the (channels, samples) plane over a Mesh.

The synthesis problem is embarrassingly parallel in both axes -- basis
evaluation is pointwise in t, so sharding needs **no halos**: the channel
axis splits descriptor rows across devices, and the sample (time) axis
splits the output grid, with each shard's global sample offset fed to the
kernel as a scalar.  Collectives appear only downstream: IIR filter state
crossing time shards (the associative scan's carry rides ICI) and FFT
pipelines; XLA's SPMD partitioner inserts those when the sharded result
flows into :mod:`waveforms_tpu.ops.iir` / ``ops.fft`` under ``jit``.

The reference's nearest analog is WaveVStack's Python loop over channels
(``/root/reference/waveforms/waveform.py:679-693``); here that batching
axis becomes a mesh dimension.

Layout guidance (scaling-book recipe): put the channel axis on the mesh's
fastest-varying ICI dimension; channels are fully independent so channel
sharding scales linearly to any mesh size, while time sharding is preferred
when a single channel's 2M+ samples dominate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.lowering import W_ARGS, LoweredSchedule, lower_schedule
from ..ops.pallas_synth import _run_kernel

__all__ = ['channel_mesh', 'synthesize_sharded', 'shard_schedule']


def channel_mesh(n_channel: int | None = None, n_time: int = 1,
                 devices=None) -> Mesh:
    """Build a ('channel', 'time') mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_channel is None:
        n_channel = len(devices) // n_time
    return Mesh(devices.reshape(n_channel, n_time), ('channel', 'time'))


def _pad_channels(arr: np.ndarray, c_pad: int) -> np.ndarray:
    if arr.shape[0] == c_pad:
        return arr
    pad = np.zeros((c_pad - arr.shape[0],) + arr.shape[1:], dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _pad_axis(arr: np.ndarray, axis: int, size: int) -> np.ndarray:
    if arr.shape[axis] == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - arr.shape[axis])
    return np.pad(arr, widths)


def shard_schedule(low: LoweredSchedule, mesh: Mesh,
                   nb_pad: int | None = None, op_remap=None):
    """Device-put descriptor tensors sharded along the mesh axes.

    Channels pad up to a multiple of the channel-axis size (padded channels
    have zero segments and synthesize to silence).  With ``nb_pad`` set,
    the bucket axis pads to that count and shards along 'time' so each
    shard holds exactly the descriptor windows of its sample slice.
    """
    C, NB, S, T, F = low.shape
    nc = mesh.shape['channel']
    c_pad = -(-C // nc) * nc
    bucket_spec = 'time' if nb_pad is not None and nb_pad > 1 else None
    sharding = NamedSharding(mesh, P('channel', bucket_spec, None, None))
    nb = nb_pad if nb_pad is not None else NB

    def put(arr, k):
        a = _pad_channels(arr.reshape(C, NB, 1, k), c_pad)
        a = _pad_axis(a, 1, nb)
        return jax.device_put(a, sharding)

    n_ext = max(int(low.ext.size) if low.ext is not None else 0, 1)
    e_pad = -(-n_ext // 256) * 256
    ext_np = np.zeros(e_pad, np.float32)
    if low.ext is not None and low.ext.size:
        ext_np[:low.ext.size] = low.ext
    ext = jax.device_put(ext_np.reshape(1, 1, 1, e_pad),
                         NamedSharding(mesh, P(None, None, None, None)))

    clip = np.stack([low.clip_min, low.clip_max], axis=1)
    # clip is per-channel only: replicate over the bucket axis if sharded
    clip4 = np.broadcast_to(clip.reshape(C, 1, 1, 2), (C, nb, 1, 2)).copy() \
        if bucket_spec else clip.reshape(C, 1, 1, 2)
    clipd = jax.device_put(
        _pad_channels(clip4, c_pad),
        NamedSharding(mesh, P('channel', bucket_spec, None, None)))
    return dict(
        seg_lo=put(low.seg_lo, S), seg_hi=put(low.seg_hi, S),
        seg_hmax=put(np.maximum.accumulate(low.seg_hi, axis=-1), S),
        nterm=put(low.nterm, S),
        nfac=put(low.nfac, S * T), amp=put(low.amp, S * T),
        op=put(op_remap[low.op] if op_remap is not None else low.op,
               S * T * F),
        pw=put(low.power, S * T * F),
        sh=put(low.shift_hi, S * T * F), q32=put(low.q32, S * T * F * 4),
        args=put(low.args, S * T * F * W_ARGS),
        ext=ext, clip=clipd,
        **({'amp_im': put(low.amp_im, S * T)}
           if low.amp_im is not None else {}),
    ), c_pad


def synthesize_sharded(low: LoweredSchedule, mesh: Mesh,
                       rows_per_tile: int | None = None,
                       interpret: bool = False,
                       out_dtype=jnp.float32,
                       dac_scale=32767.0) -> jax.Array:
    """Synthesize a lowered schedule over a ('channel', 'time') mesh.

    Returns the (C, N) output with sharding P('channel', 'time') -- each
    device holds its own channel/time block, ready for sharded downstream
    filtering without any gather.  ``out_dtype=jnp.bfloat16`` narrows the
    kernel's stores; ``jnp.int16`` emits exact DAC codes scaled by the
    scalar/per-channel ``dac_scale`` (see synthesize_device); pair-mode
    requires f32.
    """
    if not low.pallas_ok:
        from ..ops.lowering import UnsupportedFactor
        raise UnsupportedFactor(
            "schedule is outside the Pallas kernel's descriptor budget "
            "or opcode set -- synthesize per-host with engine='native'/"
            "'numpy' instead (the mesh path has no host fallback)")
    C, NB, S, T, F = low.shape
    # one shared output-mode gate (normalized dtypes, clear errors)
    from ..ops.pallas_synth import validate_out_mode
    scale_v = validate_out_mode(out_dtype, low.amp_im, C, dac_scale)
    dac = scale_v is not None
    nt_shards = mesh.shape['time']
    if rows_per_tile is None:
        from ..ops.pallas_synth import default_rows_per_tile
        rows_per_tile = default_rows_per_tile(
            -(-low.n_samples // nt_shards), low.bucket_samples, NB)
    R = rows_per_tile
    # compact the opcode branch table like the single-chip path (one-op
    # schedules then branch not at all); _compact_ops pairs the branch
    # list with the descriptor remap the kernel's lax.switch needs
    from ..ops.sparse_synth import _compact_ops
    ops_present, op_remap = _compact_ops(low)
    if NB > 1:
        # bucketed: shard whole buckets across 'time' so every local tile's
        # bucket window lives on its own shard
        tile = R * 128
        if low.bucket_samples % tile:
            raise ValueError("bucket_samples must be a multiple of the tile")
        nb_pad = -(-NB // nt_shards) * nt_shards
        rows_local = (nb_pad // nt_shards) * (low.bucket_samples // 128)
        n_rows = rows_local * nt_shards
        tensors, c_pad = shard_schedule(low, mesh, nb_pad=nb_pad,
                                        op_remap=op_remap)
        G = low.bucket_samples // tile
    else:
        n_rows = -(-low.n_samples // 128)
        n_rows = -(-n_rows // (R * nt_shards)) * (R * nt_shards)
        rows_local = n_rows // nt_shards
        tensors, c_pad = shard_schedule(low, mesh, op_remap=op_remap)
        G = max(rows_local // R, 1)

    pair = low.amp_im is not None
    bucket_spec = 'time' if NB > 1 else None
    in_spec = P('channel', bucket_spec, None, None)
    chan_spec = P('channel', None, None, None)
    specs = ([in_spec] * 11 + [P(None, None, None, None), in_spec]
             + ([in_spec] if pair else [])
             + ([chan_spec] if dac else []))

    scale_t = None
    if dac:
        scale_t = jax.device_put(_pad_channels(np.asarray(scale_v), c_pad),
                                 NamedSharding(mesh, chan_spec))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=tuple(specs),
        out_specs=P('channel', 'time', None),
        check_vma=False)
    def run(seg_lo, seg_hi, seg_hmax, nterm, nfac, amp, op, pw, sh, q32,
            args, ext, clip, *rest):
        row0 = jax.lax.axis_index('time').astype(jnp.int32) * (
            rows_local * 128)
        clip_local = clip[:, :1]  # per-channel clip (bucket axis replicated)
        out = _run_kernel(row0.reshape(1, 1, 1, 1), seg_lo, seg_hi,
                          seg_hmax, nterm,
                          nfac, amp, op, pw, sh, q32, args, ext, clip_local,
                          rest[0] if pair else None,
                          rest[-1] if dac else None,
                          S=S, T=T, F=F, R=R, n_rows=rows_local,
                          tiles_per_bucket=G, ops_present=ops_present,
                          out_dtype=out_dtype,
                          interpret=interpret)
        if pair:
            re, im = out
            out = re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)
        return out.reshape(out.shape[0], rows_local * 128)[:, None, :]

    out = run(tensors['seg_lo'], tensors['seg_hi'], tensors['seg_hmax'],
              tensors['nterm'],
              tensors['nfac'], tensors['amp'], tensors['op'], tensors['pw'],
              tensors['sh'], tensors['q32'], tensors['args'],
              tensors['ext'], tensors['clip'],
              *([tensors['amp_im']] if pair else []),
              *([scale_t] if dac else []))
    out = out.reshape(c_pad, n_rows * 128)
    return out[:C, :low.n_samples]


def synthesize_on_mesh(channels, start, stop, sample_rate, mesh,
                       part: str = 'real', rows_per_tile: int | None = None,
                       interpret: bool = False,
                       out_dtype=jnp.float32,
                       dac_scale=32767.0) -> jax.Array:
    """Lower + shard + synthesize in one call.

    Mirrors the single-chip engine's routing for EVERY output surface
    (round-4 parity): pulse-sparse schedules -- real or pair-mode, f32 /
    bf16 / int16, bucketed or not -- run the sharded PANEL kernel below
    the panel occupancy threshold (sharded worklist kernel when a shard's
    worklist is outside the panel budgets, or between the two
    thresholds); vstack-class schedules (occupancy high but every pulse
    NARROW) run the sharded stacked-table path; everything else the
    dense grid.
    """
    low = lower_schedule(channels, start, stop, sample_rate, part=part)
    prefer_stack = False
    stack_plan_memo = []           # build_stack_plan is O(instances)
    if low.pallas_ok and rows_per_tile is None:
        from ..engine import (_panel_threshold, _sparse_threshold,
                              _stack_advantage, _stack_occ_floor)
        from ..ops.lowering import UnsupportedFactor
        from ..ops.sparse_synth import (build_sparse_plan,
                                        synthesize_panels_sharded,
                                        synthesize_sparse_sharded)
        try:
            plan = build_sparse_plan(low)
            occ = plan.occupied_fraction
            # padded-tile occupancy + short-window guard, the SAME
            # correction classify_pallas_route applies (routing parity:
            # dense/panel padding rows are real work, and short windows
            # have nothing to amortize)
            from ..ops.pallas_synth import default_rows_per_tile
            R = default_rows_per_tile(low.n_samples, low.bucket_samples,
                                      low.shape[1])
            n_rows = -(-low.n_samples // 128)
            padded_rows = -(-n_rows // R) * R
            occ *= n_rows / padded_rows
            small = padded_rows <= 2 * R
            # mid-band many-overlap schedules (occ >= the stack floor)
            # skip the segment-walk kernels entirely -- single-chip
            # router parity (engine.classify_pallas_route, r5_occ_stack_*)
            if part == 'real' and not small and occ >= _stack_occ_floor():
                from ..ops.stack_synth import (STACK_MIN_NARROW,
                                               build_stack_plan)
                sp0 = build_stack_plan(low)
                stack_plan_memo.append(sp0)
                prefer_stack = (sp0 is not None and sp0.wide is None
                                and sp0.n_narrow >= STACK_MIN_NARROW
                                and sp0.advantage >= _stack_advantage())
            if not prefer_stack and occ < _panel_threshold():
                try:
                    return synthesize_panels_sharded(low, mesh, plan=plan,
                                                     interpret=interpret,
                                                     out_dtype=out_dtype,
                                                     dac_scale=dac_scale)
                except UnsupportedFactor:
                    pass               # outside panel budgets: worklist
            if not prefer_stack and (occ < _sparse_threshold()
                                     or occ < _panel_threshold()):
                return synthesize_sparse_sharded(low, mesh, plan=plan,
                                                 interpret=interpret,
                                                 out_dtype=out_dtype,
                                                 dac_scale=dac_scale)
        except UnsupportedFactor:
            pass
    if part == 'real' and rows_per_tile is None:
        # stack-route criterion mirrors classify_pallas_route: many
        # narrow instances with measured advantage over the subtile
        # kernels, or a schedule the fused kernels cannot lower at all
        from ..engine import _stack_advantage
        from ..ops.lowering import UnsupportedFactor
        from ..ops.stack_synth import STACK_MIN_NARROW, build_stack_plan
        splan = (stack_plan_memo[0] if stack_plan_memo
                 else build_stack_plan(low))
        # unlike the single-chip route, the stacked-table launch has no
        # dense-residual arm, so wide instances disqualify up front
        # (attempting would pay nc re-lowerings only to raise)
        if splan is not None and splan.wide is None and (
                (splan.n_narrow >= STACK_MIN_NARROW
                 and splan.advantage >= _stack_advantage())
                or not low.pallas_ok):
            from ..ops.stack_seq import synthesize_stack_sharded
            try:
                return synthesize_stack_sharded(
                    channels, start, stop, sample_rate, mesh,
                    interpret=interpret, out_dtype=out_dtype,
                    dac_scale=dac_scale)
            except UnsupportedFactor:
                if not low.pallas_ok:
                    raise      # dense cannot lower this schedule either
                pass           # pair/multi-bucket/shard-split: dense
    return synthesize_sharded(low, mesh, rows_per_tile=rows_per_tile,
                              interpret=interpret, out_dtype=out_dtype,
                              dac_scale=dac_scale)

"""Device-resident sequence tables: K schedules uploaded once, played by index.

Lab control systems run *sequences*: a table of pre-compiled waveform
programs selected per shot (randomized benchmarking orders, parameter
sweeps, conditional branches).  The reference's model for this is AWG
waveform memory -- upload everything, then trigger by index.  Here the
analog is a stacked descriptor tensor set: every schedule's (seg, term,
factor) arrays pad to a common shape and stack along a leading K axis, and
``play(k)`` gathers slice ``k`` *inside jit* and runs the synthesis
kernel -- so ``k`` may be a traced value (a ``lax.fori_loop`` counter, a
measurement-dependent branch) and the kernel compiles exactly once for the
whole table.

Zero-padding descriptors is sound by construction: padded segment rows have
``nterm == 0`` (skipped) and padded factor rows sit behind ``nfac`` counts.

Reference parity note: the reference has no sequencer; this is new TPU-
native surface (SURVEY.md section 2.4 -- channel batching generalized to
schedule batching).
"""

from __future__ import annotations

import numpy as np

from .lowering import N_OPS, UnsupportedFactor, W_ARGS, LoweredSchedule

__all__ = ['Sequencer']


def _pad_to(arr: np.ndarray, shape, fill=0) -> np.ndarray:
    widths = [(0, s - a) for a, s in zip(arr.shape, shape)]
    return np.pad(arr, widths, constant_values=fill)


class Sequencer:
    """Stack lowered schedules into one device-resident sequence table.

    All schedules must share channel count, sample count, sample rate and
    bucketing (lower them with the same ``bucket_samples``).  ``play(k)``
    returns the (C, N) synthesis of schedule ``k``; complex (pair-mode)
    tables require every schedule to be lowered with ``part='complex'``.
    """

    def __init__(self, schedules: list[LoweredSchedule]):
        import jax.numpy as jnp

        if not schedules:
            raise ValueError("empty sequence table")
        # slim host snapshots for lazily building sparse worklists
        # (seg bounds + counts only; the big descriptor arrays live solely
        # in the stacked device tensors)
        from types import SimpleNamespace
        self._plan_views = [SimpleNamespace(
            shape=low.shape, n_samples=low.n_samples,
            bucket_samples=low.bucket_samples,
            seg_lo=np.array(low.seg_lo), seg_hi=np.array(low.seg_hi),
            nterm=np.array(low.nterm)) for low in schedules]
        self._sparse_work = {}      # Rs -> (fields, n_tiles)
        first = schedules[0]
        for low in schedules:
            if not low.pallas_ok:
                raise UnsupportedFactor(
                    "schedule uses opcodes or ext sizes outside the kernel")
            if (low.shape[0], low.n_samples, low.sample_rate,
                    low.bucket_samples, low.shape[1]) != (
                    first.shape[0], first.n_samples, first.sample_rate,
                    first.bucket_samples, first.shape[1]):
                raise ValueError(
                    "sequence schedules must share channels, samples, "
                    "sample rate and bucketing")
        pair = [low.amp_im is not None for low in schedules]
        if any(pair) and not all(pair):
            raise ValueError("mix of real and complex (part='complex') "
                             "schedules in one table")
        self.pair = pair[0]

        C, NB = first.shape[0], first.shape[1]
        Sb = max(low.shape[2] for low in schedules)
        T = max(low.shape[3] for low in schedules)
        F = max(low.shape[4] for low in schedules)
        self.shape = (C, NB, Sb, T, F)
        self.n_samples = first.n_samples
        self.sample_rate = first.sample_rate
        self.bucket_samples = first.bucket_samples
        self.n_schedules = len(schedules)

        # joint compact opcode numbering across the whole table
        present = np.unique(np.concatenate(
            [np.unique(low.op) for low in schedules]))
        self.ops_present = tuple(int(o) for o in present)
        remap = np.zeros(N_OPS, np.int32)
        for i, o in enumerate(self.ops_present):
            remap[o] = i

        # merge per-schedule ext side-buffers into ONE table-wide buffer
        # (dedup identical blocks, like lowering._merge_channel_ext does
        # across channels) and rewrite each schedule's ext-offset args to
        # point into it.  Every schedule then reads the SAME buffer:
        # play() gathers stay trivially correct, and packed playback
        # (play_packed) can serve many shots from one SMEM-resident ext
        # block.
        from .lowering import (OP_DRAG_SIN, OP_DRAG_SINX, PALLAS_EXT_MAX)
        ext_merged: list = []
        ext_seen: dict = {}
        args_rw = []
        for low in schedules:
            a = np.array(low.args, copy=True)   # keep lowering's f32
            src = np.asarray(low.ext if low.ext is not None else [],
                             np.float64)
            for pos in np.argwhere(
                    np.isin(low.op, (OP_DRAG_SIN, OP_DRAG_SINX))):
                p = tuple(pos)
                off, ln = int(a[p + (7,)]), int(a[p + (8,)])
                block = src[off:off + ln]
                key = block.tobytes()
                goff = ext_seen.get(key)
                if goff is None:
                    goff = len(ext_merged)
                    ext_merged.extend(block.tolist())
                    ext_seen[key] = goff
                a[p + (7,)] = goff
            args_rw.append(a)
        if len(ext_merged) > PALLAS_EXT_MAX:
            raise UnsupportedFactor(
                f"merged sequence ext buffer ({len(ext_merged)} floats) "
                f"exceeds the kernel budget ({PALLAS_EXT_MAX})")
        # locals only: the big descriptor arrays live solely in the
        # stacked device tensors below (keeping K host copies alive on
        # the instance would roughly double host memory)
        ext_np = np.asarray(ext_merged, np.float32)
        E = max(-(-max(len(ext_merged), 1) // 256) * 256, 256)

        def stack(get, shape, dtype=None, fill=0):
            out = np.stack([_pad_to(np.asarray(get(low)), shape, fill)
                            for low in schedules])
            return jnp.asarray(out if dtype is None else out.astype(dtype))

        # seg slots pad with the sorted-order sentinel (see lowering)
        from .lowering import SEG_SENTINEL
        self.tensors = (
            stack(lambda l: l.seg_lo, (C, NB, Sb),
                  fill=SEG_SENTINEL).reshape(-1, C, NB, 1, Sb),
            stack(lambda l: l.seg_hi, (C, NB, Sb),
                  fill=SEG_SENTINEL).reshape(-1, C, NB, 1, Sb),
            stack(lambda l: np.maximum.accumulate(l.seg_hi, axis=-1),
                  (C, NB, Sb),
                  fill=SEG_SENTINEL).reshape(-1, C, NB, 1, Sb),
            stack(lambda l: l.nterm, (C, NB, Sb)).reshape(-1, C, NB, 1, Sb),
            stack(lambda l: l.nfac, (C, NB, Sb, T)).reshape(
                -1, C, NB, 1, Sb * T),
            stack(lambda l: l.amp, (C, NB, Sb, T)).reshape(
                -1, C, NB, 1, Sb * T),
            stack(lambda l: remap[l.op], (C, NB, Sb, T, F)).reshape(
                -1, C, NB, 1, Sb * T * F),
            stack(lambda l: l.power, (C, NB, Sb, T, F)).reshape(
                -1, C, NB, 1, Sb * T * F),
            stack(lambda l: l.shift_hi, (C, NB, Sb, T, F)).reshape(
                -1, C, NB, 1, Sb * T * F),
            stack(lambda l: l.q32, (C, NB, Sb, T, F, 4)).reshape(
                -1, C, NB, 1, Sb * T * F * 4),
            jnp.asarray(np.stack(
                [_pad_to(a, (C, NB, Sb, T, F, W_ARGS))
                 for a in args_rw])).reshape(
                -1, C, NB, 1, Sb * T * F * W_ARGS),
            # ONE copy, not K: the ext buffer is table-wide after the
            # merge above, and play()'s mode='clip' gather clamps the
            # schedule index to 0 on this axis -- K identical copies
            # wasted K x E x 4 bytes of HBM
            jnp.asarray(np.pad(ext_np, (0, E - ext_np.size))).reshape(
                1, 1, 1, 1, E),
            stack(lambda l: np.stack([l.clip_min, l.clip_max], 1),
                  (C, 2)).reshape(-1, C, 1, 1, 2),
        )
        self.amp_im = (stack(lambda l: l.amp_im, (C, NB, Sb, T)).reshape(
            -1, C, NB, 1, Sb * T) if self.pair else None)

        # shot-packed playback (play_packed) gate: one grid step serves
        # MANY shots, so the per-channel clip pair must be table-uniform
        # (ext is always shared -- merged above)
        self._clip_uniform = all(
            np.array_equal(low.clip_min, first.clip_min)
            and np.array_equal(low.clip_max, first.clip_max)
            for low in schedules)
        self._packed_tensors_cache = None
        self._packed_plans = {}
        self._palettes = {}

    def describe(self) -> str:
        """One-line table summary (debugging / logging aid)."""
        C, NB, Sb, T, F = self.shape
        return (f"{self.n_schedules} schedules x {C} ch x "
                f"{self.n_samples} samples, {NB} bucket(s), padded "
                f"Sb={Sb} T={T} F={F}, opcodes {list(self.ops_present)}, "
                f"{'complex' if self.pair else 'real'}")

    def play(self, k, rows_per_tile: int | None = None,
             interpret: bool = False, out_dtype=None, dac_scale=32767.0):
        """Synthesize schedule ``k`` (int or traced int32) -> (C, N).

        Safe inside jit/scan: the gather and the kernel trace once for the
        whole table.  ``out_dtype=jnp.bfloat16`` narrows the store;
        ``jnp.int16`` emits exact DAC codes scaled by scalar/per-channel
        ``dac_scale`` (see synthesize_device).  Pair-mode tables require
        f32.
        """
        import jax.numpy as jnp

        from .pallas_synth import _run_kernel

        if out_dtype is None:
            out_dtype = jnp.float32
        if self.pair and jnp.dtype(out_dtype) != jnp.dtype(jnp.float32):
            raise ValueError(
                "pair-mode (complex) synthesis requires f32 output")

        C, NB, Sb, T, F = self.shape
        from .pallas_synth import dac_scale_tensor
        scale = dac_scale_tensor(out_dtype, dac_scale, C)
        if rows_per_tile is None:
            from .pallas_synth import default_rows_per_tile
            rows_per_tile = default_rows_per_tile(self.n_samples,
                                                  self.bucket_samples, NB)
        R = rows_per_tile
        tile = R * 128
        if NB > 1 and self.bucket_samples % tile != 0:
            raise ValueError(
                f"bucket_samples {self.bucket_samples} must be a multiple "
                f"of the tile ({tile})")
        G = max(self.bucket_samples // tile, 1)
        n_rows = -(-self.n_samples // 128)
        n_rows = -(-n_rows // R) * R
        # mode='clip': out-of-range indices clamp to the table edges (the
        # default 'fill' mode would synthesize from zero/NaN descriptors)
        sel = [jnp.take(t, k, axis=0, mode='clip') for t in self.tensors]
        amp_im = (jnp.take(self.amp_im, k, axis=0, mode='clip')
                  if self.amp_im is not None else None)
        out = _run_kernel(
            jnp.zeros((1, 1, 1, 1), jnp.int32), *sel, amp_im, scale,
            S=Sb, T=T, F=F, R=R, n_rows=n_rows, tiles_per_bucket=G,
            ops_present=self.ops_present, interpret=interpret,
            out_dtype=out_dtype)
        if self.pair:
            re, im = out
            out = re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)
        return out.reshape(C, n_rows * 128)[:, :self.n_samples]

    def play_many(self, ks, rows_per_tile: int | None = None,
                  sparse: bool = False, Rs: int = 32,
                  interpret: bool = False, out_dtype=None,
                  dac_scale=32767.0):
        """Synthesize a whole shot sequence in ONE dispatch -> (len(ks), C, N).

        ``jax.vmap`` over the shot-index vector turns the per-shot gather +
        kernel into a single batched Pallas launch (vmap prepends a grid
        dimension), so N shots cost one dispatch: the per-dispatch floor
        (~15-20 us on the dev tunnel, the whole cost of a 10 us schedule)
        amortizes to nothing.  This is the device analog of the reference
        lab loop `for shot: wave.sample()` -- compile once, run the table.

        Memory: the result is (n_shots, C, N) -- size shots accordingly
        (int16 ``out_dtype`` halves it; the dev tunnel aborts >0.6 GB).
        No reduction happens in-jit by design: reducing a Pallas output
        inside the same jit wedges the dev tunnel (NOTES.md round 3).
        """
        import jax
        import jax.numpy as jnp
        ks = jnp.asarray(ks, jnp.int32)
        if sparse:
            if out_dtype is not None:
                # surface the gap instead of silently returning f32 to a
                # caller who sized their shot batch for int16 codes
                raise NotImplementedError(
                    "play_many(sparse=True) is f32-only (play_sparse has "
                    "no narrowed store); use sparse=False for out_dtype")
            fn = lambda k: self.play_sparse(k, Rs=Rs, interpret=interpret)  # noqa: E731
        else:
            fn = lambda k: self.play(k, rows_per_tile=rows_per_tile,       # noqa: E731
                                     interpret=interpret,
                                     out_dtype=out_dtype,
                                     dac_scale=dac_scale)
        return jax.vmap(fn)(ks)

    def _sparse_table(self, Rs: int):
        """Stacked per-schedule sparse worklists, padded to one length.

        Padding entries point at each plan's scratch tile with an empty
        segment range, so a padded slot is a no-op exactly like
        single-schedule worklist padding."""
        import jax.numpy as jnp

        from .sparse_synth import build_sparse_plan, next_pow2

        plans = [build_sparse_plan(v, Rs=Rs) for v in self._plan_views]
        n_tiles = plans[0].n_tiles
        Kw = next_pow2(max(p.work_c.shape[0] for p in plans))

        def pad(p, name, fill):
            a = getattr(p, name)
            return np.pad(a, (0, Kw - a.shape[0]), constant_values=fill)

        fields = {}
        for name, fill in (('work_c', 0), ('work_b', 0),
                           ('work_t', n_tiles), ('work_o', n_tiles),
                           ('work_s0', 0), ('work_s1', 0)):
            fields[name] = jnp.asarray(
                np.stack([pad(p, name, fill) for p in plans]))
        return fields, n_tiles

    def play_sparse(self, k, Rs: int = 32, interpret: bool = False):
        """Sparse-worklist analog of play(): schedule ``k`` (int or
        traced) runs the live-subtile kernel; the worklist table gathers
        by ``k`` inside jit, so the kernel compiles once for the whole
        table.  Real single-bucket tables only (the flagship layout).
        Measured on v5e: 132.8 GS/s vs 67.0 for play() on the flagship
        table, bit-identical output (benchmarks/tpu_state.json
        r3_seq_sparse_play)."""
        import jax.numpy as jnp

        from .sparse_synth import _run_sparse

        if self.pair:
            raise UnsupportedFactor("sparse sequence play is real-only")
        C, NB, Sb, T, F = self.shape
        if NB != 1:
            raise UnsupportedFactor(
                "sparse sequence play is single-bucket")
        if Rs not in self._sparse_work:
            self._sparse_work[Rs] = self._sparse_table(Rs)
        fields, n_tiles = self._sparse_work[Rs]

        # hmax (tensors[2]) is the dense prologue's bisect key; sparse
        # plans already encode the per-subtile ranges
        sel = [jnp.take(t, k, axis=0, mode='clip')
               for t in self.tensors[:2] + self.tensors[3:]]
        work = [jnp.take(fields[n], k, axis=0, mode='clip')
                for n in ('work_c', 'work_b', 'work_t', 'work_o',
                          'work_s0', 'work_s1')]
        out = _run_sparse(*work, *sel, None, None,
                          S=Sb, T=T, F=F, Rs=Rs, n_tiles=n_tiles,
                          ops_present=self.ops_present,
                          interpret=interpret)
        return out.reshape(C, -1)[:, :self.n_samples]

    # ------------------------------------------------------------------
    # Shot-packed playback: the whole shot sequence rides ONE panel-kernel
    # launch.  play_many amortizes the DISPATCH (one jit call) but still
    # pays one grid step per shot (~2.5 us of step machinery + full-tile
    # factor evaluation on the dev v5e, benchmarks r4_seq_amortized); here
    # shots pack along the panel ROW axis, so grid steps scale with output
    # panels (a few) and factor math runs only on each shot's live
    # subtiles.  The descriptor tables concatenate along the SEGMENT axis
    # once (device-resident, like AWG waveform memory); per shot only the
    # worklist's segment RANGES change, gathered from a per-schedule table
    # by the (traced) shot indices -- so ks may come from measurement
    # feedback and the kernel still compiles exactly once.
    # ------------------------------------------------------------------

    def _packed_tensors(self):
        """Descriptor tensors concatenated along the segment axis:
        schedule ``k`` occupies segment rows [k*Sb, (k+1)*Sb)."""
        import jax.numpy as jnp
        if self._packed_tensors_cache is not None:
            return self._packed_tensors_cache
        C, NB, Sb, T, F = self.shape
        K = self.n_schedules

        def seg_axis(t, trail):
            # (K, C, NB, 1, Sb*trail) -> (C, NB, 1, (K*Sb)*trail)
            x = t.reshape(K, C, NB, Sb, trail)
            x = jnp.transpose(x, (1, 2, 0, 3, 4))
            return x.reshape(C, NB, 1, K * Sb * trail)

        t = self.tensors                    # hmax (t[2]) is not needed:
        packed = (                          # packed items carry explicit
            seg_axis(t[0], 1),              # per-item segment ranges
            seg_axis(t[1], 1), seg_axis(t[3], 1),
            seg_axis(t[4], T), seg_axis(t[5], T),
            seg_axis(t[6], T * F), seg_axis(t[7], T * F),
            seg_axis(t[8], T * F), seg_axis(t[9], T * F * 4),
            seg_axis(t[10], T * F * W_ARGS),
            t[11][0],                       # ext (uniform; gated)
            t[12][0],                       # clip (uniform; gated)
        )
        self._packed_tensors_cache = packed
        return packed

    def _packed_plan(self, n_shots: int, Rs: int):
        """Static worklist for an n_shots packed launch (cached).

        Items enumerate (channel, shot, union-live subtile): a subtile is
        in the union when ANY table schedule has segments overlapping it,
        so the item list is independent of which schedule each shot plays
        -- only the per-item segment ranges (``rng0``/``rng1``, indexed by
        schedule) vary, and those gather inside jit."""
        key = (n_shots, Rs)
        cached = self._packed_plans.get(key)
        if cached is not None:
            return cached
        import jax.numpy as jnp

        from types import SimpleNamespace
        from .sparse_synth import (PANEL_ROWS, PANEL_WORK_SMEM_BUDGET,
                                   next_pow2)
        C, NB, Sb, T, F = self.shape
        tile = Rs * 128
        n_rows_shot = -(-self.n_samples // 128)
        tps = -(-n_rows_shot // Rs)               # subtiles per shot
        bases = np.arange(tps, dtype=np.int64) * tile
        r0 = np.zeros((self.n_schedules, C, tps), np.int32)
        r1 = np.zeros((self.n_schedules, C, tps), np.int32)
        for k, v in enumerate(self._plan_views):
            for c in range(C):
                lo = np.asarray(v.seg_lo[c, 0], np.int64)
                hi = np.asarray(v.seg_hi[c, 0], np.int64)
                hmax = np.maximum.accumulate(hi)
                s0 = np.searchsorted(hmax, bases, side='right')
                s1 = np.maximum(
                    np.searchsorted(lo, bases + tile, side='left'), s0)
                r0[k, c] = k * Sb + s0
                r1[k, c] = k * Sb + s1
        live = (r1 > r0).any(axis=0)              # (C, tps) union
        cs, ts = np.nonzero(live)
        n_union = len(cs)
        s_idx = np.repeat(np.arange(n_shots), n_union)
        c_arr = np.tile(cs, n_shots)
        t_arr = np.tile(ts, n_shots)
        wo = s_idx * tps + t_arr                  # shot-major output rows
        total_rows = max(n_shots * tps * Rs, Rs)
        P = max(Rs, min(PANEL_ROWS, total_rows))
        P = (P // Rs) * Rs
        NP = -(-total_rows // P)
        # exact-fit panels (same rule as build_panel_plan): the kernel is
        # store-bound, so padding rows past total_rows are wasted stores
        P = max(Rs, -(-(-(-total_rows // NP)) // Rs) * Rs)
        slot = c_arr * NP + (wo * Rs) // P        # NB == 1
        order = np.argsort(slot, kind='stable')
        n_items = n_shots * n_union
        Kw = next_pow2(n_items)
        if (4 * Kw + C * NP + 1) * 4 > PANEL_WORK_SMEM_BUDGET:
            raise UnsupportedFactor(
                f"packed worklist ({n_items} items) exceeds the panel "
                "kernel's SMEM budget -- play in smaller shot chunks")
        start = np.zeros(C * NP + 1, np.int64)
        np.add.at(start, slot + 1, 1)
        start = np.cumsum(start)
        pad = Kw - n_items

        def col(a):
            return jnp.asarray(np.concatenate(
                [np.asarray(a)[order],
                 np.zeros(pad, np.int64)]).astype(np.int32))

        # the segment ranges depend only on (schedule, union subtile) --
        # store the small (K, n_union) tables plus a per-item union
        # index instead of duplicating them n_shots times (same gather
        # cost in jit, ~n_shots x less device memory)
        u_of = (np.arange(n_items) % n_union)[order]
        plan = SimpleNamespace(
            start=jnp.asarray(start.astype(np.int32)),
            wt=col(t_arr), wo=col(wo),
            shot_of=jnp.asarray(s_idx[order].astype(np.int32)),
            u_of=jnp.asarray(u_of.astype(np.int32)),
            rng0_u=jnp.asarray(r0[:, cs, ts]),
            rng1_u=jnp.asarray(r1[:, cs, ts]),
            pad=pad, n_items=n_items, n_union=n_union,
            P=P, NP=NP, tps=tps, Rs=Rs)
        self._packed_plans[key] = plan
        return plan

    def play_replay(self, ks, interpret: bool = False, out_dtype=None,
                    dac_scale=32767.0,
                    max_palette_bytes: int = 2 ** 30):
        """Replay shots from device-materialized waveform memory
        -> (len(ks), C, N).

        The K table schedules synthesize ONCE into a (K, C, N) device
        palette -- exactly an AWG's waveform-memory upload -- and each
        shot is then a palette row gather, so per-shot device cost is
        one row copy (~n_samples * itemsize / store-bandwidth; 10k f32
        samples ~ 60 ns on v5e) regardless of schedule complexity.
        ``ks`` may be traced; out-of-range indices clamp like play().
        Use play_packed/play_many instead when the palette
        (K * C * N * itemsize bytes, capped by ``max_palette_bytes``)
        does not fit device memory."""
        import jax.numpy as jnp
        if out_dtype is None:
            out_dtype = jnp.float32
        itemsize = jnp.dtype(jnp.complex64 if self.pair
                             else out_dtype).itemsize
        need = self.n_schedules * self.shape[0] * self.n_samples * itemsize
        if need > max_palette_bytes:
            raise UnsupportedFactor(
                f"palette ({need >> 20} MiB) exceeds max_palette_bytes "
                "-- use play_packed/play_many for this table")
        # dac_scale may be scalar OR length-C (play supports both) --
        # key on the bytes so per-channel scales don't crash on float()
        key = (str(jnp.dtype(out_dtype)),
               np.asarray(dac_scale, np.float32).tobytes(), interpret)
        pal = self._palettes.get(key)
        if pal is None:
            pal = jnp.stack([
                self.play(k, interpret=interpret, out_dtype=out_dtype,
                          dac_scale=dac_scale)
                for k in range(self.n_schedules)])
            self._palettes[key] = pal
        ks = jnp.asarray(ks, jnp.int32)
        return jnp.take(pal, ks, axis=0, mode='clip')

    def play_packed(self, ks, Rs: int = 8, interpret: bool = False,
                    out_dtype=None, dac_scale=32767.0):
        """Synthesize the shot sequence ``ks`` in ONE kernel launch
        -> (len(ks), C, N).

        Real single-bucket tables with uniform ext/clip only.  ``ks`` may
        be traced (measurement-dependent); out-of-range indices clamp to
        the table edges like :meth:`play`.  ``out_dtype=jnp.int16`` emits
        exact DAC codes (halves the result bytes -- size big shot batches
        with it).  Memory: the result is (n_shots, C, N)."""
        import jax.numpy as jnp

        from .lowering import PALLAS_SMEM_BUDGET, _pallas_desc_bytes
        from .pallas_synth import dac_scale_tensor
        from .sparse_synth import _run_panels

        if out_dtype is None:
            out_dtype = jnp.float32
        if self.pair:
            raise UnsupportedFactor("packed sequence play is real-only")
        C, NB, Sb, T, F = self.shape
        if NB != 1:
            raise UnsupportedFactor("packed sequence play is single-bucket")
        if not self._clip_uniform:
            raise UnsupportedFactor(
                "packed sequence play needs uniform clip rails")
        if _pallas_desc_bytes(self.n_schedules * Sb, T, F) \
                > PALLAS_SMEM_BUDGET:
            raise UnsupportedFactor(
                "concatenated descriptor table exceeds the kernel SMEM "
                "budget -- fewer/smaller schedules per table")
        ks = jnp.asarray(ks, jnp.int32)
        n_shots = int(ks.shape[0])
        plan = self._packed_plan(n_shots, Rs)
        scale = dac_scale_tensor(out_dtype, dac_scale, C)
        # per-item segment ranges: schedule ks[shot]'s range for this
        # item's subtile, offset into the segment-concatenated table
        sched = jnp.clip(ks, 0, self.n_schedules - 1)[plan.shot_of]
        zpad = jnp.zeros(plan.pad, jnp.int32)
        ws0 = jnp.concatenate([plan.rng0_u[sched, plan.u_of], zpad])
        ws1 = jnp.concatenate([plan.rng1_u[sched, plan.u_of], zpad])
        out = _run_panels(
            plan.start, plan.wt, plan.wo, ws0, ws1,
            *self._packed_tensors(), None, scale,
            S=self.n_schedules * Sb, T=T, F=F, Rs=Rs, P=plan.P,
            NP=plan.NP, ops_present=self.ops_present,
            interpret=interpret, out_dtype=out_dtype)
        rows_shot = plan.tps * Rs
        out = out.reshape(C, -1)[:, :n_shots * rows_shot * 128]
        out = out.reshape(C, n_shots, rows_shot * 128)[..., :self.n_samples]
        return jnp.transpose(out, (1, 0, 2))

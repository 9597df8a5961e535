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
        self._sparse_work = None
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

        e_max = max((int(low.ext.size) if low.ext is not None else 0)
                    for low in schedules)
        E = max(-(-max(e_max, 1) // 256) * 256, 256)

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
            stack(lambda l: l.args, (C, NB, Sb, T, F, W_ARGS)).reshape(
                -1, C, NB, 1, Sb * T * F * W_ARGS),
            stack(lambda l: (np.pad(
                np.asarray(l.ext if l.ext is not None else np.zeros(0),
                           np.float32), (0, E - (l.ext.size if l.ext is not
                                                 None else 0)))), (E,)
                  ).reshape(-1, 1, 1, 1, E),
            stack(lambda l: np.stack([l.clip_min, l.clip_max], 1),
                  (C, 2)).reshape(-1, C, 1, 1, 2),
        )
        self.amp_im = (stack(lambda l: l.amp_im, (C, NB, Sb, T)).reshape(
            -1, C, NB, 1, Sb * T) if self.pair else None)

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
        if self.pair and out_dtype != jnp.float32:
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
                  interpret: bool = False, out_dtype=None):
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
            fn = lambda k: self.play_sparse(k, Rs=Rs, interpret=interpret)  # noqa: E731
        else:
            fn = lambda k: self.play(k, rows_per_tile=rows_per_tile,       # noqa: E731
                                     interpret=interpret,
                                     out_dtype=out_dtype)
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
        if self._sparse_work is None or self._sparse_work[2] != Rs:
            fields, n_tiles = self._sparse_table(Rs)
            self._sparse_work = (fields, n_tiles, Rs)
        fields, n_tiles, _ = self._sparse_work

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

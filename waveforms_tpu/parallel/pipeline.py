"""The full production step, sharded: synthesize -> predistort -> demodulate.

One call builds everything a control stack runs per experiment shot:

1. fused kernel synthesis of all channels over a ('channel', 'time') mesh,
2. per-channel IIR pre-compensation (associative scan; the carry crosses
   time shards over ICI collectives inserted by the SPMD partitioner),
3. optional MXU readout demodulation against a tone comb (psum over the
   sharded sample axis).

The per-shot flow mirrors lab usage of the reference (sample ->
``predistort``, ``/root/reference/waveforms/distortion.py:289-337`` ->
demodulate via ``utils.getFTMatrix``, ``utils.py:35-84``) as one fused
device program.  ``make_step`` returns a jitted callable so repeated
shots pay zero retrace;
descriptor tensors live on device via :class:`DeviceSchedule` semantics
(sharded by :func:`waveforms_tpu.parallel.shard_schedule`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.lowering import LoweredSchedule
from .mesh import synthesize_sharded

__all__ = ['make_step', 'run_step', 'run_sequence']


def _make_postfilter(ba_filters):
    """Shared (b, a)-cascade pre-compensation closure (or None).

    One construction site for the lfiltic zero-history initial state and
    the vmapped device lfilter -- make_step and run_sequence previously
    carried verbatim copies."""
    if not ba_filters:
        return None
    from scipy.signal import lfiltic

    from ..distortion import combine_filters
    b, a = combine_filters(ba_filters)
    zi = jnp.asarray(lfiltic(b, a, np.zeros(len(a) - 1),
                             np.zeros(len(b) - 1)))

    def apply(sig):
        from ..ops.iir import lfilter
        return jax.vmap(lambda x: lfilter(b, a, x, zi=zi)[0])(sig)

    return apply


def make_step(low: LoweredSchedule, mesh, ba_filters=None, demod_freqs=None,
              rows_per_tile: int | None = None, interpret: bool = False):
    """Build the jitted sharded production step for a lowered schedule.

    ``ba_filters``: list of (b, a) pre-compensation filters (combined and
    applied per channel).  ``demod_freqs``: tone frequencies for readout
    demodulation (None skips it).  Returns ``step() -> (signals, iq)`` with
    ``signals`` sharded P('channel', 'time') and ``iq`` (C, n_tones) or
    None.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    fs = low.sample_rate
    n = low.n_samples

    filt = _make_postfilter(ba_filters)

    demod = None
    if demod_freqs is not None:
        from ..ops.demod import demod_matrix
        # shard the sample axis when it divides the time shards (the psum
        # then reduces over ICI); replicate otherwise
        spec = P('time', None) if n % mesh.shape['time'] == 0 else P(None,
                                                                     None)
        demod = jax.device_put(demod_matrix(demod_freqs, n, fs),
                               NamedSharding(mesh, spec))

    def postprocess(sig):
        if filt is not None:
            sig = filt(sig)
        iq = None
        if demod is not None:
            from ..ops.demod import demodulate
            iq = demodulate(sig, demod)
        return sig, iq

    post = jax.jit(postprocess)

    def step():
        sig = synthesize_sharded(low, mesh, rows_per_tile=rows_per_tile,
                                 interpret=interpret)
        return post(sig)

    return step


def run_step(channels, start, stop, sample_rate, mesh, ba_filters=None,
             demod_freqs=None, **kw):
    """Lower + build + run one sharded production step."""
    from ..ops.lowering import lower_schedule
    low = lower_schedule(channels, start, stop, sample_rate)
    return make_step(low, mesh, ba_filters=ba_filters,
                     demod_freqs=demod_freqs, **kw)()


def run_sequence(seq, indices, ba_filters=None, demod_freqs=None,
                 rows_per_tile: int | None = None, interpret: bool = False):
    """Run a shot table through a :class:`~waveforms_tpu.ops.Sequencer`.

    ``indices`` is the per-shot schedule-index array (int32, length =
    number of shots; e.g. a randomized-benchmarking order).  Each shot
    synthesizes via ``seq.play`` (one kernel compile for the whole table),
    applies the optional pre-compensation IIR and demodulates against the
    tone comb -- a ``lax.scan`` carries only the per-shot IQ points, so
    memory stays bounded at one shot's signal regardless of shot count.

    Returns ``iq`` of shape (n_shots, C, n_tones) complex when
    ``demod_freqs`` is given, otherwise the stacked signals
    (n_shots, C, N).
    """
    filt = _make_postfilter(ba_filters)

    demod = None
    if demod_freqs is not None:
        from ..ops.demod import demod_matrix
        demod = jnp.asarray(demod_matrix(demod_freqs, seq.n_samples,
                                         seq.sample_rate))

    @jax.jit
    def shots(idx):
        def one(carry, k):
            sig = seq.play(k, rows_per_tile=rows_per_tile,
                           interpret=interpret)
            if filt is not None:
                sig = filt(sig)
            if demod is not None:
                # two real MXU matmuls, no complex64 intermediate (the
                # dtype the dev tunnel cannot transfer) in the hot loop
                from ..ops.demod import demodulate
                out = demodulate(sig, demod)
            else:
                out = sig
            return carry, out

        _, outs = jax.lax.scan(one, 0, idx)
        return outs

    return shots(jnp.asarray(indices, dtype=jnp.int32))

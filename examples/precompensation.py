"""Transmission-line precompensation, end to end on device.

A flux line's step response droops as 1 - sum_i A_i exp(-t/tau_i); the
inverse (pre-compensation) filter restores a square step at the qubit.
The reference runs scipy's sequential lfilter on the host
(/root/reference/waveforms/distortion.py:289-337); here the whole
pipeline -- synthesis, IIR precompensation, verification filter -- runs
on the accelerator:

* synthesis: the fused kernel via ``waveforms_tpu.synthesize``
* precompensation: ``ops.filter_zpk`` -- the FACTORED-form cascade of
  first-order doubling scans.  Keep zpk end-to-end: clustered near-unit
  poles make the expanded (b, a) polynomial an ill-conditioned encoding
  that no realization can recover beyond ~1e-6 (see ops/iir.py).

Run: python examples/precompensation.py
"""

import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from waveforms_tpu import square, synthesize
from waveforms_tpu.distortion import exp_decay_filter
from waveforms_tpu.ops.iir import filter_zpk


def main():
    fs = 2e9
    amps, taus = [0.02, 0.008, 0.004], [2e-6, 9e-6, 30e-6]

    # the line model (forward) and its inverse (pre-compensation), both
    # kept in factored zpk form
    fwd = exp_decay_filter(amps, taus, fs, output='zpk')
    inv = exp_decay_filter(amps, taus, fs, inv=True, output='zpk')

    # a 100 us flux pulse, synthesized on device (f32 kernel path)
    sig_np = np.asarray(synthesize(
        [0.5 * (square(60e-6, edge=50e-9) >> 50e-6)], 0, 100e-6, fs)[0])

    # Slow poles (tau up to 30 us at 2 GS/s) carry internal gains of
    # ~1/(1-p) ~ 6e4, so the FILTERING tier runs in f64 -- the 1e-9 tier
    # works on TPU too (docs/PRECISION.md).  The x64 flag flips only
    # AFTER synthesis: a process-global x64 during Pallas kernel tracing
    # breaks dtype promotion inside the kernel.
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    sig = jnp.asarray(sig_np, jnp.float64)

    pre = filter_zpk(*inv, sig)                    # what the AWG plays
    at_qubit = filter_zpk(*fwd, pre)               # what the line delivers

    err = np.abs(np.asarray(at_qubit) - sig_np)
    mid = slice(10_000, 190_000)
    print(f"samples: {sig.shape[0]}")
    print(f"max |precompensated - ideal| mid-pulse: {err[mid].max():.2e}")
    print(f"uncompensated droop would be ~{sum(amps):.3f}")
    assert err[mid].max() < 1e-4


if __name__ == '__main__':
    main()

"""End-to-end tour: build -> synthesize -> distort -> stream -> demodulate.

Runs on any backend (TPU uses the compiled kernel; elsewhere the native C++
engine or the oracle).  Prints a short report; no plotting dependencies.

    python examples/full_pipeline.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from waveforms_tpu import (cosPulse, drag_sin, gaussian, mixing, square,
                           synthesize, wave_eval, zero)
from waveforms_tpu.distortion import exp_decay_filter
from waveforms_tpu.ops.lowering import lower_schedule


def main():
    import os
    if os.environ.get('WFTPU_EXAMPLE_CPU'):
        # must precede any backend-initializing jax call on this platform
        import jax
        jax.config.update('jax_platforms', 'cpu')
    fs = 2e9
    start, stop = 0.0, 4e-6

    # -- 1. symbolic schedule: XY drive, flux pulse, multi-tone DRAG -------
    xy = zero()
    for k, phase in enumerate([0, np.pi / 2, np.pi]):
        I, _ = mixing(0.5 * cosPulse(20e-9) >> (0.5e-6 + k * 1e-6),
                      freq=-150e6, phase=phase, DRAGScaling=1e-10)
        xy += I
    flux = 0.3 * (square(200e-9, edge=20e-9) >> 1.2e-6)
    mt = drag_sin(0.15e9, 22.3e-9, plateau=6.1e-9, delta=3e6,
                  block_freq=(151e6, -83e6), phase=0.1) >> 2.5e-6
    dsl = wave_eval("0.2 * (gaussian(3e-08) >> 3.2e-06) * cos(2*pi*2e8)")
    channels = [xy, flux, mt, dsl]

    # -- 2. batched synthesis (engine auto-selected) -----------------------
    try:
        out = np.asarray(synthesize(channels, start, stop, fs))
    except Exception as exc:  # unhealthy accelerator: use the host engine
        print(f"device synthesis unavailable ({type(exc).__name__}); "
              "using the native host engine")
        out = np.asarray(synthesize(channels, start, stop, fs,
                                    engine='native'))
    t = np.arange(start, stop, 1 / fs)
    print(f"synthesized {out.shape[0]} channels x {out.shape[1]} samples")
    for i, ch in enumerate(channels):
        ref = np.real(ch(t))
        err = np.abs(out[i] - ref).max() / max(np.abs(ref).max(), 1e-30)
        print(f"  ch{i}: max |synth - oracle| / scale = {err:.2e}")

    # -- 3. flux-line pre-compensation (device IIR or scipy) ---------------
    inv = exp_decay_filter(0.05, 100e-9, fs, inv=True)
    from waveforms_tpu.distortion import predistort
    pre = predistort(out[1], [inv])
    print(f"pre-compensated flux channel: peak {np.abs(pre).max():.3f}")

    # -- 4. streaming with carried filter state ----------------------------
    from scipy.signal import butter, tf2sos
    sos = tf2sos(*butter(3, 0.02))
    low = lower_schedule(channels, start, stop, fs)
    try:
        import jax

        from waveforms_tpu.ops.pallas_synth import DeviceSchedule
        from waveforms_tpu.ops.streaming import synthesize_stream
        dev = DeviceSchedule(low)
        interpret = jax.default_backend() != 'tpu'
        n = 0
        for chunk in synthesize_stream(dev, chunk_rows=16,
                                       filters=(sos, 0.0),
                                       interpret=interpret):
            n += chunk.shape[1]
        print(f"streamed {n} filtered samples in chunks")
    except Exception as exc:
        print(f"streaming demo skipped: {exc}")

    # -- 5. readout demodulation (MXU matmul) -------------------------------
    from waveforms_tpu.ops.demod import demod_matrix, demodulate
    try:
        m = demod_matrix([150e6, 200e6], out.shape[1], fs)
        iq = np.asarray(demodulate(out, m))
        print("demodulated IQ magnitudes:",
              np.round(np.abs(iq), 4).tolist())
    except Exception as exc:
        print(f"demodulation demo skipped: {type(exc).__name__}")


if __name__ == '__main__':
    main()

"""Pick a precision tier per use case.

Three device tiers over the same schedule (plus the numpy oracle):

  f32 kernels      ~7.7e-7 relative, 130+ GS/s   -- DAC output, shaping
  double-f32 tier  <=1e-9 relative, kernel speed -- simulation cross-checks
                   (full production opcode set incl. erf edges, gaussian
                   derivatives, cosh, mollifier bumps, all chirps)
  XLA x64          ~4e-10 relative, ~1.7 GS/s    -- complex amps, audits

Run: python examples/precision_tiers.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from waveforms_tpu import cos, gaussian, mixing, synthesize

FS = 2e9
SPAN = 8.192e-6


def main():
    import os
    if os.environ.get('WFTPU_EXAMPLE_CPU'):
        # must precede any backend-initializing jax call on this platform
        import jax
        jax.config.update('jax_platforms', 'cpu')
    I, Q = mixing(0.5 * gaussian(200e-9) >> 2e-6, freq=-150e6,
                  DRAGScaling=1e-10)
    chans = [I + (0.3 * gaussian(4e-7) * cos(2 * np.pi * 3e7) >> 5e-6)]

    oracle = synthesize(chans, 0.0, SPAN, FS, engine='numpy')
    scale = np.abs(oracle).max()

    f32 = np.asarray(synthesize(chans, 0.0, SPAN, FS, engine='pallas'))
    print(f"f32 kernel tier:    {np.abs(f32 - oracle).max() / scale:.2e}")

    hi = synthesize(chans, 0.0, SPAN, FS, engine='pallas',
                    precision='double')
    print(f"double-f32 tier:    {np.abs(hi - oracle).max() / scale:.2e} "
          f"(dtype {hi.dtype})")

    codes = None
    try:
        import jax.numpy as jnp

        from waveforms_tpu.ops.lowering import lower_schedule
        from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                    synthesize_device)
        low = lower_schedule(chans, 0.0, SPAN, FS)
        codes = np.asarray(synthesize_device(
            DeviceSchedule(low), out_dtype=jnp.int16,
            interpret=True))
        expect = np.clip(np.round(f32 * 32767.0), -32768, 32767)
        print(f"int16 DAC codes:    max off-by "
              f"{np.abs(codes - expect).max()} code(s) vs round(f32*fs)")
    except Exception as exc:
        print(f"int16 path skipped: {exc}")


if __name__ == '__main__':
    main()

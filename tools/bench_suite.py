"""Full baseline sweep: every measured reference config from BASELINE.md.

Prints one JSON line per config with the measured rate and the speedup over
the reference's single-core CPU measurement.  Runs the Pallas kernel on a
TPU backend and the native C++ engine elsewhere (``--native`` forces the
host engine; ``--cpu`` forces the CPU jax backend first).

    python tools/bench_suite.py [--native] [--cpu]

The driver-facing headline benchmark stays in bench.py; this suite exists
so every BASELINE.md row can be re-measured in one command.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402

# (name, reference rate in samples/s, from BASELINE.md "Measured baseline")
REF = {
    'readme_demo_10k': 100e6,
    'xy_z_pair_200k': 0.7e9,
    'dense_chirp_2M': 0.031e9,
    'flux_iir_1M': 0.142e9,
    'vstack_1000x200k': 8.2e6,
    'overlap100_drag_2200': 0.5e6,
}


def build(name):
    """Return (channels, start, stop, fs) for a BASELINE.md config."""
    from waveforms_tpu import (WaveVStack, chirp, cosPulse, drag, gaussian,
                               mixing, square, zero)
    rng = np.random.default_rng(7)
    if name == 'readme_demo_10k':
        ch = zero()
        for k in range(3):
            I, _ = mixing(0.5 * cosPulse(20e-9) >> (k * 3e-6 + 1e-6),
                          freq=-20e6, DRAGScaling=0.2)
            ch += I
        return [ch], -1e-6, 9.001e-6, 1e9
    if name == 'xy_z_pair_200k':
        I, _ = mixing(0.5 * cosPulse(20e-9) >> 50e-6, freq=-150e6,
                      DRAGScaling=1e-10)
        z = 0.3 * (square(80e-9, edge=10e-9) >> 30e-6)
        return [I, z], 0, 100e-6, 2e9
    if name == 'dense_chirp_2M':
        return [gaussian(1e-3) * chirp(1e6, 500e6, 1e-3, 0.0, 'linear')], \
            0, 1e-3, 2e9
    if name == 'vstack_1000x200k':
        wl = [(0.5 * cosPulse(50e-9) >> o)
              for o in rng.uniform(0, 99e-6, 1000)]
        return [WaveVStack(wl)], 0, 100e-6, 2e9
    if name == 'overlap100_drag_2200':
        ch = zero()
        for _ in range(100):
            ch += drag(100e6, 300e-9, plateau=200e-9, delta=2e6,
                       block_freq=None, phase=rng.uniform(0, 6),
                       t0=0.0) >> rng.uniform(0, 0.6e-6)
        return [ch], 0, 1.1e-6, 2e9
    raise KeyError(name)


def time_engine(chans, start, stop, fs, use_pallas, reps):
    from waveforms_tpu.ops.lowering import lower_schedule
    low = lower_schedule(chans, start, stop, fs)
    n = len(chans) * low.n_samples
    if use_pallas:
        import jax
        import jax.numpy as jnp

        from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
            _run_kernel, default_rows_per_tile
        from waveforms_tpu.utils.profiling import measure_device
        dev = DeviceSchedule(low)
        jax.block_until_ready(dev.tensors)
        C, NB, S, T, F = dev.shape
        R = default_rows_per_tile(dev.n_samples, dev.bucket_samples, NB)
        n_rows = -(-dev.n_samples // 128)
        n_rows = -(-n_rows // R) * R
        kw = dict(S=S, T=T, F=F, R=R, n_rows=n_rows,
                  tiles_per_bucket=max(dev.bucket_samples // (R * 128), 1),
                  ops_present=dev.ops_present, interpret=False)
        row0 = jnp.zeros((1, 1, 1, 1), jnp.int32)

        def run():
            return _run_kernel(row0, *dev.tensors, **kw)

        run().block_until_ready()              # compile outside the trace
        # device-event timing: wall clock is unreliable on the tunneled
        # dev chip (see NOTES.md)
        dtm = measure_device(run, 'jit__run_kernel', reps=reps)
    else:
        from waveforms_tpu import native
        native.synthesize_native(low)
        t0 = time.perf_counter()
        for _ in range(reps):
            native.synthesize_native(low)
        dtm = (time.perf_counter() - t0) / reps
    return n / dtm


def time_flux_iir(use_pallas, reps):
    """Reference row: exp_decay_filter design + lfilter over 1M samples."""
    from waveforms_tpu.distortion import exp_decay_filter
    b, a = exp_decay_filter([0.02, 0.005], [3e-6, 20e-6], 2e9)
    sig = np.sin(np.linspace(0, 300.0, 1_000_000))
    if use_pallas:
        import jax
        import jax.numpy as jnp

        from waveforms_tpu.ops.iir import lfilter
        from waveforms_tpu.utils.profiling import measure_device
        bd, ad = jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)
        sd = jnp.asarray(sig, jnp.float32)

        @jax.jit
        def flux_filter(x):
            return lfilter(bd, ad, x)[0]

        flux_filter(sd).block_until_ready()
        dtm = measure_device(lambda: flux_filter(sd), 'jit_flux_filter',
                             reps=reps)
    else:
        from scipy.signal import lfilter as sp_lfilter
        sp_lfilter(b, a, sig)
        t0 = time.perf_counter()
        for _ in range(reps):
            sp_lfilter(b, a, sig)
        dtm = (time.perf_counter() - t0) / reps
    return len(sig) / dtm


def main():
    import jax
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    use_pallas = ('--native' not in sys.argv
                  and jax.default_backend() == 'tpu')
    reps = 5
    for name, ref_rate in REF.items():
        try:
            if name == 'flux_iir_1M':
                rate = time_flux_iir(use_pallas, reps)
            else:
                rate = time_engine(*build(name), use_pallas, reps)
        except Exception as exc:  # keep sweeping
            print(json.dumps({"metric": name, "error": repr(exc)[:120]}))
            continue
        print(json.dumps({
            "metric": name,
            "value": round(rate / 1e9, 4),
            "unit": "Gsamples/s",
            "engine": "pallas" if use_pallas else "native",
            "vs_reference_cpu": round(rate / ref_rate, 1),
        }))


if __name__ == '__main__':
    main()

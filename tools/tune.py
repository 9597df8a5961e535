"""Kernel tuning sweep: rows_per_tile x dimension_semantics on a real TPU.

Run on a healthy chip (`python tools/tune.py`); prints one line per
configuration with the flagship-schedule throughput, then the best setting.
The knobs map to ops.pallas_synth._run_kernel's ``R`` and ``dimsem``
arguments; bake the winner into synthesize_device defaults.

Timing is d2h-free (block_until_ready only) and runs inside one jitted
fori_loop per config so host dispatch never pollutes the measurement --
same protocol as bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import jax
    if '--cpu' in sys.argv:  # smoke-test the sweep plumbing off-TPU
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from bench import build_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, _run_kernel

    interpret = jax.default_backend() != 'tpu'
    reps = 2 if interpret else 10

    # interpret mode exists only to smoke the sweep plumbing: tiny schedule
    chans = build_schedule(n_channels=4) if interpret else build_schedule()
    stop = 4.096e-6 if interpret else 1e-3
    low = lower_schedule(chans, 0.0, stop, 2e9)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape

    results = []
    for R in (8, 16, 32):
        # NB > 1 requires whole buckets per tile; NB == 1 has no constraint
        if NB > 1 and dev.bucket_samples % (R * 128):
            continue
        for dimsem in (None, ('parallel', 'arbitrary'),
                       ('parallel', 'parallel')):
            n_rows = -(-dev.n_samples // 128)
            n_rows = -(-n_rows // R) * R
            G = max(dev.bucket_samples // (R * 128), 1)
            kw = dict(S=S, T=T, F=F, R=R, n_rows=n_rows, tiles_per_bucket=G,
                      ops_present=dev.ops_present, interpret=interpret,
                      dimsem=dimsem)

            @jax.jit
            def timed():
                def body(i, acc):
                    row0 = jnp.full((1, 1, 1, 1), i >> 20, jnp.int32)
                    out = _run_kernel(row0, *dev.tensors, **kw)
                    return acc + out[0, 0, 0]
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

            try:
                timed().block_until_ready()
                t0 = time.perf_counter()
                timed().block_until_ready()
                dtm = (time.perf_counter() - t0) / reps
            except Exception as exc:
                print(f"R={R:<3} dimsem={dimsem}: FAILED ({exc!r})")
                continue
            gsps = len(chans) * dev.n_samples / dtm / 1e9
            results.append((gsps, R, dimsem))
            print(f"R={R:<3} dimsem={str(dimsem):<28} {gsps:8.1f} GS/s")

    if results:
        best = max(results)
        print(f"\nbest: R={best[1]} dimsem={best[2]} -> {best[0]:.1f} GS/s")


if __name__ == '__main__':
    main()

"""Kernel tuning sweep: rows_per_tile x dimension_semantics on a real TPU.

Run on a healthy chip (`python tools/tune.py`); prints one line per
configuration with the flagship-schedule throughput, then the best setting.
The knobs map to ops.pallas_synth._run_kernel's ``R`` and ``dimsem``
arguments; bake the winner into TUNED_ROWS_PER_TILE.

Timing uses profiler DEVICE events (waveforms_tpu.utils.profiling.
measure_device): on the tunneled dev chip, wall-clock around
block_until_ready is meaningless (see NOTES.md); the device-side span is
the only trustworthy duration.  ``--cpu`` smoke-tests the sweep plumbing
off-TPU with wall-clock timing (flagged in the output).
"""

import json
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
    from waveforms_tpu.utils.profiling import measure_device

    interpret = jax.default_backend() != 'tpu'

    # interpret mode exists only to smoke the sweep plumbing: tiny schedule
    chans = build_schedule(n_channels=4) if interpret else build_schedule()
    stop = 4.096e-6 if interpret else 524.288e-6
    low = lower_schedule(chans, 0.0, stop, 2e9)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape
    n_total = C * dev.n_samples
    row0 = jnp.zeros((1, 1, 1, 1), jnp.int32)

    results = []
    for R in ((8,) if interpret else (64, 128, 256, 512)):
        # NB > 1 requires whole buckets per tile; NB == 1 has no constraint
        if NB > 1 and dev.bucket_samples % (R * 128):
            continue
        for dimsem in (None, ('parallel', 'arbitrary')):
            n_rows = -(-dev.n_samples // 128)
            n_rows = -(-n_rows // R) * R
            G = max(dev.bucket_samples // (R * 128), 1)
            kw = dict(S=S, T=T, F=F, R=R, n_rows=n_rows, tiles_per_bucket=G,
                      ops_present=dev.ops_present, interpret=interpret,
                      dimsem=dimsem)

            def run():
                return _run_kernel(row0, *dev.tensors, **kw)

            try:
                run().block_until_ready()       # compile outside the trace
                if interpret:
                    t0 = time.perf_counter()
                    run().block_until_ready()
                    dt = time.perf_counter() - t0
                else:
                    dt = measure_device(run, 'jit__run_kernel', reps=3)
            except Exception as exc:
                print(json.dumps({"R": R, "dimsem": dimsem,
                                  "error": repr(exc)[:100]}))
                continue
            gsps = n_total / dt / 1e9
            results.append((gsps, R, dimsem))
            print(json.dumps({
                "R": R, "dimsem": dimsem, "device_ms": round(dt * 1e3, 3),
                "gsps": round(gsps, 1),
                **({"note": "interpret_mode_non_tpu"} if interpret else {}),
            }))

    if results:
        best = max(results)
        print(json.dumps({"best_R": best[1], "best_dimsem": best[2],
                          "best_gsps": round(best[0], 1)}))

    # sparse worklist kernel: subtile-height sweep on the same schedule
    if NB == 1 and dev.amp_im is None:
        from waveforms_tpu.ops.sparse_synth import (build_sparse_plan,
                                                    synthesize_sparse)
        sres = []
        for Rs in ((8,) if interpret else (16, 32, 64)):
            plan = build_sparse_plan(low, Rs=Rs)

            def srun():
                return synthesize_sparse(dev, plan=plan,
                                         interpret=interpret)

            try:
                srun().block_until_ready()
                if interpret:
                    t0 = time.perf_counter()
                    srun().block_until_ready()
                    dt = time.perf_counter() - t0
                else:
                    dt = measure_device(srun, 'jit__run_sparse', reps=3)
            except Exception as exc:
                print(json.dumps({"Rs": Rs, "error": repr(exc)[:100]}))
                continue
            gsps = n_total / dt / 1e9
            sres.append((gsps, Rs))
            print(json.dumps({
                "Rs": Rs, "device_ms": round(dt * 1e3, 3),
                "gsps": round(gsps, 1), "n_live": plan.n_live,
                **({"note": "interpret_mode_non_tpu"} if interpret else {}),
            }))
        if sres:
            best = max(sres)
            print(json.dumps({"best_sparse_Rs": best[1],
                              "best_sparse_gsps": round(best[0], 1)}))


if __name__ == '__main__':
    main()

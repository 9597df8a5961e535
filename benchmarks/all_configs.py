"""All five BASELINE.json benchmark configs, on the best available engine.

Prints a JSON line per config (informational; the driver's headline metric
is bench.py).  Reference single-core CPU numbers from BASELINE.md are
included for comparison.

Run: python benchmarks/all_configs.py [--engine pallas|native]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_CPU = {
    "readme_demo_10001pts": 0.100e9,       # ~100 MS/s
    "xy_z_pair_200k_sparse": 0.7e9,
    "dense_chirp_gaussian_2M": 0.031e9,
    "flux_distortion_1M": 0.142e9,
    "wavevstack_1000x200k": 0.0082e9,
}


def build_configs():
    from waveforms_tpu import (chirp, cos, cosPulse, gaussian, mixing,
                               square, zero)
    from waveforms_tpu.core import WaveVStack

    rng = np.random.default_rng(0)
    cfgs = {}

    # 1. README demo: 3 DRAG-corrected cosPulses mixed at -20 MHz, 10001 pts
    x = zero()
    for amp, dt, ph in [(0.5, 0, 0), (1.0, 1e-6, np.pi / 2), (0.5, 2e-6, 0)]:
        I, _ = mixing((amp * cosPulse(20e-9)) >> dt, freq=-20e6, phase=ph,
                      DRAGScaling=1e-10)
        x += I
    cfgs["readme_demo_10001pts"] = ([x], -1e-6, 9e-6, 1000.1e6)

    # 2. XY+Z pair at 2 GS/s over 100 us (mostly zero)
    xy = zero()
    for k in range(8):
        I, _ = mixing(0.5 * gaussian(30e-9) >> (k * 10e-6), freq=-150e6,
                      DRAGScaling=1e-10)
        xy += I
    z = zero()
    for k in range(8):
        z += 0.3 * (square(200e-9, edge=20e-9) >> (k * 10e-6 + 1e-6))
    cfgs["xy_z_pair_200k_sparse"] = ([xy, z], 0, 100e-6, 2e9)

    # 3. dense chirp x gaussian, 2M pts
    cfgs["dense_chirp_gaussian_2M"] = (
        [gaussian(2.2e-3) * chirp(1e6, 500e6, 1e-3, 0.1, 'linear')],
        0, 1e-3, 2e9)

    # 5. randomized-benchmarking stack: 1000 pulses, 200k pts
    offs = np.sort(rng.uniform(0, 0.99e-4, 1000))
    stack = WaveVStack([(0.5 * cosPulse(20e-9) >> o)
                        * cos(2 * np.pi * 200e6, rng.uniform(0, 6.28))
                        for o in offs])
    cfgs["wavevstack_1000x200k"] = ([stack], 0, 1e-4, 2e9)

    return cfgs


def bench_synthesis(name, chans, start, stop, fs, engine):
    from waveforms_tpu.ops.lowering import lower_schedule

    bucket = 32768 if name.startswith("wavevstack") else None
    low = lower_schedule(chans, start, stop, fs, bucket_samples=bucket)
    total = len(chans) * low.n_samples

    if engine == 'native':
        from waveforms_tpu.native import synthesize_native
        synthesize_native(low)  # warm
        reps = max(1, int(2e6 / total))
        t0 = time.perf_counter()
        for _ in range(max(reps, 1)):
            synthesize_native(low)
        el = (time.perf_counter() - t0) / max(reps, 1)
    else:
        import jax

        from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                    synthesize_device)
        interpret = jax.default_backend() != 'tpu'
        dev = DeviceSchedule(low)
        jax.block_until_ready(dev.tensors)
        out = synthesize_device(dev, interpret=interpret)
        out.block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = synthesize_device(dev, interpret=interpret)
        out.block_until_ready()
        el = (time.perf_counter() - t0) / reps
    return total / el


def bench_distortion(engine):
    """Config 4: 2-exponential IIR pre-compensation on 1M samples."""
    from waveforms_tpu.distortion import exp_decay_filter, predistort
    sig = np.zeros(1_000_000)
    sig[100_000:900_000] = 1.0
    filters = [exp_decay_filter(0.05, 100e-9, 2e9, inv=True),
               exp_decay_filter(-0.02, 30e-9, 2e9, inv=True)]
    if engine == 'native':
        predistort(sig, filters)
        t0 = time.perf_counter()
        for _ in range(5):
            predistort(sig, filters)
        el = (time.perf_counter() - t0) / 5
    else:
        import jax
        import jax.numpy as jnp

        from waveforms_tpu.ops.iir import predistort_jax
        s = jnp.asarray(sig, dtype=jnp.float32)
        predistort_jax(s, filters).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            out = predistort_jax(s, filters)
        out.block_until_ready()
        el = (time.perf_counter() - t0) / 5
    return len(sig) / el


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--engine', default=None,
                    choices=['pallas', 'native'])
    args = ap.parse_args()
    engine = args.engine
    if engine is None:
        try:
            import jax
            engine = 'pallas' if jax.default_backend() == 'tpu' else 'native'
        except ImportError:
            engine = 'native'

    for name, (chans, start, stop, fs) in build_configs().items():
        rate = bench_synthesis(name, chans, start, stop, fs, engine)
        ref = REFERENCE_CPU.get(name)
        print(json.dumps({
            "config": name, "engine": engine,
            "samples_per_sec": round(rate),
            "vs_reference_cpu": round(rate / ref, 1) if ref else None,
        }), flush=True)

    rate = bench_distortion(engine)
    print(json.dumps({
        "config": "flux_distortion_1M", "engine": engine,
        "samples_per_sec": round(rate),
        "vs_reference_cpu": round(rate / REFERENCE_CPU[
            "flux_distortion_1M"], 1),
    }), flush=True)


if __name__ == '__main__':
    main()

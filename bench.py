"""Headline benchmark: 64-qubit full-chip schedule synthesis on one TPU chip.

Workload (BASELINE.json config 5): 128 channels x 2 GS/s x 1 ms -- 64 XY
channels carrying DRAG-corrected cosPulse gates mixed at per-qubit IF
frequencies, interleaved with 64 Z flux channels of edge-smoothed square
pulses.  The schedule lowers once to descriptor tensors and the fused Pallas
kernel synthesizes all 256M samples.

Baseline: the reference library has no published numbers; BASELINE.json's
north star for this config is 10 GS/s/chip (about 300x the reference's
measured dense single-core CPU rate of 0.031 GS/s, BASELINE.md).
``vs_baseline`` is measured-GS/s / 10.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def build_schedule(n_channels=128, seed=0):
    from waveforms_tpu import cosPulse, mixing, square, zero

    rng = np.random.default_rng(seed)
    chans = []
    for c in range(n_channels):
        if c % 2 == 0:
            x = zero()
            for _ in range(4):
                I, _ = mixing(0.5 * cosPulse(20e-9) >> rng.uniform(0, 0.9e-3),
                              freq=-150e6 - 2e6 * c,
                              phase=rng.uniform(0, 2 * np.pi),
                              DRAGScaling=1e-10)
                x += I
            chans.append(x)
        else:
            z = zero()
            for _ in range(3):
                z += 0.3 * (square(80e-9, edge=10e-9)
                            >> rng.uniform(0, 0.9e-3))
            chans.append(z)
    return chans


def main():
    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device

    interpret = jax.default_backend() != 'tpu'

    start, stop, fs = 0.0, 1e-3, 2e9
    chans = build_schedule()
    low = lower_schedule(chans, start, stop, fs)
    dev = DeviceSchedule(low)  # descriptor upload happens once, like an
    jax.block_until_ready(dev.tensors)  # AWG waveform-memory load

    out = synthesize_device(dev, interpret=interpret)
    out.block_until_ready()  # warmup: compile + first run

    reps = 2 if interpret else 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = synthesize_device(dev, interpret=interpret)
    out.block_until_ready()
    elapsed = (time.perf_counter() - t0) / reps

    # correctness spot-check against the numpy float64 oracle
    t = np.arange(start, stop, 1 / fs)[:100000]
    oracle = chans[0](t)
    got = np.asarray(out[0, :100000])
    rel = float(np.abs(got - oracle).max() / max(np.abs(oracle).max(), 1e-30))
    assert rel < 1e-5, f"accuracy regression: rel err {rel}"

    total = len(chans) * low.n_samples
    gsps = total / elapsed / 1e9
    print(json.dumps({
        "metric": "full_chip_synthesis_128ch_2GSps_1ms",
        "value": round(gsps, 2),
        "unit": "Gsamples/s/chip",
        "vs_baseline": round(gsps / 10.0, 2),
    }))


if __name__ == '__main__':
    main()

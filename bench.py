"""Headline benchmark: 64-qubit full-chip schedule synthesis on one TPU chip.

Workload (BASELINE.json config 5): 128 channels x 2 GS/s x 1 ms -- 64 XY
channels carrying DRAG-corrected cosPulse gates mixed at per-qubit IF
frequencies, interleaved with 64 Z flux channels of edge-smoothed square
pulses.  The schedule lowers once to descriptor tensors (uploaded once, like
an AWG waveform-memory load) and the fused Pallas kernel synthesizes all
256M samples.

Timing runs INSIDE one jitted fori_loop (each iteration's sample offset
depends on the loop index so the kernel cannot be hoisted), so a single
dispatch measures pure device throughput and only scalars cross the host
link.

Baseline: the reference library has no published numbers; BASELINE.json's
north star for this config is 10 GS/s/chip (about 300x the reference's
measured dense single-core CPU rate of 0.031 GS/s, BASELINE.md).
``vs_baseline`` is measured-GS/s / 10.

Prints exactly one JSON line.
"""

import contextlib
import json
import time

import numpy as np

_nullcontext = contextlib.nullcontext

REPS = 10


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
    import jax.numpy as jnp

    # persistent compile cache: once any run compiles the kernel on a
    # healthy terminal, later runs skip the remote compile entirely
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:
        pass

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, _run_kernel

    interpret = jax.default_backend() != 'tpu'

    start, stop, fs = 0.0, 1e-3, 2e9
    chans = build_schedule()
    low = lower_schedule(chans, start, stop, fs)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)

    C, NB, S, T, F = dev.shape
    R = 16
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    G = max(dev.bucket_samples // (R * 128), 1)
    kw = dict(S=S, T=T, F=F, R=R, n_rows=n_rows, tiles_per_bucket=G,
              ops_present=dev.ops_present, interpret=interpret)

    def run_once(row0_scalar):
        row0 = jnp.full((1, 1, 1, 1), row0_scalar, jnp.int32)
        return _run_kernel(row0, *dev.tensors, **kw)

    reps = 2 if interpret else REPS

    @jax.jit
    def timed_loop():
        def body(i, acc):
            # (i >> 20) is always 0 here but loop-varying, so the compiler
            # cannot hoist the kernel out of the loop
            out = run_once(i >> 20)
            return acc + out[0, 0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    # Accuracy spot-check FIRST, in interpreter mode (pure XLA ops) pinned
    # to the HOST CPU backend: the dev terminal has a fault where
    # device->host reads abort, so no value readback may touch the TPU --
    # the only TPU interaction is the d2h-free compiled kernel below.
    # (Full engine parity is covered by the test suite; this guards the
    # exact bench configuration.)
    from waveforms_tpu.ops.pallas_synth import synthesize_device
    small = build_schedule(n_channels=4, seed=3)
    small_stop = 4.096e-6
    low_s = lower_schedule(small, start, small_stop, fs)
    try:
        cpu0 = jax.local_devices(backend='cpu')[0]
    except RuntimeError:
        cpu0 = None
    ctx = jax.default_device(cpu0) if cpu0 is not None else _nullcontext()
    with ctx:
        out_s = np.asarray(synthesize_device(DeviceSchedule(low_s),
                                             rows_per_tile=8,
                                             interpret=True))
    t = np.arange(start, small_stop, 1 / fs)
    for ci in range(len(small)):
        oracle = small[ci](t)
        scale = max(np.abs(oracle).max(), 1e-30)
        rel = np.abs(out_s[ci] - oracle).max() / scale
        assert rel < 1e-5, f"accuracy regression ch{ci}: rel err {rel}"

    # Timing is d2h-free: block_until_ready confirms completion without
    # reading values back.
    timed_loop().block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    timed_loop().block_until_ready()
    elapsed = (time.perf_counter() - t0) / reps

    total = len(chans) * dev.n_samples
    gsps = total / elapsed / 1e9
    print(json.dumps({
        "metric": "full_chip_synthesis_128ch_2GSps_1ms",
        "value": round(gsps, 2),
        "unit": "Gsamples/s/chip",
        "vs_baseline": round(gsps / 10.0, 2),
    }))


def cpu_fallback():
    """Last resort when the TPU terminal is unavailable: measure the
    native C++ engine on the same workload so the round still records an
    honest number (flagged via the ``note`` field)."""
    from waveforms_tpu import native
    from waveforms_tpu.ops.lowering import lower_schedule

    start, stop, fs = 0.0, 1e-3, 2e9
    chans = build_schedule()
    low = lower_schedule(chans, start, stop, fs)
    native.synthesize_native(low)  # warmup (page faults, thread pool)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        native.synthesize_native(low)
    elapsed = (time.perf_counter() - t0) / reps
    gsps = len(chans) * low.n_samples / elapsed / 1e9
    print(json.dumps({
        "metric": "full_chip_synthesis_128ch_2GSps_1ms",
        "value": round(gsps, 3),
        "unit": "Gsamples/s/chip",
        "vs_baseline": round(gsps / 10.0, 3),
        "note": "tpu_terminal_unavailable_cpu_native_fallback",
    }))


if __name__ == '__main__':
    import signal
    import sys
    import traceback

    def _alarm(signum, frame):
        raise TimeoutError("bench attempt watchdog expired")

    signal.signal(signal.SIGALRM, _alarm)

    # The dev TPU tunnel occasionally wedges and recovers after idle time;
    # retry a few times before giving up so a transient fault doesn't
    # zero out the round's benchmark.  The degraded tunnel can also HANG
    # (multi-minute stalls at init), so each attempt runs under a watchdog.
    for attempt in range(4):
        try:
            # compile artifacts are pre-seeded in .jax_cache, so a healthy
            # attempt finishes in ~2-3 min; 420 s covers a cold compile too
            signal.alarm(420)
            main()
            signal.alarm(0)
            break
        except BaseException:
            signal.alarm(0)
            traceback.print_exc(file=sys.stderr)
            if attempt == 3:
                print("all TPU attempts failed; measuring the CPU-native "
                      "engine instead", file=sys.stderr, flush=True)
                cpu_fallback()
                break
            print(f"bench attempt {attempt + 1} failed; retrying in 30s",
                  file=sys.stderr, flush=True)
            time.sleep(30)

"""Headline benchmark: 64-qubit full-chip schedule synthesis on one TPU chip.

Workload (BASELINE.json config 5): 128 channels x 2 GS/s x 1 ms -- 64 XY
channels carrying DRAG-corrected cosPulse gates mixed at per-qubit IF
frequencies, interleaved with 64 Z flux channels of edge-smoothed square
pulses.  The schedule lowers once to descriptor tensors (uploaded once, like
an AWG waveform-memory load) and the fused Pallas kernel synthesizes all
256M samples.

Timing is a host loop of independent dispatches, each blocked on
``block_until_ready`` (no value readback touches the host); the headline is
the MEDIAN per-dispatch latency, so it includes real dispatch overhead and
is robust to tunnel jitter.  (An earlier fori_loop-of-kernels formulation
measured marginally higher but ABORTS on the tunneled dev TPU, so the host
loop is both the honest and the only reliable formulation here.)

Honesty fields in the JSON line:

- ``occupancy``: fraction of the 256M samples inside a live (non-silent)
  segment.  The flagship schedule is pulse-sparse (~0.1%%), and the kernel
  skips factor evaluation on silent tiles, so the headline GS/s is mostly
  bound by the output store.  The ``dense_*`` fields cover the opposite
  regime.
- ``dense_gsps`` / ``dense_occupancy``: a 128-channel gaussian x linear-chirp
  schedule with occupancy 1.0 -- every sample evaluates transcendentals.
- ``write_mfu``: headline output bytes/s divided by this chip's *measured*
  achievable write bandwidth (a jitted full-buffer fill of the same shape),
  i.e. fraction of the store roofline the kernel reaches.

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

REPS = 20


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


def build_dense_schedule(n_channels=128, duration=1e-3):
    """Occupancy-1.0 counterpart: every sample inside a chirp x gaussian."""
    from waveforms_tpu import chirp, gaussian

    chans = []
    for c in range(n_channels):
        f1 = 300e6 + 1e6 * c
        chans.append(gaussian(duration) * chirp(1e6, f1, duration, 0.0,
                                                'linear'))
    return chans


def schedule_occupancy(low):
    """Fraction of samples covered by live segments, from the descriptors.

    ``seg_lo``/``seg_hi`` are global sample indices (a segment spanning
    several time buckets appears in each with the same global window), so a
    per-channel interval union gives the exact live-sample count.
    """
    C = low.shape[0]
    lo = low.seg_lo.reshape(C, -1)
    hi = low.seg_hi.reshape(C, -1)
    nt = low.nterm.reshape(C, -1)
    live = 0
    for c in range(C):
        ivals = sorted(
            (max(int(a), 0), min(int(b), low.n_samples))
            for a, b, n in zip(lo[c], hi[c], nt[c]) if n > 0 and b > a)
        end = 0
        for a, b in ivals:
            if b <= end:
                continue
            live += b - max(a, end)
            end = b
    return live / (C * low.n_samples)


def median_dispatch(fn, reps):
    """Median wall time of fn() -> jax.Array, blocking each dispatch."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _device_runner(chans, start, stop, fs, interpret, rows_per_tile=16):
    """Lower + upload a schedule; return (thunk, n_total, lowered)."""
    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, _run_kernel

    low = lower_schedule(chans, start, stop, fs)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape
    R = rows_per_tile
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    kw = dict(S=S, T=T, F=F, R=R, n_rows=n_rows,
              tiles_per_bucket=max(dev.bucket_samples // (R * 128), 1),
              ops_present=dev.ops_present, interpret=interpret)
    row0 = jnp.zeros((1, 1, 1, 1), jnp.int32)

    def run():
        return _run_kernel(row0, *dev.tensors, **kw)

    return run, C * dev.n_samples, low, (C, n_rows)


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

    interpret = jax.default_backend() != 'tpu'
    reps = 2 if interpret else REPS

    start, stop, fs = 0.0, 1e-3, 2e9
    run, n_total, low, (C, n_rows) = _device_runner(
        build_schedule(), start, stop, fs, interpret)

    # Accuracy spot-check FIRST, in interpreter mode (pure XLA ops) pinned
    # to the HOST CPU backend, so no value readback ever touches the TPU.
    # (Full engine parity is covered by the test suite; this guards the
    # exact bench configuration.)
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device
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

    # -- headline: sparse flagship schedule --------------------------------
    run().block_until_ready()          # compile + warmup
    med = median_dispatch(run, reps)
    gsps = n_total / med / 1e9

    # -- measured store roofline: jitted full-buffer fill, same shape ------
    @jax.jit
    def fill(s):
        return jnp.full((C, n_rows * 128), s, jnp.float32)

    one = jnp.float32(1.0)
    fill(one).block_until_ready()
    fill_med = median_dispatch(lambda: fill(one), reps)
    out_bytes = C * n_rows * 128 * 4
    write_mfu = (out_bytes / med) / (out_bytes / fill_med)

    # -- dense counterpart: occupancy 1.0, transcendental-bound ------------
    dense_stop = stop if not interpret else 4.096e-6
    drun, dn_total, dlow, _ = _device_runner(
        build_dense_schedule(duration=dense_stop), start, dense_stop, fs,
        interpret)
    drun().block_until_ready()
    dmed = median_dispatch(drun, max(reps // 2, 2))
    dense_gsps = dn_total / dmed / 1e9

    result = {
        "metric": "full_chip_synthesis_128ch_2GSps_1ms",
        "value": round(gsps, 2),
        "unit": "Gsamples/s/chip",
        "vs_baseline": round(gsps / 10.0, 2),
        "occupancy": round(schedule_occupancy(low), 5),
        "write_mfu": round(write_mfu, 3),
        "dense_gsps": round(dense_gsps, 2),
        "dense_occupancy": round(schedule_occupancy(dlow), 5),
        "reps": reps,
        "device": str(jax.devices()[0]),
    }
    if interpret:
        # interpret-mode numbers on a CPU backend are NOT device throughput
        result["note"] = "interpret_mode_non_tpu"
    print(json.dumps(result))


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
        "occupancy": round(schedule_occupancy(low), 5),
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

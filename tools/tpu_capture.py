"""Resumable TPU measurement capture for the flaky tunneled dev chip.

The dev TPU tunnel oscillates between healthy and wedged (any mid-size
Pallas execution or d2h read can ABORT and poison the chip for a while).
Three further tunnel quirks make naive wall-clock timing WORTHLESS here:

1. Async dispatch + ``block_until_ready`` does not actually wait for device
   completion ("phantom mode": 128 enqueued 1-GB-output kernels "finish" in
   microseconds).
2. After any d2h read, the runtime flips to a synchronized mode where every
   dispatch ships the full output over the tunnel (~34 ms RTT + ~19 GB/s).
3. Outputs >~0.6 GB abort outright.

The ONLY trustworthy duration is the device-side event in a
``jax.profiler`` trace, so every measurement here is profiler-based.

This script runs ONE budgeted attempt: a cheap health probe, then as many
pending tasks from TASKS as fit in the time budget, checkpointing results
to ``benchmarks/tpu_state.json`` after each.  On the first abort it exits
immediately (the chip needs idle time).  Run it from a loop, e.g.:

    while true; do python tools/tpu_capture.py; sleep 1200; done
"""

import glob
import gzip
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402

STATE = os.path.join(os.path.dirname(__file__), '..', 'benchmarks',
                     'tpu_state.json')
BUDGET_S = 480
FS = 2e9

SWEEP_R = (64, 128, 256, 512, 16)
SWEEP_DS = (None, ('parallel', 'arbitrary'))


class Aborted(RuntimeError):
    pass


def _alarm(signum, frame):
    raise Aborted("phase watchdog expired")


def load_state():
    try:
        with open(STATE) as f:
            return json.load(f)
    except Exception:
        return {}


def save_state(state):
    os.makedirs(os.path.dirname(STATE), exist_ok=True)
    with open(STATE, 'w') as f:
        json.dump(state, f, indent=1, sort_keys=True)


def device_times(tracedir, prefix):
    """Device-side event durations (seconds) from a jax profiler trace."""
    out = []
    for p in glob.glob(tracedir + '/plugins/profile/*/*.trace.json.gz'):
        with gzip.open(p) as f:
            tr = json.load(f)
        devpids = {e['pid'] for e in tr['traceEvents']
                   if e.get('ph') == 'M' and e.get('name') == 'process_name'
                   and 'TPU' in str(e.get('args', {}).get('name', ''))}
        for e in tr['traceEvents']:
            if (e.get('ph') == 'X' and e.get('pid') in devpids
                    and e.get('name', '').startswith(prefix)):
                out.append(e['dur'] / 1e6)
    return out


def profile_median(fn, prefix, reps=3):
    """Median device-side duration of fn() over reps profiled calls."""
    import jax
    td = '/tmp/tpu_capture_trace'
    os.system(f'rm -rf {td}')
    jax.profiler.start_trace(td)
    try:
        for _ in range(reps):
            jax.block_until_ready(fn())
    finally:
        jax.profiler.stop_trace()
    ts = device_times(td, prefix)
    if not ts:
        raise Aborted(f"no device events for {prefix}")
    return float(np.median(ts))


def _kernel_runner(chans, start, stop, R, dimsem=None, out_dtype=None,
                   row0_val=0, fine=True):
    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, _run_kernel

    low = lower_schedule(chans, start, stop, FS)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    kw = dict(S=S, T=T, F=F, R=R, n_rows=n_rows,
              tiles_per_bucket=max(dev.bucket_samples // (R * 128), 1),
              ops_present=dev.ops_present, interpret=False, dimsem=dimsem,
              fine=fine)
    if out_dtype is not None:
        kw['out_dtype'] = out_dtype
    row0 = jnp.full((1, 1, 1, 1), row0_val, jnp.int32)

    def run():
        return _run_kernel(row0, *dev.tensors, **kw)

    return run, dev, n_rows


# ---------------------------------------------------------------------------
# tasks -- each returns a JSON-serializable result dict

def _sparse_chans(n=128, seed=0):
    from bench import build_schedule
    return build_schedule(n_channels=n, seed=seed)


def _dense_chans(duration):
    from bench import build_dense_schedule
    return build_dense_schedule(duration=duration)


def task_sweep(R, dimsem):
    chans = _sparse_chans()
    run, dev, n_rows = _kernel_runner(chans, 0.0, 524.288e-6, R, dimsem)
    run().block_until_ready()  # compile outside the trace
    med = profile_median(run, 'jit__run_kernel')
    n_total = len(chans) * dev.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n_total / med / 1e9, 1),
            "write_gbps": round(128 * n_rows * 128 * 4 / med / 1e9, 1)}


def best_sweep(state):
    best, cfg = None, None
    for R in SWEEP_R:
        for ds in SWEEP_DS:
            key = f"sweep_R{R}_{'pa' if ds else 'none'}"
            r = state.get(key)
            if r and 'gsps' in r and (best is None or r['gsps'] > best):
                best, cfg = r['gsps'], (R, ds)
    return cfg


def task_fill_roofline():
    import jax
    import jax.numpy as jnp
    C, n_rows = 128, 8192

    @jax.jit
    def fill(s):
        return jnp.full((C, n_rows * 128), s, jnp.float32)

    one = jnp.float32(1.0)
    fill(one).block_until_ready()
    med = profile_median(lambda: fill(one), 'jit_fill')
    return {"device_ms": round(med * 1e3, 3),
            "write_gbps": round(C * n_rows * 128 * 4 / med / 1e9, 1)}


def task_dense(R, dimsem):
    chans = _dense_chans(524.288e-6)
    run, dev, n_rows = _kernel_runner(chans, 0.0, 524.288e-6, R, dimsem)
    run().block_until_ready()
    med = profile_median(run, 'jit__run_kernel')
    n_total = len(chans) * dev.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n_total / med / 1e9, 1)}


def task_headline(R, dimsem):
    """Full 1 ms flagship schedule as two 512 mus time-sharded windows.

    A single 1-GB output buffer aborts this tunnel, so the schedule is
    synthesized in two windows via the kernel's native ``row0`` time-shard
    offset -- the same mechanism the multi-chip time axis uses.  GS/s is
    total scheduled samples over summed device time.
    """
    import jax.numpy as jnp
    chans = _sparse_chans()
    half = 1048576  # samples per window at 2 GS/s (512 rows x 128 x 16)
    times = []
    for w in range(2):
        run, dev, n_rows = _kernel_runner(chans, 0.0, 1e-3, R, dimsem,
                                          row0_val=w * half)
        # window = half the rows
        import jax
        from waveforms_tpu.ops.pallas_synth import _run_kernel
        C, NB, S, T, F = dev.shape
        kw = dict(S=S, T=T, F=F, R=R, n_rows=half // 128,
                  tiles_per_bucket=max(dev.bucket_samples // (R * 128), 1),
                  ops_present=dev.ops_present, interpret=False, dimsem=dimsem)
        row0 = jnp.full((1, 1, 1, 1), w * half, jnp.int32)

        def run_w():
            return _run_kernel(row0, *dev.tensors, **kw)

        run_w().block_until_ready()
        times.append(profile_median(run_w, 'jit__run_kernel'))
    total = 128 * 2000000
    dt = sum(times)
    return {"device_ms": round(dt * 1e3, 3),
            "gsps": round(total / dt / 1e9, 1),
            "windows": 2, "window_us": 524.288,
            "note": "1GB single-window output aborts this tunnel; "
                    "time-sharded via row0"}


def task_bf16(R, dimsem):
    import jax.numpy as jnp
    chans = _sparse_chans()
    run, dev, n_rows = _kernel_runner(chans, 0.0, 524.288e-6, R, dimsem,
                                      out_dtype=jnp.bfloat16)
    run().block_until_ready()
    med = profile_median(run, 'jit__run_kernel')
    n_total = len(chans) * dev.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n_total / med / 1e9, 1)}


def task_parity_small():
    """Real-hardware correctness: compiled (non-interpret) kernel output
    read back and compared against the numpy oracle."""
    chans = _sparse_chans(8)
    stop = 32.768e-6
    run, dev, n_rows = _kernel_runner(chans, 0.0, stop, 8)
    out = np.asarray(run())[:, :, :].reshape(8, -1)[:, :dev.n_samples]
    t = np.arange(0.0, stop, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(out[c] - oracle).max() / scale))
    return {"max_rel_err": worst, "ok": bool(worst < 1e-5)}


def task_floor(R):
    """Grid+store floor: an all-zero schedule (S=1, nterm=0) isolates the
    kernel's per-tile fixed cost from the segment/factor work."""
    from waveforms_tpu import zero
    chans = [zero() for _ in range(128)]
    run, dev, n_rows = _kernel_runner(chans, 0.0, 524.288e-6, R)
    run().block_until_ready()
    med = profile_median(run, 'jit__run_kernel')
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(len(chans) * dev.n_samples / med / 1e9, 1)}


def task_int16_parity():
    """int16 DAC-code output on real hardware: compiled kernel codes equal
    round(f32 * scale) to within one code."""
    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device

    chans = _sparse_chans(8)
    stop = 32.768e-6
    low = lower_schedule(chans, 0.0, stop, FS)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    f32 = np.asarray(synthesize_device(dev, rows_per_tile=8))
    codes = np.asarray(synthesize_device(dev, rows_per_tile=8,
                                         out_dtype=jnp.int16))
    expected = np.clip(np.round(f32 * 32767.0), -32768, 32767)
    off = int(np.abs(codes.astype(np.int64)
                     - expected.astype(np.int64)).max())
    return {"max_code_err": off, "ok": bool(off <= 1)}


def task_suite_row(name):
    """One BASELINE.md row (tools/bench_suite.py config) via device events."""
    import importlib
    import jax

    bench_suite = importlib.import_module('bench_suite')
    if name == 'flux_iir_1M':
        import jax.numpy as jnp

        from waveforms_tpu.distortion import exp_decay_filter
        from waveforms_tpu.ops.iir import lfilter
        from waveforms_tpu.utils.profiling import measure_device
        b, a = exp_decay_filter([0.02, 0.005], [3e-6, 20e-6], 2e9)
        sig = np.sin(np.linspace(0, 300.0, 1_000_000))
        bd, ad = jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)
        sd = jnp.asarray(sig, jnp.float32)

        @jax.jit
        def flux_filter(x):
            return lfilter(bd, ad, x)[0]

        flux_filter(sd).block_until_ready()
        med = measure_device(lambda: flux_filter(sd), 'jit_flux_filter')
        rate = len(sig) / med
    else:
        chans, start, stop, fs = bench_suite.build(name)
        R = None  # auto
        from waveforms_tpu.ops.lowering import lower_schedule
        from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
            default_rows_per_tile
        low = lower_schedule(chans, start, stop, fs)
        dev = DeviceSchedule(low)
        C, NB, S, T, F = dev.shape
        R = default_rows_per_tile(dev.n_samples, dev.bucket_samples, NB)
        run, dev, n_rows = _kernel_runner(chans, start, stop, R)
        run().block_until_ready()
        med = profile_median(run, 'jit__run_kernel')
        rate = len(chans) * dev.n_samples / med
    return {"gsps": round(rate / 1e9, 4),
            "vs_reference_cpu": round(rate / bench_suite.REF[name], 1)}


SUITE_ROWS = ('readme_demo_10k', 'xy_z_pair_200k', 'dense_chirp_2M',
              'flux_iir_1M', 'vstack_1000x200k')


def task_sparse(Rs):
    """Sparse worklist kernel on the 524us flagship window: parity readback
    (small) + device-event timing (full window)."""
    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, \
        synthesize_device
    from waveforms_tpu.ops.sparse_synth import build_sparse_plan, \
        synthesize_sparse
    from waveforms_tpu.utils.profiling import measure_device

    # parity on a small window first (readback-safe size)
    chans_s = _sparse_chans(8)
    low_s = lower_schedule(chans_s, 0.0, 32.768e-6, FS)
    dev_s = DeviceSchedule(low_s)
    sp = np.asarray(synthesize_sparse(dev_s, low_s, Rs=Rs))
    t = np.arange(0.0, 32.768e-6, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans_s):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(sp[c] - oracle).max() / scale))

    # timing on the full 524us window
    chans = _sparse_chans()
    low = lower_schedule(chans, 0.0, 524.288e-6, FS)
    dev = DeviceSchedule(low)
    plan = build_sparse_plan(low, Rs=Rs)
    jax.block_until_ready(dev.tensors)

    def run():
        return synthesize_sparse(dev, plan=plan, interpret=False)

    run().block_until_ready()
    med = measure_device(run, 'jit__run_sparse')
    n_total = len(chans) * dev.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n_total / med / 1e9, 1),
            "n_live": plan.n_live, "Rs": Rs,
            "max_rel_err": worst, "parity_ok": bool(worst < 1e-5)}


def task_dense_probe(kind):
    """Decompose the dense-path per-sample cost: one basis per probe.

    cos = 1 transcendental + 1 int32 mul (fixed-point phase);
    gauss = 1 transcendental + float envelope math;
    chirp = 1 transcendental + 6 int32 muls (quadratic phase).
    Comparing per-sample times isolates the int-multiply cost on the VPU.
    """
    import numpy as np

    from waveforms_tpu import chirp, cos, gaussian
    dur = 524.288e-6
    if kind == 'cos':
        chans = [cos(2 * np.pi * (100e6 + 1e6 * c)) for c in range(128)]
    elif kind == 'gauss':
        chans = [gaussian(3 * dur) >> (dur / 2) for _ in range(128)]
    else:
        chans = [chirp(1e6, 300e6 + 1e6 * c, dur, 0.0, 'linear')
                 for c in range(128)]
    run, dev, n_rows = _kernel_runner(chans, 0.0, dur, 256)
    run().block_until_ready()
    med = profile_median(run, 'jit__run_kernel')
    n_total = len(chans) * dev.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n_total / med / 1e9, 1),
            "ns_per_sample_per_ch": round(med / dev.n_samples * 1e9, 4)}


def task_stack_row(name):
    """A stack-heavy BASELINE row via the pulse-instance batched path
    (plus small-window parity readback against the oracle)."""
    import importlib

    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.stack_synth import build_stack_plan, \
        synthesize_stack
    from waveforms_tpu.utils.profiling import measure_device

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(name)
    low = lower_schedule(chans, start, stop, fs)
    plan = build_stack_plan(low)

    # parity readback (these rows are small enough to read whole)
    out = np.asarray(synthesize_stack(low, plan))
    t = np.arange(start, stop, 1 / fs)
    worst = 0.0
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(out[c] - oracle).max() / scale))

    def run():
        return synthesize_stack(low, plan)

    jax.block_until_ready(run())
    # the fused runner jits its pallas program alone (span
    # 'jit__stack_call' -- comparable to the other kernel rows); the XLA
    # chain runner is one whole program ('jit_run_stack').  The cache
    # key carries env-lever suffixes ('_runner_t0_l2', ...), so scan the
    # plan's attrs rather than hard-coding one name.
    runner = next((v for k, v in vars(plan).items()
                   if k.startswith('_runner') and not k.startswith(
                       '_runner_is_xla') and v is not None), None)
    span = getattr(runner, 'kernel_span', 'jit_run_stack')
    med = measure_device(run, span)
    res = {"device_ms": round(med * 1e3, 3), "span": span}
    n = len(chans) * low.n_samples
    res.update({
        "gsps": round(n / med / 1e9, 4),
        "n_narrow": plan.n_narrow, "advantage": round(plan.advantage, 1),
        "max_rel_err": worst, "parity_ok": bool(worst < 1e-5),
        "vs_reference_cpu": round(n / med / bench_suite.REF[name], 1)})
    return res


def task_mid_sparse(Rs):
    """~1%-occupancy stratum (bench.build_mid_schedule): worklist-kernel
    subtile-height sweep."""
    import jax

    from bench import build_mid_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import build_sparse_plan, \
        synthesize_sparse
    from waveforms_tpu.utils.profiling import measure_device

    chans = build_mid_schedule()
    low = lower_schedule(chans, 0.0, 524.288e-6, FS)
    dev = DeviceSchedule(low)
    plan = build_sparse_plan(low, Rs=Rs)
    jax.block_until_ready(dev.tensors)

    def run():
        return synthesize_sparse(dev, plan=plan)

    run().block_until_ready()
    med = measure_device(run, 'jit__run_sparse')
    n = len(chans) * low.n_samples
    return {"Rs": Rs, "device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 1), "n_live": plan.n_live,
            "occupied": round(plan.occupied_fraction, 4)}


def task_panels(which, panel_rows=4096):
    """Panel kernel (grid = channel x panel x bucket; round-4 redesign
    driven by r4_grid_overhead_probe/r4_walker_cost_probe) on the mid or
    flagship stratum, with small-window parity readback."""
    import jax

    from bench import build_mid_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import (build_panel_plan,
                                                synthesize_panels)
    from waveforms_tpu.utils.profiling import measure_device

    chans = (build_mid_schedule() if which == 'mid'
             else _sparse_chans())
    low = lower_schedule(chans, 0.0, 524.288e-6, FS)
    dev = DeviceSchedule(low)
    plan = build_panel_plan(low, panel_rows=panel_rows)
    jax.block_until_ready(dev.tensors)

    # parity on a small readback-safe window first
    stop_s = 16.384e-6
    chans_s = (build_mid_schedule(n_channels=8) if which == 'mid'
               else _sparse_chans(8))
    low_s = lower_schedule(chans_s, 0.0, stop_s, FS)
    out_s = np.asarray(synthesize_panels(DeviceSchedule(low_s), low=low_s))
    t = np.arange(0.0, stop_s, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans_s):
        oracle = w(t)
        s = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(out_s[c] - oracle).max() / s))

    def run():
        return synthesize_panels(dev, plan=plan)

    med = _measure(run, 'jit__run_panels')
    n = len(chans) * low.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 1), "n_live": plan.n_live,
            "P": plan.P, "n_steps": (plan.n_channels * plan.n_panels
                                     * plan.n_buckets),
            "occupied": round(plan.occupied_fraction, 4),
            "max_rel_err": worst, "parity_ok": bool(worst < 1e-5)}


def task_seq_sparse():
    """Sequencer shot-loop on silicon: sparse vs dense play of the same
    128-channel table (parity readback on a small table first)."""
    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer
    from waveforms_tpu.utils.profiling import measure_device

    # parity on a small table
    small = [lower_schedule(_sparse_chans(4), 0.0, 8.192e-6, FS),
             lower_schedule(_sparse_chans(4, seed=23), 0.0, 8.192e-6, FS)]
    seq_s = Sequencer(small)
    worst = 0.0
    for k in range(2):
        d = np.asarray(seq_s.play(k, rows_per_tile=8))
        s = np.asarray(seq_s.play_sparse(k, Rs=8))
        worst = max(worst, float(np.abs(d - s).max()))

    # timing on the flagship-shaped table (one 524 us window)
    lows = [lower_schedule(_sparse_chans(), 0.0, 524.288e-6, FS)
            for _ in range(2)]
    seq = Sequencer(lows)

    def dense_run():
        return seq.play(0)

    def sparse_run():
        return seq.play_sparse(0)

    jax.block_until_ready(dense_run())
    t_dense = profile_median(dense_run, 'jit__run_kernel')
    jax.block_until_ready(sparse_run())
    t_sparse = profile_median(sparse_run, 'jit__run_sparse')
    n = 128 * seq.n_samples
    return {"dense_ms": round(t_dense * 1e3, 3),
            "sparse_ms": round(t_sparse * 1e3, 3),
            "dense_gsps": round(n / t_dense / 1e9, 1),
            "sparse_gsps": round(n / t_sparse / 1e9, 1),
            "max_abs_diff": worst, "parity_ok": bool(worst < 1e-5)}


def task_x64_probe():
    """The 1e-9 tier ON CHIP: XLA x64 engine parity + rate (subprocess --
    x64 is process-global)."""
    import subprocess
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      'x64_probe.py')],
        capture_output=True, text=True, timeout=280)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-200:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def task_mid_dense(fine):
    """Mid-occupancy (~1-5% live) stratum through the DENSE kernel with /
    without the round-4 fine-skip sub-block walk (the valley fix)."""
    from bench import build_mid_schedule
    chans = build_mid_schedule()
    run, dev, n_rows = _kernel_runner(chans, 0.0, 524.288e-6, 256,
                                      fine=fine)
    run().block_until_ready()
    med = profile_median(run, 'jit__run_kernel')
    n = len(chans) * dev.n_samples
    return {"fine": bool(fine), "device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 1)}


def task_parity_fine():
    """On-chip parity with the fine-skip walk ENGAGED (R=256, scattered
    schedule, readback-safe size): fine sub-block ranges and the
    fine/full cond must agree with the numpy oracle on real silicon."""
    from bench import build_mid_schedule
    chans = build_mid_schedule(n_channels=4)
    stop = 65.536e-6
    run, dev, n_rows = _kernel_runner(chans, 0.0, stop, 256)
    out = np.asarray(run()).reshape(len(chans), -1)[:, :dev.n_samples]
    t = np.arange(0.0, stop, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(out[c] - oracle).max() / scale))
    return {"max_rel_err": worst, "ok": bool(worst < 1e-5)}


def task_flagship_dense_fine():
    """Flagship (0.02% live) through dense+fine: locates the sparse-vs-
    dense routing crossover for docs/TUNING.md."""
    chans = _sparse_chans()
    run, dev, n_rows = _kernel_runner(chans, 0.0, 524.288e-6, 256)
    run().block_until_ready()
    med = profile_median(run, 'jit__run_kernel')
    n = len(chans) * dev.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 1)}


def task_mid_sparse_vs_dense_summary():
    """Reads prior r4 rows and records the routing recommendation."""
    state = load_state()
    rows = {k: state.get(k, {}).get('gsps') for k in
            ('r4_mid_dense_fine', 'r4_mid_dense_nofine',
             'r4m_mid_Rs32', 'r4_flagship_dense_fine',
             'r4_sparse_Rs32')}
    return {"rows": rows}


def task_seq_amortized(n_shots=100):
    """Amortized shot loop ON SILICON: a readme-demo-sized table played
    n_shots times in ONE dispatch via Sequencer.play_many (vmap batches
    the kernel grid; no in-jit reduction -- the round-3 abort trigger).
    Reports per-shot device cost vs the single-shot dispatch floor."""
    import importlib

    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build('readme_demo_10k')
    low = lower_schedule(chans, start, stop, fs)
    seq = Sequencer([low, low])
    ks = jnp.asarray(np.arange(n_shots) % 2, jnp.int32)

    @jax.jit
    def play_shots(ks):
        return seq.play_many(ks)

    out = play_shots(ks)
    out.block_until_ready()
    # parity spot-check on one shot (d2h of one slice only)
    single = np.asarray(seq.play(0))
    diff = float(np.abs(np.asarray(out[0]) - single).max())
    med = profile_median(lambda: play_shots(ks), 'jit_play_shots')
    n = n_shots * len(chans) * low.n_samples
    per_shot_us = med / n_shots * 1e6
    return {"n_shots": n_shots, "device_ms": round(med * 1e3, 3),
            "per_shot_us": round(per_shot_us, 2),
            "gsps": round(n / med / 1e9, 3),
            "max_abs_diff_vs_single": diff,
            "parity_ok": bool(diff < 1e-6)}


def task_bench_seed_int16(Rs=32):
    """Compile-cache seeding: run bench.py's two int16 panel windows once
    (same shapes, same plans) so the round-end bench run hits the
    persistent cache instead of paying ~100 s/window of remote compile."""
    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import (build_panel_plan,
                                                synthesize_panels)

    chans = _sparse_chans()
    low = lower_schedule(chans, 0.0, 1e-3, FS)
    dev = DeviceSchedule(low)
    n_rows = -(-low.n_samples // 128)
    n_tiles = -(-n_rows // Rs)
    half = n_tiles // 2
    out = {}
    for i, win in enumerate(((0, half), (half, n_tiles))):
        plan = build_panel_plan(low, Rs=Rs, tile_window=win)

        def run():
            return synthesize_panels(dev, plan=plan,
                                     out_dtype=jnp.int16)

        jax.block_until_ready(run())
        out[f"win{i}_ms"] = round(
            profile_median(run, 'jit__run_panels') * 1e3, 3)
    return out


def task_stack_layout_ab(row='vstack_1000x200k'):
    """Identity-layer vs pure one-hot scatter, SAME chip window (the
    r4g/r4h comparison straddled a wedge and its degraded aftermath)."""
    import importlib
    import os

    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops import stack_synth as st

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    res = {}
    for name, layers in (("ident2", '2'), ("onehot", '0')):
        os.environ['WFTPU_STACK_IDENT_LAYERS'] = layers
        plan = st.build_stack_plan(low)
        runner = st._build_kernel_runner(plan, low, False)
        jax.block_until_ready(runner())
        med = profile_median(runner, runner.kernel_span)
        res[name + "_ms"] = round(med * 1e3, 4)
    os.environ.pop('WFTPU_STACK_IDENT_LAYERS', None)
    n = len(chans) * low.n_samples
    best = min(res.values())
    res["best_gsps"] = round(n / (best * 1e-3) / 1e9, 3)
    return res


def task_stack_fetch_ab(row='vstack_1000x200k'):
    """Row-major vs TRANSPOSED packed tables, SAME chip window, with an
    on-chip oracle parity check for the transposed layout (the in-kernel
    tpu.transpose lowering and its numerics are unproven on this chip;
    interpret-mode equality proved nothing for the bf16 dots either).
    Runs both under the current default scatter layout."""
    import importlib
    import os

    import jax

    from waveforms_tpu.ops import stack_synth as st
    from waveforms_tpu.ops.lowering import lower_schedule

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    t = np.arange(start, stop, 1 / fs)
    oracle = np.stack([np.asarray(w(t), float) for w in chans])
    scale = max(np.abs(oracle).max(), 1e-30)
    res = {}
    for name, flag in (("rowmajor", '0'), ("tablet", '1')):
        os.environ['WFTPU_STACK_TABLE_T'] = flag
        try:
            plan = st.build_stack_plan(low)
            runner = st._build_kernel_runner(plan, low, False)
            out = np.asarray(runner())
            res[name + "_rel_err"] = float(
                np.abs(out - oracle).max() / scale)
            med = profile_median(runner, runner.kernel_span)
            res[name + "_ms"] = round(med * 1e3, 4)
        finally:
            os.environ.pop('WFTPU_STACK_TABLE_T', None)
    n = len(chans) * low.n_samples
    best = min(v for k, v in res.items() if k.endswith('_ms'))
    res["best_gsps"] = round(n / (best * 1e-3) / 1e9, 3)
    return res


def task_stack_dict_ab(row='vstack_1000x200k'):
    """Full vs DICTIONARY-COMPACTED packed tables, SAME chip window,
    oracle-anchored (the narrow-lane operand block and baked-immediate
    strip math are unproven on real Mosaic; interpret equality proved
    nothing for the bf16 dots or the int16 dynamic stores either).
    Compaction bakes bitwise-constant table columns into the kernel as
    immediates -- on the vstack row only the shift-derived columns vary,
    so the HBM operand stream shrinks ~12x with no in-kernel transpose
    (the lever TABLE_T failed to be)."""
    import importlib
    import os

    import jax

    from waveforms_tpu.ops import stack_synth as st
    from waveforms_tpu.ops.lowering import lower_schedule

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    t = np.arange(start, stop, 1 / fs)
    oracle = np.stack([np.asarray(w(t), float) for w in chans])
    scale = max(np.abs(oracle).max(), 1e-30)
    res = {}
    for name, flag in (("full", '0'), ("dict", '1')):
        os.environ['WFTPU_STACK_DICT'] = flag
        try:
            plan = st.build_stack_plan(low)
            runner = st._build_kernel_runner(plan, low, False)
            tab_bytes = sum(int(np.prod(o.shape)) * 4
                            for o in runner.kernel_args)
            out = np.asarray(runner())
            res[name + "_rel_err"] = float(
                np.abs(out[:, :len(t)] - oracle).max() / scale)
            med = profile_median(runner, runner.kernel_span)
            res[name + "_ms"] = round(med * 1e3, 4)
            res[name + "_operand_bytes"] = tab_bytes
        finally:
            os.environ.pop('WFTPU_STACK_DICT', None)
    n = len(chans) * low.n_samples
    best = min(v for k, v in res.items() if k.endswith('_ms'))
    res["best_gsps"] = round(n / (best * 1e-3) / 1e9, 3)
    return res


def task_stack_strip_ab(row='vstack_1000x200k'):
    """(onestrip x dot3) race, SAME chip window, oracle-anchored.  The
    cost-probe8 decomposition (floor 5.1, tables 5.3, eval 11.6,
    scatter 19.1, full 21.4 us) says per-strip machinery + the strip
    dot chain is now the critical path: onestrip walks each chunk's
    whole spill region as ONE (k_sp, 128) strip (one dot per chunk),
    dot3 replaces the HIGHEST 6-pass dot with 3 exact-split bf16
    passes (parity proven on this row twice: 7.55e-8 / 7.6e-8)."""
    import importlib
    import os

    import jax

    from waveforms_tpu.ops import stack_synth as st
    from waveforms_tpu.ops.lowering import lower_schedule

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    t = np.arange(start, stop, 1 / fs)
    oracle = np.stack([np.asarray(w(t), float) for w in chans])
    scale = max(np.abs(oracle).max(), 1e-30)
    res = {}
    for oflag in ('0', '1'):
        for d3 in (False, True):
            name = f"os{oflag}_d3{int(d3)}"
            os.environ['WFTPU_STACK_ONESTRIP'] = oflag
            try:
                plan = st.build_stack_plan(low)
                runner = st._build_kernel_runner(plan, low, False, dot3=d3)
                out = np.asarray(runner())
                res[name + "_rel_err"] = float(
                    np.abs(out[:, :len(t)] - oracle).max() / scale)
                med = profile_median(runner, runner.kernel_span)
                res[name + "_ms"] = round(med * 1e3, 4)
            finally:
                os.environ.pop('WFTPU_STACK_ONESTRIP', None)
    n = len(chans) * low.n_samples
    best = min(v for k, v in res.items() if k.endswith('_ms'))
    res["best_gsps"] = round(n / (best * 1e-3) / 1e9, 3)
    return res


def task_stack_sc_ab(row='vstack_1000x200k'):
    """Superchunk-size sweep, SAME chip window: per-step machinery vs
    fetch/compute double-buffering granularity (merged tables left the
    VMEM budget ~10x clear, so SC up to one-grid-step now fits)."""
    import importlib
    import os

    import jax

    from waveforms_tpu.ops import stack_synth as st
    from waveforms_tpu.ops.lowering import lower_schedule

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    t = np.arange(start, stop, 1 / fs)
    oracle = np.stack([np.asarray(w(t), float) for w in chans])
    scale = max(np.abs(oracle).max(), 1e-30)
    res = {}
    for sc in ('4', '8', '16'):
        os.environ['WFTPU_STACK_SC'] = sc
        try:
            plan = st.build_stack_plan(low)
            runner = st._build_kernel_runner(plan, low, False)
            out = np.asarray(runner())
            res[f"sc{sc}_rel_err"] = float(
                np.abs(out - oracle).max() / scale)
            med = profile_median(runner, runner.kernel_span)
            res[f"sc{sc}_ms"] = round(med * 1e3, 4)
        finally:
            os.environ.pop('WFTPU_STACK_SC', None)
    n = len(chans) * low.n_samples
    best = min(v for k, v in res.items() if k.endswith('_ms'))
    res["best_gsps"] = round(n / (best * 1e-3) / 1e9, 3)
    return res


def task_stack_dot3(row='vstack_1000x200k'):
    """Candidate 3-split bf16 scatter dot, ORACLE-anchored on silicon
    (round-3 lesson: interpret-mode equality does not catch MXU downcast
    behavior).  Reports parity and speed vs the HIGHEST-dot kernel."""
    import importlib

    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    plan = build_stack_plan(low)
    t = np.arange(start, stop, 1 / fs)
    res = {"n_narrow": plan.n_narrow}
    for name, d3 in (("highest", False), ("dot3", True)):
        runner = _build_kernel_runner(plan, low, False, dot3=d3)
        if runner is None:
            return {"error": "kernel runner not viable"}
        out = np.asarray(runner())
        worst = 0.0
        for c, w in enumerate(chans):
            oracle = np.real(w(t))
            s = max(np.abs(oracle).max(), 1e-30)
            worst = max(worst,
                        float(np.abs(out[c, :len(t)] - oracle).max() / s))
        med = profile_median(runner, runner.kernel_span)
        res[name] = {"device_ms": round(med * 1e3, 4),
                     "max_rel_err": worst,
                     "parity_ok": bool(worst < 1e-6)}
    return res


def task_tiny_race(row='readme_demo_10k'):
    """Panel vs dense(fine) on a TINY schedule, same chip window: dense
    pads 79 rows to its R=128 tile, panel walks 2 live subtiles in one
    step.  Decides the small-schedule side of the routing threshold."""
    import importlib

    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                default_rows_per_tile,
                                                synthesize_device)
    from waveforms_tpu.ops.sparse_synth import (build_panel_plan,
                                                synthesize_panels)

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    R = default_rows_per_tile(dev.n_samples, dev.bucket_samples,
                              dev.shape[1])
    plan = build_panel_plan(low)

    def drun():
        return synthesize_device(dev, rows_per_tile=R)

    def prun():
        return synthesize_panels(dev, plan=plan)

    np.testing.assert_allclose(np.asarray(prun()), np.asarray(drun()),
                               rtol=0, atol=1e-5)
    d = profile_median(drun, 'jit__run_kernel')
    p = profile_median(prun, 'jit__run_panels')
    n = len(chans) * low.n_samples
    return {"dense_us": round(d * 1e6, 2), "panel_us": round(p * 1e6, 2),
            "dense_gsps": round(n / d / 1e9, 3),
            "panel_gsps": round(n / p / 1e9, 3),
            "n_live": plan.n_live, "R": R}


def task_stack_cost_probe(row='vstack_1000x200k'):
    """Decompose the fused stack kernel's device time: full vs eval-only
    (no scatter dot) vs scatter-only (no factor math).  Three redesigns
    in a row assumed the wrong bound (dispatch chain, then table
    streaming); this measures it."""
    import importlib

    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.stack_synth import (_build_kernel_runner,
                                               build_stack_plan)

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    plan = build_stack_plan(low)
    res = {"n_narrow": plan.n_narrow}
    for name, probe in (("full_ms", None), ("eval_ms", 'eval'),
                        ("scatter_ms", 'scatter'),
                        ("tables_ms", 'tables'),
                        ("floor_ms", 'floor')):
        runner = _build_kernel_runner(plan, low, False, probe=probe)
        if runner is None:
            res[name] = None
            continue
        jax.block_until_ready(runner())
        res[name] = round(
            profile_median(
                runner, getattr(runner, 'kernel_span',
                                'jit_run_stack_kernel')) * 1e3, 4)
    return res


def task_hi_panels(which='flagship'):
    """Hi (double-f32) tier through the PANEL kernel on silicon: factor
    math scales with occupancy, so sparse production schedules keep the
    <=1e-9 contract far above the dense hi grid's 3.6 GS/s
    (r4_hi_tier).  Parity on a readback-safe window first."""
    import jax

    from bench import build_mid_schedule
    from waveforms_tpu.ops.hi_synth import (HiSchedule, _run_panels_hi,
                                            synthesize_hi_panels)
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sparse_synth import build_panel_plan

    def hi_sparse(n=128, dur=5.2e-4, seed=0):
        # flagship-occupancy schedule from the HI_OPS set (the bench
        # flagship's Z channels use erf-edged squares, excluded from the
        # hi tier by design): 3 short gaussian x cos pulses per channel
        from waveforms_tpu import cos, gaussian, zero
        rng = np.random.default_rng(seed)
        chans = []
        for c in range(n):
            wv = zero()
            for _ in range(3):
                wv = wv + ((gaussian(60e-9)
                            >> float(rng.uniform(1e-6, dur * 0.95)))
                           * cos(2 * np.pi * (1e8 + 1e6 * c), 0.3))
            chans.append(wv)
        return chans

    chans = (build_mid_schedule() if which == 'mid' else hi_sparse())
    # small-window parity vs the f64 oracle
    chans_s = (build_mid_schedule(n_channels=8, duration=1.6e-5)
               if which == 'mid' else hi_sparse(8, dur=1.6e-5, seed=1))
    stop_s = 16.384e-6
    low_s = lower_schedule(chans_s, 0.0, stop_s, FS, keep_f64=True)
    out = synthesize_hi_panels(low_s, interpret=False)
    t = np.arange(0.0, stop_s, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans_s):
        oracle = np.real(w(t))
        scale = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(out[c] - oracle).max() / scale))

    low = lower_schedule(chans, 0.0, 524.288e-6, FS, keep_f64=True)
    dev = HiSchedule(low)
    plan = build_panel_plan(low)
    jax.block_until_ready(dev.tensors)
    tensors = dev.tensors[:2] + dev.tensors[3:]
    import jax.numpy as jnp
    C, NB, S, T, F = dev.shape

    def run():
        return _run_panels_hi(
            jnp.asarray(plan.start), jnp.asarray(plan.work_t),
            jnp.asarray(plan.work_o), jnp.asarray(plan.work_s0),
            jnp.asarray(plan.work_s1), *tensors,
            S=S, T=T, F=F, Rs=plan.Rs, P=plan.P, NP=plan.n_panels,
            ops_present=dev.ops_present, interpret=False)

    med = _measure(run, 'jit__run_panels_hi')
    n = len(chans) * low.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 2), "n_live": plan.n_live,
            "max_rel_err": worst, "parity_ok": bool(worst < 1e-9)}


def task_seq_packed(n_shots=100, Rs=8, out16=False):
    """Shot-PACKED playback on silicon: the whole sequence rides one
    panel-kernel launch (grid steps ~ output panels, not shots), so both
    the per-shot step machinery AND the full-tile factor math of the
    vmapped play_many path disappear.  Parity vs play() per shot."""
    import importlib

    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build('readme_demo_10k')
    low = lower_schedule(chans, start, stop, fs)
    seq = Sequencer([low, low])
    ks = jnp.asarray(np.arange(n_shots) % 2, jnp.int32)
    dt = jnp.int16 if out16 else None

    @jax.jit
    def play_shots(ks):
        return seq.play_packed(ks, Rs=Rs, out_dtype=dt)

    out = play_shots(ks)
    out.block_until_ready()
    a = np.asarray(out[0]).astype(np.float64)
    b = np.asarray(out[1]).astype(np.float64)
    single0 = np.asarray(seq.play(0)).astype(np.float64)
    single1 = np.asarray(seq.play(1)).astype(np.float64)
    if out16:
        single0 = np.clip(np.round(single0 * 32767.0), -32768, 32767)
        single1 = np.clip(np.round(single1 * 32767.0), -32768, 32767)
    diff = max(float(np.abs(a - single0).max()),
               float(np.abs(b - single1).max()))
    med = profile_median(lambda: play_shots(ks), 'jit_play_shots')
    n = n_shots * len(chans) * low.n_samples
    return {"n_shots": n_shots, "Rs": Rs, "int16": out16,
            "device_ms": round(med * 1e3, 3),
            "per_shot_us": round(med / n_shots * 1e6, 3),
            "gsps": round(n / med / 1e9, 3),
            "max_abs_diff_vs_single": diff,
            "parity_ok": bool(diff < (1.0 if out16 else 1e-6))}


def task_seq_stack(n_shots=100, n_sched=16, n_pulses=30):
    """Stacked-table (stack-path) sequence playback on silicon: K
    narrow-pulse schedules' packed stack tables ride device-resident,
    shots select table slices via scalar-prefetch index maps, the whole
    sequence is ONE launch.  Parity vs the oracle per distinct schedule;
    per-shot cost compares against play_packed's ~1.75 us/shot floor
    (r4_seq_packed) -- the stack path touches only live pulse blocks."""
    import jax
    import jax.numpy as jnp

    from waveforms_tpu import cosPulse
    from waveforms_tpu.core import WaveVStack
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.stack_seq import StackSequencer

    fs = 2e9
    stop = 5.12e-6                       # 10240 samples, readme-demo size
    rng = np.random.default_rng(99)
    chans_k, lows = [], []
    for _ in range(n_sched):
        wl = [(float(a) * cosPulse(50e-9) >> o)
              for a, o in zip(rng.uniform(0.2, 1.0, n_pulses),
                              rng.uniform(0, stop - 1e-7, n_pulses))]
        ch = WaveVStack(wl)
        chans_k.append(ch)
        lows.append(lower_schedule([ch], 0, stop, fs))
    from waveforms_tpu.utils.profiling import measure_device
    seq = StackSequencer(lows)
    ks = jnp.asarray(np.arange(n_shots) % n_sched, jnp.int32)
    out = seq.play_packed(ks)
    jax.block_until_ready(out)
    t = np.arange(0, stop, 1 / fs)
    worst = 0.0
    for k in range(min(n_sched, 4)):
        want = np.asarray(chans_k[k](t), float)
        scale = max(np.abs(want).max(), 1e-30)
        worst = max(worst, float(
            np.abs(np.asarray(out[k, 0]) - want).max() / scale))
    med = measure_device(lambda: seq.play_packed(ks),
                         'jit__stack_seq_call')
    n = n_shots * lows[0].n_samples
    return {"n_shots": n_shots, "n_sched": n_sched,
            "device_ms": round(med * 1e3, 3),
            "per_shot_us": round(med / n_shots * 1e6, 3),
            "gsps": round(n / med / 1e9, 3),
            "max_rel_err": worst, "parity_ok": bool(worst < 1e-5),
            "table": seq.describe()}


def task_seq_stack_dict(n_shots=1000, n_sched=16, n_pulses=30):
    """Stacked-table playback with full vs dictionary-compacted tables,
    SAME window: the sequencer's operand stream scales with schedule
    count, so this is where compaction should pay (the single-schedule
    A/B was neutral: r4_stack_dict_ab)."""
    import os
    res = {}
    for name, flag in (("full", '0'), ("dict", '1')):
        os.environ['WFTPU_STACK_DICT'] = flag
        try:
            res[name] = task_seq_stack(n_shots, n_sched, n_pulses)
        finally:
            os.environ.pop('WFTPU_STACK_DICT', None)
    return res


def task_seq_replay(n_shots=1000):
    """Waveform-memory replay ON SILICON: the table synthesizes once into
    a device palette; each shot is a palette row gather.  Per-shot device
    cost = one row copy, the true AWG-replay floor."""
    import importlib

    import jax
    import jax.numpy as jnp

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build('readme_demo_10k')
    low = lower_schedule(chans, start, stop, fs)
    seq = Sequencer([low, low])
    ks = jnp.asarray(np.arange(n_shots) % 2, jnp.int32)
    seq.play_replay(ks[:1]).block_until_ready()   # palette + compile

    @jax.jit
    def replay(ks):
        return seq.play_replay(ks)

    out = replay(ks)
    out.block_until_ready()
    diff = float(np.abs(np.asarray(out[0]).astype(np.float64)
                        - np.asarray(seq.play(0)).astype(np.float64)).max())
    med = profile_median(lambda: replay(ks), 'jit_replay')
    n = n_shots * len(chans) * low.n_samples
    return {"n_shots": n_shots, "device_ms": round(med * 1e3, 4),
            "per_shot_us": round(med / n_shots * 1e6, 4),
            "gsps": round(n / med / 1e9, 2),
            "max_abs_diff_vs_single": diff, "parity_ok": bool(diff == 0.0)}


def task_seq_packed_station(n_shots=50, n_sched=16):
    """Shot-packed playback at LAB SCALE: a table of gate-train schedules
    (XY pulse trains at per-schedule phases, 2 ch x 200k samples each)
    played n_shots times in one launch -- the randomized-benchmarking
    usage pattern.  Per-shot output is panel-kernel territory, so this is
    the amortized surface at production shape."""
    import jax
    import jax.numpy as jnp

    from waveforms_tpu import cosPulse, mixing, square, zero
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    rng = np.random.default_rng(11)
    lows = []
    for k in range(n_sched):
        xy = zero()
        for g in range(12):
            I, _ = mixing(0.5 * cosPulse(30e-9) >> (2e-6 + g * 7.5e-6),
                          freq=-150e6, phase=float(rng.uniform(0, 6.28)),
                          DRAGScaling=1e-10)
            xy += I
        z = 0.3 * (square(80e-9, edge=10e-9) >> float(
            rng.uniform(1e-6, 9e-5)))
        lows.append(lower_schedule([xy, z], 0, 1e-4, 2e9))
    seq = Sequencer(lows)
    ks = jnp.asarray(rng.integers(0, n_sched, n_shots), jnp.int32)

    @jax.jit
    def play_shots(ks):
        return seq.play_packed(ks, Rs=8)

    out = play_shots(ks)
    out.block_until_ready()
    k0 = int(ks[0])
    diff = float(np.abs(np.asarray(out[0]).astype(np.float64)
                        - np.asarray(seq.play(k0)).astype(np.float64)
                        ).max())
    med = profile_median(lambda: play_shots(ks), 'jit_play_shots')
    n = n_shots * 2 * seq.n_samples
    return {"n_shots": n_shots, "n_schedules": n_sched,
            "device_ms": round(med * 1e3, 3),
            "per_shot_us": round(med / n_shots * 1e6, 2),
            "gsps": round(n / med / 1e9, 2),
            "max_abs_diff_vs_single": diff,
            "parity_ok": bool(diff < 1e-6)}


def task_pair_planes_parity():
    """Pair-mode sparse pinned on silicon WITHOUT complex64 transfers:
    the kernel's two f32 planes read back separately and compared against
    the complex oracle's re/im parts (the dev tunnel aborts on any
    complex transfer, poisoning the process -- round-3 finding)."""
    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import build_sparse_plan, \
        synthesize_sparse
    from waveforms_tpu.core import WaveVStack

    chans = _sparse_chans(8)
    stop = 32.768e-6
    low = lower_schedule(chans, 0.0, stop, FS, part='complex')
    dev = DeviceSchedule(low)
    plan = build_sparse_plan(low)
    jax.block_until_ready(dev.tensors)
    re, im = synthesize_sparse(dev, plan=plan, combine_pair=False)
    re = np.asarray(re)
    im = np.asarray(im)
    t = np.arange(0.0, stop, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans):
        oracle = np.asarray((w.simplify() if isinstance(w, WaveVStack)
                             else w)(t)).astype(complex)
        scale = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst,
                    float(np.abs(re[c] - oracle.real).max() / scale),
                    float(np.abs(im[c] - oracle.imag).max() / scale))
    return {"max_rel_err": worst, "ok": bool(worst < 1e-5)}


def task_sparse_step_cost_probe():
    """Localize the sparse kernel's ~1.05 us/step cost (round-4 analysis).

    Three timing-only variants on the flagship plan:
      aliased  -- production kernel (dynamic out map + aliased background)
      compact  -- same work, outputs written to block i (static monotone
                  map, no aliasing): isolates the dynamic-output/alias
                  serialization
      padded   -- production kernel with the worklist padded 4x (pure
                  overhead per extra no-op step)
    If compact drops to ~0.1-0.2 us/step, a compact+paste redesign can
    lift the flagship past the background-fill bound.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import (_run_sparse, _sparse_kernel,
                                                build_sparse_plan)

    chans = _sparse_chans()
    low = lower_schedule(chans, 0.0, 524.288e-6, FS)
    dev = DeviceSchedule(low)
    plan = build_sparse_plan(low, Rs=32)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape
    Rs = 32
    out = {"n_live": plan.n_live, "K": len(plan.work_c)}

    def timed_aliased(padx):
        work = [plan.work_c, plan.work_b, plan.work_t, plan.work_o,
                plan.work_s0, plan.work_s1]
        if padx > 1:
            K0 = len(plan.work_c)
            padn = K0 * (padx - 1)
            work = [np.concatenate([w, np.full(
                padn, {3: plan.n_tiles}.get(i, 0) if i in (2, 3)
                else 0, w.dtype)]) for i, w in enumerate(work)]
            work[2][K0:] = plan.n_tiles        # abs tile -> scratch
            work[3][K0:] = plan.n_tiles
        tensors = dev.tensors[:2] + dev.tensors[3:]

        def run():
            return _run_sparse(*[jnp.asarray(w) for w in work], *tensors,
                               None, None, S=S, T=T, F=F, Rs=Rs,
                               n_tiles=plan.n_tiles,
                               ops_present=dev.ops_present,
                               interpret=False)

        run().block_until_ready()
        return profile_median(run, 'jit__run_sparse')

    out['aliased_ms'] = round(timed_aliased(1) * 1e3, 3)
    out['aliased_pad4_ms'] = round(timed_aliased(4) * 1e3, 3)
    K = len(plan.work_c)
    out['us_per_padstep'] = round(
        (out['aliased_pad4_ms'] - out['aliased_ms']) / (3 * K) * 1e3, 3)

    # compact variant: out block = i (monotone static), no aliasing
    tensors = dev.tensors[:2] + dev.tensors[3:]

    @functools.partial(jax.jit, static_argnames=('S', 'T', 'F', 'Rs',
                                                 'ops_present'))
    def run_compact(wc, wb, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac,
                    amp, op, pw, sh, q32, args, ext, clip, *, S, T, F, Rs,
                    ops_present):
        E = ext.shape[-1]

        def smem(k, bcast=False):
            if bcast:
                return pl.BlockSpec((1, 1, 1, k),
                                    lambda i, wc, wb, wt, wo, s0, s1:
                                    (0, 0, 0, 0),
                                    memory_space=pltpu.SMEM)
            return pl.BlockSpec((1, 1, 1, k),
                                lambda i, wc, wb, wt, wo, s0, s1:
                                (wc[i], wb[i], 0, 0),
                                memory_space=pltpu.SMEM)

        def chan_smem(k):
            return pl.BlockSpec((1, 1, 1, k),
                                lambda i, wc, wb, wt, wo, s0, s1:
                                (wc[i], 0, 0, 0),
                                memory_space=pltpu.SMEM)

        out_spec = pl.BlockSpec((1, Rs, 128),
                                lambda i, wc, wb, wt, wo, s0, s1:
                                (i, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(wc.shape[0],),
            in_specs=[smem(S), smem(S), smem(S), smem(S * T), smem(S * T),
                      smem(S * T * F), smem(S * T * F), smem(S * T * F),
                      smem(S * T * F * 4),
                      smem(S * T * F * 12), smem(E, bcast=True),
                      chan_smem(2)],
            out_specs=out_spec,
        )
        base = functools.partial(_sparse_kernel, S=S, T=T, F=F, Rs=Rs,
                                 ops_present=ops_present, pair=False,
                                 dac=False)

        def kernel(*refs):
            # no aliased background here (that is the point of the
            # variant); _sparse_kernel's trailing (_bg, out) unpack gets
            # the out ref twice -- _bg is never read
            base(*refs[:-1], refs[-1], refs[-1])

        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((wc.shape[0], Rs, 128),
                                           jnp.float32),
        )(wc, wb, wt, wo, ws0, ws1, seg_lo, seg_hi, nterm, nfac, amp, op,
          pw, sh, q32, args, ext, clip)

    work = [jnp.asarray(w) for w in (plan.work_c, plan.work_b, plan.work_t,
                                     plan.work_o, plan.work_s0,
                                     plan.work_s1)]

    def crun():
        return run_compact(*work, *tensors, S=S, T=T, F=F, Rs=Rs,
                           ops_present=dev.ops_present)

    try:
        crun().block_until_ready()
        out['compact_ms'] = round(
            profile_median(crun, 'jit_run_compact') * 1e3, 3)
    except Exception as exc:
        out['compact_error'] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def task_grid_overhead_probe():
    """Decompose the worklist kernel's ~0.5 us fixed per-grid-step cost.

    Trivial-body synthetic kernels (store one (Rs, 128) block), grid
    K=4096, varying the three suspects independently:
      op13_dyn_dynout   -- 13 SMEM operands w/ dynamic index maps +
                           dynamic out map (the production shape)
      op13_dyn          -- same inputs, static out (block i)
      op2_dyn           -- 2 dynamic SMEM operands, static out
      op13_static       -- 13 operands w/ constant maps, static out
      op2_static        -- 2 operands, constant maps, static out
    us/step deltas localize the cost: operand count vs dynamic index
    maps (scalar-core work) vs the dynamic output map.  Drives the
    compact/packed-descriptor redesign decision for the mid-occupancy
    valley (VERDICT r3 ask #1)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Rs, K, L, C = 32, 4096, 64, 128
    rng = np.random.default_rng(0)
    wc = rng.integers(0, C, K).astype(np.int32)
    wo = (np.arange(K) % 256).astype(np.int32)
    tables = [jnp.asarray(np.zeros((C, 1, L), np.float32) + i)
              for i in range(13)]   # literal-1 sublane dim: SMEM blocks
    # must also satisfy divisible-or-full on their last two dims

    def variant(n_ops, dyn_in, dyn_out):
        if dyn_in:
            smem = pl.BlockSpec((1, 1, L), lambda i, wc, wo: (wc[i], 0, 0),
                                memory_space=pltpu.SMEM)
        else:
            smem = pl.BlockSpec((1, 1, L), lambda i, wc, wo: (0, 0, 0),
                                memory_space=pltpu.SMEM)
        if dyn_out:
            out_spec = pl.BlockSpec((1, Rs, 128),
                                    lambda i, wc, wo: (wo[i], 0, 0))
            out_shape = jax.ShapeDtypeStruct((256, Rs, 128), jnp.float32)
        else:
            out_spec = pl.BlockSpec((1, Rs, 128),
                                    lambda i, wc, wo: (i, 0, 0))
            out_shape = jax.ShapeDtypeStruct((K, Rs, 128), jnp.float32)

        def kernel(wc_ref, wo_ref, *rest):
            out_ref = rest[-1]
            acc = jnp.float32(0)
            for r in rest[:-1]:          # touch every operand so no DMA
                acc = acc + r[0, 0, 0]   # is dead-code-eliminated
            out_ref[0] = jnp.full((Rs, 128), acc, jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(K,),
            in_specs=[smem for _ in range(n_ops)], out_specs=out_spec)
        f = pl.pallas_call(kernel, grid_spec=grid_spec,
                           out_shape=out_shape)

        @jax.jit
        def run():
            return f(jnp.asarray(wc), jnp.asarray(wo), *tables[:n_ops])

        return run

    out = {}
    for name, cfg in dict(op13_dyn_dynout=(13, True, True),
                          op13_dyn=(13, True, False),
                          op2_dyn=(2, True, False),
                          op13_static=(13, False, False),
                          op2_static=(2, False, False)).items():
        run = variant(*cfg)
        jax.block_until_ready(run())
        med = profile_median(run, 'jit_run')
        out[name] = round(med / K * 1e6, 4)          # us per grid step
    return out


def _measure(run, prefix):
    """Warm-up + profiled median (patchable seam: the AOT lowering check
    swaps this for a compile-only probe)."""
    import jax
    jax.block_until_ready(run())
    return profile_median(run, prefix)


def task_walker_cost_probe():
    """Price the walker's building blocks on the scalar core.

    The segment walker spends its time in SMEM scalar reads, lax.cond,
    lax.switch, dynamic-trip fori_loop, and vector-valued conds; this
    measures each in isolation (K=2048-step grid, per-step repetition,
    cost = (variant - base) / reps) so the walker rewrite optimizes the
    measured expensive construct instead of a guessed one."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Rs, K, L, C = 32, 2048, 128, 8
    rng = np.random.default_rng(0)
    wc = rng.integers(0, C, K).astype(np.int32)
    table = jnp.asarray(
        rng.standard_normal((C, 1, L)).astype(np.float32))
    itab = jnp.asarray(rng.integers(0, 3, (C, 1, L)).astype(np.int32))

    def variant(body):
        smem = pl.BlockSpec((1, 1, L), lambda i, wc: (wc[i], 0, 0),
                            memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((1, Rs, 128), lambda i, wc: (i, 0, 0))

        def kernel(wc_ref, f_ref, i_ref, out_ref):
            out_ref[0] = body(f_ref, i_ref)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(K,), in_specs=[smem, smem],
            out_specs=out_spec)
        f = pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((K, Rs, 128), jnp.float32))

        @jax.jit
        def run():
            return f(jnp.asarray(wc), table, itab)

        return run

    def b_base(f_ref, i_ref):
        return jnp.full((Rs, 128), f_ref[0, 0, 0], jnp.float32)

    def b_reads(f_ref, i_ref):
        acc = jnp.float32(0)
        for k in range(64):
            acc = acc + f_ref[0, 0, k]
        return jnp.full((Rs, 128), acc, jnp.float32)

    def b_conds(f_ref, i_ref):
        acc = jnp.float32(0)
        for k in range(16):
            acc = jax.lax.cond(i_ref[0, 0, k] > 0,
                               lambda a: a + f_ref[0, 0, k],
                               lambda a: a, acc)
        return jnp.full((Rs, 128), acc, jnp.float32)

    def b_switch(f_ref, i_ref):
        acc = jnp.float32(0)
        for k in range(16):
            acc = acc + jax.lax.switch(
                i_ref[0, 0, k],
                [lambda k=k: f_ref[0, 0, k],
                 lambda k=k: f_ref[0, 0, k] * 2.0,
                 lambda k=k: f_ref[0, 0, k] + 1.0])
        return jnp.full((Rs, 128), acc, jnp.float32)

    def b_fori(f_ref, i_ref):
        n = i_ref[0, 0, 0] + 15        # dynamic trip count ~16
        acc = jax.lax.fori_loop(
            0, n, lambda j, a: a + f_ref[0, 0, j], jnp.float32(0))
        return jnp.full((Rs, 128), acc, jnp.float32)

    def b_veccond(f_ref, i_ref):
        acc = jnp.zeros((Rs, 128), jnp.float32)
        for k in range(8):
            acc = jax.lax.cond(
                i_ref[0, 0, k] > 0,
                lambda a, k=k: a + f_ref[0, 0, k],
                lambda a: a, acc)
        return acc

    def b_vecwork(f_ref, i_ref):
        # 8 masked vector accumulations (the masked/clip epilogue shape)
        acc = jnp.zeros((Rs, 128), jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Rs, 128), 0)
        for k in range(8):
            m = rows >= i_ref[0, 0, k]
            acc = acc + jnp.where(m, f_ref[0, 0, k], 0.0)
        return acc

    out = {}
    for name, body, reps in (('base', b_base, 1), ('reads64', b_reads, 64),
                             ('cond16', b_conds, 16),
                             ('switch16x3', b_switch, 16),
                             ('fori16', b_fori, 16),
                             ('veccond8', b_veccond, 8),
                             ('vecwork8', b_vecwork, 8)):
        run = variant(body)
        med = _measure(run, 'jit_run')
        out[name] = round(med / K * 1e6, 4)          # us per grid step
    base = out['base']
    out['ns_per'] = {n: round((out[n] - base) / r * 1e3, 1)
                     for n, r in (('reads64', 64), ('cond16', 16),
                                  ('switch16x3', 16), ('fori16', 16),
                                  ('veccond8', 8), ('vecwork8', 8))}
    return out


def task_hi_tier():
    """Double-f32 kernel tier ON SILICON: small-window parity (hi+lo
    combined on host vs the f64 oracle) + device rate on an occupancy-1
    carrier schedule -- the PRECISION.md intermediate-tier row."""
    import jax

    from waveforms_tpu import cos, gaussian
    from waveforms_tpu.ops.hi_synth import (HiSchedule, _run_kernel_hi,
                                            synthesize_hi)
    from waveforms_tpu.ops.lowering import lower_schedule

    def mk(n, dur):
        return [gaussian(3 * dur) * cos(2 * np.pi * (100e6 + 1e6 * c), 0.3)
                >> (dur / 2) for c in range(n)]

    # parity on a readback-safe window
    stop_s = 32.768e-6
    chans_s = mk(8, stop_s)
    low_s = lower_schedule(chans_s, 0.0, stop_s, FS, keep_f64=True)
    out = synthesize_hi(low_s)
    t = np.arange(0.0, stop_s, 1 / FS)
    worst = 0.0
    for c, w in enumerate(chans_s):
        oracle = w(t)
        scale = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(out[c] - oracle).max() / scale))

    # device rate on the full 524 us window (two f32 output planes)
    dur = 524.288e-6
    chans = mk(128, dur)
    low = lower_schedule(chans, 0.0, dur, FS, keep_f64=True)
    dev = HiSchedule(low)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape
    R = 256
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    import jax.numpy as jnp
    row0 = jnp.zeros((1, 1, 1, 1), jnp.int32)

    def run():
        return _run_kernel_hi(row0, *dev.tensors, S=S, T=T, F=F, R=R,
                              n_rows=n_rows, tiles_per_bucket=1,
                              ops_present=dev.ops_present)

    jax.block_until_ready(run())
    med = profile_median(run, 'jit__run_kernel_hi')
    n = len(chans) * dev.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 2),
            "max_rel_err": worst, "parity_ok": bool(worst < 1e-9)}


def task_hi_ops_r5():
    """Round-5 hi-tier opcode closures ON SILICON: erf (df32 three-regime
    form), cosh edges, d_gaussian (poly_gauss in df), mollifier d=0, and
    an exotic chirp through the 5e-10 rad window fit.  The CPU interpret
    tests pin these at 1e-9 via the f64 EFT guard; this row proves the
    GUARD-FREE Mosaic trace (plain f32 EFTs on the VPU) holds the same
    contract -- plus the device rate on an erf-edged flux schedule."""
    import jax

    from waveforms_tpu.models import shapes as sh
    from waveforms_tpu.ops.hi_synth import (HiSchedule, _run_kernel_hi,
                                            synthesize_hi)
    from waveforms_tpu.ops.lowering import lower_schedule

    # parity on a readback-safe window, one channel per new opcode
    stop_s = 32.768e-6
    chans_s = [
        sh.square(8e-6, edge=2e-7, type='erf') >> 12e-6,
        (sh.step(2e-6) >> 6e-6) * sh.cos(2 * np.pi * 3e7, 0.4),
        sh.coshPulse(4e-6, plateau=2e-6) >> 12e-6,
        sh.gaussian(4e-6, d=2) >> 12e-6,
        sh.mollifier(8e-6, plateau=2e-6) >> 12e-6,
        sh.chirp(1e6, 8e7, stop_s, type='exponential')
        * sh.gaussian(2e-5) >> 12e-6,
    ]
    low_s = lower_schedule(chans_s, 0.0, stop_s, FS, keep_f64=True)
    out = synthesize_hi(low_s)
    t = np.arange(0.0, stop_s, 1 / FS)
    worst = 0.0
    per = []
    for c, w in enumerate(chans_s):
        oracle = np.real(np.asarray(w(t), complex))
        scale = max(np.abs(oracle).max(), 1e-30)
        err = float(np.abs(out[c] - oracle).max() / scale)
        per.append(round(err, 15))
        worst = max(worst, err)

    # device rate: 128-channel erf-edged flux schedule (station Z lines)
    dur = 524.288e-6
    rng = np.random.default_rng(5)
    chans = [sum((0.3 * (sh.square(2e-6, edge=2e-8, type='erf')
                         >> float(o)))
                 for o in rng.uniform(2e-6, dur - 3e-6, 8))
             for _ in range(128)]
    low = lower_schedule(chans, 0.0, dur, FS, keep_f64=True)
    dev = HiSchedule(low)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape
    import jax.numpy as jnp
    R = 256
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    row0 = jnp.zeros((1, 1, 1, 1), jnp.int32)

    def run():
        return _run_kernel_hi(row0, *dev.tensors, S=S, T=T, F=F, R=R,
                              n_rows=n_rows, tiles_per_bucket=1,
                              ops_present=dev.ops_present)

    jax.block_until_ready(run())
    med = profile_median(run, 'jit__run_kernel_hi')
    n = len(chans) * dev.n_samples
    return {"per_op_rel_err": per, "max_rel_err": worst,
            "parity_ok": bool(worst < 1e-9),
            "erf_flux_device_ms": round(med * 1e3, 3),
            "erf_flux_gsps": round(n / med / 1e9, 2)}


def task_stack_scdot_ab(row='vstack_1000x200k'):
    """Superchunk-batched scatter dot A/B, SAME chip window, with an
    on-chip oracle parity check for the batched output (interpret mode
    proved bit-identity, but the widened SC*128-lane bf16 one-hot is a
    new operand shape on real MXU).  The probe decomposition put the
    per-strip dot machinery at 19.1 of 21.4 us on this row (r4j probe8);
    batching collapses 3*SC*n_groups dots per grid step into 3."""
    import importlib
    import os

    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops import stack_synth as st

    bench_suite = importlib.import_module('bench_suite')
    chans, start, stop, fs = bench_suite.build(row)
    low = lower_schedule(chans, start, stop, fs)
    t = np.arange(start, stop, 1 / fs)
    oracle = np.stack([np.asarray(w(t), float) for w in chans])
    scale = max(np.abs(oracle).max(), 1e-30)
    res = {}
    try:
        for name, flag in (("perchunk", '0'), ("batched", 'auto')):
            os.environ['WFTPU_STACK_SCDOT'] = flag
            plan = st.build_stack_plan(low)
            runner = st._build_kernel_runner(plan, low, False)
            res[name + "_engaged"] = bool(runner.scdot)
            out = np.asarray(runner())
            res[name + "_rel_err"] = float(
                np.abs(out - oracle).max() / scale)
            med = profile_median(runner, runner.kernel_span)
            res[name + "_ms"] = round(med * 1e3, 4)
    finally:
        os.environ.pop('WFTPU_STACK_SCDOT', None)
    n = len(chans) * low.n_samples
    best = min(res["perchunk_ms"], res["batched_ms"])
    res["best_gsps"] = round(n / (best * 1e-3) / 1e9, 3)
    res["parity_ok"] = max(res["perchunk_rel_err"],
                           res["batched_rel_err"]) < 1e-6
    return res


def task_occ_scdot_ab(n_pulses=120):
    """Forced batched scatter on an occupancy-ladder rung.

    The auto waste rule declines these many-overlap schedules (padded
    slots ~2-3x live work), but the saved dot machinery may still win:
    if forced-on beats per-chunk here, the 1.6x threshold is too strict
    and gets recalibrated from this row."""
    import importlib
    import os

    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops import stack_synth as st

    dur = 524.288e-6
    chans = _ladder_chans(n_pulses)
    low = lower_schedule(chans, 0.0, dur, FS)
    res = {"n_pulses": n_pulses}
    try:
        for name, flag in (("perchunk", '0'), ("forced", '1')):
            os.environ['WFTPU_STACK_SCDOT'] = flag
            plan = st.build_stack_plan(low)
            runner = st._build_kernel_runner(plan, low, False)
            res[name + "_engaged"] = bool(runner.scdot)
            out4 = np.asarray(runner()[:4])
            t = np.arange(0.0, dur, 1 / FS)
            worst = 0.0
            for c in range(4):
                oracle = np.real(chans[c](t))
                s = max(np.abs(oracle).max(), 1e-30)
                worst = max(worst, float(
                    np.abs(out4[c, :len(t)] - oracle).max() / s))
            res[name + "_rel_err"] = worst
            med = profile_median(runner, runner.kernel_span)
            res[name + "_ms"] = round(med * 1e3, 4)
    finally:
        os.environ.pop('WFTPU_STACK_SCDOT', None)
    n = len(chans) * low.n_samples
    best = min(res["perchunk_ms"], res["forced_ms"])
    res["best_gsps"] = round(n / (best * 1e-3) / 1e9, 3)
    return res


def task_hi_ext_ops_r5():
    """Round-5 close of the LAST hi-tier opcode holes ON SILICON:
    multi-tone DRAG (OP_DRAG_SIN/SINX -- the f64 ext coefficient block
    carried as hi/lo SMEM planes, blend Horner as a fori_loop) and
    mollifier derivatives d=1..3 (df polynomial + denominator powers).
    Parity on a readback-safe window against the host f64 oracle, plus
    the device rate on a 64-channel XY-line drag_sin schedule (the
    reference's multy_drag.py production shape)."""
    import jax

    from waveforms_tpu.models import shapes as sh
    from waveforms_tpu.models.multy_drag import drag_sin, drag_sinx
    from waveforms_tpu.ops.hi_synth import (HiSchedule, _run_kernel_hi,
                                            synthesize_hi)
    from waveforms_tpu.ops.lowering import lower_schedule

    stop_s = 32.768e-6
    chans_s = [
        drag_sin(2e8, 22e-9, plateau=6e-9, delta=3e6,
                 block_freq=(2.5e8, 2.8e8), phase=0.4, t0=12e-6),
        drag_sinx(2e8, 22e-9, plateau=6e-9, delta=3e6,
                  block_freq=(2.5e8,), phase=0.1, t0=12e-6),
        sh.mollifier(8e-6, d=1) >> 12e-6,
        sh.mollifier(8e-6, d=2) >> 12e-6,
        sh.mollifier(8e-6, d=3) >> 12e-6,
    ]
    low_s = lower_schedule(chans_s, 0.0, stop_s, FS, keep_f64=True)
    out = synthesize_hi(low_s)
    t = np.arange(0.0, stop_s, 1 / FS)
    worst = 0.0
    per = []
    for c, w in enumerate(chans_s):
        oracle = np.real(np.asarray(w(t), complex))
        scale = max(np.abs(oracle).max(), 1e-30)
        err = float(np.abs(out[c] - oracle).max() / scale)
        per.append(round(err, 15))
        worst = max(worst, err)

    # device rate: 64 XY lines x 24 drag_sin gates over 524 us
    dur = 524.288e-6
    rng = np.random.default_rng(7)
    chans = [sum((drag_sin(2e8, 22e-9, plateau=6e-9, delta=3e6,
                           block_freq=(2.5e8,), phase=float(p),
                           t0=float(o)))
                 for o, p in zip(rng.uniform(2e-6, dur - 1e-6, 24),
                                 rng.uniform(0, 6.28, 24)))
             for _ in range(64)]
    low = lower_schedule(chans, 0.0, dur, FS, keep_f64=True)
    dev = HiSchedule(low)
    jax.block_until_ready(dev.tensors)
    C, NB, S, T, F = dev.shape
    import jax.numpy as jnp
    R = 256
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // R) * R
    row0 = jnp.zeros((1, 1, 1, 1), jnp.int32)

    def run():
        return _run_kernel_hi(row0, *dev.tensors, S=S, T=T, F=F, R=R,
                              n_rows=n_rows, tiles_per_bucket=1,
                              ops_present=dev.ops_present)

    jax.block_until_ready(run())
    med = profile_median(run, 'jit__run_kernel_hi')
    n = len(chans) * dev.n_samples
    return {"per_op_rel_err": per, "max_rel_err": worst,
            "parity_ok": bool(worst < 1e-9),
            "drag_sin_device_ms": round(med * 1e3, 3),
            "drag_sin_gsps": round(n / med / 1e9, 2)}


def task_hi_routed_flux_r5():
    """The PRODUCTION hi entry on the erf-flux schedule: r5_hi_ops
    measured the dense hi kernel at 1.99 GS/s, but the router sends this
    ~3%-occupancy schedule through the hi PANEL kernel -- this row
    records what `precision='double'` actually delivers."""
    import jax

    from waveforms_tpu.models import shapes as sh
    from waveforms_tpu.ops.hi_synth import (HiSchedule,
                                            synthesize_hi_panels)
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sparse_synth import build_panel_plan
    from waveforms_tpu.utils.profiling import measure_device

    dur = 524.288e-6
    rng = np.random.default_rng(5)
    chans = [sum((0.3 * (sh.square(2e-6, edge=2e-8, type='erf')
                         >> float(o)))
                 for o in rng.uniform(2e-6, dur - 3e-6, 8))
             for _ in range(128)]
    low = lower_schedule(chans, 0.0, dur, FS, keep_f64=True)
    dev = HiSchedule(low)
    plan = build_panel_plan(low)

    def run():
        return synthesize_hi_panels(dev, low, plan=plan, combine=False)

    jax.block_until_ready(run())
    med = measure_device(run, 'jit__run_panels_hi')
    n = len(chans) * low.n_samples
    # parity spot-check on one channel (small readback)
    hi, lo = run()
    got = (np.asarray(hi[0], np.float64) + np.asarray(lo[0], np.float64))
    t = np.arange(0.0, dur, 1 / FS)
    want = np.asarray(chans[0](t), float)
    scale = max(np.abs(want).max(), 1e-30)
    err = float(np.abs(got[:len(t)] - want).max() / scale)
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 2),
            "max_rel_err": err, "parity_ok": bool(err < 1e-9)}


def task_panels_int16(which):
    """Panel kernel with int16 DAC-code stores: halves output bytes, the
    only lever left once the f32 panel run hits the store roofline.
    Parity: codes must equal round(f32 * 32767) exactly (int16 is exact
    on this chip, `int16_parity`), checked on a small window."""
    import jax
    import jax.numpy as jnp

    from bench import build_mid_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import (build_panel_plan,
                                                synthesize_panels)

    chans = (build_mid_schedule() if which == 'mid' else _sparse_chans())
    low = lower_schedule(chans, 0.0, 524.288e-6, FS)
    dev = DeviceSchedule(low)
    plan = build_panel_plan(low)
    jax.block_until_ready(dev.tensors)

    # small-window code parity vs the f32 panel output
    chans_s = (build_mid_schedule(n_channels=8) if which == 'mid'
               else _sparse_chans(8))
    low_s = lower_schedule(chans_s, 0.0, 16.384e-6, FS)
    dev_s = DeviceSchedule(low_s)
    f32 = np.asarray(synthesize_panels(dev_s, low=low_s))
    codes_s = np.asarray(synthesize_panels(dev_s, low=low_s,
                                           out_dtype=jnp.int16))
    want = np.clip(np.round(f32 * 32767.0), -32768, 32767).astype(np.int16)
    n_bad = int((codes_s != want).sum())

    def run():
        return synthesize_panels(dev, plan=plan, out_dtype=jnp.int16)

    med = _measure(run, 'jit__run_panels')
    n = len(chans) * low.n_samples
    return {"device_ms": round(med * 1e3, 3),
            "gsps": round(n / med / 1e9, 1), "n_live": plan.n_live,
            "code_mismatches": n_bad, "parity_ok": n_bad == 0}


def task_suite_routed(name):
    """BASELINE.md row through the ENGINE's own route classifier: time the
    kernel the production entry point picks (round-4 panel routing), with
    an oracle parity readback first (these rows are readback-safe sizes).
    """
    import importlib

    import jax

    bench_suite = importlib.import_module('bench_suite')
    from waveforms_tpu.engine import classify_pallas_route
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule

    chans, start, stop, fs = bench_suite.build(name)
    low = lower_schedule(chans, start, stop, fs)
    kind, plan = classify_pallas_route(low)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    if kind == 'panel':
        from waveforms_tpu.ops.sparse_synth import synthesize_panels

        def run():
            return synthesize_panels(dev, plan=plan)

        span = 'jit__run_panels'
    elif kind == 'sparse':
        from waveforms_tpu.ops.sparse_synth import synthesize_sparse

        def run():
            return synthesize_sparse(dev, plan=plan)

        span = 'jit__run_sparse'
    else:
        from waveforms_tpu.ops.pallas_synth import (default_rows_per_tile,
                                                    synthesize_device)
        C, NB, S, T, F = dev.shape
        R = default_rows_per_tile(dev.n_samples, dev.bucket_samples, NB)

        def run():
            return synthesize_device(dev, rows_per_tile=R)

        span = 'jit__run_kernel'
    out = np.asarray(run())
    t = np.arange(start, stop, 1 / fs)
    worst = 0.0
    for c, w in enumerate(chans):
        oracle = np.real(w(t))
        s = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(np.abs(out[c, :len(t)] - oracle).max() / s))
    med = profile_median(run, span)
    rate = len(chans) * low.n_samples / med
    return {"gsps": round(rate / 1e9, 4), "path": kind,
            "device_ms": round(med * 1e3, 4),
            "max_rel_err": worst, "parity_ok": bool(worst < 1e-5),
            "vs_reference_cpu": round(rate / bench_suite.REF[name], 1)}


def _ladder_chans(n_pulses, n_channels=128, duration=524.288e-6, seed=5):
    """Occupancy-ladder schedules: n_pulses 200 ns mixed pulses/channel
    over a 524 us window (25 pulses ~ 10% subtile occupancy at Rs=32)."""
    from waveforms_tpu import cosPulse, mixing, zero
    rng = np.random.default_rng(seed)
    chans = []
    for c in range(n_channels):
        x = zero()
        for _ in range(n_pulses):
            I, _ = mixing(
                0.5 * cosPulse(200e-9) >> rng.uniform(0, duration * 0.9),
                freq=-150e6 - 2e6 * c, DRAGScaling=1e-10)
            x += I
        chans.append(x)
    return chans


def task_occ_ladder(n_pulses):
    """Race panel kernel vs fine-skip dense at one occupancy rung; the
    crossover pins PANEL_OCCUPANCY_THRESHOLD (engine auto routing)."""
    import jax

    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import (build_panel_plan,
                                                panels_eligible,
                                                synthesize_panels)

    dur = 524.288e-6
    chans = _ladder_chans(n_pulses)
    low = lower_schedule(chans, 0.0, dur, FS)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    res = {"n_pulses": n_pulses}
    n = len(chans) * low.n_samples
    plan = build_panel_plan(low)
    res["occupied"] = round(plan.occupied_fraction, 4)
    if panels_eligible(plan, np.float32, False):

        def prun():
            return synthesize_panels(dev, plan=plan)

        med = _measure(prun, 'jit__run_panels')
        res["panel_gsps"] = round(n / med / 1e9, 1)
        res["panel_ms"] = round(med * 1e3, 3)
    else:
        # outside the SMEM budget at this rung: WINDOWED panels (round
        # 4: item-balanced tile windows, one launch each)
        from waveforms_tpu.ops.sparse_synth import plan_panel_windows
        plans = plan_panel_windows(low)
        if plans is None:
            res["panel_gsps"] = None
        else:
            total = 0.0
            for p in plans:
                def prun(p=p):
                    return synthesize_panels(dev, plan=p)

                total += _measure(prun, 'jit__run_panels')
            res["panel_windows"] = len(plans)
            res["panel_gsps"] = round(n / total / 1e9, 1)
            res["panel_ms"] = round(total * 1e3, 3)
    R = 256
    drun, _, _ = _kernel_runner(chans, 0.0, dur, R)
    med = _measure(drun, 'jit__run_kernel')
    res["dense_fine_gsps"] = round(n / med / 1e9, 1)
    res["dense_fine_ms"] = round(med * 1e3, 3)
    return res


def task_panel_headline():
    """Flagship 1 ms schedule through the panel kernel as two 524 us tile
    windows (the >0.6 GB single-output abort workaround) -- the round-4
    headline: window placement is window-relative via PanelPlan.work_o."""
    import jax

    from bench import TOTAL_SAMPLES, build_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import (build_panel_plan,
                                                synthesize_panels)

    chans = build_schedule()
    low = lower_schedule(chans, 0.0, 1e-3, FS)
    dev = DeviceSchedule(low)
    jax.block_until_ready(dev.tensors)
    Rs = 32
    n_rows = -(-low.n_samples // 128)
    n_tiles = -(-n_rows // Rs)
    half = n_tiles // 2
    total = 0.0
    raw = []
    for win in ((0, half), (half, n_tiles)):
        plan = build_panel_plan(low, Rs=Rs, tile_window=win)

        def run():
            return synthesize_panels(dev, plan=plan)

        med = _measure(run, 'jit__run_panels')
        raw.append(round(med, 6))
        total += med
    gsps = len(chans) * TOTAL_SAMPLES / total / 1e9
    return {"gsps": round(gsps, 1), "device_ms": round(total * 1e3, 3),
            "windows": 2, "window_raw_s": raw,
            "note": "1GB single-window output aborts this tunnel; "
                    "panel windows via work_o"}


def task_dense_fine_ab():
    """Same-window fine-skip A/B (VERDICT r5 ask #2): the prologue +
    per-tile branch cost on the occupancy-1 dense stratum and on the
    flagship schedule, fine compiled OUT vs IN.  Decides / validates the
    host-side fine_would_engage gate (occ-1 now auto-compiles fine=False;
    this row is the evidence for TUNING.md 7e)."""
    res = {}
    for name, chans in (('dense', _dense_chans(524.288e-6)),
                        ('flagship', _sparse_chans())):
        n = None
        for fine in (False, True):
            run, dev, n_rows = _kernel_runner(chans, 0.0, 524.288e-6, 256,
                                              fine=fine)
            run().block_until_ready()
            med = profile_median(run, 'jit__run_kernel')
            n = len(chans) * dev.n_samples
            res[f"{name}_fine{int(fine)}_ms"] = round(med * 1e3, 3)
            res[f"{name}_fine{int(fine)}_gsps"] = round(n / med / 1e9, 1)
    # the production auto gate's decisions for the two schedules
    from bench import build_dense_schedule, build_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                fine_would_engage)
    for name, chans in (('dense', build_dense_schedule(
            duration=524.288e-6)), ('flagship', build_schedule())):
        low = lower_schedule(chans, 0.0, 524.288e-6, FS)
        dev = DeviceSchedule(low)
        n_rows = -(-(-(-low.n_samples // 128)) // 256) * 256
        res[f"{name}_auto_fine"] = bool(
            fine_would_engage(dev, 256, n_rows))
    return res


def task_bench_fresh():
    """bench.py --inner in a CLEAN-env child process: the driver twin.

    Round 4's official capture lost the panel headline to an exception
    bench.py swallowed (a stale 3-arg panels_eligible call).  This task
    (a) validates the exact code path the round-end driver runs, env
    stripped of WFTPU_* levers, and (b) seeds the persistent compile
    cache with the exact keys that fresh process hits.  The recorded row
    IS the round's reproducibility proof: degraded must be absent."""
    import signal
    import subprocess
    signal.alarm(560)          # this task legitimately outlives the 300 s
    env = {k: v for k, v in os.environ.items()
           if not k.startswith('WFTPU_')}
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), '..', 'bench.py'),
         '--inner'],
        capture_output=True, text=True, timeout=540, env=env)
    if out.returncode != 0:
        raise RuntimeError((out.stderr or '')[-300:])
    js = json.loads(out.stdout.strip().splitlines()[-1])
    keys = ('value', 'flagship_gsps', 'mid_gsps', 'mid_best_path',
            'panel_kernel_gsps', 'flagship_int16_gsps',
            'sparse_kernel_gsps', 'grid_kernel_gsps', 'degraded')
    return {k: js[k] for k in keys if k in js}


def task_overlap_bound():
    """Price the overlap100_drag_2200 floor (VERDICT r5 ask #7): the
    minimal eval work is 100 DRAG instances x ~1000-sample supports of
    envelope+quadrature math (~4 transcendentals + ~20 flops/sample),
    with no tables, no scatter, no launch machinery.  A plain jitted XLA
    elementwise pass over the same (100, 1024) sample block IS that
    floor on this chip's VPU; compare against the stack kernel's
    measured full/eval times (r4_stack_cost_probe_overlap)."""
    import jax
    import jax.numpy as jnp
    n_inst, n_sup = 100, 1024
    t = jnp.linspace(0.0, 5e-7, n_sup, dtype=jnp.float32)
    t = jnp.broadcast_to(t, (n_inst, n_sup))
    w = jnp.linspace(6e8, 6.3e8, n_inst,
                     dtype=jnp.float32).reshape(n_inst, 1)

    @jax.jit
    def drag_eval(t, w):
        # per-sample model of one lowered DRAG instance: gaussian-edged
        # envelope (exp), quadrature carrier (sin+cos), derivative term
        u = (t - 2.5e-7) * 4e6
        env = jnp.exp(-0.5 * u * u)
        denv = -u * env * 4e6
        ph = w * t
        return env * jnp.cos(ph) + 2e-9 * denv * jnp.sin(ph)

    drag_eval(t, w).block_until_ready()
    med = profile_median(lambda: drag_eval(t, w), 'jit_drag_eval')
    state = load_state()
    return {"minimal_eval_us": round(med * 1e6, 3),
            "n_inst": n_inst, "n_sup": n_sup,
            "kernel_probe_us": {
                k: round(v * 1e3, 1)
                for k, v in state.get('r4_stack_cost_probe_overlap',
                                      {}).items()
                if isinstance(v, (int, float)) and k.endswith('_ms')},
            "note": "floor = pure-XLA eval of the same live samples; "
                    "everything above it is table/scatter/launch"}


def task_occ_ladder_stack(n_pulses):
    """Stack-path rung for the 20-60% occupancy band (VERDICT r5 ask #3).

    classify_pallas_route already routes these many-overlap schedules to
    the pulse-instance stack path (advantage ~40 at 128 channels: 120
    random 200 ns pulses touch 39% of subtiles but only ~4.6% of
    samples); round 4 raced only panel vs dense here.  Targets: >= 15
    GS/s at 39% subtile occupancy, >= 10 GS/s at 55%."""
    import jax

    from waveforms_tpu.engine import classify_pallas_route
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.stack_synth import synthesize_stack
    from waveforms_tpu.utils.profiling import measure_device

    from waveforms_tpu.ops.stack_synth import build_stack_plan

    dur = 524.288e-6
    chans = _ladder_chans(n_pulses)
    low = lower_schedule(chans, 0.0, dur, FS)
    kind, _ = classify_pallas_route(low)
    res = {"n_pulses": n_pulses, "route": kind}
    # measure the stack path even when the router picked another engine:
    # the rung-vs-rung crossover is what re-tunes the route thresholds
    plan = build_stack_plan(low)
    if plan is None:
        return res
    res.update({"advantage": round(plan.advantage, 1),
                "n_narrow": plan.n_narrow,
                "wide_residual": plan.wide is not None})

    # parity readback on a channel slice (full 537 MB d2h aborts tunnel)
    out4 = np.asarray(synthesize_stack(low, plan)[:4])
    t = np.arange(0.0, dur, 1 / FS)
    worst = 0.0
    for c in range(4):
        oracle = np.real(chans[c](t))
        s = max(np.abs(oracle).max(), 1e-30)
        worst = max(worst, float(
            np.abs(out4[c, :len(t)] - oracle).max() / s))
    res.update({"max_rel_err": worst, "parity_ok": bool(worst < 1e-5)})

    def run():
        return synthesize_stack(low, plan)

    jax.block_until_ready(run())
    runner = next((v for k, v in vars(plan).items()
                   if k.startswith('_runner') and not k.startswith(
                       '_runner_is_xla') and v is not None), None)
    span = getattr(runner, 'kernel_span', 'jit_run_stack')
    med = measure_device(run, span)
    n = len(chans) * low.n_samples
    res.update({"span": span, "device_ms": round(med * 1e3, 3),
                "stack_gsps": round(n / med / 1e9, 2)})
    return res


def task_fine_gate():
    """Record the cost-based fine-skip gate's decisions (host-only row).

    The gate engages fine iff the walk saves >= FINE_GATE_UNITS_PER_TILE
    sub-block evals per tile; this row pins the decision + the saved-work
    metric for the four calibration schedules so threshold drift is
    visible.  Expected: mid/ladder True, flagship/dense False (matching
    the measured A/Bs r5_dense_fine_ab + r4_mid_dense_*)."""
    from bench import build_dense_schedule, build_mid_schedule, \
        build_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import (DeviceSchedule,
                                                fine_would_engage)
    res = {}
    for name, chans in (('flagship', build_schedule()),
                        ('dense', build_dense_schedule(
                            duration=524.288e-6)),
                        ('mid', build_mid_schedule()),
                        ('ladder120', _ladder_chans(120))):
        low = lower_schedule(chans, 0.0, 524.288e-6, FS)
        dev = DeviceSchedule(low)
        n_rows = -(- -(-low.n_samples // 128) // 256) * 256
        res[name] = bool(fine_would_engage(dev, 256, n_rows))
    return res


def pending_tasks(state):
    tasks = []
    for R in SWEEP_R:
        for ds in SWEEP_DS:
            key = f"sweep_R{R}_{'pa' if ds else 'none'}"
            tasks.append((key, lambda R=R, ds=ds: task_sweep(R, ds)))
    tasks.append(("fill_roofline", task_fill_roofline))
    cfg = best_sweep(state)
    if cfg is not None:
        R, ds = cfg
        tasks.append((f"dense_R{R}", lambda: task_dense(R, ds)))
        tasks.append((f"headline_windowed_R{R}",
                      lambda: task_headline(R, ds)))
        tasks.append((f"bf16_R{R}", lambda: task_bf16(R, ds)))
    tasks.append(("parity_small", task_parity_small))
    tasks.append(("int16_parity", task_int16_parity))
    for R in (256, 128):
        tasks.append((f"floor_zero_R{R}", lambda R=R: task_floor(R)))
    for row in SUITE_ROWS:
        tasks.append((f"suite_{row}", lambda row=row: task_suite_row(row)))
    for Rs in (32, 16, 64):
        tasks.append((f"sparse_Rs{Rs}", lambda Rs=Rs: task_sparse(Rs)))
    for kind in ('cos', 'gauss', 'chirp'):
        tasks.append((f"dense_probe_{kind}",
                      lambda kind=kind: task_dense_probe(kind)))
    # r3: polynomial sin/cos kernel (exact int32-turn range reduction) --
    # re-measure the trig-bound rows and re-pin on-chip parity
    tasks.append(("r3_parity_small", task_parity_small))
    for kind in ('cos', 'chirp'):
        tasks.append((f"r3_poly_probe_{kind}",
                      lambda kind=kind: task_dense_probe(kind)))
    tasks.append(("r3_dense_R256", lambda: task_dense(256, None)))
    tasks.append(("r3_sweep_R256", lambda: task_sweep(256, None)))
    tasks.append(("r3_headline_R256", lambda: task_headline(256, None)))
    tasks.append(("r3_sparse_Rs32", lambda: task_sparse(32)))
    for row in ('readme_demo_10k', 'dense_chirp_2M', 'xy_z_pair_200k'):
        tasks.append((f"r3_suite_{row}", lambda row=row: task_suite_row(row)))
    # stack-heavy rows via the pulse-instance batched path
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r3_stack_{row}", lambda row=row: task_stack_row(row)))
    tasks.append(("r3_xla_x64", task_x64_probe))
    # final round-3 confirmations after the tile-covering fast path
    tasks.append(("r3final_sparse_Rs32", lambda: task_sparse(32)))
    tasks.append(("r3final_suite_flux_iir_1M",
                  lambda: task_suite_row('flux_iir_1M')))
    tasks.append(("r3final_parity_small", task_parity_small))
    # dense-stratum tile-height sweep (the flagship sweep optimized the
    # sparse schedule; occupancy-1 work may prefer a different R)
    for R in (128, 512):
        tasks.append((f"r3x_dense_R{R}", lambda R=R: task_dense(R, None)))
    tasks.append(("r3_seq_sparse_play", task_seq_sparse))
    # mid-occupancy (~1%) stratum: Rs sweep for the worklist kernel
    for Rs in (16, 32, 64):
        tasks.append((f"r3m_mid_Rs{Rs}", lambda Rs=Rs: task_mid_sparse(Rs)))
    # ---- round 4 ---------------------------------------------------------
    # parity first (fine-skip walk on silicon), then the valley fix rows
    tasks.append(("r4_parity_fine", task_parity_fine))
    tasks.append(("r4_parity_small", task_parity_small))
    tasks.append(("r4_mid_dense_fine", lambda: task_mid_dense(True)))
    tasks.append(("r4_mid_dense_nofine", lambda: task_mid_dense(False)))
    tasks.append(("r4m_mid_Rs32", lambda: task_mid_sparse(32)))
    tasks.append(("r4_dense_R256", lambda: task_dense(256, None)))
    tasks.append(("r4_sparse_Rs32", lambda: task_sparse(32)))
    tasks.append(("r4_flagship_dense_fine", task_flagship_dense_fine))
    # stack rows through the new single-kernel runner
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4_stack_{row}", lambda row=row: task_stack_row(row)))
    # suite rows whose regime the fine walk changes
    for row in ('xy_z_pair_200k', 'readme_demo_10k'):
        tasks.append((f"r4_suite_{row}", lambda row=row: task_suite_row(row)))
    # amortized shot loop + pair-mode silicon pin
    tasks.append(("r4_seq_amortized", task_seq_amortized))
    tasks.append(("r4_pair_planes_parity", task_pair_planes_parity))
    tasks.append(("r4_hi_tier", task_hi_tier))
    tasks.append(("r4_sparse_step_probe", task_sparse_step_cost_probe))
    tasks.append(("r4_routing_summary", task_mid_sparse_vs_dense_summary))
    # retake: first probe attempt hit the compact variant's missing-bg
    # unpack bug; this rerun carries the wrapper fix
    tasks.append(("r4_sparse_step_probe2", task_sparse_step_cost_probe))
    # retake: first r4 stack rows ran on the XLA fallback (the kernel's
    # table blocks violated Mosaic's (8, 128) divisibility rule); these
    # rerun with the lane-padded tables, which lower cleanly (AOT-checked
    # in tools/check_tpu_lowering.py)
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4b_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    # retake 2: r4b still fell back -- the SMEM counts block (1, 1) over
    # (n_chunks, 1) violates Mosaic's divisible-or-full rule whenever
    # n_chunks > 1 (the AOT check's single-chunk schedule masked it);
    # counts now ride whole-in-SMEM indexed by program_id
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4c_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    tasks.append(("r4_grid_overhead_probe", task_grid_overhead_probe))
    tasks.append(("r4_walker_cost_probe", task_walker_cost_probe))
    # panel kernel (the probe-driven redesign): valley + flagship strata,
    # plus a panel-height sweep on the mid stratum
    tasks.append(("r4_panel_mid", lambda: task_panels('mid')))
    tasks.append(("r4_panel_flagship", lambda: task_panels('flagship')))
    for pr in (2048, 8192):
        tasks.append((f"r4_panel_mid_P{pr}",
                      lambda pr=pr: task_panels('mid', panel_rows=pr)))
    # panel routing landed in the engine: re-time the suite rows through
    # the production classifier, pin the panel/dense crossover, and take
    # the windowed panel headline
    tasks.append(("r4_panel_headline", task_panel_headline))
    for row in ('readme_demo_10k', 'xy_z_pair_200k'):
        tasks.append((f"r4p_suite_{row}",
                      lambda row=row: task_suite_routed(row)))
    for np_ in (60, 120, 200):
        tasks.append((f"r4_occ_ladder_{np_}",
                      lambda np_=np_: task_occ_ladder(np_)))
    # the panel kernel sits AT the f32 store roofline (r4_panel_flagship
    # 0.827 ms vs 0.818 ms fill): int16 DAC codes halve the output bytes,
    # the only remaining lever in the store-bound regime
    tasks.append(("r4_panel_flagship_int16",
                  lambda: task_panels_int16('flagship')))
    # stack kernel retake 3: the packed single-table layout (int columns
    # bitcast into one lane-padded f32 table) cuts table streaming 3-4x
    # vs the r4c separate-table kernel, whose 44 us was table-bound
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4d_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    # shot-packed sequence playback (play_packed): one panel launch for
    # the whole sequence -- the amortized-shot ask's real answer (the
    # vmapped play_many still paid ~2.5 us/shot of per-step machinery +
    # full-tile factor math; r4_seq_amortized)
    tasks.append(("r4_seq_packed", lambda: task_seq_packed(100, Rs=8)))
    tasks.append(("r4_seq_packed_Rs32",
                  lambda: task_seq_packed(100, Rs=32)))
    tasks.append(("r4_seq_packed_1000",
                  lambda: task_seq_packed(1000, Rs=8)))
    tasks.append(("r4_seq_packed_int16",
                  lambda: task_seq_packed(1000, Rs=8, out16=True)))
    # hi tier through the panel kernel: the <=1e-9 contract at
    # occupancy-scaled speed (the dense hi grid is the occupancy-1 floor)
    tasks.append(("r4_hi_panel_flagship", lambda: task_hi_panels()))
    tasks.append(("r4_hi_panel_mid", lambda: task_hi_panels('mid')))
    # stack kernel: measure the actual bound before redesign #4
    tasks.append(("r4_stack_cost_probe",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    tasks.append(("r4_stack_cost_probe_overlap",
                  lambda: task_stack_cost_probe('overlap100_drag_2200')))
    # tiny-schedule crossover: the routed readme row (10.7 us, dense) vs
    # the earlier 4.4 us suggests a degraded window -- remeasure the
    # routed path and race panel-vs-dense head-to-head on the same window
    tasks.append(("r4_tiny_race_readme", task_tiny_race))
    for row in ('readme_demo_10k', 'xy_z_pair_200k'):
        tasks.append((f"r4p2_suite_{row}",
                      lambda row=row: task_suite_routed(row)))
    # probe round 2: split the 17.2 us base into table-load vs machinery
    # (r4_stack_cost_probe: base 17.2, one-hot dot 16.9, factor math 6.0)
    tasks.append(("r4_stack_cost_probe2",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    # the routed readme row after the small-schedule panel rule
    tasks.append(("r4p3_suite_readme_demo_10k",
                  lambda: task_suite_routed('readme_demo_10k')))
    # stack retake 4: same-support term merge (vstack instances 1999 ->
    # 1003, blocks 3998 -> 1778) -- the probe says base+dot scale with
    # blocks, so both should roughly halve
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4e_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    tasks.append(("r4_stack_cost_probe3",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    tasks.append(("r4_seq_packed_station", task_seq_packed_station))
    # windowed-panel rungs: the 120/200-pulse ladder rows where the
    # whole-window worklist was over budget (panel_gsps null)
    for np_ in (120, 200):
        tasks.append((f"r4w_occ_ladder_{np_}",
                      lambda np_=np_: task_occ_ladder(np_)))
    # probe 4 adds the 'floor' variant (launch structure with zero strip
    # work) and retimes the rows after the static strip unroll
    tasks.append(("r4_stack_cost_probe4",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4f_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    # waveform-memory replay: the amortized-shot floor (palette gather)
    tasks.append(("r4_seq_replay", lambda: task_seq_replay(1000)))
    tasks.append(("r4_seq_replay_100", lambda: task_seq_replay(100)))
    # candidate 3-split bf16 scatter dot, oracle-anchored
    tasks.append(("r4_stack_dot3_vstack",
                  lambda: task_stack_dot3('vstack_1000x200k')))
    # seed the persistent compile cache with bench.py's int16 panel
    # windows (2 cold remote compiles would eat into bench's watchdog)
    tasks.append(("r4_bench_seed_int16", task_bench_seed_int16))
    # stack retake 5: superchunks (4 chunks per grid step; the floor
    # probe priced launch structure at 0.7 us/step = 9 of 24.9 us)
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4g_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    tasks.append(("r4_stack_cost_probe5",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    # stack retake 6: hybrid identity-layer scatter (dot only on spills)
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4h_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    tasks.append(("r4_stack_cost_probe6",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    # second sample: probe6/r4h ran in the window right after a wedge
    # (floor doubled on a +12% table -- degraded-window suspect)
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4i_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    tasks.append(("r4_stack_cost_probe7",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    # same-window A/B: identity-layer vs one-hot scatter
    tasks.append(("r4_stack_layout_ab",
                  lambda: task_stack_layout_ab('vstack_1000x200k')))
    # same-window A/B: row-major vs transposed packed tables (fetch-side
    # lever; the floor probe priced operand fetch + launch at 7.6 of
    # 24.7 us and the row-major table lane-pads ~23 used columns to 128)
    tasks.append(("r4_stack_fetch_ab",
                  lambda: task_stack_fetch_ab('vstack_1000x200k')))
    tasks.append(("r4_stack_fetch_ab_overlap",
                  lambda: task_stack_fetch_ab('overlap100_drag_2200')))
    # stacked-table sequence playback (stack_seq.StackSequencer): the
    # narrow-pulse analog of play_packed, oracle-anchored
    tasks.append(("r4_seq_stack_100", lambda: task_seq_stack(100)))
    tasks.append(("r4_seq_stack_1000", lambda: task_seq_stack(1000)))
    # stack retake 7 (session 5): 8-granular spill padding + narrow tail
    # strips (k_sp 256 -> 176 on the vstack row, ~31% less slot eval/dot
    # work) and MERGED operands (one counts + one table block per step
    # instead of 2 per group; the floor probe priced per-operand
    # machinery inside the 14.3 us floor)
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4j_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    tasks.append(("r4_stack_cost_probe8",
                  lambda: task_stack_cost_probe('vstack_1000x200k')))
    # the sequencer shares _emit_chunk: re-pin one stacked-playback row
    tasks.append(("r4j_seq_stack_1000", lambda: task_seq_stack(1000)))
    # superchunk sweep under the merged tables (same window; SC=16 caps
    # at n_chunks=13 -> one grid step on the vstack row)
    tasks.append(("r4_stack_sc_ab",
                  lambda: task_stack_sc_ab('vstack_1000x200k')))
    # dot3 retake: with ~31% less eval the HIGHEST 6-pass dot may no
    # longer hide behind VPU work (the r4 A/B measured it neutral)
    tasks.append(("r4j_stack_dot3_vstack",
                  lambda: task_stack_dot3('vstack_1000x200k')))
    # dictionary-compacted tables (bake bitwise-constant columns as
    # kernel immediates): the operand-floor lever TABLE_T failed to be
    # -- ~12x fewer table bytes on the vstack row, no in-kernel
    # transpose.  Oracle-anchored A/B, same chip window per row.
    tasks.append(("r4_stack_dict_ab",
                  lambda: task_stack_dict_ab('vstack_1000x200k')))
    tasks.append(("r4_stack_dict_ab_overlap",
                  lambda: task_stack_dict_ab('overlap100_drag_2200')))
    # scatter-side levers after probe8 moved the bound to the strip
    # machinery: (onestrip x dot3) race, oracle-anchored per row
    tasks.append(("r4_stack_strip_ab",
                  lambda: task_stack_strip_ab('vstack_1000x200k')))
    tasks.append(("r4_stack_strip_ab_overlap",
                  lambda: task_stack_strip_ab('overlap100_drag_2200')))
    # sequencer-scale dict A/B (stacked tables scale with shot-schedule
    # count; the single-schedule dict A/B was byte-big but time-neutral)
    tasks.append(("r4_seq_stack_dict_ab",
                  lambda: task_seq_stack_dict(1000)))
    # record rows under the DECIDED defaults (dict=1, dot3=1, onestrip
    # auto -- r4_stack_strip_ab: 17.2 us = 11.6 GS/s on the vstack row)
    for row in ('vstack_1000x200k', 'overlap100_drag_2200'):
        tasks.append((f"r4k_stack_{row}",
                      lambda row=row: task_stack_row(row)))
    tasks.append(("r4k_seq_stack_1000", lambda: task_seq_stack(1000)))
    # re-seed bench.py's int16 panel compiles: the session-5 .jax_cache
    # did not survive into session 6 (fresh container disk)
    tasks.append(("r4s6_bench_seed_int16", task_bench_seed_int16))
    # mid-stratum int16: the mid panel row (53 GS/s) is store-heavy (10%
    # live eval, 100% stored); halved output bytes should move it the
    # way it moved the flagship (162 -> 281)
    tasks.append(("r4_panel_mid_int16",
                  lambda: task_panels_int16('mid')))
    # ---- round 5 ---------------------------------------------------------
    # reproducibility first: the driver-twin bench validation (also seeds
    # the compile cache with the exact fresh-process keys), then the
    # dense fine-skip A/B, the clean-window vstack confirmation, and the
    # overlap100 eval-floor pricing
    tasks.append(("r5_parity_small", task_parity_small))
    tasks.append(("r5_dense_fine_ab", task_dense_fine_ab))
    tasks.append(("r5_bench_fresh", task_bench_fresh))
    tasks.append(("r5_vstack_retake",
                  lambda: task_stack_row('vstack_1000x200k')))
    tasks.append(("r5_overlap_bound", task_overlap_bound))
    # the 20-60% occupancy band through the stack route (ask #3), plus a
    # 300-pulse rung past the band to find where stack stops winning
    tasks.append(("r5_fine_gate", task_fine_gate))
    for np_ in (60, 120, 200, 300):
        tasks.append((f"r5_occ_stack_{np_}",
                      lambda np_=np_: task_occ_ladder_stack(np_)))
    # round-5 hi-tier opcode closures (erf/cosh/poly_gauss/mollifier/
    # exotic chirp) pinned on the guard-free Mosaic trace
    tasks.append(("r5_hi_ops", task_hi_ops_r5))
    tasks.append(("r5_hi_routed_flux", task_hi_routed_flux_r5))
    # the LAST hi opcode holes (drag_sin/sinx ext planes, mollifier
    # derivatives) pinned on silicon
    tasks.append(("r5_hi_ext_ops", task_hi_ext_ops_r5))
    # superchunk-batched scatter dot (the r4j scatter-machinery lever):
    # A/B + on-chip parity on the vstack row, then the sequencer-scale
    # stacked row under the winning default
    tasks.append(("r5_stack_scdot_ab", task_stack_scdot_ab))
    tasks.append(("r5_occ_scdot_ab", task_occ_scdot_ab))
    tasks.append(("r5k_seq_stack_1000", lambda: task_seq_stack(1000)))
    # exact-fit panels (store-bound: padding rows past the window were
    # a 4.7% tax) -- retake the flagship panel windows + fresh bench
    tasks.append(("r5_panel_exactfit", lambda: task_panels('flagship')))
    tasks.append(("r5_panel_exactfit_int16",
                  lambda: task_panels_int16('flagship')))
    tasks.append(("r5_bench_exactfit", task_bench_fresh))
    todo = [(k, fn) for k, fn in tasks if k not in state]
    # a crashing task must not starve fresh ones: run least-failed first
    # (stable within a failure count, so the authored order still holds)
    fails = state.get('_failures', {})
    return sorted(todo, key=lambda kv: fails.get(kv[0], 0))


def main():
    signal.signal(signal.SIGALRM, _alarm)
    t_start = time.time()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    # -- health probe (cheap; exits fast when the chip is wedged) ----------
    try:
        signal.alarm(120)
        if jax.default_backend() != 'tpu':
            print(json.dumps({"status": "no_tpu_backend"}))
            return
        assert float(jnp.sum(jnp.arange(1024.0))) == 523776.0
        from jax.experimental import pallas as pl

        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
                jnp.ones((8, 128), jnp.float32))
        assert float(np.asarray(y)[0, 0]) == 2.0
        signal.alarm(0)
    except BaseException as e:
        signal.alarm(0)
        print(json.dumps({"status": "unhealthy",
                          "error": f"{type(e).__name__}: {e}"[:120]}))
        return

    state = load_state()
    done = []
    while time.time() - t_start < BUDGET_S:
        todo = pending_tasks(state)
        if not todo:
            break
        key, fn = todo[0]
        try:
            signal.alarm(300)
            res = fn()
            signal.alarm(0)
            state[key] = res
            save_state(state)
            done.append(key)
        except BaseException as e:
            signal.alarm(0)
            state.setdefault('_failures', {})[key] = \
                state.get('_failures', {}).get(key, 0) + 1
            save_state(state)
            print(json.dumps({"status": "aborted_on", "task": key,
                              "error": f"{type(e).__name__}: {e}"[:120],
                              "done_this_attempt": done}))
            return
    print(json.dumps({"status": "ok", "done_this_attempt": done,
                      "remaining": [k for k, _ in pending_tasks(state)]}))


if __name__ == '__main__':
    main()

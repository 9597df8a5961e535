"""AOT Mosaic-lowering smoke checks: every Pallas kernel must lower for TPU.

Interpret mode happily accepts primitives the real Pallas TPU lowering
lacks (round-4 live example: value-level ``dynamic_update_slice``
compiled nowhere but on-chip).  ``jax.jit(f).trace(...).lower(
lowering_platforms=('tpu',))`` runs the FULL Mosaic kernel lowering
without TPU hardware, so this catches that whole bug class on any CPU --
the difference between finding it in CI and finding it by burning a
scarce hardware window.

Run as a script (``python tools/check_tpu_lowering.py``): prints one
JSON object mapping check name -> "ok" / "error: ...".  The checks run
with production dtypes (x64 OFF): with x64 enabled this jax build's
tracer falls into an unbounded ``convert_element_type`` recursion on
these kernels, which is why tests/test_tpu_lowering.py drives this file
in a subprocess instead of importing it under the x64 conftest.
"""

import functools
import json
import os
import sys
import traceback

import numpy as np

FS = 2e9


def lowers_for_tpu(jitfn, *args):
    jitfn.trace(*args).lower(lowering_platforms=('tpu',))


def check_dense_fine_skip():
    import jax
    import jax.numpy as jnp

    from bench import build_mid_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, _run_kernel

    low = lower_schedule(build_mid_schedule(n_channels=4), 0.0,
                         65.536e-6, FS)
    dev = DeviceSchedule(low)
    C, NB, S, T, F = dev.shape
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // 256) * 256
    f = jax.jit(functools.partial(
        _run_kernel, S=S, T=T, F=F, R=256, n_rows=n_rows,
        tiles_per_bucket=1, ops_present=dev.ops_present))
    lowers_for_tpu(f, jnp.zeros((1, 1, 1, 1), jnp.int32), *dev.tensors,
                   None, None)


def _check_dense_mode(mode):
    import jax
    import jax.numpy as jnp

    from bench import build_mid_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule, _run_kernel

    part = 'complex' if mode == 'pair' else 'real'
    low = lower_schedule(build_mid_schedule(n_channels=2), 0.0,
                         32.768e-6, FS, part=part)
    dev = DeviceSchedule(low)
    C, NB, S, T, F = dev.shape
    n_rows = -(-dev.n_samples // 128)
    n_rows = -(-n_rows // 256) * 256
    out_dtype = jnp.int16 if mode == 'int16' else jnp.float32
    scale = (jnp.full((C, 1, 1, 1), 32767.0, jnp.float32)
             if mode == 'int16' else None)
    f = jax.jit(functools.partial(
        _run_kernel, S=S, T=T, F=F, R=256, n_rows=n_rows,
        tiles_per_bucket=1, ops_present=dev.ops_present,
        out_dtype=out_dtype))
    lowers_for_tpu(f, jnp.zeros((1, 1, 1, 1), jnp.int32), *dev.tensors,
                   dev.amp_im, scale)


def check_dense_pair():
    _check_dense_mode('pair')


def check_dense_int16():
    _check_dense_mode('int16')


def check_sparse():
    import jax
    import jax.numpy as jnp

    from bench import build_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import _run_sparse, \
        build_sparse_plan

    low = lower_schedule(build_schedule(n_channels=8), 0.0, 65.536e-6, FS)
    dev = DeviceSchedule(low)
    plan = build_sparse_plan(low)
    C, NB, S, T, F = dev.shape
    tensors = dev.tensors[:2] + dev.tensors[3:]
    f = jax.jit(functools.partial(
        _run_sparse, S=S, T=T, F=F, Rs=plan.Rs, n_tiles=plan.n_tiles,
        ops_present=dev.ops_present))
    lowers_for_tpu(f, jnp.asarray(plan.work_c), jnp.asarray(plan.work_b),
                   jnp.asarray(plan.work_t), jnp.asarray(plan.work_o),
                   jnp.asarray(plan.work_s0), jnp.asarray(plan.work_s1),
                   *tensors, None, None)


def check_hi_including_chirp():
    import jax
    import jax.numpy as jnp

    from bench import build_dense_schedule
    from waveforms_tpu.models import shapes as sh
    from waveforms_tpu.ops.hi_synth import HiSchedule, _run_kernel_hi
    from waveforms_tpu.ops.lowering import lower_schedule

    from waveforms_tpu.models.multy_drag import drag_sin, drag_sinx
    for chans in ([sh.gaussian(4e-7) * sh.cos(2 * np.pi * 3e7)],
                  build_dense_schedule(n_channels=1, duration=3.2768e-5),
                  # hi ext-plane opcodes (round 5): multi-tone DRAG with
                  # the blend-polynomial fori_loop Horner
                  [drag_sin(2e8, 22e-9, plateau=6e-9, delta=3e6,
                            block_freq=(2.5e8,), phase=0.4, t0=2e-6) +
                   drag_sinx(2e8, 22e-9, plateau=6e-9, delta=3e6,
                             block_freq=(2.5e8,), phase=0.1, t0=4e-6) +
                   sh.mollifier(2e-6, d=2) >> 8e-6]):
        span = 3.2768e-5
        low = lower_schedule(chans, 0.0, span, FS, keep_f64=True)
        dev = HiSchedule(low)
        C, NB, S, T, F = dev.shape
        n_rows = -(-dev.n_samples // 128)
        n_rows = -(-n_rows // 64) * 64
        f = jax.jit(functools.partial(
            _run_kernel_hi, S=S, T=T, F=F, R=64, n_rows=n_rows,
            tiles_per_bucket=1, ops_present=dev.ops_present))
        lowers_for_tpu(f, jnp.zeros((1, 1, 1, 1), jnp.int32),
                       *dev.tensors)

    # hi panel kernel (round 4): single-bucket sparse route
    from waveforms_tpu.ops.hi_synth import _run_panels_hi
    from waveforms_tpu.ops.sparse_synth import build_panel_plan
    low = lower_schedule([sh.gaussian(4e-7) * sh.cos(2 * np.pi * 3e7),
                          sh.gaussian(2e-7) >> 2e-5], 0.0, 3.2768e-5, FS,
                         keep_f64=True)
    dev = HiSchedule(low)
    plan = build_panel_plan(low)
    C, NB, S, T, F = dev.shape
    fp = jax.jit(functools.partial(
        _run_panels_hi, S=S, T=T, F=F, Rs=plan.Rs, P=plan.P,
        NP=plan.n_panels, ops_present=dev.ops_present))
    lowers_for_tpu(fp, jnp.asarray(plan.start), jnp.asarray(plan.work_t),
                   jnp.asarray(plan.work_o), jnp.asarray(plan.work_s0),
                   jnp.asarray(plan.work_s1),
                   *(dev.tensors[:2] + dev.tensors[3:]))


def check_stack_including_ext():
    from waveforms_tpu.core import WaveVStack
    from waveforms_tpu.models import shapes as sh
    from waveforms_tpu.models.multy_drag import drag_sin
    from waveforms_tpu.ops import stack_synth as st
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu import cosPulse

    rng = np.random.default_rng(0)
    # span long enough for a MULTI-chunk grid (n_chunks > 1): with one
    # chunk every block trivially equals its array and Mosaic's
    # divisible-or-full rule can't fire (the round-4 counts-block bug
    # only reproduced at n_chunks > 1)
    wl = [(0.5 * cosPulse(50e-9) >> o) for o in rng.uniform(0, 6e-5, 60)]
    low = lower_schedule([WaveVStack(wl)], 0, 65.536e-6, FS)
    runner = st._build_kernel_runner(st.build_stack_plan(low), low, False)
    assert runner is not None
    runner.kernel_jit.trace(*runner.kernel_args).lower(
        lowering_platforms=('tpu',))

    # dictionary-compacted tables: the narrow-lane operand block (PW=8)
    # and baked-immediate strip math must lower too
    os.environ['WFTPU_STACK_DICT'] = '1'
    try:
        rd = st._build_kernel_runner(st.build_stack_plan(low), low, False)
        assert rd is not None
        assert rd.kernel_args[-1].shape[-1] < 128   # actually compacted
        rd.kernel_jit.trace(*rd.kernel_args).lower(
            lowering_platforms=('tpu',))
    finally:
        os.environ.pop('WFTPU_STACK_DICT', None)

    p = drag_sin(5e9, 20e-9, plateau=10e-9, delta=1e6)
    x = sh.zero()
    for _ in range(10):
        x += p >> float(rng.uniform(0, 7e-6))
    low2 = lower_schedule([x], 0, 8.192e-6, FS)
    for d3 in (False, True):
        runner2 = st._build_kernel_runner(st.build_stack_plan(low2), low2,
                                          False, dot3=d3)
        assert runner2 is not None
        runner2.kernel_jit.trace(*runner2.kernel_args).lower(
            lowering_platforms=('tpu',))


def check_panels():
    import jax
    import jax.numpy as jnp

    from bench import build_mid_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.pallas_synth import DeviceSchedule
    from waveforms_tpu.ops.sparse_synth import _run_panels, \
        build_panel_plan

    # multi-panel + multi-bucket + pair cover every structural variant
    for part, bs, span in (('real', None, 5.24288e-4),
                           ('complex', None, 6.5536e-5),
                           ('real', 16384, 6.5536e-5)):
        low = lower_schedule(build_mid_schedule(n_channels=4), 0.0, span,
                             FS, part=part, bucket_samples=bs)
        dev = DeviceSchedule(low)
        plan = build_panel_plan(low)
        C, NB, S, T, F = dev.shape
        tensors = dev.tensors[:2] + dev.tensors[3:]
        f = jax.jit(functools.partial(
            _run_panels, S=S, T=T, F=F, Rs=plan.Rs, P=plan.P,
            NP=plan.n_panels, ops_present=dev.ops_present))
        lowers_for_tpu(f, jnp.asarray(plan.start),
                       jnp.asarray(plan.work_t),
                       jnp.asarray(plan.work_o),
                       jnp.asarray(plan.work_s0),
                       jnp.asarray(plan.work_s1), *tensors,
                       dev.amp_im, None)
        if part == 'real' and bs is None:
            # int16 DAC codes (single-bucket only): the f32-scratch +
            # static convert-store path (dynamic int16 sub-stores crash
            # the real Mosaic compile)
            fi = jax.jit(functools.partial(
                _run_panels, S=S, T=T, F=F, Rs=plan.Rs, P=plan.P,
                NP=plan.n_panels, ops_present=dev.ops_present,
                out_dtype=jnp.int16))
            scale = jnp.full((C, 1, 1, 1), 32767.0, jnp.float32)
            lowers_for_tpu(fi, jnp.asarray(plan.start),
                           jnp.asarray(plan.work_t),
                           jnp.asarray(plan.work_o),
                           jnp.asarray(plan.work_s0),
                           jnp.asarray(plan.work_s1), *tensors,
                           None, scale)


def check_play_many():
    import jax
    import jax.numpy as jnp

    from bench import build_schedule
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.ops.sequencer import Sequencer

    low = lower_schedule(build_schedule(n_channels=8), 0.0, 65.536e-6, FS)
    seq = Sequencer([low, low])
    ks = jnp.asarray([0, 1, 0], jnp.int32)
    lowers_for_tpu(jax.jit(lambda k: seq.play_many(k, rows_per_tile=64)),
                   ks)
    lowers_for_tpu(jax.jit(lambda k: seq.play_many(k, sparse=True)), ks)
    lowers_for_tpu(jax.jit(lambda k: seq.play_packed(k)), ks)
    lowers_for_tpu(jax.jit(lambda k: seq.play_packed(
        k, out_dtype=jnp.int16)), ks)


CHECKS = {
    'dense_fine_skip': check_dense_fine_skip,
    'dense_pair': check_dense_pair,
    'dense_int16': check_dense_int16,
    'sparse': check_sparse,
    'panels': check_panels,
    'hi_including_chirp': check_hi_including_chirp,
    'stack_including_ext': check_stack_including_ext,
    'play_many': check_play_many,
}


def main():
    sys.setrecursionlimit(100_000)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import jax
    jax.config.update('jax_platforms', 'cpu')   # env var is ignored by
    # this jax build; config.update before backend init is the reliable
    # form (see tests/conftest.py)
    results = {}
    for name, fn in CHECKS.items():
        try:
            fn()
            results[name] = 'ok'
        except Exception:
            results[name] = 'error: ' + traceback.format_exc(limit=20)
    print(json.dumps(results))
    return 0 if all(v == 'ok' for v in results.values()) else 1


if __name__ == '__main__':
    raise SystemExit(main())

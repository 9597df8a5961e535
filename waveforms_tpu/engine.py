"""Unified synthesis entry points with engine selection.

Engines:

* ``'pallas'``  -- fused TPU kernels over descriptor tensors (production
  path; 162 GS/s/chip measured on v5e, compile-once).  Low-occupancy
  schedules run the panel kernel (worklist kernel when outside its
  budgets), everything else the dense grid; ``'pallas-panel'`` /
  ``'pallas-sparse'`` / ``'pallas-dense'`` force one path.
* ``'xla'``     -- trace-specialized XLA program per waveform structure
  (any backend; float64 under x64 -- the 1e-9-parity device path).
* ``'native'``  -- C++ host engine (float64, SIMD + threads; same
  descriptor program as the kernel).
* ``'numpy'``   -- the pure-numpy float64 oracle (reference semantics).
* ``'auto'``    -- pallas on TPU when all factors lower, else native when a
  toolchain exists, else numpy.
"""

from __future__ import annotations

import numpy as np

from .core import Waveform
from .ops.lowering import UnsupportedFactor, lower_schedule

__all__ = ['synthesize', 'sample']


def _is_device_fault(exc: BaseException) -> bool:
    """True only for runtime/device failures (the class where a host
    fallback is sane); compile-time and Python-level errors are not.

    PJRT raises XlaRuntimeError for COMPILE failures too (e.g. a Mosaic
    kernel regression the SMEM-budget guard didn't predict); silently
    degrading those to ~100x-slower host synthesis would hide a code bug,
    so compile-phase messages are excluded (code-review finding r2).
    """
    seen = set()
    msgs = []
    visited: set[int] = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in visited:   # identity cycle guard
        visited.add(id(e))
        seen.add(type(e).__name__)
        msgs.append(str(e))
        e = e.__cause__ or e.__context__
    if not (seen & {'JaxRuntimeError', 'XlaRuntimeError',
                    'FailedPreconditionError', 'InternalError',
                    'ResourceExhaustedError'}):
        return False
    text = ' '.join(msgs).lower()
    # markers must be SPECIFIC to the compile phase: broad words like
    # 'unsupported' also appear in genuine runtime transfer faults, which
    # must keep their host fallback (review finding r3)
    compile_markers = ('mosaic', 'compilation failure', 'compile failed',
                       'lowering failed',
                       # a kernel using a primitive the Pallas TPU lowering
                       # lacks is a CODE bug (seen live: value-level
                       # dynamic_update_slice, round 4) -- never a reason
                       # to silently degrade to 100x-slower host synthesis
                       'unimplemented primitive in pallas')
    return not any(m in text for m in compile_markers)


def _degrade_or_raise(exc: Exception, engine_name: str) -> None:
    """Shared auto-path fallback contract for the device engines.

    Only genuine DEVICE faults (aborts, OOM, a wedged tunnel) may
    degrade to host synthesis -- anything else (shape mismatches, tracer
    errors) is a code regression and must surface, not hide as a 100x
    slowdown.  WFTPU_STRICT_ENGINE=1 forbids even the device-fault
    fallback.  Returns (letting the caller continue down the engine
    ladder) only when degradation is allowed."""
    import os
    import warnings
    if not _is_device_fault(exc) or os.environ.get('WFTPU_STRICT_ENGINE'):
        raise exc
    warnings.warn(f"{engine_name} engine hit a device fault ({exc!r}); "
                  "falling back to host synthesis")


def _env_float(name: str, default_factory):
    """Env-var override with a visible failure mode for malformed values."""
    import os
    raw = os.environ.get(name, '')
    if raw:
        try:
            return float(raw)
        except ValueError:
            import warnings
            warnings.warn(f"ignoring unparseable {name}={raw!r}")
    return default_factory()


def _sparse_threshold():
    from .ops.sparse_synth import SPARSE_OCCUPANCY_THRESHOLD
    return _env_float('WFTPU_SPARSE_THRESHOLD',
                      lambda: SPARSE_OCCUPANCY_THRESHOLD)


def _panel_threshold():
    from .ops.sparse_synth import PANEL_OCCUPANCY_THRESHOLD
    return _env_float('WFTPU_PANEL_THRESHOLD',
                      lambda: PANEL_OCCUPANCY_THRESHOLD)


def _stack_advantage():
    from .ops.stack_synth import DEFAULT_ADVANTAGE
    return _env_float('WFTPU_STACK_ADVANTAGE', lambda: DEFAULT_ADVANTAGE)


def _stack_occ_floor():
    # padded subtile occupancy above which many-pulse schedules prefer
    # the pulse-instance stack kernel over the segment-walk kernels
    # (whose per-tile segment lists blow up with overlap count).  On-chip
    # ladder, r5_occ_stack_* vs r4_occ_ladder_*: at 10% occupancy the
    # panel kernel wins (52.7 GS/s); at 22% the stack kernel wins 2.2x
    # (31.4 vs 14.5), at 39% it wins 2.4x (19.0 vs 8.0), at 55% 2.8x
    # (13.8 vs 5.0).  0.15 splits the measured crossover.
    return _env_float('WFTPU_STACK_OCC', lambda: 0.15)


def _try_pallas(channels, start, stop, sample_rate, bucket_samples, part,
                force=None, out_dtype=None, dac_scale=32767.0):
    import jax
    import jax.numpy as jnp

    from .ops.pallas_synth import DeviceSchedule, synthesize_device
    from .ops.sparse_synth import synthesize_panels, synthesize_sparse
    interpret = jax.default_backend() != 'tpu'
    od = jnp.float32 if out_dtype is None else out_dtype

    # part='complex' runs ONE fused kernel pass: the factor products are
    # computed once and scaled by both amplitude planes (pair mode)
    low = lower_schedule(channels, start, stop, sample_rate, part=part,
                         bucket_samples=bucket_samples)

    kind, plan = classify_pallas_route(low, force=force, out_dtype=od)
    if kind == 'panel':
        return synthesize_panels(DeviceSchedule(low), plan=plan,
                                 interpret=interpret, out_dtype=od,
                                 dac_scale=dac_scale)
    if kind == 'panel-windowed':
        from .ops.sparse_synth import synthesize_panels_windowed
        return synthesize_panels_windowed(DeviceSchedule(low), low,
                                          plans=plan, interpret=interpret,
                                          out_dtype=od,
                                          dac_scale=dac_scale)
    if kind == 'sparse':
        return synthesize_sparse(DeviceSchedule(low), plan=plan,
                                 interpret=interpret, out_dtype=od,
                                 dac_scale=dac_scale)
    if kind == 'stack':
        from .ops.stack_synth import synthesize_stack
        return synthesize_stack(low, plan, interpret=interpret,
                                out_dtype=out_dtype, dac_scale=dac_scale)
    return synthesize_device(DeviceSchedule(low), interpret=interpret,
                             out_dtype=od, dac_scale=dac_scale)


def classify_pallas_route(low, force=None, out_dtype=None):
    """Pick the pallas execution strategy for a lowered schedule.

    Returns ``(kind, plan)`` with kind in {'panel', 'panel-windowed',
    'sparse', 'stack', 'dense'} (for 'panel-windowed', ``plan`` is the
    window-plan list).  Routing order (measured, rounds 3-4;
    benchmarks/tpu_state.json): the PANEL kernel (one fat grid step per
    channel x panel x bucket, worklist resident in SMEM) dominates the
    per-subtile worklist kernel everywhere it is eligible -- 162 vs 132
    GS/s at the flagship's 0.75% subtile occupancy, 53 vs 26 at 10% --
    because the worklist kernel pays ~0.5 us of step machinery per live
    subtile (r4_grid_overhead_probe).  The worklist kernel remains for
    plans outside the panel budgets (SMEM-resident worklist, narrowed
    multi-bucket stores).  Dense takes over at high occupancy, and the
    stack path when occupancy is HIGH but the pulses are narrow (a
    1000-pulse train fills every subtile yet each pulse covers ~2% of
    one: vstack occupancy ~1.0, advantage ~18) or when the fused kernels
    cannot lower the schedule at all (SMEM budget).
    """
    import jax.numpy as jnp

    from .ops.sparse_synth import (build_panel_plan, build_sparse_plan,
                                   panels_eligible)

    sparse_plan = None
    stack_plan_cache = []          # memo: build_stack_plan is O(instances)
    if not low.pallas_ok and force in ('sparse', 'panel'):
        raise UnsupportedFactor(
            "schedule is outside the fused kernels' descriptor budget or "
            "opcode set -- the forced engine cannot run it")
    if low.pallas_ok and force in (None, 'sparse', 'panel'):
        try:
            sparse_plan = build_sparse_plan(low)
        except UnsupportedFactor:
            if force in ('sparse', 'panel'):
                raise
    if sparse_plan is not None:
        occ = sparse_plan.occupied_fraction
        # the dense grid pads the row count to its tile height (R), and
        # padding rows are REAL evaluated work; for short windows (the
        # readme-demo class: 79 rows padded to 256) that triples dense's
        # cost, so the crossover must compare live subtiles against the
        # PADDED tile count (r4p_suite_readme_demo_10k: dense 10.7 us via
        # the unpadded ratio; the panel run is ~1 step)
        from .ops.pallas_synth import default_rows_per_tile
        NB = low.shape[1]
        R = default_rows_per_tile(low.n_samples, low.bucket_samples, NB)
        n_rows = -(-low.n_samples // 128)
        padded_rows = -(-n_rows // R) * R
        occ *= n_rows / padded_rows
        # short windows (<= 2 dense steps per channel) prefer panels even
        # above the at-scale threshold: dense's per-step cost has nothing
        # to amortize over, while the panel runs the whole channel as one
        # step (r4_tiny_race_readme: panel 3.25 us vs dense 10.65 us on
        # the 10k-sample readme demo, reproduced across chip windows)
        small = padded_rows <= 2 * R
        # the 15-60% occupancy band (round-5 valley): many-overlap
        # schedules blow up per-tile segment lists in every segment-walk
        # kernel; the pulse-instance stack kernel's work scales with
        # instances instead, measured 2.2-2.8x faster across the band
        # (r5_occ_stack_* -- see _stack_occ_floor)
        if force is None and not small and occ >= _stack_occ_floor():
            from .ops.stack_synth import STACK_MIN_NARROW, build_stack_plan
            splan = build_stack_plan(low)
            stack_plan_cache.append(splan)
            if (splan is not None
                    and splan.n_narrow >= STACK_MIN_NARROW
                    and splan.advantage >= _stack_advantage()):
                return 'stack', splan
        # force='sparse' must select the WORKLIST kernel (the engine
        # name promises one path -- it is the measurement lever for the
        # per-subtile kernel), so only force='panel' enters this branch
        if force == 'panel' or (force is None
                                and (small or occ < _panel_threshold())):
            od = out_dtype if out_dtype is not None else jnp.float32
            panel_plan = build_panel_plan(low, base=sparse_plan)
            if panels_eligible(panel_plan, od):
                return 'panel', panel_plan
            from .ops.sparse_synth import plan_panel_windows
            windows = plan_panel_windows(low, base=sparse_plan,
                                         out_dtype=od)
            if windows is not None:
                return 'panel-windowed', windows
            if force == 'panel':
                raise UnsupportedFactor(
                    "schedule is outside the panel kernel's budgets "
                    "(worklist SMEM or narrowed multi-bucket stores)")
        if force == 'sparse' or occ < _sparse_threshold():
            return 'sparse', sparse_plan

    if force in (None, 'stack'):
        from .ops.stack_synth import STACK_MIN_NARROW, build_stack_plan
        plan = (stack_plan_cache[0] if stack_plan_cache
                else build_stack_plan(low))
        if plan is not None and (
                force == 'stack'
                or (plan.n_narrow >= STACK_MIN_NARROW
                    and plan.advantage >= _stack_advantage())
                or (not low.pallas_ok and plan.wide is None)):
            return 'stack', plan
        if force == 'stack':
            raise UnsupportedFactor(
                "schedule has no batchable pulse instances")
    return 'dense', None


def _quantize_host(out, out_dtype, dac_scale):
    """Host-engine analog of the kernels' out_dtype store: int16 DAC
    codes via scale -> round-half-even -> clip (identical convention to
    synthesize_device), bf16 via plain astype.  Works on both ndarray
    (native/numpy engines) and jax.Array (xla engine) results."""
    if out_dtype is None:
        return out
    dt = np.dtype(out_dtype)     # jax-free: host engines must quantize
    if np.issubdtype(dt, np.integer):        # without jax installed
        if dt != np.dtype(np.int16):
            # the device engines' gate (dac_scale_tensor); silently
            # astype'ing here truncated unit-range samples to ~0 codes
            raise ValueError("integer output supports int16 only")
        xp = np if isinstance(out, np.ndarray) else __import__(
            'jax.numpy', fromlist=['jnp'])
        sc = np.asarray(dac_scale, np.float64)
        scaled = out * (sc.reshape(-1, 1) if sc.ndim else float(sc))
        return xp.clip(xp.round(scaled), -32768.0,
                       32767.0).astype(np.int16)
    if isinstance(out, np.ndarray):
        return np.asarray(out).astype(dt)
    return out.astype(out_dtype)


def synthesize(channels, start: float, stop: float, sample_rate: float,
               engine: str = 'auto', bucket_samples='auto',
               part: str = 'real', precision: str = 'single',
               out_dtype=None, dac_scale=32767.0):
    """Synthesize a list of channels on the chosen engine -> (C, N).

    ``part`` selects 'real' (default, the physical-output convention of
    WaveVStack), 'imag', or 'complex' (one fused pair-mode pass on the
    pallas engine; the native engine runs its real and imag passes).
    Returns a jax.Array for the device engines ('pallas' variants and
    'xla', including 'auto' when it routes to either); ndarray for the
    host engines ('native', 'numpy', and 'auto' after host degradation).
    Callers needing ndarray semantics should np.asarray the result.

    ``precision='double'`` selects the <=1e-9 contract: the Pallas
    engines run the double-f32 kernel tier (ops/hi_synth.py, f64 ndarray
    result); native/numpy already compute in f64 and pass through.  The
    hi kernel covers the full production opcode set (HI_OPS: linear,
    gaussian + derivatives, cos, exp, sinc, drag, erf, cosh, sinh,
    mollifier bumps + derivatives, multi-tone drag_sin/x via df ext
    planes, interp via lossless affine expansion, and all chirps via
    lowering's quadratic windows); schedules exceeding the SMEM
    descriptor budget raise UnsupportedFactor under engine='pallas' and
    degrade to the host f64 engines under 'auto'.

    ``out_dtype=jnp.int16`` emits exact DAC codes scaled by ``dac_scale``
    (scalar or per-channel) on EVERY engine: the pallas routes quantize
    in-kernel (halved output stream); host engines quantize their f64
    result with the same round-half-even + clip convention, so codes
    agree across engines to the underlying precision tier.
    ``out_dtype=bfloat16`` narrows the store (pallas) / result (host).
    """
    if precision not in ('single', 'double'):
        raise ValueError(f"unknown precision {precision!r}")
    if out_dtype is not None:
        # np.dtype understands jnp dtype objects too -- keep this block
        # jax-free so host-only deployments can narrow/quantize
        if precision == 'double':
            raise ValueError("out_dtype narrowing contradicts "
                             "precision='double'")
        if part == 'complex' and np.dtype(out_dtype) != np.float32:
            raise ValueError("part='complex' requires f32 output")
        if np.dtype(out_dtype) == np.dtype(np.float32):
            out_dtype = None        # f32 is every engine's default
    if precision == 'double' and engine not in ('native', 'numpy'):
        if engine not in ('auto', 'pallas', 'pallas-dense', 'xla'):
            raise ValueError(
                f"precision='double' is unsupported on engine {engine!r}")
        if engine in ('pallas', 'pallas-dense', 'auto'):
            on_tpu = False
            try:
                import jax
                on_tpu = jax.default_backend() == 'tpu'
            except ImportError:
                if engine != 'auto':
                    raise       # explicit device engine needs jax
            except Exception:
                pass
            if engine != 'auto' or on_tpu:
                from .ops.hi_synth import (synthesize_hi,
                                           synthesize_hi_routed)
                # 'pallas-dense' promises ONE path at the hi tier too:
                # the dense hi grid, not the occupancy-routed pick
                hi_fn = (synthesize_hi if engine == 'pallas-dense'
                         else synthesize_hi_routed)
                try:
                    low = lower_schedule(channels, start, stop,
                                         sample_rate, part=part,
                                         bucket_samples=bucket_samples,
                                         keep_f64=True)
                    return hi_fn(low)
                except UnsupportedFactor:
                    if engine != 'auto':
                        raise
                except Exception as exc:
                    # same device-fault-only degradation contract as the
                    # f32 auto ladder: native/numpy ARE the f64 oracle,
                    # so the fallback is lossless
                    if engine != 'auto':
                        raise
                    _degrade_or_raise(exc, 'hi')
            # auto off-TPU / unsupported ops: host f64 engines below
            return synthesize(channels, start, stop, sample_rate,
                              engine='native' if _native_ok() else 'numpy',
                              bucket_samples=bucket_samples, part=part)
        # engine == 'xla': fall through -- under jax x64 the trace engine
        # is the measured 4.4e-10 path; without x64 it cannot honor the
        # contract, so refuse loudly
        import jax
        if not jax.config.read('jax_enable_x64'):
            raise RuntimeError(
                "precision='double' on the XLA engine needs jax x64 "
                "(set JAX_ENABLE_X64=1); or use engine='pallas' "
                "(double-f32 kernel) / 'native' / 'numpy'")
    if engine in ('pallas', 'pallas-sparse', 'pallas-panel', 'pallas-dense',
                  'pallas-stack'):
        force = {'pallas-sparse': 'sparse',
                 'pallas-panel': 'panel',
                 'pallas-dense': 'dense',
                 'pallas-stack': 'stack'}.get(engine)
        return _try_pallas(channels, start, stop, sample_rate,
                           bucket_samples, part, force=force,
                           out_dtype=out_dtype, dac_scale=dac_scale)
    if engine == 'xla':
        import jax.numpy as jnp

        from .core import WaveVStack
        from .ops.jax_eval import evaluate
        t = jnp.asarray(np.arange(start, stop, 1 / sample_rate))
        vals = [evaluate(ch.simplify() if part != 'real'
                         and isinstance(ch, WaveVStack) else ch, t)
                for ch in channels]
        if part == 'real':
            vals = [v.real for v in vals]
        elif part == 'imag':
            vals = [v.imag for v in vals]
        else:
            vals = [v.astype(jnp.complex128 if t.dtype == jnp.float64
                             else jnp.complex64) for v in vals]
        return _quantize_host(jnp.stack(vals), out_dtype, dac_scale)
    if engine == 'native':
        from . import native
        if not native.available():
            raise RuntimeError(
                f"native engine unavailable: {native.build_error()}")

        # part='complex' lowers once with both amplitude planes and runs
        # one pair-mode pass (same fusion as the Pallas kernel)
        low = lower_schedule(channels, start, stop, sample_rate, part=part,
                             bucket_samples=bucket_samples)
        return _quantize_host(native.synthesize_native(low), out_dtype,
                              dac_scale)
    if engine == 'numpy':
        from .core import WaveVStack
        t = np.arange(start, stop, 1 / sample_rate)
        # WaveVStack.__call__ returns the REAL part (reference physical-
        # output convention); for 'imag'/'complex' use the stack's complex
        # accumulation (simplify -> Waveform) to match the descriptor
        # engines, which lower the complex amplitudes directly.
        vals = [np.asarray((ch.simplify() if part != 'real'
                            and isinstance(ch, WaveVStack) else ch)(t))
                for ch in channels]
        if part == 'real':
            vals = [np.real(v) for v in vals]
        elif part == 'imag':
            vals = [np.imag(v) for v in vals]
        else:
            vals = [v.astype(complex) for v in vals]
        return _quantize_host(np.stack(vals), out_dtype, dac_scale)
    if engine == 'auto':
        backend = None
        try:
            import jax
            backend = jax.default_backend()
            if backend == 'tpu':
                return _try_pallas(channels, start, stop, sample_rate,
                                   bucket_samples, part,
                                   out_dtype=out_dtype,
                                   dac_scale=dac_scale)
        except (UnsupportedFactor, ImportError):
            pass
        except Exception as exc:
            _degrade_or_raise(exc, 'pallas')
        # non-TPU accelerator (GPU/ROCm): the fused XLA trace engine runs
        # on any backend and beats host synthesis by the device's memory
        # bandwidth -- routing order is tpu-pallas > accel-xla > native >
        # numpy (round-4 fix: previously GPU hosts silently fell through
        # to the host engines)
        # the xla rung only under x64: the trace engine samples t
        # directly, and an f32 grid collapses adjacent samples once
        # t/dt > ~2^23 (start = 1 s at 1 GS/s is 60-sample ulps) -- the
        # host f64 engines below are the correct single-precision-host
        # fallback
        if (backend not in (None, 'cpu', 'tpu')
                and jax.config.read('jax_enable_x64')):
            try:
                return synthesize(channels, start, stop, sample_rate,
                                  engine='xla', part=part,
                                  out_dtype=out_dtype,
                                  dac_scale=dac_scale)
            except Exception as exc:
                _degrade_or_raise(exc, 'xla')
        try:
            from . import native
            if native.available():
                return synthesize(channels, start, stop, sample_rate,
                                  engine='native',
                                  bucket_samples=bucket_samples, part=part,
                                  out_dtype=out_dtype,
                                  dac_scale=dac_scale)
        except UnsupportedFactor:
            pass
        return synthesize(channels, start, stop, sample_rate,
                          engine='numpy', part=part,
                          out_dtype=out_dtype, dac_scale=dac_scale)
    raise ValueError(f"unknown engine {engine!r}")


def _native_ok() -> bool:
    try:
        from . import native
        return native.available()
    except Exception:
        return False


def sample(wav: Waveform, sample_rate=None, engine: str = 'auto'):
    """Engine-selected analog of ``Waveform.sample()``.

    SOS filters attached to the waveform apply on device for jax-backed
    engines (associative-scan IIR) and on the host otherwise.
    """
    if sample_rate is None:
        sample_rate = wav.sample_rate
    if wav.start is None or wav.stop is None or sample_rate is None:
        raise ValueError('Waveform is not initialized')
    sig = synthesize([wav], wav.start, wav.stop, sample_rate,
                     engine=engine)[0]
    if wav.filters is None:
        return sig
    sos, initial = wav.filters
    if isinstance(sig, np.ndarray):
        from scipy.signal import sosfilt as _sosfilt
        sos = np.asarray(sos, dtype=float)
        if initial:
            return _sosfilt(sos, sig - initial) + initial
        return _sosfilt(sos, sig)
    import jax.numpy as jnp

    from .ops.iir import iir_apply as _iir_apply_dev
    sosd = jnp.asarray(np.asarray(sos, dtype=float), dtype=sig.dtype)
    return _iir_apply_dev(sosd, sig, initial)

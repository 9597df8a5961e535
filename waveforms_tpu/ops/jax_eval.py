"""Trace-specialized XLA evaluator: one fused program per waveform structure.

``compile_waveform`` walks the (hashable) IR once at trace time and emits a
single jit-compiled function of the sample grid: every segment becomes a
mask-select, every term a fused multiply-add, every factor a call into the
traceable basis lowerings (:mod:`waveforms_tpu.ops.jax_basis`).  XLA fuses
the whole thing into one elementwise pass -- the device-side analog of the
reference's ``calc_parts`` (``/root/reference/waveforms/_waveform.pyx:
130-169``) without the per-segment host loop.

The compile cache is keyed on the IR tuples themselves (they are nested
tuples, hence hashable); repeated sampling of structurally equal waveforms
hits the cache and pays zero retrace cost.

Unlike the host oracle, the grid does not need to be sorted: segment
membership is evaluated per point (``bounds[i-1] <= t < bounds[i]``), which
on sorted grids coincides with the oracle's searchsorted semantics.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Waveform, WaveVStack
from ..ir.algebra import ZERO
from .jax_basis import get_traceable

__all__ = ['compile_waveform', 'sample_waveform', 'evaluate', 'compile_expr']


def _expr_is_complex(expr) -> bool:
    return any(isinstance(v, complex) for v in expr[1])


def _eval_expr(expr, t, memo):
    """Trace one IR expression over traced grid *t* (factor-dedup memoized)."""

    def factor_values(factor):
        hit = memo.get(factor)
        if hit is None:
            fun_id, *args, shift = factor
            hit = get_traceable(fun_id)(t - shift, *args)
            memo[factor] = hit
        return hit

    acc = None
    for (factors, powers), v in zip(*expr):
        prod = None
        for factor, n in zip(factors, powers):
            vals = factor_values(factor)
            vals = vals if n == 1 else vals ** n
            prod = vals if prod is None else prod * vals
        term = (v if prod is None else
                (prod * v if v != 1.0 else prod))
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros_like(t)
    if not hasattr(acc, 'shape') or acc.shape != t.shape:
        acc = jnp.broadcast_to(jnp.asarray(acc, dtype=None), t.shape)
    return acc


@lru_cache(maxsize=4096)
def compile_expr(expr):
    """Jitted evaluator for a single segment expression (unbounded support)."""

    @jax.jit
    def run(t):
        return _eval_expr(expr, t, {})

    return run


@lru_cache(maxsize=1024)
def compile_waveform(bounds, seq, vmin=-np.inf, vmax=np.inf):
    """Jitted evaluator ``f(t) -> values`` for a piecewise waveform IR.

    Zero segments contribute nothing (no compute is emitted for them); the
    remaining segments evaluate under their membership mask and clip to
    [vmin, vmax], matching the oracle's per-part ``np.clip``.
    """
    is_complex = any(_expr_is_complex(s) for s in seq if s != ZERO)
    lowers = (-np.inf,) + bounds[:-1]

    def evaluate_fn(t):
        memo: dict = {}
        out = None
        for lo, hi, expr in zip(lowers, bounds, seq):
            if expr == ZERO:
                continue
            vals = _eval_expr(expr, t, memo)
            if vmin != -np.inf or vmax != np.inf:
                vals = jnp.clip(vals, vmin, vmax)
            if lo == -np.inf and hi == np.inf:
                seg = vals
            else:
                mask = jnp.ones(t.shape, dtype=bool)
                if lo != -np.inf:
                    mask = mask & (t >= lo)
                if hi != np.inf:
                    mask = mask & (t < hi)
                seg = jnp.where(mask, vals, 0)
            out = seg if out is None else out + seg
        if out is None:
            dtype = t.dtype
            return jnp.zeros(t.shape, dtype=dtype)
        if is_complex and not jnp.iscomplexobj(out):
            out = out.astype(jnp.complex128 if t.dtype == jnp.float64
                             else jnp.complex64)
        return out

    return jax.jit(evaluate_fn)


def evaluate(wav: Waveform, t) -> jax.Array:
    """Evaluate a Waveform (or WaveVStack) on grid *t* via XLA."""
    t = jnp.asarray(t)
    if isinstance(wav, WaveVStack):
        if wav.function_lib is not None:
            # the XLA path resolves basis IDs against the GLOBAL
            # registry; a stack shipped from another process carries its
            # own function_lib, and a missing ID here would otherwise
            # KeyError (or, worse, collide with a local registration)
            import waveforms_tpu.ir.registry as _reg
            missing = sorted(
                fid for fid in wav.function_lib
                if fid not in _reg.baseFunc)
            if missing:
                raise ValueError(
                    f"stack carries user basis IDs {missing} not in this "
                    "process's registry -- ship it with registry."
                    "packBaseFunc()/updateBaseFunc() first (the XLA "
                    "engine resolves IDs globally)")
        out = jnp.zeros(t.shape,
                        dtype=(jnp.complex128 if t.dtype == jnp.float64
                               else jnp.complex64)) + wav.offset
        tt = t - wav.shift if wav.shift != 0 else t
        for bounds, seq in wav.wlist:
            # min/max passed explicitly: lru_cache keys omitted defaults
            # differently and compiled identical programs twice
            out = out + compile_waveform(bounds, seq, -np.inf, np.inf)(tt)
        return out.real
    return compile_waveform(wav.bounds, wav.seq, wav.min, wav.max)(t)


def sample_waveform(wav: Waveform, sample_rate=None, dtype=None) -> jax.Array:
    """Device-side analog of ``Waveform.sample()`` (incl. SOS filtering)."""
    if sample_rate is None:
        sample_rate = wav.sample_rate
    if wav.start is None or wav.stop is None or sample_rate is None:
        raise ValueError(
            f'Waveform is not initialized. {wav.start=}, {wav.stop=}, '
            f'{sample_rate=}')
    t = np.arange(wav.start, wav.stop, 1 / sample_rate)
    if dtype is not None:
        t = t.astype(dtype)
    sig = evaluate(wav, jnp.asarray(t))
    if wav.filters is not None:
        from .iir import iir_apply
        sos, initial = wav.filters
        sos = jnp.asarray(np.asarray(sos, dtype=float))
        sig = iir_apply(sos, sig, initial)
    return sig

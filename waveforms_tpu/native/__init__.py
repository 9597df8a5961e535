"""Native (C++) host synthesis engine, bound via ctypes.

``synthesize_native(low)`` runs the same descriptor program as the Pallas
TPU kernel on the CPU in double precision, multithreaded over channels --
the production host fallback and a high-precision oracle for the kernel's
fixed-point phase semantics.  The shared library builds on first use with
g++ (-O3 -march=native -fopenmp); if no toolchain is available,
``available()`` returns False and callers fall back to the numpy oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'wavecore.cpp')
_LIB = os.path.join(_HERE, '_wavecore.so')
_LOWER_SRC = os.path.join(_HERE, 'lowerext.cpp')
_LOWER_LIB = os.path.join(_HERE, '_lowerext.so')
# baseline-architecture builds bundled by WFTPU_BUILD_NATIVE=1 wheels
# (setup.py); used when the host has no toolchain
_LIB_PREBUILT = os.path.join(_HERE, '_wavecore_prebuilt.so')
_LOWER_PREBUILT = os.path.join(_HERE, '_lowerext_prebuilt.so')

_lock = threading.Lock()
_lib = None
_build_error: str | None = None
_lower_mod = None
_lower_error: str | None = None


def _build() -> None:
    # Compile with -ffast-math (enables libmvec SIMD transcendentals) but
    # LINK without it: GCC 12 would otherwise embed crtfastmath.o in the
    # shared library, which sets FTZ/DAZ for the whole host process at
    # dlopen and silently changes float64 subnormal semantics everywhere.
    # unique temp names + atomic rename: concurrent builders never clobber
    tmp = f"{_LIB}.{os.getpid()}"
    obj = tmp + '.o'
    try:
        subprocess.run(['g++', '-O3', '-march=native', '-ffast-math',
                        '-fopenmp', '-fPIC', '-c', _SRC, '-o', obj],
                       check=True, capture_output=True, text=True)
        subprocess.run(['g++', '-shared', '-fopenmp', '-o', tmp, obj,
                        '-lmvec', '-lm'],
                       check=True, capture_output=True, text=True)
        os.replace(tmp, _LIB)
    finally:
        # a failed compile/link must not strand tmp artifacts in the
        # package dir (one pair per failing import attempt)
        for leftover in (obj, tmp):
            try:
                os.unlink(leftover)
            except OSError:
                pass


def _load():
    global _lib, _build_error
    if os.environ.get('WFTPU_DISABLE_NATIVE'):
        # explicit opt-out (and the CI hook validating that every code
        # path degrades gracefully on hosts without a C++ toolchain)
        _build_error = 'disabled via WFTPU_DISABLE_NATIVE'
        return None
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.wavecore_synthesize.restype = None
            lib.wavecore_version.restype = ctypes.c_int32
            _lib = lib
        except Exception as exc:  # toolchain missing, build failure, ...
            # wheel-bundled baseline build (setup.py WFTPU_BUILD_NATIVE=1):
            # slower than -march=native but toolchain-free
            try:
                if os.path.exists(_LIB_PREBUILT):
                    lib = ctypes.CDLL(_LIB_PREBUILT)
                    lib.wavecore_synthesize.restype = None
                    lib.wavecore_version.restype = ctypes.c_int32
                    _lib = lib
                    return _lib
            except Exception:
                pass
            _build_error = str(exc)
            _lib = None
    return _lib


def _load_lower():
    """Build/load the native IR->descriptor lowering extension."""
    global _lower_mod, _lower_error
    if os.environ.get('WFTPU_DISABLE_NATIVE'):
        _lower_error = 'disabled via WFTPU_DISABLE_NATIVE'
        return None
    with _lock:
        if _lower_mod is not None or _lower_error is not None:
            return _lower_mod
        try:
            import sysconfig
            if (not os.path.exists(_LOWER_LIB)
                    or os.path.getmtime(_LOWER_LIB)
                    < os.path.getmtime(_LOWER_SRC)):
                inc = sysconfig.get_paths()['include']
                tmp = f"{_LOWER_LIB}.{os.getpid()}"
                try:
                    subprocess.run(
                        ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                         f'-I{inc}', _LOWER_SRC, '-o', tmp],
                        check=True, capture_output=True, text=True)
                    os.replace(tmp, _LOWER_LIB)
                finally:
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass
            _lower_mod = _import_lower(_LOWER_LIB)
        except Exception as exc:
            try:
                if os.path.exists(_LOWER_PREBUILT):
                    _lower_mod = _import_lower(_LOWER_PREBUILT)
                    return _lower_mod
            except Exception:
                pass
            _lower_error = str(exc)
            _lower_mod = None
    return _lower_mod


def _import_lower(path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'waveforms_tpu.native._lowerext', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def lower_available() -> bool:
    return _load_lower() is not None


def lower_channel_flat(pieces, grid, start, dt, want_imag):
    """Native channel lowering -> flat numpy arrays, or None (fallback).

    Returns (seg_lo, seg_hi, seg_nterm, term_amp, term_nfac, f_op, f_pw,
    f_sh, f_q32(n,4), f_args(n,12), ext(float64)) or None when a factor
    (or the build) requires the Python path.  ``ext`` holds this channel's
    float64 side-buffer blocks (multi-tone DRAG coefficient tables) with
    CHANNEL-LOCAL offsets in args[:, 7]; the schedule assembler rebases
    them into the shared schedule buffer.
    """
    mod = _load_lower()
    if mod is None:
        return None
    res = mod.lower_channel(list(pieces), memoryview(grid), float(start),
                            float(dt), int(want_imag))
    if res is None:
        return None
    (b_lo, b_hi, b_nt), (b_amp, b_nf), (b_op, b_pw, b_sh, b_q, b_a), b_x = res
    seg_lo = np.frombuffer(b_lo, np.int64)
    seg_hi = np.frombuffer(b_hi, np.int64)
    seg_nt = np.frombuffer(b_nt, np.int32)
    t_amp = np.frombuffer(b_amp, np.float32)
    t_nf = np.frombuffer(b_nf, np.int32)
    f_op = np.frombuffer(b_op, np.int32)
    f_pw = np.frombuffer(b_pw, np.int32)
    f_sh = np.frombuffer(b_sh, np.int32)
    f_q = np.frombuffer(b_q, np.int32).reshape(-1, 4)
    f_a = np.frombuffer(b_a, np.float32).reshape(-1, 12)
    ext = np.frombuffer(b_x, np.float64)
    return seg_lo, seg_hi, seg_nt, t_amp, t_nf, f_op, f_pw, f_sh, f_q, f_a, \
        ext


def available() -> bool:
    """True if the native engine built (or can build) on this host."""
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def synthesize_native(low, n_threads: int = 0) -> np.ndarray:
    """Synthesize a LoweredSchedule on the CPU -> (C, N) float64.

    Schedules lowered with ``part='complex'`` (carrying an ``amp_im``
    plane) run in pair mode -- one factor-product pass scaled by both
    amplitude planes -- and return complex128.
    ``n_threads=0`` uses the OpenMP default (all cores).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native engine unavailable: {_build_error}")

    from ..ops.lowering import W_ARGS

    C, NB, Sb, T, F = low.shape
    pair = getattr(low, 'amp_im', None) is not None
    out = np.empty((C, low.n_samples), dtype=np.float64)
    out_im = np.empty((C, low.n_samples), dtype=np.float64) if pair else None

    clip = np.stack([low.clip_min, low.clip_max], axis=1)
    # contiguous, correctly-typed holders kept alive for the call duration
    i32s = [np.ascontiguousarray(x, dtype=np.int32) for x in
            (low.seg_lo, low.seg_hi, low.nterm, low.nfac, low.op,
             low.power, low.shift_hi, low.q32)]
    f32s = [np.ascontiguousarray(x, dtype=np.float32) for x in
            (low.amp, low.args, clip)]
    amp_im = (np.ascontiguousarray(low.amp_im, dtype=np.float32)
              if pair else None)
    ext = np.ascontiguousarray(
        low.ext if low.ext is not None and low.ext.size else np.zeros(1),
        dtype=np.float64)

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def dp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    seg_lo, seg_hi, nterm, nfac, op, power, shift_hi, q32 = i32s
    amp, args, clipf = f32s
    lib.wavecore_synthesize(
        ip(seg_lo), ip(seg_hi), ip(nterm), ip(nfac), fp(amp), ip(op),
        ip(power), ip(shift_hi), ip(q32), fp(args), dp(ext), fp(clipf),
        ctypes.c_int32(C), ctypes.c_int32(NB), ctypes.c_int32(Sb),
        ctypes.c_int32(T), ctypes.c_int32(F), ctypes.c_int32(W_ARGS),
        ctypes.c_int64(low.n_samples), ctypes.c_int64(low.bucket_samples),
        dp(out),
        fp(amp_im) if pair else None,
        dp(out_im) if pair else None,
        ctypes.c_int32(n_threads))
    if pair:
        return out + 1j * out_im
    return out

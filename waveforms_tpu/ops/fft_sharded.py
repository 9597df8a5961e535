"""Distributed FFT over the sample axis: the long-axis deconvolution path.

The reference deconvolves distortion kernels with host ``fftconvolve``
(``/root/reference/waveforms/distortion.py:329-337``); at production scale
(2M samples/channel) the sample axis is sharded over the device mesh, and
the transform must ride ICI instead of gathering to one chip.  This module
implements the classic FOUR-STEP decomposition, which maps exactly onto
TPU strengths:

view x (length N = P * L, P shards) as the row-major matrix A[r, c]
(r in [0, P), c in [0, L), shard r holds row r).  Then with
w = exp(-2i pi / N):

    B[p, c] = DFT_P over r of A[r, c]      (short column DFTs)
    C[p, c] = B[p, c] * w^(c p)            (twiddle, elementwise)
    X[p + P q] = DFT_L over c of C[p, c]   (long row DFTs)

Step 1's cross-shard DFT becomes LOCAL after an ``all_to_all`` transpose
(each shard then holds all P rows of an L/P column block) and is a tiny
(P, P) @ (P, L/P) matmul -- MXU work.  A second ``all_to_all`` restores
row-sharding for step 3's local ``jnp.fft``.  The output lands in the
natural *strided* distribution (shard p holds ``X[p::P]``), which is
exactly what convolution wants: multiply by an identically-distributed
kernel spectrum, then run the inverse (which retraces the steps and
returns the natural block distribution).  One shard never materializes
more than N/P samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['fft_sharded', 'ifft_sharded', 'fft_convolve_sharded']


def _dft_matrix(P, inverse, dtype):
    k = np.arange(P)
    sign = 2j if inverse else -2j
    W = np.exp(sign * np.pi * np.outer(k, k) / P)
    return jnp.asarray(W, dtype)


def fft_sharded(xl: jax.Array, axis_name: str) -> jax.Array:
    """Per-shard body (call under shard_map): local block of x -> local
    strided block of DFT(x): shard p returns ``X[p + P*q]`` for all q.

    ``xl``: (L,) complex, the shard's contiguous block; L must be a
    multiple of the axis size P.
    """
    P = jax.lax.axis_size(axis_name)
    L = xl.shape[-1]
    cdt = xl.dtype
    # transpose: shard p <- column block [p*L/P, (p+1)*L/P) of ALL rows
    blocks = xl.reshape(P, L // P)
    at = jax.lax.all_to_all(blocks, axis_name, split_axis=0, concat_axis=0,
                            tiled=False)                     # (P, L/P) rows
    # short column DFTs on the MXU
    B = _dft_matrix(P, False, cdt) @ at                      # (P, L/P)
    # twiddle w^(c p): this shard owns columns c = my_block*L/P + j
    C = B * _twiddle(axis_name, P, L, -1.0, cdt)
    # transpose back: shard p <- row p of C, i.e. C[p, :] full length L
    back = jax.lax.all_to_all(C, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)                   # (P, L/P)
    row = back.reshape(L)
    return jnp.fft.fft(row)                                  # X[p + P q]


def _twiddle(axis_name: str, P: int, L: int, sign: float, cdt):
    """The (P, L/P) twiddle block w^(sign * c p) this shard owns --
    shared by the forward and inverse transforms so the layout math
    cannot drift between them."""
    me = jax.lax.axis_index(axis_name)
    c = (me * (L // P) + jnp.arange(L // P))[None, :]
    p = jnp.arange(P)[:, None]
    N = P * L
    return jnp.exp((sign * 2j * jnp.pi / N) * (c * p)).astype(cdt)


def ifft_sharded(Xl: jax.Array, axis_name: str) -> jax.Array:
    """Inverse of :func:`fft_sharded`: strided spectrum block back to the
    shard's contiguous sample block (steps retraced in reverse)."""
    P = jax.lax.axis_size(axis_name)
    L = Xl.shape[-1]
    cdt = Xl.dtype
    row = jnp.fft.ifft(Xl)                                   # C[p, :] / L·...
    back = row.reshape(P, L // P)
    C = jax.lax.all_to_all(back, axis_name, split_axis=0, concat_axis=0,
                           tiled=False)
    B = C * _twiddle(axis_name, P, L, +1.0, cdt)
    at = (_dft_matrix(P, True, cdt) / P) @ B
    blocks = jax.lax.all_to_all(at, axis_name, split_axis=0, concat_axis=0,
                                tiled=False)
    return blocks.reshape(L)


def fft_convolve_sharded(sig: jax.Array, ker: np.ndarray, mesh,
                         axis: str = 'time',
                         centered: bool = False) -> jax.Array:
    """Circular FFT convolution of a sample-axis-sharded signal.

    ``sig``: (N,) real or complex, sharded (or shardable) over ``axis`` of
    ``mesh``; ``ker``: host kernel (length <= N), zero-padded to N.  The
    kernel spectrum is computed once on the host in f64 and distributed in
    the SAME strided order the sharded FFT emits, so the pointwise product
    never crosses shards.  Returns the (N,) convolution, block-sharded.

    ``centered=True`` treats the kernel's zero-lag as its CENTER tap
    (``len(ker)//2``) -- the convention of :func:`extract_kernel_jax` /
    the reference's ``extractKernel`` -- by rolling it before the
    transform; without it, such kernels shift the output by half the
    kernel length.  NB: this is CIRCULAR convolution either way (the
    first/last ~len(ker)/2 samples wrap); the single-chip
    :func:`fft_convolve_centered` zero-pads instead.
    """
    from jax.sharding import NamedSharding, PartitionSpec as PS

    P = mesh.shape[axis]
    N = sig.shape[-1]
    if N % (P * P):
        raise ValueError(f"N ({N}) must be a multiple of P^2 ({P * P})")
    ker = np.asarray(ker, np.complex128)
    if centered:
        rolled = np.zeros(N, np.complex128)
        K = ker.shape[-1]
        rolled[:K] = ker
        ker = np.roll(rolled, -(K // 2))
    if ker.shape[-1] > N:
        raise ValueError(
            f"kernel ({ker.shape[-1]} taps) longer than the signal ({N}) "
            "-- np.fft.fft would silently truncate it")
    Kf = np.fft.fft(ker, n=N)
    # precision follows the caller's dtype: f64/c128 signals (the x64
    # tier) keep full double precision through the transform
    cdt = (jnp.complex128 if sig.dtype in (jnp.float64, jnp.complex128)
           else jnp.complex64)
    # strided distribution: shard p needs Kf[p::P]; laying the spectrum
    # out as (P, N/P) row-major with row p = Kf[p::P] makes a plain
    # block-shard of the flattened array deliver exactly that
    Kf_strided = jnp.asarray(Kf.reshape(N // P, P).T.reshape(N), cdt)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(PS(axis), PS(axis)), out_specs=PS(axis))
    def conv(xl, kl):
        X = fft_sharded(xl.astype(cdt), axis)
        return ifft_sharded(X * kl, axis)

    out = conv(jax.device_put(sig, NamedSharding(mesh, PS(axis))),
               Kf_strided)
    return out.real if not jnp.iscomplexobj(sig) else out

"""Chunked streaming synthesis with carried IIR filter state.

Device analog of the reference's chunked ``Waveform.sample(chunk_size=...)``
(``/root/reference/waveforms/waveform.py:209-257``): the synthesis kernel
already takes a per-call sample offset (row0), so streaming is just repeated
kernel launches over successive windows, with SOS filter state ``zi``
carried across chunk boundaries by :func:`waveforms_tpu.ops.iir.sosfilt`.

Use cases: AWG-style upload of waveforms larger than device memory, or
latency-bounded pipelines where downstream consumes chunks as they finish.
"""

from __future__ import annotations

from typing import Generator

import jax
import jax.numpy as jnp
import numpy as np

from .iir import sosfilt
from .pallas_synth import DeviceSchedule, _run_kernel, default_rows_per_tile

__all__ = ['synthesize_stream']


def synthesize_stream(dev: DeviceSchedule, chunk_rows: int = 512,
                      rows_per_tile: int | None = None, filters=None,
                      interpret: bool = False, out_dtype=None,
                      dac_scale=32767.0
                      ) -> Generator[jax.Array, None, None]:
    """Yield (C, chunk_rows*128) chunks of the schedule, in time order.

    ``filters = (sos, initial)`` applies per-channel SOS filtering with
    state carried across chunks (matching the host streaming semantics).
    The final chunk is trimmed to the schedule's sample count.
    Complex (pair-mode) schedules stream complex64 chunks; SOS filtering
    applies to the real and imaginary planes independently.

    ``out_dtype=jnp.int16`` streams exact in-kernel DAC codes scaled by
    the scalar/per-channel ``dac_scale`` (the shared engine convention)
    -- the AWG-upload use case this generator exists for.  Quantized
    streaming excludes ``filters`` (filter f32, then quantize).
    """
    C, NB, S, T, F = dev.shape
    scale_t = None
    if out_dtype is not None and jnp.dtype(out_dtype) != jnp.dtype(
            jnp.float32):
        if filters is not None:
            raise ValueError(
                "quantized streaming excludes filters -- stream f32, "
                "filter, then quantize host-side (codes must round once)")
        from .pallas_synth import validate_out_mode
        scale_np = validate_out_mode(out_dtype, dev.amp_im, C, dac_scale)
        if scale_np is not None:
            scale_t = jnp.asarray(scale_np)
    else:
        out_dtype = None
    if rows_per_tile is None:
        rows_per_tile = default_rows_per_tile(
            min(dev.n_samples, chunk_rows * 128), dev.bucket_samples, NB,
            divides=chunk_rows)
    R = rows_per_tile
    if chunk_rows % R:
        raise ValueError(f"chunk_rows must be a multiple of {R}")
    tile = R * 128
    if NB > 1 and dev.bucket_samples % tile != 0:
        raise ValueError("bucket_samples must be a multiple of the tile")
    if NB > 1 and (chunk_rows * 128) % dev.bucket_samples != 0:
        raise ValueError("chunk must cover whole buckets")
    G = max(dev.bucket_samples // tile, 1)

    n_rows_total = -(-dev.n_samples // 128)
    n_chunks = -(-n_rows_total // chunk_rows)

    zi = None
    sos = initial = None
    if filters is not None:
        sos, initial = filters
        sos = jnp.asarray(np.asarray(sos, dtype=float))
        zi = jnp.zeros((C, sos.shape[0], 2))
        if dev.amp_im is not None:
            # pair mode filters the two planes independently: stack the
            # per-plane state up front (inferring it from zi's shape inside
            # the loop breaks when C == 2)
            zi = jnp.stack([zi, zi])

    emitted = 0
    for k in range(n_chunks):
        row0 = jnp.full((1, 1, 1, 1), k * chunk_rows * 128, jnp.int32)
        if NB > 1:
            # slice this chunk's buckets so the bucket index_map stays
            # chunk-local; zero-pad the tail chunk to a full bucket count
            b0 = (k * chunk_rows * 128) // dev.bucket_samples
            nb = (chunk_rows * 128) // dev.bucket_samples

            def window(x):
                if x.shape[1] != NB:
                    return x
                sl = x[:, b0:min(b0 + nb, NB)]
                if sl.shape[1] < nb:
                    pad = jnp.zeros(
                        (sl.shape[0], nb - sl.shape[1]) + sl.shape[2:],
                        dtype=sl.dtype)
                    sl = jnp.concatenate([sl, pad], axis=1)
                return sl

            tensors = [window(x) for x in dev.tensors]
            amp_im = window(dev.amp_im) if dev.amp_im is not None else None
        else:
            tensors = list(dev.tensors)
            amp_im = dev.amp_im
        out = _run_kernel(row0, *tensors, amp_im, scale_t, S=S, T=T, F=F,
                          R=R, n_rows=chunk_rows, tiles_per_bucket=G,
                          ops_present=dev.ops_present, interpret=interpret,
                          out_dtype=(out_dtype if out_dtype is not None
                                     else jnp.float32))
        if amp_im is not None:
            re, im = out
            out = re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)
        sig = out.reshape(C, chunk_rows * 128)

        if filters is not None:
            if jnp.iscomplexobj(sig):
                # one batched sosfilt over (2C, n) stacked planes; the
                # DC 'initial' setpoint shifts the REAL plane only --
                # the host path computes sosfilt(sos, sig - initial)
                # where complex-minus-real-scalar leaves imag untouched
                # (round-4 review: shifting imag too injected a decaying
                # transient into every streamed pair-mode chunk)
                planes = jnp.concatenate(
                    [sig.real.astype(sos.dtype),
                     sig.imag.astype(sos.dtype)])
                if initial:
                    planes = planes.at[:C].add(-initial)
                planes, zi = jax.vmap(
                    lambda x, z: sosfilt(sos, x, zi=z))(
                        planes, zi.reshape((2 * C,) + zi.shape[2:]))
                zi = zi.reshape((2, C) + zi.shape[1:])
                if initial:
                    planes = planes.at[:C].add(initial)
                sig = planes[:C] + 1j * planes[C:]
            else:
                sig = sig.astype(sos.dtype)  # f64 filtering under x64
                if initial:
                    sig = sig - initial
                sig, zi = jax.vmap(lambda x, z: sosfilt(sos, x, zi=z))(sig,
                                                                       zi)
                if initial:
                    sig = sig + initial

        remaining = dev.n_samples - emitted
        if remaining < sig.shape[1]:
            sig = sig[:, :remaining]
        emitted += sig.shape[1]
        yield sig

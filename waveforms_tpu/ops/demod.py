"""Readout demodulation on the MXU: project signal frames onto tone combs.

The device analog of :func:`waveforms_tpu.utils.getFTMatrix`
(cf. /root/reference/waveforms/utils.py:35-84): building the
``exp(-1j(2 pi f t + phi)) * weight`` matrix and contracting the sample axis
is exactly a matmul, so readout demodulation of many channels against many
tones rides the TPU's systolic array.  Under a ('channel', 'time') mesh the
contraction reduces over the sharded sample axis with a psum inserted by the
partitioner (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['demod_matrix', 'demodulate']


def demod_matrix(freqs, n_samples: int, sample_rate: float, phases=None,
                 weight=None, dtype=jnp.complex64) -> jax.Array:
    """(n_samples, n_tones) demodulation matrix, getFTMatrix-compatible."""
    freqs = np.atleast_1d(np.asarray(freqs, dtype=float))
    t = np.linspace(0, n_samples / sample_rate, n_samples, endpoint=False)
    if phases is None:
        phases = np.zeros_like(freqs)
    if weight is None:
        weight = np.full(n_samples, 2.0 / n_samples)
    weight = np.asarray(weight, dtype=float)
    # getFTMatrix accepts per-tone integration weights too: a 2-D weight
    # is (n_tones, n_samples), one row per tone (utils.py:79-83)
    w = weight.T if weight.ndim == 2 else weight[:, None]
    e = w * np.exp(
        -1j * (2 * np.pi * freqs[None, :] * t[:, None]
               + np.asarray(phases)[None, :]))
    return jnp.asarray(e, dtype=dtype)


@jax.jit
def demodulate(signals: jax.Array, matrix: jax.Array) -> jax.Array:
    """IQ values per (channel/shot, tone): one MXU matmul.

    ``signals``: (batch, n_samples) real; ``matrix``: (n_samples, n_tones)
    complex.  Returns (batch, n_tones) complex.  Real and imaginary parts
    contract separately so the MXU sees two real matmuls.
    """
    sig = signals.astype(matrix.real.dtype)
    re = jnp.dot(sig, matrix.real, preferred_element_type=sig.dtype)
    im = jnp.dot(sig, matrix.imag, preferred_element_type=sig.dtype)
    return re + 1j * im

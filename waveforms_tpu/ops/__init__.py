"""Device execution layer: XLA/Pallas evaluators, IIR scans, FFT pipelines."""

from .jax_eval import compile_waveform, evaluate, sample_waveform
from .iir import lfilter, predistort_jax, sosfilt

__all__ = ['compile_waveform', 'evaluate', 'sample_waveform', 'sosfilt',
           'lfilter', 'predistort_jax']

"""Device execution layer: descriptor lowering, Pallas/XLA evaluators,
IIR scans, FFT pipelines, streaming synthesis."""

from .fft_sharded import fft_convolve_sharded
from .iir import filter_zpk, lfilter, predistort_jax, sosfilt
from .jax_eval import compile_waveform, evaluate, sample_waveform
from .lowering import (LoweredSchedule, UnsupportedFactor, lower_schedule)
from .pallas_synth import (DeviceSchedule, synthesize, synthesize_device,
                           synthesize_lowered)
from .sequencer import Sequencer
from .stack_seq import StackSequencer
from .sparse_synth import (SparsePlan, build_sparse_plan,
                           synthesize_sparse, synthesize_sparse_sharded)
from .stack_synth import StackPlan, build_stack_plan, synthesize_stack
from .streaming import synthesize_stream

__all__ = [
    'compile_waveform', 'evaluate', 'sample_waveform',
    'sosfilt', 'lfilter', 'filter_zpk', 'predistort_jax',
    'LoweredSchedule', 'UnsupportedFactor', 'lower_schedule',
    'DeviceSchedule', 'synthesize', 'synthesize_device',
    'synthesize_lowered', 'synthesize_stream', 'Sequencer',
    'StackSequencer',
    'SparsePlan', 'build_sparse_plan', 'synthesize_sparse',
    'synthesize_sparse_sharded',
    'StackPlan', 'build_stack_plan', 'synthesize_stack',
    'fft_convolve_sharded',
]

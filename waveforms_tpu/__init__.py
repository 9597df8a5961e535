"""waveforms_tpu: a TPU-native pulse-synthesis framework.

Control waveforms are described by a lazy, hashable symbolic IR (piecewise
sums of products of analytic basis functions, closed under
``+ - * / ** >> << | &`` and exact differentiation) and synthesized by
interchangeable engines over the same IR: the numpy oracle (host,
float64, bit-parity with the reference library feihoo87/waveforms), a
trace-specialized XLA program (the 1e-9 tier, CPU and TPU), a C++ host
engine, and three TPU Pallas/XLA production paths -- a dense descriptor-
interpreter grid, a sparse live-subtile worklist, and a pulse-instance
batched scatter -- auto-selected by schedule shape
(:mod:`waveforms_tpu.engine`), batching hundreds of channels into one
``(channels, samples)`` launch and sharding over device meshes
(:mod:`waveforms_tpu.parallel`).

The public namespace mirrors ``/root/reference/waveforms/__init__.py``.
"""

from numpy import e, pi

from .core import Waveform, WaveVStack, const, one, play, zero
from .dsl import wave_eval
from .engine import sample, synthesize
from .ir.registry import registerBaseFunc, registerDerivative
from .models import (D, chirp, cos, cosh, coshPulse, cosPulse, cut, drag,
                     drag_sin, drag_sinx, exp, function, gaussian,
                     general_cosine, hanning, interp, mixing, mollifier, poly,
                     samplingPoints, sign, sin, sinc, sinh, slepian, square,
                     step, t)
from .version import __version__

__all__ = [
    'D', 'Waveform', 'WaveVStack', 'chirp', 'const', 'cos', 'cosh',
    'coshPulse', 'cosPulse', 'cut', 'drag', 'drag_sin', 'drag_sinx', 'e',
    'exp', 'function', 'gaussian', 'general_cosine', 'hanning', 'interp',
    'mixing', 'mollifier', 'one', 'pi', 'play', 'poly', 'registerBaseFunc',
    'registerDerivative', 'sample', 'samplingPoints', 'sign', 'sin', 'sinc',
    'sinh', 'slepian', 'square', 'step', 'synthesize', 't', 'wave_eval',
    'zero', '__version__',
]

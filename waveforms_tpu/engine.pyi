from typing import Any, Iterable, Literal

import numpy as np
from numpy.typing import NDArray

from .core import Waveform

Engine = Literal['auto', 'pallas', 'pallas-sparse', 'pallas-dense',
                 'pallas-stack', 'xla', 'native', 'numpy']


def synthesize(channels: Iterable[Waveform], start: float, stop: float,
               sample_rate: float, engine: Engine = ...,
               bucket_samples: int | str | None = ...,
               part: Literal['real', 'imag', 'complex'] = ...,
               ) -> NDArray[np.floating] | Any: ...


def sample(wav: Waveform, sample_rate: float | None = ...,
           engine: Engine = ...) -> NDArray[np.floating] | Any: ...

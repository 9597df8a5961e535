from typing import Any, Iterable, Literal

import numpy as np
from numpy.typing import NDArray

from .core import Waveform

Engine = Literal['auto', 'pallas', 'pallas-panel', 'pallas-sparse',
                 'pallas-dense', 'pallas-stack', 'xla', 'native', 'numpy']

RouteKind = Literal['panel', 'panel-windowed', 'sparse',
                    'stack', 'dense']


def synthesize(channels: Iterable[Waveform], start: float, stop: float,
               sample_rate: float, engine: Engine = ...,
               bucket_samples: int | str | None = ...,
               part: Literal['real', 'imag', 'complex'] = ...,
               precision: Literal['single', 'double'] = ...,
               out_dtype: Any = ..., dac_scale: float | Any = ...,
               ) -> NDArray[np.floating] | Any: ...


def classify_pallas_route(low: Any, force: str | None = ...,
                          out_dtype: Any = ...
                          ) -> tuple[RouteKind, Any]: ...


def sample(wav: Waveform, sample_rate: float | None = ...,
           engine: Engine = ...) -> NDArray[np.floating] | Any: ...

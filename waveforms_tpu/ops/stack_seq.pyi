"""Stubs for stacked-table (stack-path) sequence playback."""

from typing import Any, Sequence

import jax

from .lowering import LoweredSchedule
from .stack_synth import StackPlan


class StackSequencer:
    n_schedules: int
    n_channels: int
    n_samples: int
    sample_rate: float
    n_super: int

    def __init__(self, lows: list[LoweredSchedule],
                 plans: list[StackPlan] | None = ...,
                 n_super_multiple: int = ...) -> None: ...
    def describe(self) -> str: ...
    def play(self, k: int | jax.Array,
             interpret: bool | None = ..., out_dtype: Any = ...,
             dac_scale: float = ...) -> jax.Array: ...
    def play_packed(self, ks: Sequence[int] | jax.Array,
                    interpret: bool | None = ..., out_dtype: Any = ...,
                    dac_scale: float = ...) -> jax.Array: ...
    def play_packed_sharded(self, ks: Sequence[int] | jax.Array,
                            mesh: Any, interpret: bool | None = ...,
                            out_dtype: Any = ...,
                            dac_scale: float = ...) -> jax.Array: ...


def synthesize_stack_sharded(channels: Sequence[Any], start: float,
                             stop: float, sample_rate: float, mesh: Any,
                             interpret: bool | None = ...,
                             out_dtype: Any = ...,
                             dac_scale: float = ...) -> jax.Array: ...

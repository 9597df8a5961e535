"""Stubs for device-resident sequence tables (play-by-index shot loops)."""

from typing import Any, Sequence

import jax

from .lowering import LoweredSchedule


class Sequencer:
    shape: tuple[int, int, int, int, int]
    n_samples: int
    sample_rate: float
    bucket_samples: int
    n_schedules: int
    ops_present: tuple[int, ...]
    pair: bool

    def __init__(self, schedules: list[LoweredSchedule]) -> None: ...
    def describe(self) -> str: ...
    def play(self, k: int | jax.Array,
             rows_per_tile: int | None = ...,
             interpret: bool = ..., out_dtype: Any = ...,
             dac_scale: float = ...) -> jax.Array: ...
    def play_sparse(self, k: int | jax.Array, Rs: int = ...,
                    interpret: bool = ...) -> jax.Array: ...
    def play_many(self, ks: Sequence[int] | jax.Array,
                  rows_per_tile: int | None = ...,
                  sparse: bool = ..., Rs: int = ...,
                  interpret: bool = ...,
                  out_dtype: Any = ...) -> jax.Array: ...
    def play_packed(self, ks: Sequence[int] | jax.Array, Rs: int = ...,
                    interpret: bool = ..., out_dtype: Any = ...,
                    dac_scale: float = ...) -> jax.Array: ...
    def play_replay(self, ks: Sequence[int] | jax.Array,
                    interpret: bool = ..., out_dtype: Any = ...,
                    dac_scale: float = ...,
                    max_palette_bytes: int = ...) -> jax.Array: ...

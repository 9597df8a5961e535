"""Stubs for multi-chip sharded synthesis over a ('channel','time') Mesh."""

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh
from numpy.typing import NDArray

from ..ops.lowering import LoweredSchedule


def channel_mesh(n_channel: int | None = ..., n_time: int = ...,
                 devices: Sequence[Any] | NDArray[np.object_] | None = ...
                 ) -> Mesh: ...
def shard_schedule(low: LoweredSchedule, mesh: Mesh,
                   nb_pad: int | None = ...
                   ) -> tuple[dict[str, jax.Array], int]: ...
def synthesize_sharded(low: LoweredSchedule, mesh: Mesh,
                       rows_per_tile: int | None = ...,
                       interpret: bool = ...,
                       out_dtype: Any = ...,
                       dac_scale: float | NDArray[np.float32] = ...
                       ) -> jax.Array: ...
def synthesize_on_mesh(channels: Sequence[Any], start: float, stop: float,
                       sample_rate: float, mesh: Mesh, part: str = ...,
                       rows_per_tile: int | None = ...,
                       interpret: bool = ...,
                       out_dtype: Any = ...) -> jax.Array: ...

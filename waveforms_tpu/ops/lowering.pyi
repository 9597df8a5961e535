"""Stubs for the descriptor lowering layer (lab-integrator surface:
lower once, save/load checkpoints, inspect stats, hand to an engine)."""

from dataclasses import dataclass
from os import PathLike
from typing import Any, Sequence

import numpy as np
from numpy.typing import NDArray

W_ARGS: int
N_OPS: int
PALLAS_OPS: frozenset[int]
PALLAS_EXT_MAX: int
PALLAS_SMEM_BUDGET: int
SEG_SENTINEL: int

OP_LINEAR: int
OP_GAUSSIAN: int
OP_ERF: int
OP_COS: int
OP_SINC: int
OP_EXP: int
OP_LINEARCHIRP: int
OP_EXPCHIRP: int
OP_HYPCHIRP: int
OP_COSH: int
OP_SINH: int
OP_DRAG: int
OP_POLY_GAUSS: int
OP_MOLLIFIER: int
OP_INTERP: int
OP_DRAG_SIN: int
OP_DRAG_SINX: int
DRAG_SIN_MAXM: int
DRAG_SIN_NC: int
DRAG_SINX_MAXQ: int


class UnsupportedFactor(Exception): ...


@dataclass
class FactorDesc:
    op: int
    power: int
    shift_hi: int
    args: NDArray[np.float64]
    q32: tuple[int, int, int, int]


@dataclass
class SegmentDesc:
    lo: int
    hi: int
    amps: list[complex]
    factors: list[list[FactorDesc]]


class LoweredSchedule:
    seg_lo: NDArray[np.int32]
    seg_hi: NDArray[np.int32]
    nterm: NDArray[np.int32]
    amp: NDArray[np.float32]
    nfac: NDArray[np.int32]
    op: NDArray[np.int32]
    power: NDArray[np.int32]
    shift_hi: NDArray[np.int32]
    q32: NDArray[np.int32]
    args: NDArray[np.float32]
    clip_min: NDArray[np.float32]
    clip_max: NDArray[np.float32]
    n_samples: int
    start: float
    sample_rate: float
    bucket_samples: int
    ext: NDArray[np.float64] | None
    amp_im: NDArray[np.float32] | None
    pallas_ok: bool
    args_lo: NDArray[np.float32] | None
    amp_lo: NDArray[np.float32] | None

    @property
    def shape(self) -> tuple[int, int, int, int, int]: ...
    @property
    def n_buckets(self) -> int: ...
    def occupancy(self) -> float: ...
    def stats(self) -> dict[str, Any]: ...
    def describe(self) -> str: ...
    def save(self, path: str | PathLike[str]) -> None: ...
    @classmethod
    def load(cls, path: str | PathLike[str]) -> 'LoweredSchedule': ...


def lower_channel(wav: Any, grid: NDArray[np.float64], start: float,
                  dt: float, part: str, ext: list[float],
                  cache: dict[Any, Any]
                  ) -> tuple[list[SegmentDesc], float, float]: ...
def lower_schedule(channels: Sequence[Any], start: float, stop: float,
                   sample_rate: float, part: str = ...,
                   pad_to: tuple[int, int, int] | None = ...,
                   bucket_samples: int | str | None = ...,
                   keep_f64: bool = ...) -> LoweredSchedule: ...

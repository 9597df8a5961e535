"""Stubs for the base-function registry (user-extensible basis table)."""

from typing import Callable, Protocol

import numpy as np
from numpy.typing import NDArray


class _BaseFunc(Protocol):
    def __call__(self, t: NDArray[np.float64],
                 *args: float) -> NDArray[np.float64]: ...


LINEAR: int
GAUSSIAN: int
ERF: int
COS: int
SINC: int
EXP: int
INTERP: int
LINEARCHIRP: int
EXPONENTIALCHIRP: int
HYPERBOLICCHIRP: int
COSH: int
SINH: int
DRAG: int
MOLLIFIER: int
D_GAUSSIAN: int

baseFunc: dict[int, _BaseFunc]
derivativeBaseFunc: dict[int, Callable[..., object]]
baseFuncLatex: dict[int, Callable[..., str]]

def registerBaseFunc(func: _BaseFunc) -> int: ...
def registerDerivative(fun_id: int,
                       dfunc: Callable[..., object]) -> None: ...
def registerBaseFuncLatex(fun_id: int,
                          formatter: Callable[..., str]) -> None: ...
def packBaseFunc() -> bytes: ...
def updateBaseFunc(buf: bytes) -> None: ...
def hermite_coefficients(n: int) -> list[int]: ...
def mollifier_poly(d: int) -> np.poly1d: ...

"""Deep-freeze arbitrary nested containers (opt-in immutability helper).

cf. /root/reference/waveforms/utils.py:9-32.
"""

from __future__ import annotations

from types import MappingProxyType
from typing import cast

import numpy as np


def freeze(x):
    """Recursively freeze lists/dicts/sets; mark ndarrays read-only."""
    if isinstance(x, (int, float, complex, str, bytes, type(None))):
        return x
    if isinstance(x, (list, tuple)):
        return tuple(freeze(y) for y in x)
    if isinstance(x, dict):
        return MappingProxyType({k: freeze(v) for k, v in x.items()})
    if isinstance(x, set):
        return frozenset(freeze(y) for y in x)
    if isinstance(x, (np.ndarray, np.matrix)):
        x.flags.writeable = False
        return x
    if isinstance(x, bytearray):
        return bytes(x)
    try:
        import scipy.sparse as sp
        if isinstance(x, sp.spmatrix):
            cast(np.ndarray, getattr(x, 'data')).flags.writeable = False
            if getattr(x, 'format') in {'csr', 'csc', 'bsr'}:
                cast(np.ndarray, getattr(x, 'indices')).flags.writeable = False
                cast(np.ndarray, getattr(x, 'indptr')).flags.writeable = False
            elif getattr(x, 'format') == 'coo':
                cast(np.ndarray, getattr(x, 'row')).flags.writeable = False
                cast(np.ndarray, getattr(x, 'col')).flags.writeable = False
    except ImportError:
        pass
    return x

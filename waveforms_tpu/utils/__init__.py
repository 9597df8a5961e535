from .freeze import freeze
from .signal import getFTMatrix, shift

__all__ = ['freeze', 'getFTMatrix', 'shift']

from .par import merge, merge_sort, reduce, scan
from . import debug

__all__ = ["merge", "merge_sort", "reduce", "scan", "debug"]

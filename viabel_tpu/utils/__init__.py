from .timers import Timer, format_seconds
from .prng import split_like, fold_in_index

__all__ = ['Timer', 'format_seconds', 'split_like', 'fold_in_index']

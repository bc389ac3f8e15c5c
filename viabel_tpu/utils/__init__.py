from .timers import Timer, format_seconds
from .prng import split_like, fold_in_index
from .metrics import ThroughputMeter, profile_trace

__all__ = ['Timer', 'format_seconds', 'split_like', 'fold_in_index',
           'ThroughputMeter', 'profile_trace']

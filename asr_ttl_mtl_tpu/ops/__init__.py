from .dtw import dtw, dtw_wavefront_numpy, backtrace  # noqa: F401
from .median import median_filter  # noqa: F401

"""Host-side utilities: depth visualization, metric logging, image/GIF I/O."""

from hypernerf_tpu.utils.visualization import visualize_depth
from hypernerf_tpu.utils.logging import MetricsLogger

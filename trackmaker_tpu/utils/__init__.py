from trackmaker_tpu.utils.logging import init_logging, get_logger
from trackmaker_tpu.utils.progress import ProgressBar

__all__ = ["init_logging", "get_logger", "ProgressBar"]

from gymrl_tpu.utils.logging import get_logger, MetricsWriter, log_monitors
from gymrl_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, checkpoint_path

__all__ = [
    "get_logger",
    "MetricsWriter",
    "log_monitors",
    "save_checkpoint",
    "restore_checkpoint",
    "checkpoint_path",
]

from .logging import AverageMeter, get_logger, main_process, check_makedirs
from .schedules import poly_learning_rate, step_learning_rate, make_lr_schedule
from .trees import param_count, param_summary

__all__ = [
    "AverageMeter",
    "get_logger",
    "main_process",
    "check_makedirs",
    "poly_learning_rate",
    "step_learning_rate",
    "make_lr_schedule",
    "param_count",
    "param_summary",
]

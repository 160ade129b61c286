from .logging import create_logger, AverageMeter, print_name_value
from .summary import model_summary

__all__ = ["create_logger", "AverageMeter", "print_name_value", "model_summary"]

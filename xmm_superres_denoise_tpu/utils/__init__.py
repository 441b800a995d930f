from .imagelogger import ImageLogger
from .logging import setup_logging
from .profiling import StepTimers, annotate, flops_estimate, trace

__all__ = ["ImageLogger", "StepTimers", "annotate", "flops_estimate", "setup_logging", "trace"]

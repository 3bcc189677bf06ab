from .logger import (  # noqa: F401
    ALL_EVENTS,
    Convergence,
    Counters,
    Event,
    Loggable,
    LoggedLinOp,
    Logger,
    PerformanceHint,
    Record,
    Stream,
    add_global_logger,
    clear_global_loggers,
    fanout,
    global_log,
    global_loggers,
    remove_global_logger,
)
from .profiler import ProfilerRange, profile_region  # noqa: F401

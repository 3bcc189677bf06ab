"""Profiler integration: event-hook logger emitting jax.profiler annotations.

Reference analog: the vendor-range annotation role of the logger system
(SURVEY.md §5 tracing; the reference's Papi logger exports counters,
papi.hpp:92-275 — here the export target is the XLA/TPU profiler instead).

Usage:
    with profile_region("solve"):            # TraceAnnotation context
        x, info = solver.solve(b)

    prof = ProfilerRange()                    # logger: one annotation per
    solver.solve_chunked(b, loggers=[prof])   # started/completed event pair

    with trace("/tmp/jax-trace"):             # full profiler dump
        x, info = solver.solve(b)
"""

from __future__ import annotations

import contextlib

import jax

from .logger import Logger, Event

_STARTED = {
    Event.linop_apply_started: Event.linop_apply_completed,
    Event.linop_advanced_apply_started: Event.linop_advanced_apply_completed,
    Event.linop_factory_generate_started: Event.linop_factory_generate_completed,
    Event.criterion_check_started: Event.criterion_check_completed,
    Event.operation_launched: Event.operation_completed,
    Event.copy_started: Event.copy_completed,
    Event.allocation_started: Event.allocation_completed,
}
_COMPLETED = {v: k for k, v in _STARTED.items()}


def profile_region(name: str):
    """Named region visible in TPU profiler traces (xprof/tensorboard)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager producing a full jax.profiler trace directory:
    ``with trace(dir): ...``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProfilerRange(Logger):
    """Logger that opens a TraceAnnotation at every *_started event and
    closes it at the matching *_completed — the analog of the reference's
    vendor-range profiler loggers."""

    def __init__(self, events=None):
        super().__init__(
            events
            or (frozenset(_STARTED) | frozenset(_COMPLETED) | {Event.iteration_complete})
        )
        self._open = []

    def on(self, event, **data):
        if event in _STARTED:
            name = data.get("name") or event.value.rsplit("_", 1)[0]
            ann = jax.profiler.TraceAnnotation(str(name))
            ann.__enter__()
            self._open.append((event, ann))
        elif event in _COMPLETED:
            want = _COMPLETED[event]
            for i in range(len(self._open) - 1, -1, -1):
                if self._open[i][0] == want:
                    _, ann = self._open.pop(i)
                    ann.__exit__(None, None, None)
                    break
        elif event == Event.iteration_complete:
            with jax.profiler.TraceAnnotation(
                f"iteration_{data.get('iteration', '?')}"
            ):
                pass

    def close(self):
        while self._open:
            _, ann = self._open.pop()
            ann.__exit__(None, None, None)

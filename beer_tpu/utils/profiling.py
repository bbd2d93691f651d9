"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference has none; the rebuild exposes named profiler scopes around
the E/M steps and a trace context manager so ``jax.profiler`` captures
land with meaningful annotations, plus a simple wall-clock span recorder
for environments without a profiler UI.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


def named_scope(name: str):
    """Annotate a region for the XLA/jax profiler (usable as context)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SpanTimer:
    """Wall-clock spans written as JSONL (poor-man's tracing, no deps).

    Note: with async dispatch a span only bounds *host* time; call
    ``jax.block_until_ready`` on results inside the span for device time.
    """

    def __init__(self, path=None):
        self.path = Path(path) if path else None
        self.spans = []

    @contextlib.contextmanager
    def span(self, name: str, **meta):
        t0 = time.time()
        try:
            yield
        finally:
            rec = {"name": name, "start": t0, "dur_s": time.time() - t0, **meta}
            self.spans.append(rec)
            if self.path:
                with open(self.path, "a") as fh:
                    fh.write(json.dumps(rec) + "\n")

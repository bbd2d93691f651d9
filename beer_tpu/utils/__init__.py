"""Utilities: checkpointing, config, profiling, debugging, metrics."""

from beer_tpu.utils.checkpoint import latest_checkpoint, load_model, save_model
from beer_tpu.utils.config import load_yaml
from beer_tpu.utils.debug import assert_finite, guard_finite_outputs, nan_guard
from beer_tpu.utils.metrics import MetricsLogger
from beer_tpu.utils.profiling import SpanTimer, named_scope, trace

__all__ = [
    "save_model",
    "load_model",
    "latest_checkpoint",
    "load_yaml",
    "guard_finite_outputs",
    "nan_guard",
    "assert_finite",
    "MetricsLogger",
    "named_scope",
    "trace",
    "SpanTimer",
]

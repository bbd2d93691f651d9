"""Utilities: checkpointing, config loading, logging."""

from beer_tpu.utils.checkpoint import latest_checkpoint, load_model, save_model
from beer_tpu.utils.config import load_yaml

__all__ = ["save_model", "load_model", "latest_checkpoint", "load_yaml"]

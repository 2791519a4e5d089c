"""Shared utilities: session config, metrics."""

from velox_tpu.utils.config import SessionConfig, config  # noqa: F401

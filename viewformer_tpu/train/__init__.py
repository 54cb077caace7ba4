"""Training harness (L5)."""
from .checkpoint import CheckpointManager, restore_checkpoint  # noqa: F401
from .logging import MetricLogger  # noqa: F401

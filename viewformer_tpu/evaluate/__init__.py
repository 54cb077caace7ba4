"""Evaluation suite (L6)."""
from .evaluator import Evaluator, MultiContextEvaluator, print_metrics  # noqa: F401

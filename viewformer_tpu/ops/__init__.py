"""Compute ops (L4): attention kernels, quantizers, image preprocessing."""
from . import branching_attention, image, quantizer  # noqa: F401

"""Pallas TPU kernels with lax reference implementations.

Every kernel here has a pure-lax reference (`*_reference`) used as the
correctness oracle in tests and as the CPU fallback. Kernels are enabled via
``use_pallas=...`` flags on the modules that consume them (SURVEY.md §7:
"Pallas kernels behind a flag with lax reference implementations").
"""
from .resnet import fused_resnet_item, resnet_item_reference

__all__ = ["fused_resnet_item", "resnet_item_reference"]

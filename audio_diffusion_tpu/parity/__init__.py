"""Parity harness: torch oracle U-Net + torch->JAX weight importer.

The full-model matched-seed A/B (tests/test_parity_full_model.py) proves the
assembled TPU-first net — folding, patch resampling, skip/modulation/item
ordering, conditioning wrappers — matches an independent plain-torch
implementation of the §2.9 contract, and exercises the weight-converter path
SURVEY.md §5.4 calls for. Torch is imported lazily (test-time dependency
only).
"""
from __future__ import annotations

__all__ = ["importer", "torch_oracle"]

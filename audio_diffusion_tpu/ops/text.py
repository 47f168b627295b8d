"""Text encoders for text-conditional generation.

The reference conditions on frozen `t5-base` token embeddings
([b, ≤64, 768]) produced inside a-unet's TextConditioningPlugin
(SURVEY.md §2.9; reference README.md:47-76 fixes embedding_max_length=64,
embedding_features=768). Here encoding is host-side and happens once per
model call (see ops/components.py docstring).

Encoders implement::

    encoder(texts: list[str]) -> np.ndarray [b, max_length, features]

- :class:`T5TextEncoder` — real frozen T5 via transformers' Flax weights;
  requires the model to be present in the local HF cache (this build
  environment has no network egress, so it loads with local_files_only=True
  and raises a clear error if absent).
- :class:`RandomT5TextEncoder` — the REAL T5 encoder architecture
  (transformers' FlaxT5EncoderModel built from a config, no downloads) with
  frozen random weights and byte-level tokenization. Semantically
  meaningless like the stub, but it exercises the genuine encoder stack
  (relative-position-bias attention, masking, tokenize→encode→mask
  pipeline), so the text path's wiring is proven against the true
  architecture even in a zero-egress environment.
- :class:`StubTextEncoder` — deterministic hash-based embeddings for offline
  testing/benchmarking. NOT semantically meaningful; it exists so the full
  text-conditional pipeline (CFG, cross-attention, guided sampling) can be
  exercised end-to-end without T5 weights.
"""
from __future__ import annotations

import hashlib
from typing import Any, List

import numpy as np

__all__ = ["T5TextEncoder", "RandomT5TextEncoder", "StubTextEncoder"]


class T5TextEncoder:
    """Frozen T5 encoder (default t5-base: 768-d, matching the reference)."""

    def __init__(self, model_name: str = "t5-base", max_length: int = 64):
        self.model_name = model_name
        self.max_length = max_length
        self.features = 768
        self._model: Any = None
        self._tokenizer: Any = None

    def _load(self):
        if self._model is not None:
            return
        try:
            from transformers import AutoTokenizer, FlaxT5EncoderModel

            self._tokenizer = AutoTokenizer.from_pretrained(
                self.model_name, local_files_only=True)
            self._model = FlaxT5EncoderModel.from_pretrained(
                self.model_name, local_files_only=True)
            self.features = self._model.config.d_model
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                f"T5 text encoder '{self.model_name}' is unavailable in the "
                "local HuggingFace cache (this environment has no network "
                "egress). Either pre-populate the cache, pass precomputed "
                "`embedding=` arrays, or pass a custom `text_encoder=` "
                "(e.g. audio_diffusion_tpu.ops.text.StubTextEncoder) to "
                "UNetV0/DiffusionModel."
            ) from e

    def __call__(self, texts: List[str]) -> np.ndarray:
        self._load()
        tokens = self._tokenizer(
            texts, return_tensors="np", padding="max_length",
            max_length=self.max_length, truncation=True)
        out = self._model(**tokens).last_hidden_state
        # Zero out padding positions so they act as nulls in cross-attention.
        mask = tokens["attention_mask"][..., None]
        return np.asarray(out) * mask


class RandomT5TextEncoder:
    """The real T5 encoder stack with frozen random weights (no downloads).

    Uses transformers' ``FlaxT5EncoderModel`` constructed from a
    ``T5Config`` (offline) and a byte-level tokenizer (ids = byte+3, with
     0 as pad — the ByteT5 convention). Deterministic for a fixed ``seed``.
    Swap in :class:`T5TextEncoder` when real t5-base weights are cached;
    the downstream contract (``[b, max_length, features]`` with padding
    positions zeroed) is identical.
    """

    def __init__(self, max_length: int = 64, features: int = 768,
                 num_layers: int = 2, num_heads: int = 4, seed: int = 0):
        from transformers import FlaxT5EncoderModel, T5Config

        self.max_length = max_length
        self.features = features
        cfg = T5Config(d_model=features, d_ff=2 * features,
                       num_layers=num_layers, num_heads=num_heads,
                       d_kv=features // num_heads, vocab_size=259,
                       dropout_rate=0.0)
        self._model = FlaxT5EncoderModel(cfg, seed=seed)

    def _tokenize(self, texts: List[str]) -> np.ndarray:
        ids = np.zeros((len(texts), self.max_length), np.int32)
        for i, text in enumerate(texts):
            raw = text.encode("utf-8")[: self.max_length]
            ids[i, : len(raw)] = np.frombuffer(raw, np.uint8) + 3
        return ids

    def __call__(self, texts: List[str]) -> np.ndarray:
        ids = self._tokenize(texts)
        mask = (ids != 0).astype(np.int32)
        out = self._model(input_ids=ids,
                          attention_mask=mask).last_hidden_state
        return np.asarray(out) * mask[..., None]


class StubTextEncoder:
    """Deterministic pseudo-embeddings from a text hash (offline stand-in)."""

    def __init__(self, max_length: int = 64, features: int = 768):
        self.max_length = max_length
        self.features = features

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.max_length, self.features),
                       dtype=np.float32)
        for i, text in enumerate(texts):
            digest = hashlib.sha256(text.encode("utf-8")).digest()
            seed = int.from_bytes(digest[:8], "little") % (2**31)
            rng = np.random.default_rng(seed)
            n = min(len(text.split()) + 1, self.max_length)
            out[i, :n] = rng.standard_normal((n, self.features)) * 0.05
        return out

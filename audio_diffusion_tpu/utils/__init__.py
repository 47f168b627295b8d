"""Generic helpers: null-coalescing, kwargs prefix-routing, misc math.

Behavioral parity targets (reference: /root/reference/audio_diffusion_pytorch/
utils.py:15-74 — `exists`, `default`, `groupby`, `prefix_dict`,
`closest_power_2`). Reimplemented for a functional JAX codebase; the kwargs
prefix-routing IS the reference's config system (SURVEY.md §5.6) and must keep
identical semantics because the public model constructors are flat-kwargs.
"""
from __future__ import annotations

from functools import reduce
from math import ceil, floor, log2
from typing import (
    Callable,
    Dict,
    List,
    Optional,
    Sequence,
    Tuple,
    TypeVar,
    Union,
)

T = TypeVar("T")

__all__ = [
    "exists",
    "iff",
    "is_sequence",
    "default",
    "to_list",
    "prod",
    "closest_power_2",
    "group_dict_by_prefix",
    "groupby",
    "prefix_dict",
    "Static",
    "dequant_pcm16",
]


def _freeze(v):
    """Recursively convert a static kwarg value to a hashable key."""
    if isinstance(v, dict):
        return ("dict",) + tuple(
            sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return ("seq",) + tuple(_freeze(e) for e in v)
    return v


class Static:
    """Hashable wrapper for a static (non-array) kwarg at a jit boundary.

    Preserves the ORIGINAL Python value (``.value``) so dicts/lists round-trip
    through the jit cache unchanged, while hashing/comparing on a frozen
    deep-immutable key (dicts and lists are not hashable themselves).
    """

    __slots__ = ("value", "_key")

    def __init__(self, value):
        self.value = value
        self._key = _freeze(value)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, Static) and self._key == other._key

    def __repr__(self):
        return f"Static({self.value!r})"


def contains_array(v) -> bool:
    """True if the value (or any nested element) is an ndarray — used to
    split traced vs static arguments at jit boundaries."""
    import jax.numpy as jnp
    import numpy as np

    if isinstance(v, (jnp.ndarray, np.ndarray)):
        return True
    if isinstance(v, dict):
        return any(contains_array(e) for e in v.values())
    if isinstance(v, (list, tuple)):
        return any(contains_array(e) for e in v)
    return False


def split_static_kwargs(kwargs: dict):
    """THE jit-boundary convention, shared by DiffusionModel's jit cache
    and the train step: array-containing kwargs are traced (returned as the
    `dynamic` dict), everything else becomes a sorted hashable tuple of
    ``(name, Static(value))`` pairs that selects the compiled program."""
    dynamic = {k: v for k, v in kwargs.items() if contains_array(v)}
    static_items = tuple(sorted(
        ((k, Static(v)) for k, v in kwargs.items() if k not in dynamic),
        key=lambda kv: kv[0]))
    return dynamic, static_items


def exists(val: Optional[T]) -> bool:
    return val is not None


def iff(condition: bool, value: T) -> Optional[T]:
    return value if condition else None


def is_sequence(obj) -> bool:
    return isinstance(obj, (list, tuple))


def default(val: Optional[T], d: Union[Callable[[], T], T]) -> T:
    """Null-coalescing with lazy default (callable defaults are invoked)."""
    if exists(val):
        return val  # type: ignore[return-value]
    return d() if callable(d) else d


def to_list(val: Union[T, Sequence[T]]) -> List[T]:
    if isinstance(val, tuple):
        return list(val)
    if isinstance(val, list):
        return val
    return [val]  # type: ignore[list-item]


def prod(vals: Sequence[int]) -> int:
    return reduce(lambda x, y: x * y, vals)


def closest_power_2(x: float) -> int:
    """Nearest power of two (may round DOWN — reference utils.py:45-49)."""
    exponent = log2(x)
    candidates = (floor(exponent), ceil(exponent))
    exponent_closest = min(candidates, key=lambda z: abs(x - 2**z))
    return 2 ** int(exponent_closest)


def group_dict_by_prefix(prefix: str, d: Dict) -> Tuple[Dict, Dict]:
    """Split a dict into (keys with prefix, keys without)."""
    with_prefix: Dict = {}
    without_prefix: Dict = {}
    for key, value in d.items():
        (with_prefix if key.startswith(prefix) else without_prefix)[key] = value
    return with_prefix, without_prefix


def groupby(prefix: str, d: Dict, keep_prefix: bool = False) -> Tuple[Dict, Dict]:
    """Extract prefixed kwargs, stripping the prefix unless keep_prefix.

    The config-routing idiom: ``groupby("diffusion_", kwargs)`` returns the
    diffusion sub-config plus the remaining kwargs (reference utils.py:65-70).
    """
    kwargs_with_prefix, kwargs = group_dict_by_prefix(prefix, d)
    if keep_prefix:
        return kwargs_with_prefix, kwargs
    return {k[len(prefix):]: v for k, v in kwargs_with_prefix.items()}, kwargs


def prefix_dict(prefix: str, d: Dict) -> Dict:
    return {prefix + str(k): v for k, v in d.items()}


def dequant_pcm16(x):
    """Dequantize int16 PCM audio to float32 in [-1, 1); other dtypes pass
    through unchanged.

    AudioDataset's PCM16 passthrough (data/loader.py, dtype="int16"/"auto")
    uploads raw int16 samples — 4x smaller host->device batches — and relies
    on model/train-step entry points calling this in-graph. x/32768 with
    power-of-two factors reproduces the float32 decode path bit-exactly.
    """
    import jax.numpy as jnp

    if hasattr(x, "dtype") and x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x

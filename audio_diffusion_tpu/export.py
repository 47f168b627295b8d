"""AOT sampler export: a deployable serving artifact (jax.export).

The reference's deployment story ends at ``model.sample`` inside the
training codebase (reference README.md:37-44): a serving host must import
the model-definition Python, rebuild the net, and re-trace it. This module
serializes the **traced sampling program itself** (StableHLO via
``jax.export``) next to a JSON manifest, so a serving host runs it with

    sampler, manifest = load_sampler("artifact/")
    audio = sampler(params, noise)          # params: the orbax tree

without the net/config code — the params tree (``model.save`` output) and
the artifact are the full deployment payload. TPU-first consequences:

- Static shapes: the artifact fixes (batch, channels, length) and the
  step count at export time — exactly the constraint XLA compilation has
  anyway; export one artifact per serving shape, like one compiled
  program per shape today.
- Platform-checked: an artifact exported under TPU refuses to run on CPU
  (and vice versa) instead of silently recompiling something else.
- Version-checked: ``jax.export`` embeds calling-convention versions;
  loading an incompatible artifact fails loudly at deserialize time.

Scalar conditioning (e.g. CFG ``embedding_scale``) is baked in at export
time. Array conditioning (text/precomputed embeddings) becomes an INPUT of
the artifact: pass an example array (or ``jax.ShapeDtypeStruct``) at
export and the matching array per call —

    export_sampler(model, "artifact/", length=2**17,
                   embedding=jnp.zeros((1, 8, 32)), embedding_scale=3.0)
    sampler, manifest = load_sampler("artifact/")
    audio = sampler(params, noise, embedding=emb)

so conditional models deploy model-code-free too (round 4; the distilled
profile-conditional student serves this way).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_sampler", "load_sampler", "load_params",
           "ArtifactSampler"]

_BLOB_NAME = "sampler.stablehlo"
_MANIFEST_NAME = "manifest.json"


def export_sampler(
    model,
    path,
    *,
    length: int,
    batch_size: int = 1,
    num_steps: int = 50,
    channels: Optional[int] = None,
    unroll: int = 1,
    params: Optional[Dict] = None,
    sample_rate: Optional[int] = None,
    **cond,
) -> Dict:
    """Serialize the model's sampling program for ``(batch_size, channels,
    length)`` float32 noise at ``num_steps`` steps to ``path/`` (the
    StableHLO blob + a manifest). Returns the manifest dict.

    ``params=`` overrides the live parameters only for SHAPE/DTYPE
    derivation — parameters are an *argument* of the artifact, not baked
    into it, so one artifact serves every checkpoint of the same config.
    ``**cond`` scalars (ints/floats/bools, e.g. ``embedding_scale=5.0``)
    are closed over; ``**cond`` ARRAYS (or ``jax.ShapeDtypeStruct``s)
    become traced INPUTS of the artifact — the caller passes a matching
    array per call (``sampler(params, noise, embedding=...)``).

    ``unroll`` (scan unroll factor) defaults to 1 — `model.sample`'s own
    default, which keeps the artifact BIT-exact with the live model on
    every default path; other values change XLA scheduling and therefore
    float rounding (~1e-6). The manifest records it either way.
    """
    p = params if params is not None else model.params
    assert p is not None, (
        "initialize/load the model before exporting its sampler")
    clean = {}
    array_specs: Dict[str, jax.ShapeDtypeStruct] = {}
    for k, v in cond.items():
        if isinstance(v, jax.ShapeDtypeStruct):
            array_specs[k] = v
        elif hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
            v = jnp.asarray(v)
            array_specs[k] = jax.ShapeDtypeStruct(v.shape, v.dtype)
        else:
            # 0-dim numpy/jnp scalars would pass tracing but break the
            # JSON manifest afterwards — coerce to Python scalars up front.
            clean[k] = v.item() if hasattr(v, "item") else v
    cond = clean
    c = channels if channels is not None else getattr(
        model.net, "in_channels", None)
    assert c is not None, "pass channels= (net does not declare in_channels)"

    def fn(params_, noise_, *arrays_):
        named = dict(zip(sorted(array_specs), arrays_))
        return model.sample_fn(params_, noise_, num_steps=num_steps,
                               unroll=min(unroll, num_steps), **cond,
                               **named)

    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), p)
    noise_spec = jax.ShapeDtypeStruct((batch_size, c, length), jnp.float32)
    ordered_specs = [array_specs[k] for k in sorted(array_specs)]
    exported = jexport.export(jax.jit(fn))(params_spec, noise_spec,
                                           *ordered_specs)
    blob = exported.serialize()

    manifest = {
        "kind": "audio_diffusion_tpu.sampler",
        "noise_shape": [batch_size, c, length],
        "num_steps": num_steps,
        "unroll": min(unroll, num_steps),
        "platforms": list(exported.platforms),
        "sample_rate": (int(sample_rate) if sample_rate is not None
                        else None),
        "scalar_cond": dict(cond),
        "array_cond": {k: {"shape": list(s.shape), "dtype": str(s.dtype)}
                       for k, s in array_specs.items()},
        "jax_version": jax.__version__,
        "out_shape": list(exported.out_avals[0].shape),
        "out_dtype": str(exported.out_avals[0].dtype),
    }
    # Serialize the manifest BEFORE touching disk: a failure here must not
    # leave a blob-without-manifest (unloadable) artifact behind.
    manifest_text = json.dumps(manifest, indent=1)
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    (out / _BLOB_NAME).write_bytes(blob)
    (out / _MANIFEST_NAME).write_text(manifest_text)
    return manifest


def load_sampler(path) -> Tuple[Callable, Dict]:
    """Load an exported sampler: returns ``(sampler, manifest)`` where
    ``sampler(params, noise, **array_cond)`` runs the deserialized program
    under jit. The params tree must match the exporting config's structure
    (the ``model.save``/orbax tree); noise must match the manifest's
    shape; any ``array_cond`` declared in the manifest (e.g. a conditional
    model's ``embedding``) is required by keyword."""
    src = Path(path)
    blob = (src / _BLOB_NAME).read_bytes()
    manifest = json.loads((src / _MANIFEST_NAME).read_text())
    if manifest.get("kind") != "audio_diffusion_tpu.sampler":
        raise ValueError(f"{src} is not an exported sampler artifact")
    exported = jexport.deserialize(blob)
    call = jax.jit(exported.call)
    need = sorted(manifest.get("array_cond") or {})

    def sampler(params, noise, **arrays):
        if sorted(arrays) != need:
            raise ValueError(
                f"artifact requires array conditioning {need}, "
                f"got {sorted(arrays)}")
        return call(params, noise, *[arrays[k] for k in need])

    return sampler, manifest


def load_params(path) -> Dict:
    """Restore a params tree saved by ``model.save`` WITHOUT the model:
    orbax reconstructs the pytree from checkpoint metadata. Pairs with
    :func:`load_sampler` for model-code-free serving hosts."""
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(Path(path).absolute())


class ArtifactSampler:
    """Model-shaped wrapper over an exported artifact: a drop-in for
    :class:`~audio_diffusion_tpu.serve.GenerationService`'s ``model``
    argument (and the HTTP server above it), so a serving host deploys
    from ``(artifact dir, params dir)`` alone::

        sampler = ArtifactSampler("artifact/", load_params("run/model"))
        service = GenerationService(sampler,
                                    num_steps=sampler.num_steps,
                                    result_format="pcm16")

    The artifact bakes shape and step count; ``sample`` enforces them —
    a mismatched request fails loudly instead of recompiling something
    the artifact was never exported for.
    """

    def __init__(self, path, params: Optional[Dict] = None):
        self._fn, self.manifest = load_sampler(path)
        self.params = params
        self.num_steps = int(self.manifest["num_steps"])
        b, c, t = self.manifest["noise_shape"]
        self.batch_size, self.in_channels, self.length = b, c, t
        self.sample_rate = self.manifest.get("sample_rate")
        self.array_cond = dict(self.manifest.get("array_cond") or {})

    def sample(self, noise, *, num_steps: Optional[int] = None,
               params: Optional[Dict] = None, **cond):
        if num_steps is not None and num_steps != self.num_steps:
            raise ValueError(
                f"artifact was exported at num_steps={self.num_steps}; "
                f"per-request num_steps={num_steps} needs its own artifact")
        extra = set(cond) - set(self.array_cond)
        if extra:
            raise ValueError(
                f"conditioning {sorted(extra)} cannot be passed to this "
                "artifact (scalars are baked at export time; the manifest "
                f"declares array inputs {sorted(self.array_cond)})")
        p = params if params is not None else self.params
        assert p is not None, "pass params= (or set .params) before sampling"
        noise = jnp.asarray(noise)
        want = (self.batch_size, self.in_channels, self.length)
        if tuple(noise.shape) != want:
            raise ValueError(
                f"artifact expects noise {want}, got {tuple(noise.shape)}")
        for k, spec in self.array_cond.items():
            if k not in cond:
                raise ValueError(f"artifact requires {k}= "
                                 f"(shape {spec['shape']})")
            got = tuple(jnp.asarray(cond[k]).shape)
            if got != tuple(spec["shape"]):
                raise ValueError(
                    f"{k} shape {got} != exported {tuple(spec['shape'])}")
        return self._fn(p, noise, **{k: jnp.asarray(v)
                                     for k, v in cond.items()})

"""Production serving: a microbatching generation service.

The reference has no serving story — users call ``model.sample`` directly
(reference README.md:42-43), one request at a time. On TPU, serving
throughput comes from batching: batch-8 sampling measures ~1.4× the
samples/minute of batch-1 on the flagship config (PERFORMANCE.md), and a
fixed batch size means a single compiled XLA program per request shape.

:class:`GenerationService` accepts concurrent generation requests, groups
them by *signature* (input shape/dtype + conditioning structure + static
sampling options), assembles fixed-size batches — padding partial batches by
replication so exactly one program is compiled per signature — and runs them
on one worker thread (one process owns the TPU). Results come back as
futures holding host numpy arrays.

Typical use::

    service = GenerationService(model, num_steps=50, batch_size=8)
    futs = [service.submit(noise_i) for noise_i in requests]
    audio = [f.result() for f in futs]            # [channels, length] each
    service.close()

For serving EMA weights while training continues, pass a parameter
snapshot: ``GenerationService(model, params=trainer.ema_params)``.

Autoregressive models (``DiffusionAR``) are not batchable this way — their
sample signature has no per-request array input; call them directly.
"""
from __future__ import annotations

import threading
import time
import queue as queue_mod
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GenerationService"]


def _is_arraylike(v: Any) -> bool:
    return isinstance(v, (np.ndarray, jax.Array))


def _is_text(v: Any) -> bool:
    return (isinstance(v, (list, tuple)) and len(v) > 0
            and all(isinstance(s, str) for s in v))


def _signature(primary: np.ndarray, cond: Dict[str, Any],
               num_steps: int) -> Tuple:
    """Requests batch together iff their signatures are equal: same input
    shape/dtype, same conditioning structure, identical static values.
    Per-request data (arrays, text) contributes its STRUCTURE only — two
    requests with different prompts still share one compiled program."""
    if isinstance(primary, _SeedNoise):
        head: Tuple = ("seednoise", primary.channels, primary.length)
    else:
        head = ("primary", primary.shape, str(primary.dtype))
    items: List[Tuple] = [("num_steps", num_steps), head]
    for k in sorted(cond):
        v = cond[k]
        if _is_arraylike(v):
            # .dtype/.shape read without any device->host transfer.
            items.append((k, tuple(v.shape), str(v.dtype)))
        elif _is_text(v):
            items.append((k, "text", len(v)))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            # Numerically-equal scalars of different types (5 vs 5.0) must
            # share one bucket/program — jit would treat them identically.
            items.append((k, "num", float(v)))
        else:
            items.append((k, repr(v)))
    return tuple(items)


class _SeedNoise:
    """Marker primary: noise is drawn ON DEVICE from this seed — the
    request uploads 8 bytes instead of a [channels, length] array."""

    __slots__ = ("seed", "channels", "length")

    def __init__(self, seed: int, channels: int, length: int):
        self.seed = seed
        self.channels = channels
        self.length = length


class _Request:
    __slots__ = ("primary", "cond", "num_steps", "future", "t_enqueue")

    def __init__(self, primary, cond, num_steps):
        self.primary = primary
        self.cond = cond
        self.num_steps = num_steps
        self.future: Future = Future()
        self.t_enqueue = time.monotonic()


class GenerationService:
    """Microbatching sampling server around a (task) DiffusionModel.

    Parameters
    ----------
    model:
        Any initialized model exposing ``sample`` with a per-request array
        as first argument (DiffusionModel, DiffusionUpsampler,
        DiffusionVocoder, DiffusionAE via ``decode`` — see ``method``).
    num_steps:
        Default sampling steps (overridable per request).
    batch_size:
        Device batch size. Partial batches are padded by replicating the
        last request so only one program compiles per signature.
    max_wait_ms:
        How long to hold an incomplete batch open for more requests.
    params:
        Optional parameter snapshot (e.g. ``trainer.ema_params``) used for
        every batch; defaults to the model's live ``model.params``. A tree
        quantized by :func:`audio_diffusion_tpu.quantize_params` works here
        (int8 weight streaming).
    method:
        Name of the model method to call (default ``"sample"``; use
        ``"decode"`` to serve DiffusionAE latents).
    result_format:
        ``"float32"`` (default): futures resolve to float32 audio.
        ``"pcm16"``: audio is converted to int16 PCM ON DEVICE
        (``clip(round(x·32767))``, the same quantization ``wav_write``
        applies) and futures resolve to int16 arrays — a 4× smaller
        device->host payload, which was the remaining bottleneck of remote
        serving after seed requests removed the upload (PERFORMANCE.md
        §8a2). Divide by 32767 to recover floats.
    """

    def __init__(self, model, *, num_steps: int = 50, batch_size: int = 8,
                 max_wait_ms: float = 100.0, params: Optional[Dict] = None,
                 method: str = "sample", result_format: str = "float32"):
        assert batch_size >= 1
        assert result_format in ("float32", "pcm16"), result_format
        self._model = model
        self._method = method
        self._result_format = result_format
        def to_pcm16(x):
            # Bit-match the native WAV writer (wavio.cpp:142-144): clip to
            # [-1, 1], scale by 32767, round half away from zero, truncate.
            v = jnp.clip(x.astype(jnp.float32), -1.0, 1.0) * 32767.0
            half = jnp.where(v >= 0, jnp.float32(0.5), jnp.float32(-0.5))
            return jnp.trunc(v + half).astype(jnp.int16)

        self._to_pcm16 = jax.jit(to_pcm16)
        self._num_steps = num_steps
        self._batch_size = batch_size
        self._max_wait = max_wait_ms / 1e3
        self._params = params
        self._queue: "queue_mod.Queue" = queue_mod.Queue()
        self._noise_jit: Dict[Tuple[int, int], Any] = {}
        self._closed = False
        self._submit_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_served = 0
        self._n_batches = 0
        self._n_padded = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- public
    def submit(self, primary, *, num_steps: Optional[int] = None,
               **cond) -> Future:
        """Enqueue one request. ``primary`` is the per-request array
        (noise for sample; low-rate audio for an upsampler; mel for a
        vocoder), WITHOUT the batch dimension: ``[channels, length]``.
        Conditioning kwargs are per-request: arrays (stacked into the device
        batch, no batch dim — e.g. ``embedding=[64, 768]``), ``text=`` as
        one string (or a 1-element list), and scalars (which must be equal
        across a batch and act as static config, e.g.
        ``embedding_scale=5.0``). Returns a Future resolving to the
        generated ``[channels, length]`` numpy array."""
        if not isinstance(primary, _SeedNoise):
            primary = np.asarray(primary)
        if isinstance(cond.get("text"), str):
            cond["text"] = [cond["text"]]
        for k, v in cond.items():
            if _is_text(v) and len(v) != 1:
                raise ValueError(
                    f"{k}= must hold exactly one string per request "
                    f"(one request = one sample); got {len(v)}")
            if not (_is_arraylike(v) or _is_text(v)
                    or isinstance(v, (int, float, bool, str, type(None)))):
                raise TypeError(
                    f"unsupported conditioning value for {k}= "
                    f"({type(v).__name__}): pass arrays, text, or scalars "
                    "— structured conditioning (e.g. channels=[...]) "
                    "isn't batchable; call the model directly")
        req = _Request(primary, cond, num_steps or self._num_steps)
        # The closed-check and enqueue are one atomic step vs close():
        # otherwise a request enqueued after the worker's final drain
        # would hold an unresolved future forever.
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("service is closed")
            with self._stats_lock:
                self._n_requests += 1
            self._queue.put(req)
        return req.future

    def submit_seed(self, seed: int, *, length: int, channels: int = 2,
                    num_steps: Optional[int] = None, **cond) -> Future:
        """Like :meth:`submit`, but the standard-normal noise is drawn ON
        DEVICE from ``seed`` — the request ships 8 bytes instead of a
        ``[channels, length]`` float32 array (2 MB for 5.5 s stereo @48 kHz;
        host→device noise upload was the measured bottleneck of remote
        serving, PERFORMANCE.md §8a2). Deterministic per seed, independent
        of batch composition."""
        seed = int(seed)
        if not 0 <= seed < 2**32:
            # Validate at submit time: an out-of-range seed must fail THIS
            # request, not blow up inside the batch and take its innocent
            # co-batched neighbors down with it.
            raise ValueError(f"seed must be in [0, 2**32), got {seed}")
        return self.submit(_SeedNoise(seed, channels, length),
                           num_steps=num_steps, **cond)

    def generate(self, primary=None, *, length: Optional[int] = None,
                 channels: int = 2, seed: Optional[int] = None,
                 num_steps: Optional[int] = None, **cond) -> np.ndarray:
        """Blocking convenience: submit + wait. When ``primary`` is omitted,
        noise ``[channels, length]`` is drawn on device from ``seed``
        (deterministic: same seed → same audio)."""
        if primary is None:
            assert length is not None, "pass primary= or length="
            return self.submit_seed(seed or 0, length=length,
                                    channels=channels,
                                    num_steps=num_steps, **cond).result()
        return self.submit(primary, num_steps=num_steps,
                           **cond).result()

    def update_params(self, params: Optional[Dict]) -> None:
        """Hot-swap the parameter snapshot used by SUBSEQUENT batches —
        the live-refresh path for serving while training continues
        (periodically push ``trainer.ema_params``) or for swapping in a
        quantized tree. The swap is one atomic reference assignment:
        in-flight batches finish on the old snapshot, no request fails,
        and nothing recompiles (params are traced inputs of the cached
        per-signature program, so only a dtype/structure change — e.g.
        float -> int8 — triggers a one-time recompile). Pass ``None`` to
        serve the model's live ``model.params`` again."""
        self._params = params

    @property
    def stats(self) -> Dict[str, float]:
        with self._stats_lock:
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "padded_slots": self._n_padded,
                "mean_occupancy": (
                    self._n_served / self._n_batches / self._batch_size
                    if self._n_batches else 0.0),
            }

    def close(self, timeout: Optional[float] = 60.0) -> None:
        """Drain pending requests and stop the worker."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)  # sentinel
        self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- worker
    def _run(self) -> None:
        """Worker entry: the batching loop, guarded so an unexpected error
        in the bucketing/flush logic itself (outside _run_batch's per-batch
        try) fails every pending and queued future instead of silently
        killing the daemon thread and hanging all callers."""
        buckets: Dict[Tuple, List[_Request]] = {}
        try:
            self._run_loop(buckets)
        except BaseException as e:
            with self._submit_lock:
                self._closed = True  # reject further submits
            pending = [r for reqs in buckets.values() for r in reqs]
            while True:  # drain anything already enqueued
                try:
                    item = self._queue.get_nowait()
                except queue_mod.Empty:
                    break
                if item is not None:
                    pending.append(item)
            for r in pending:
                if not r.future.done():
                    r.future.set_exception(
                        RuntimeError(f"GenerationService worker died: {e!r}"))
            raise

    def _run_loop(self, buckets: Dict[Tuple, List[_Request]]) -> None:
        done = False

        def bucket(item) -> bool:
            nonlocal done
            if item is None:
                done = True
                return False
            try:
                sig = _signature(item.primary, item.cond, item.num_steps)
            except BaseException as e:
                # A malformed request fails ALONE at bucketing time; the
                # item is no longer in the queue, so without this it would
                # be invisible to the top-level guard and hang its caller.
                if not item.future.done():
                    item.future.set_exception(e)
                return True
            buckets.setdefault(sig, []).append(item)
            return True

        while not (done and not buckets and self._queue.empty()):
            # Deadline: the oldest held request's max-wait expiry.
            now = time.monotonic()
            deadlines = [reqs[0].t_enqueue + self._max_wait
                         for reqs in buckets.values() if reqs]
            timeout = (max(min(deadlines) - now, 0.0) if deadlines
                       else None)
            if done:
                timeout = 0.0
            try:
                bucket(self._queue.get(timeout=timeout))
            except queue_mod.Empty:
                pass  # timer fired / drain pass
            # Drain everything already enqueued before deciding what to
            # flush: while a batch computes (seconds), waiting requests
            # pile up in the queue and must coalesce, not expire into
            # singleton batches.
            while True:
                try:
                    bucket(self._queue.get_nowait())
                except queue_mod.Empty:
                    break

            now = time.monotonic()
            for sig in list(buckets):
                reqs = buckets[sig]
                expired = reqs[0].t_enqueue + self._max_wait <= now
                if len(reqs) >= self._batch_size or done or expired:
                    # Flush full chunks; a fresh partial tail (triggered
                    # only by fullness) goes back in the bucket to wait for
                    # its own deadline instead of burning a padded run.
                    n_flush = len(reqs)
                    if not (done or expired):
                        n_flush -= n_flush % self._batch_size
                    # Keep reqs in the bucket until their batches have run:
                    # if _run_batch itself raises (its internal guard
                    # failing is "unexpected error" territory), the
                    # top-level guard in _run still sees these requests and
                    # fails their futures instead of losing them.
                    for i in range(0, n_flush, self._batch_size):
                        self._run_batch(reqs[i:i + self._batch_size])
                    if n_flush < len(reqs):
                        buckets[sig] = reqs[n_flush:]
                    else:
                        del buckets[sig]

    def _noise_builder(self, channels: int, length: int):
        key = (channels, length)
        fn = self._noise_jit.get(key)
        if fn is None:
            def build(seeds):
                keys = jax.vmap(jax.random.key)(seeds)
                return jax.vmap(lambda k: jax.random.normal(
                    k, (channels, length), jnp.float32))(keys)

            fn = self._noise_jit[key] = jax.jit(build)
        return fn

    def _run_batch(self, reqs: List[_Request]) -> None:
        n = len(reqs)
        pad = self._batch_size - n
        try:
            if isinstance(reqs[0].primary, _SeedNoise):
                sn = reqs[0].primary
                seeds = jnp.asarray(
                    [r.primary.seed for r in reqs]
                    + [reqs[-1].primary.seed] * pad, jnp.uint32)
                batch = self._noise_builder(sn.channels, sn.length)(seeds)
            else:
                batch = np.stack([r.primary for r in reqs]
                                 + [reqs[-1].primary] * pad)
            cond: Dict[str, Any] = {}
            for k, v0 in reqs[0].cond.items():
                if _is_arraylike(v0):
                    cond[k] = np.stack(
                        [np.asarray(r.cond[k]) for r in reqs]
                        + [np.asarray(reqs[-1].cond[k])] * pad)
                elif _is_text(v0):
                    cond[k] = [r.cond[k][0] for r in reqs] + \
                        [reqs[-1].cond[k][0]] * pad
                else:
                    cond[k] = v0  # static: identical across the batch
            # Parameter snapshots ride through the explicit `params=`
            # call override — no shared-state mutation, so a concurrent
            # trainer (or a direct model.sample in another thread) never
            # observes the snapshot.
            if self._params is not None:
                cond["params"] = self._params
            out = getattr(self._model, self._method)(
                batch, num_steps=reqs[0].num_steps, **cond)
            if self._result_format == "pcm16":
                # Quantize on device: the download shrinks 4x and the
                # values are bit-identical to what wav_write would store.
                out = self._to_pcm16(out)
            host = np.asarray(jax.device_get(out))
            with self._stats_lock:
                self._n_batches += 1
                self._n_served += n
                self._n_padded += pad
            for i, r in enumerate(reqs):
                if not r.future.done():  # caller may have cancelled
                    r.future.set_result(host[i])
        except Exception as e:  # surface to all callers of this batch
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)

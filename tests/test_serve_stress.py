"""Serving under adversarial load (VERDICT r4 #7).

Concurrent mixed-signature clients, malformed requests interleaved with
good ones, and a params hot-swap mid-stream — the failure modes a
multi-tenant deployment actually sees. The TPU-measured p50/p99 numbers
live in PERFORMANCE.md (examples/serve_stress.py); these tests pin the
CORRECTNESS contract: no request hangs, malformed requests fail alone,
the swap loses nothing, and the stats ledger balances.
"""
import json
import threading
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_diffusion_tpu import DiffusionModel, GenerationService, UNetV0
from audio_diffusion_tpu.server import make_server

TINY = dict(net_t=UNetV0, in_channels=2, channels=[8, 16], factors=[1, 2],
            items=[1, 1], modulation_features=32)


@pytest.fixture(scope="module")
def model():
    m = DiffusionModel(**TINY)
    m.initialize(jnp.zeros((1, 2, 256)))
    return m


def test_adversarial_concurrent_mix(model):
    """3 client threads × mixed signatures (two lengths, seed-noise, a
    bad-length poison request) all resolve: good requests return audio,
    the poison request fails ALONE, and the stats ledger balances."""
    results, failures, latencies = [], [], []
    lock = threading.Lock()

    with GenerationService(model, num_steps=2, batch_size=4,
                           max_wait_ms=40.0) as svc:
        def client(tid):
            rng = np.random.default_rng(tid)
            for i in range(6):
                t0 = time.monotonic()
                kind = (tid + i) % 4
                try:
                    if kind == 0:
                        out = svc.submit(rng.standard_normal(
                            (2, 256)).astype(np.float32)).result(120)
                    elif kind == 1:
                        out = svc.submit(rng.standard_normal(
                            (2, 512)).astype(np.float32)).result(120)
                    elif kind == 2:
                        out = svc.submit_seed(
                            tid * 100 + i, length=256).result(120)
                    else:  # poison: indivisible length
                        out = svc.submit(np.zeros(
                            (2, 255), np.float32)).result(120)
                    with lock:
                        results.append((kind, out.shape))
                        latencies.append(time.monotonic() - t0)
                except Exception as e:
                    with lock:
                        failures.append((kind, type(e).__name__))

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(300)
        assert not any(t.is_alive() for t in threads), "a client hung"
        stats = svc.stats

    # Every request resolved one way or the other: 3 threads x 6 each.
    assert len(results) + len(failures) == 18
    # All poison requests failed; nothing else did.
    assert all(kind == 3 for kind, _ in failures) and failures
    assert all(shape == (2, 256) or shape == (2, 512)
               for _, shape in results)
    # Ledger: every submit was counted; batches ran; occupancy in (0, 1].
    assert stats["requests"] == 18
    assert stats["batches"] >= 1
    assert 0 < stats["mean_occupancy"] <= 1.0
    p50, p99 = np.percentile(latencies, [50, 99])
    assert p99 < 120  # nothing waited for the full timeout


def test_hot_swap_mid_stream(model):
    """update_params mid-stream: earlier requests serve the old snapshot,
    later ones the new; NO request fails or hangs across the swap."""
    noise = np.random.default_rng(3).standard_normal(
        (2, 256)).astype(np.float32)
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p), model.params)
    with GenerationService(model, num_steps=2, batch_size=2,
                           max_wait_ms=10.0) as svc:
        # The swap applies to batches that RUN after it (in-flight batches
        # finish on the old snapshot), so gather each phase before
        # swapping.
        out_before = [f.result(120)
                      for f in [svc.submit(noise) for _ in range(4)]]
        svc.update_params(zeros)
        out_after = [f.result(120)
                     for f in [svc.submit(noise) for _ in range(4)]]
        svc.update_params(None)  # back to live params
        out_restored = [f.result(120)
                        for f in [svc.submit(noise) for _ in range(2)]]
    # Same-signature requests within each phase agree...
    for group in (out_before, out_after, out_restored):
        for o in group[1:]:
            np.testing.assert_array_equal(o, group[0])
    # ...the swap actually changed the weights serving the stream...
    assert np.abs(out_before[0] - out_after[0]).max() > 0
    # ...and None restored the live params.
    np.testing.assert_array_equal(out_restored[0], out_before[0])


def test_http_malformed_and_concurrent_good_requests(model):
    """HTTP layer under mixed fire: malformed JSON, wrong routes, and
    oversize conditioning each get their 4xx/5xx WITHOUT disturbing the
    concurrent well-formed requests (200 + WAV)."""
    svc = GenerationService(model, num_steps=2, batch_size=2,
                            max_wait_ms=40.0)
    server = make_server(svc, sample_rate=8000, default_length=256,
                         channels=2)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body: bytes, ok_codes=(200,)):
        req = urllib.request.Request(base + path, data=body,
                                     method="POST")
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    good_out, bad_out = [], []

    def good(seed):
        code, body = post("/generate", json.dumps(
            {"seed": seed, "length": 256}).encode())
        good_out.append((code, body[:4]))

    def bad(i):
        if i == 0:
            bad_out.append(post("/generate", b"{not json")[0])
        elif i == 1:
            bad_out.append(post("/nope", b"{}")[0])
        elif i == 2:  # /transform against an unconditional server
            bad_out.append(post("/transform", b"RIFFxxxx")[0])
        else:  # string seed
            bad_out.append(post("/generate", json.dumps(
                {"seed": "evil"}).encode())[0])

    threads = [threading.Thread(target=good, args=(s,)) for s in (1, 2)] \
        + [threading.Thread(target=bad, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    server.shutdown()
    svc.close()

    assert all(code == 200 and magic == b"RIFF"
               for code, magic in good_out), good_out
    assert sorted(bad_out) == [400, 400, 400, 404]

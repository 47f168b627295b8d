"""Serving stress measurement on the real TPU (VERDICT r4 #7).

Drives GenerationService + the HTTP front end with concurrent
mixed-signature clients against the trained distilled flagship
(runs/flagship_r3/model_distilled8, 8-step), exactly like a multi-tenant
deployment: two lengths, seed-noise requests, malformed requests
interleaved. Reports p50/p99 end-to-end latency per signature and batch
occupancy as one JSON line.

Run (TPU, solo): python examples/serve_stress.py
Env: SS_REQUESTS (default 48), SS_THREADS (16), SS_STEPS (8).
"""
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
RUN = Path(os.environ.get("SS_RUN", ROOT / "runs/flagship_r3"))
MODEL_DIR = Path(os.environ.get("SS_MODEL", RUN / "model_distilled8"))
N_REQ = int(os.environ.get("SS_REQUESTS", 48))
N_THREADS = int(os.environ.get("SS_THREADS", 16))
STEPS = int(os.environ.get("SS_STEPS", 8))
LENGTHS = tuple(int(x) for x in os.environ.get(
    "SS_LENGTHS", f"{2 ** 18},{2 ** 17}").split(","))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache"))


def main():
    import jax.numpy as jnp

    from audio_diffusion_tpu import GenerationService
    from audio_diffusion_tpu.cli import _build_model
    from audio_diffusion_tpu.server import make_server

    cfg = json.loads((RUN / "config.json").read_text())
    for k in ("_task", "_sample_rate", "_init_from"):
        cfg.pop(k, None)
    model = _build_model(dict(cfg), "v", "unconditional")
    # Init length must be divisible by the net's total downsampling and
    # leave a few bottleneck samples for the attention levels.
    import numpy as np
    init_len = 4 * int(np.prod(cfg.get("factors", [1])))
    model.initialize(jnp.zeros((1, cfg.get("in_channels", 2), init_len)))
    model.load(MODEL_DIR)

    svc = GenerationService(model, num_steps=STEPS, batch_size=8,
                            max_wait_ms=60.0, result_format="pcm16")
    server = make_server(svc, sample_rate=48000,
                         default_length=LENGTHS[0], channels=2)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    # Warm both signatures (compile happens once per signature).
    print("warming 2 signatures...", flush=True)
    for ln in LENGTHS:
        svc.submit_seed(0, length=ln).result(1800)

    lat = {ln: [] for ln in LENGTHS}
    errors, http_bad = [], []
    lock = threading.Lock()

    def client(tid):
        rng = np.random.default_rng(tid)
        for i in range(N_REQ // N_THREADS):
            ln = LENGTHS[(tid + i) % 2]
            t0 = time.monotonic()
            if tid % 4 == 0:  # HTTP path
                body = json.dumps({"seed": int(rng.integers(2 ** 31)),
                                   "length": ln,
                                   "num_steps": STEPS}).encode()
                req = urllib.request.Request(base + "/generate",
                                             data=body, method="POST")
                try:
                    with urllib.request.urlopen(req, timeout=600) as r:
                        ok = r.status == 200 and r.read(4) == b"RIFF"
                except urllib.error.HTTPError as e:
                    ok = False
                    with lock:
                        http_bad.append(e.code)
                if not ok:
                    with lock:
                        errors.append(("http", ln))
                    continue
            else:  # direct service path
                try:
                    out = svc.submit_seed(int(rng.integers(2 ** 31)),
                                          length=ln).result(600)
                    assert out.shape == (2, ln)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append((type(e).__name__, ln))
                    continue
            with lock:
                lat[ln].append(time.monotonic() - t0)
        # One malformed request per thread, interleaved with the load.
        try:
            svc.submit(np.zeros((2, LENGTHS[0] + 1), np.float32)).result(600)
            with lock:
                errors.append(("poison-did-not-fail", 0))
        except Exception:
            pass  # expected

    t_start = time.monotonic()
    threads = [threading.Thread(target=client, args=(t,))
               for t in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(1800)
    wall = time.monotonic() - t_start
    server.shutdown()
    stats = svc.stats
    svc.close()

    out = {"requests": N_REQ, "threads": N_THREADS, "steps": STEPS,
           "wall_s": round(wall, 1),
           "errors": errors, "http_rejects": http_bad,
           "mean_occupancy": round(stats["mean_occupancy"], 3),
           "batches": stats["batches"],
           "padded_slots": stats["padded_slots"]}
    for ln in LENGTHS:
        if lat[ln]:
            p50, p99 = np.percentile(lat[ln], [50, 99])
            out[f"p50_ms_len{ln}"] = round(p50 * 1e3, 1)
            out[f"p99_ms_len{ln}"] = round(p99 * 1e3, 1)
            out[f"served_len{ln}"] = len(lat[ln])
    print(json.dumps(out), flush=True)
    print("SS DONE", flush=True)


if __name__ == "__main__":
    main()

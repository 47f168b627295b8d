"""Perf endgame: pre-registered hypotheses against the 3.66 ms/step chain
(VERDICT r4 #3).

The batch-1 50-step exact sampler has plateaued at ~3.66 ms/step for three
rounds; PERFORMANCE.md's own per-section decomposition says 2.3-2.6 ms
should be achievable, with the gap attributed to serialized-dispatch /
scheduling bubbles. This script measures the remaining *registered*
hypotheses (unroll>5 was already measured WORSE in r4 — PERFORMANCE.md r4
item 6 — and is not re-run):

- H-sigfeat: hoist the sigma-embedding MLP chain out of the scan by
  precomputing per-step features f_i = embed(sigma_i) - embed(0) and
  passing sigmas=0 (loop-invariant -> XLA hoists embed(0)); waveform
  verified ~equal to the baseline before timing.
- H-interleave2: two INDEPENDENT 50-step chains advanced in one scan body
  as separate net calls — if the serialized op chain leaves scheduler
  bubbles, the second chain's ops fill them (reported per-sample;
  compare against batch-2, which fuses the chains into batched ops).
- H-bf16carry: bf16 noise -> the scan carry and every elementwise update
  run in bf16 (halves carry traffic; coefficient math stays f32 inside
  the sampler by design). Bit-accuracy traded for latency; quality
  would need a separate A/B before production use.

All rows use the slope method (t(12 reps) - t(2 reps), median of 3) so
the tunnel RTT cancels (PERFORMANCE.md r4). Run (TPU, solo):
    python examples/perf_endgame.py
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_diffusion_tpu import DiffusionModel, UNetV0  # noqa: E402
from audio_diffusion_tpu.diffusion.core import alpha_beta  # noqa: E402
from audio_diffusion_tpu.diffusion.schedules import LinearSchedule  # noqa: E402
from audio_diffusion_tpu.ops.net import cast_inference_params  # noqa: E402
from audio_diffusion_tpu.ops.unet import SigmaEmbedding  # noqa: E402

NUM_STEPS = 50
LENGTH = int(os.environ.get("PE_LENGTH", 2 ** 18))
UNROLL = 5
REPS_SMALL, REPS_BIG = 2, 12
TINY = bool(os.environ.get("PE_TINY"))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))


def build_model():
    global LENGTH
    if TINY:
        LENGTH = 4096
        model = DiffusionModel(net_t=UNetV0, in_channels=2,
                               channels=[8, 16], factors=[1, 2],
                               items=[1, 1], modulation_features=32)
    else:
        model = DiffusionModel(
            net_t=UNetV0, in_channels=2,
            channels=[8, 32, 64, 128, 256, 512, 512, 1024, 1024],
            factors=[1, 4, 4, 4, 2, 2, 2, 2, 2],
            items=[1, 2, 2, 2, 2, 2, 2, 4, 4],
            attentions=[0, 0, 0, 0, 0, 1, 1, 1, 1],
            attention_heads=8, attention_features=64, dtype=jnp.bfloat16)
    model.initialize(jnp.zeros((1, 2, LENGTH), jnp.float32))
    return model


def make_pair(step_fn, batch, dtype=jnp.float32):
    """One jitted lax.map runner + (small, big) rep noise stacks."""
    @jax.jit
    def many(params, ns):
        return jnp.sum(jax.lax.map(
            lambda m: step_fn(params, m), ns).astype(jnp.float32))

    def mk(n):
        return jax.random.normal(
            jax.random.key(0), (n, batch, 2, LENGTH)).astype(dtype)

    return many, mk(REPS_SMALL), mk(REPS_BIG)


def slope_time(many, params, ns, nb, rounds=3):
    _ = float(many(params, ns))  # compile + warm (both shapes)
    _ = float(many(params, nb))
    diffs = []
    for _i in range(rounds):
        t0 = time.perf_counter()
        _ = float(many(params, nb))
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(many(params, ns))
        diffs.append(max(tb - (time.perf_counter() - t0), 1e-6))
    return sorted(diffs)[len(diffs) // 2] / (REPS_BIG - REPS_SMALL)


def main():
    model = build_model()
    params = model.params
    net = model.net
    cdtype = getattr(net, "compute_dtype", None)
    sigmas = LinearSchedule()(NUM_STEPS + 1).astype(jnp.float32)
    alphas, betas = alpha_beta(sigmas)
    results = {"length": LENGTH}

    def report(name, per_call, samples_per_call=1):
        ms = 1e3 * per_call / samples_per_call / NUM_STEPS
        results[name + "_ms_per_step"] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms/step "
              f"({1e3 / ms:.1f} steps/s per sample)", flush=True)

    def update(x, v, a0, b0, a1, b1):
        x_pred = a0 * x - b0 * v
        n_pred = b0 * x + a0 * v
        return (a1 * x_pred + b1 * n_pred).astype(x.dtype)

    # ---- baseline: the production unroll=5 sampler ----------------------
    def base(p, noise):
        return model.sample_fn(p, noise, num_steps=NUM_STEPS,
                               unroll=UNROLL)

    many, ns, nb = make_pair(base, 1)
    report("baseline_unroll5", slope_time(many, params, ns, nb))

    # ---- H-sigfeat: hoist the sigma-embedding chain out of the scan -----
    se_tree = params["net"]["sigma_embedding"]
    mf = se_tree["Dense_1"]["kernel"].shape[1]
    se = SigmaEmbedding(mf, dtype=cdtype)
    emb_all = se.apply({"params": se_tree}, sigmas[:-1])      # [steps, mf]
    emb0 = se.apply({"params": se_tree}, jnp.zeros((1,)))     # [1, mf]
    feats = (emb_all - emb0).astype(
        cdtype or jnp.float32)                                # [steps, mf]

    def sigfeat(p, x):
        pc = cast_inference_params(p, cdtype)
        zero_sig = jnp.zeros((x.shape[0],), x.dtype)

        def step(x, scan_in):
            f, a0, b0, a1, b1 = scan_in
            v = net.apply(pc["net"], x, zero_sig, features=f[None])
            return update(x, v, a0, b0, a1, b1), None

        x, _ = lax.scan(step, x, (feats, alphas[:-1], betas[:-1],
                                  alphas[1:], betas[1:]), unroll=UNROLL)
        return x

    # Semantics check before timing: embed(0) + (embed(s)-embed(0)) must
    # reproduce the baseline waveform (up to bf16 association).
    probe = jax.random.normal(jax.random.key(7), (1, 2, LENGTH))
    w_base = np.asarray(jax.jit(base)(params, probe), np.float32)
    w_sf = np.asarray(jax.jit(sigfeat)(params, probe), np.float32)
    rel = float(np.sqrt(np.mean((w_base - w_sf) ** 2))
                / max(np.sqrt(np.mean(w_base ** 2)), 1e-9))
    results["sigfeat_rel_rms_vs_base"] = round(rel, 5)
    print(f"sigfeat waveform rel-RMS vs baseline: {rel:.5f}", flush=True)

    many, ns, nb = make_pair(sigfeat, 1)
    report("sigfeat_hoisted", slope_time(many, params, ns, nb))

    # ---- H-interleave2 vs batch-2 ---------------------------------------
    def inter2(p, x2):  # [2, 2, LENGTH] = two independent chains
        pc = cast_inference_params(p, cdtype)

        def step(carry, scan_in):
            xa, xb = carry
            sig, a0, b0, a1, b1 = scan_in
            va = net.apply(pc["net"], xa, jnp.full((1,), sig, xa.dtype))
            vb = net.apply(pc["net"], xb, jnp.full((1,), sig, xb.dtype))
            return (update(xa, va, a0, b0, a1, b1),
                    update(xb, vb, a0, b0, a1, b1)), None

        (xa, xb), _ = lax.scan(
            step, (x2[:1], x2[1:]),
            (sigmas[:-1], alphas[:-1], betas[:-1], alphas[1:], betas[1:]),
            unroll=UNROLL)
        return jnp.concatenate([xa, xb])

    many, ns, nb = make_pair(inter2, 2)
    report("interleave2", slope_time(many, params, ns, nb),
           samples_per_call=2)

    many, ns, nb = make_pair(base, 2)
    report("batch2", slope_time(many, params, ns, nb), samples_per_call=2)

    # ---- H-bf16carry -----------------------------------------------------
    many, ns, nb = make_pair(base, 1, dtype=jnp.bfloat16)
    report("bf16carry", slope_time(many, params, ns, nb))

    print(json.dumps(results), flush=True)
    print("PE DONE", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: 50-step VSampler, 2^18-sample stereo, full README 9-level U-Net
(BASELINE.json north-star configuration), bf16 compute, batch 1.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes NO numbers (BASELINE.md) and cannot run
here (a-unet not installed, no network). The baseline is therefore an
ANALYTIC estimate of the PyTorch reference on one A100: the compiled step's
FLOP count (from XLA cost analysis) at an assumed A100-bf16 MFU
(312 TFLOP/s peak). vs_baseline = measured steps/s ÷ that estimate.

Target-attainability math (BASELINE.md): BASELINE.json's "≥3× A100" north
star is only meaningful against a realistic eager-torch MFU. At a generous
25% assumed reference MFU, 3× ≈ 1050 steps/s ≈ 119% of v5e bf16 peak
(197 TFLOP/s) — unattainable by any implementation on this chip. The
DEFENSIBLE framing is the 10% assumption (typical for eager torch running
hundreds of small kernels per step with a Python-loop sampler and a
per-step host sync, reference diffusion.py:188): 3× @10% ≈ 420 steps/s
≈ 47% sampling MFU on v5e — hard but physical. vs_baseline is therefore
reported against the 10% estimate; the stderr diagnostics print BOTH
assumptions so either framing can be checked.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NUM_STEPS = 50
LENGTH = 2**18
BATCH = 1
A100_PEAK_BF16 = 312e12
REFERENCE_MFU_DEFENSIBLE = 0.10
REFERENCE_MFU_GENEROUS = 0.25


def main():
    # Persistent compilation cache: verified to work through the remote
    # backend (second process: init 12.3s -> 4.1s, sampling compile 5.3s ->
    # 1.2s) — repeat bench runs skip the multi-minute first compile.
    import os
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)

    from audio_diffusion_tpu import DiffusionModel, UNetV0

    model = DiffusionModel(
        net_t=UNetV0,
        in_channels=2,
        channels=[8, 32, 64, 128, 256, 512, 512, 1024, 1024],
        factors=[1, 4, 4, 4, 2, 2, 2, 2, 2],
        items=[1, 2, 2, 2, 2, 2, 2, 4, 4],
        attentions=[0, 0, 0, 0, 0, 1, 1, 1, 1],
        attention_heads=8,
        attention_features=64,
        dtype=jnp.bfloat16,
    )
    example = jnp.zeros((BATCH, 2, LENGTH), jnp.float32)
    model.initialize(example)

    def sample(params, noise):
        return model.sample_fn(params, noise, num_steps=NUM_STEPS, unroll=5)

    noise = jax.random.normal(jax.random.key(0), (BATCH, 2, LENGTH),
                              jnp.float32)

    # FLOPs of ONE net forward from XLA cost analysis (the sampling step is
    # one forward + a few elementwise ops).
    def one_forward(params, x):
        return model.net.apply(params["net"], x,
                               jnp.full((BATCH,), 0.5, jnp.float32))

    cost = jax.jit(one_forward).lower(
        model.params, noise).compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops_per_step = float((cost or {}).get("flops", 0.0))

    # All repetitions run on-device inside ONE jitted call (lax.map over
    # rep noises): each host->device call costs ~30 ms through the axon
    # tunnel and does NOT overlap, so a host-side reps loop would dilute
    # the measurement. Tunnel overhead is removed by a SLOPE measurement:
    # time a big-reps call and a small-reps call and difference them — the
    # per-call round-trip cancels exactly instead of being estimated.
    # (Subtracting a separately-measured RTT over-corrects badly on
    # degraded-tunnel days: BENCH_r03 measured a 1302 ms trivial-call RTT
    # and the single-call subtraction inflated the result ~60%.)
    @jax.jit
    def _trivial(x):
        return jnp.sum(x)

    _ = float(_trivial(jnp.ones((8,))))  # compile
    rtt_samples = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = float(_trivial(jnp.ones((8,))))
        rtt_samples.append(time.perf_counter() - t0)
    RTT = sorted(rtt_samples)[len(rtt_samples) // 2]

    REPS_SMALL, REPS_BIG = 2, 12
    reps = REPS_BIG - REPS_SMALL  # samples measured by each slope

    def make_many(n):
        noises = jax.random.normal(
            jax.random.key(0), (n, BATCH, 2, LENGTH), jnp.float32)

        @jax.jit
        def sample_many(params, noises):
            outs = jax.lax.map(lambda m: sample(params, m), noises)
            return jnp.sum(outs)

        return sample_many, noises

    many_small, noises_small = make_many(REPS_SMALL)
    many_big, noises_big = make_many(REPS_BIG)

    def slope(params, rounds=3):
        """Median over rounds of t(big) - t(small): pure device time of
        (REPS_BIG - REPS_SMALL) samples; the tunnel RTT cancels."""
        diffs = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            _ = float(many_big(params, noises_big))
            t_big = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(many_small(params, noises_small))
            t_small = time.perf_counter() - t0
            diffs.append(max(t_big - t_small, 1e-6))
        return sorted(diffs)[len(diffs) // 2]

    _ = float(many_small(model.params, noises_small))  # compile + warmup
    _ = float(many_big(model.params, noises_big))
    elapsed = slope(model.params)

    steps_per_sec = NUM_STEPS * reps / elapsed
    if flops_per_step > 0:
        base_10 = (A100_PEAK_BF16 * REFERENCE_MFU_DEFENSIBLE
                   / flops_per_step)
        base_25 = (A100_PEAK_BF16 * REFERENCE_MFU_GENEROUS
                   / flops_per_step)
        vs_baseline = steps_per_sec / base_10
    else:
        base_10 = base_25 = None
        vs_baseline = None

    import sys
    print(f"diag: {elapsed/reps:.3f}s per 50-step sample, "
          f"{1000*elapsed/(reps*NUM_STEPS):.2f} ms/step, "
          f"net forward ≈ {flops_per_step/1e9:.1f} GFLOP, "
          f"measured RTT {RTT*1000:.1f} ms",
          file=sys.stderr)
    if base_10 is not None:
        print(f"diag: A100-reference estimate {base_10:.1f} steps/s @10% MFU "
              f"(vs: {steps_per_sec/base_10:.2f}x) | {base_25:.1f} steps/s "
              f"@25% MFU (vs: {steps_per_sec/base_25:.2f}x); "
              "3x@25% exceeds v5e bf16 peak — see BASELINE.md",
              file=sys.stderr)

    # Secondary diagnostic: int8 weight-only quantized sampling (ops/quant.py
    # — 36% fewer HBM bytes per XLA cost analysis; ~+2% wall clock at
    # batch 1, which is compute/serialization-bound, PERFORMANCE.md r3).
    from audio_diffusion_tpu import quantize_params

    qparams = jax.jit(quantize_params)(model.params)
    _ = float(many_small(qparams, noises_small))  # compile + warmup
    _ = float(many_big(qparams, noises_big))
    q_elapsed = slope(qparams)
    print(f"diag: int8 weight-quantized sampling "
          f"{1000*q_elapsed/(reps*NUM_STEPS):.2f} ms/step "
          f"({NUM_STEPS*reps/q_elapsed:.1f} steps/s; rel-RMS error vs bf16 "
          "0.74% on trained flagship weights, LSD 0.18 dB — r4-measured "
          "citation, not re-measured in this run)", file=sys.stderr)

    # Secondary diagnostic: encoder-reuse sampling (Faster Diffusion,
    # arXiv:2312.09608; VSampler encoder_reuse=2) — an approximate
    # alternative sampler: measured in-distribution quality flat on the
    # trained flagship (band-profile 0.578 vs 0.572 exact), PERFORMANCE.md
    # r4. The headline above stays the exact k=1 sampler.
    def sample_er(params, noise):
        return model.sample_fn(params, noise, num_steps=NUM_STEPS,
                               unroll=5, encoder_reuse=2)

    def make_er(n):
        ns = jax.random.normal(jax.random.key(0), (n, BATCH, 2, LENGTH),
                               jnp.float32)

        @jax.jit
        def many(p, nn_):
            return jnp.sum(jax.lax.map(lambda m: sample_er(p, m), nn_))

        return many, ns

    er_s, er_ns = make_er(REPS_SMALL)
    er_b, er_nb = make_er(REPS_BIG)
    _ = float(er_s(model.params, er_ns))
    _ = float(er_b(model.params, er_nb))
    er_d = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(er_b(model.params, er_nb))
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(er_s(model.params, er_ns))
        er_d.append(max(tb - (time.perf_counter() - t0), 1e-6))
    er_elapsed = sorted(er_d)[1]
    print(f"diag: encoder-reuse k=2 sampling "
          f"{1000*er_elapsed/(reps*NUM_STEPS):.2f} ms/step "
          f"({NUM_STEPS*reps/er_elapsed:.1f} steps/s; approximate sampler, "
          "k=2 set-level quality neutral on two corpora — r4-measured "
          "citation, not re-measured in this run)", file=sys.stderr)

    # Secondary diagnostic: the distilled flagship (64->8 progressive
    # distillation, PERFORMANCE.md r4) when its params are on disk — the
    # serving-latency headline: 8 steps at better-than-teacher-16-step
    # quality, measured 29.6 ms vs 182.8 ms for the 50-step teacher.
    import os.path
    distilled = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "runs", "flagship_r3", "model_distilled8")
    if os.path.isdir(distilled):
        try:
            import orbax.checkpoint as ocp

            dparams = ocp.StandardCheckpointer().restore(
                os.path.abspath(distilled), target=model.params)

            def sample8(params, noise):
                return model.sample_fn(params, noise, num_steps=8, unroll=5)

            def make8(n):
                ns = jax.random.normal(jax.random.key(0),
                                       (n, BATCH, 2, LENGTH), jnp.float32)

                @jax.jit
                def many(p, nn_):
                    return jnp.sum(jax.lax.map(lambda m: sample8(p, m),
                                               nn_))

                return many, ns

            s8, n8s = make8(REPS_SMALL)
            b8, n8b = make8(REPS_BIG)
            _ = float(s8(dparams, n8s))
            _ = float(b8(dparams, n8b))
            d8 = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(b8(dparams, n8b))
                tb = time.perf_counter() - t0
                t0 = time.perf_counter()
                _ = float(s8(dparams, n8s))
                d8.append(max(tb - (time.perf_counter() - t0), 1e-6))
            lat8 = sorted(d8)[1] / reps
            print(f"diag: distilled-8-step flagship sample "
                  f"{lat8*1000:.1f} ms/sample "
                  f"({elapsed/reps/lat8:.1f}x the 50-step teacher; quality "
                  "between teacher 16 and 32 steps — r4-measured citation, "
                  "not re-measured in this run)",
                  file=sys.stderr)
        except Exception as e:  # diag only — never fail the bench
            print(f"diag: distilled model present but unmeasurable: {e}",
                  file=sys.stderr)

    # Secondary diagnostic: train step (loss+grad+adam) samples/sec via the
    # library's donated train step (the real training path — measured ~25%
    # faster than a naive non-donated loop, PERFORMANCE.md).
    import optax
    from audio_diffusion_tpu.parallel import make_train_step

    TRAIN_BATCH = 8
    xt = jax.random.normal(jax.random.key(2), (TRAIN_BATCH, 2, LENGTH),
                           jnp.float32)
    init_state, train_step = make_train_step(model.loss, optax.adam(1e-4))
    state = init_state(model.params, jax.random.key(1))
    state, m = train_step(state, xt)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = train_step(state, xt)
    _ = float(m["loss"])
    train_dt = (time.perf_counter() - t0) / reps
    print(f"diag: train step (donated, batch {TRAIN_BATCH}) "
          f"{train_dt*1000:.1f} ms "
          f"({TRAIN_BATCH/train_dt:.2f} samples/s at 2^18 stereo)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "vsampler_steps_per_sec_2e18_stereo_9level",
        "value": round(steps_per_sec, 3),
        "unit": "net_steps/sec",
        "vs_baseline": (round(vs_baseline, 4)
                        if vs_baseline is not None else None),
    }))


if __name__ == "__main__":
    main()

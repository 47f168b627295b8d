"""Synthesize a captioned WAV corpus: truthful sidecar captions for
semantic text-to-audio training in a zero-egress environment.

The plain corpus generator (make_corpus.py) mixes a random 2-3-subset of
five sound generators per file. Here the subset (the "ingredient combo")
is CONTROLLED and each file gets a sidecar caption (`<stem>.txt`) that
truthfully names its ingredients — so `train --caption-dir` learns real
text->audio semantics: the frozen byte-level text encoder (RandomT5,
ops/text.py) gives every caption a distinct fixed representation, and the
U-Net's cross-attention learns what the tokens MEAN from the audio,
exactly as the reference's cross-attention learns over frozen T5-base
embeddings (reference components.py:71-72, README.md:47-76).

Compositional held-out protocol: of the 20 possible ingredient combos
(C(5,2)+C(5,3)), 4 are NEVER generated in the training corpus
(HELD_OUT below). The eval (caption_conditional_eval.py) prompts all 20
captions — held-out accuracy measures whether the model composes
ingredient phrases it only ever saw in other combinations.

    python examples/make_caption_corpus.py --out corpus_cap --files 64
    python examples/make_caption_corpus.py --out corpus_cap_val \
        --files 40 --seed 7 --include-held-out   # probe-validation corpus
"""
from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from make_corpus import SR, chord_pad, drums, fm_bass, melody, noise_sweep  # noqa: E402
from audio_diffusion_tpu.data import wav_write  # noqa: E402

# Ingredient table: (generator, caption phrase). Index order is canonical.
INGREDIENTS = (
    (chord_pad, "warm chord pad"),
    (melody, "plucked melody"),
    (fm_bass, "deep fm bass"),
    (drums, "kick drum groove"),
    (noise_sweep, "rising noise sweep"),
)
NAMES = tuple(p for _, p in INGREDIENTS)

# All 2- and 3-ingredient combos, canonical order (20 total).
COMBOS = tuple(itertools.combinations(range(len(INGREDIENTS)), 2)) + \
    tuple(itertools.combinations(range(len(INGREDIENTS)), 3))

# Combos excluded from training: every ingredient still appears in many
# TRAIN combos, only these exact combinations are novel at eval time.
HELD_OUT = ((0, 3), (1, 4), (0, 2, 4), (1, 2, 3))
TRAIN_COMBOS = tuple(c for c in COMBOS if c not in HELD_OUT)


def caption_for(combo) -> str:
    """The canonical truthful caption for an ingredient combo."""
    return ", ".join(NAMES[i] for i in combo)


# One-shot generators decay to silence (fm bass ~2 s, chord pad ~6 s), so
# a random training crop of a long file could MISS an ingredient its
# caption names — label noise for both the conditioning model and the
# eval probe. Re-trigger them on these periods so every crop contains
# every captioned ingredient.
RETRIGGER_S = {fm_bass: 2.0, chord_pad: 4.0}


def render(rng, combo, seconds: float) -> np.ndarray:
    """Mix exactly the given ingredients (make_corpus.make_file renders a
    random subset; captions need a controlled one)."""
    n = int(seconds * SR)
    mono = np.zeros(n, np.float32)
    for gi in combo:
        gen = INGREDIENTS[gi][0]
        period = int(RETRIGGER_S.get(gen, seconds) * SR)
        for start in range(0, n, period):
            seg = min(period, n - start)
            mono[start:start + seg] += gen(rng, seg)
    pan = 0.2 * np.sin(2 * np.pi * rng.uniform(0.05, 0.2)
                       * np.arange(n) / SR).astype(np.float32)
    stereo = np.stack([mono * (1 + pan), mono * (1 - pan)])
    return stereo * (0.7 / max(np.abs(stereo).max(), 1e-6))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--include-held-out", action="store_true",
                    help="cycle ALL 20 combos (for probe-validation "
                         "corpora), not just the 16 training combos")
    args = ap.parse_args(argv)
    combos = COMBOS if args.include_held_out else TRAIN_COMBOS
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(args.files):
        combo = combos[i % len(combos)]
        rng = np.random.default_rng(args.seed * 10_000 + i)
        wav_write(out / f"cap_{i:03d}.wav",
                  render(rng, combo, args.seconds), SR)
        (out / f"cap_{i:03d}.txt").write_text(caption_for(combo) + "\n")
        print(f"wrote {i + 1}/{args.files}", end="\r", flush=True)
    held = "all-20-combos" if args.include_held_out else \
        f"{len(TRAIN_COMBOS)} train combos (held out: " \
        f"{[caption_for(c) for c in HELD_OUT]})"
    print(f"\n{args.files} captioned files x {args.seconds}s @ {SR} Hz "
          f"-> {out} [{held}]")


if __name__ == "__main__":
    main()

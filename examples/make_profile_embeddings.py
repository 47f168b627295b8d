"""Derive a per-file conditioning embedding from each corpus file's
third-octave band profile — self-supervised conditioning that needs no
external text encoder (the zero-egress stand-in for T5/CLAP embeddings).

Each WAV gets `<stem>.npy` of shape [tokens, features]: the z-scored
(corpus statistics) band profile, cyclically rotated per token so cross
attention sees position-distinct views of the same signature. The result
plugs into the text-conditional training path:

    python examples/make_profile_embeddings.py --data corpus --out embs
    python -m audio_diffusion_tpu train --data corpus --embedding-dir embs \
        --preset my_conditional.json ...
    python -m audio_diffusion_tpu sample --model run/model \
        --embedding embs/corpus_000.npy --embedding-scale 3.0 ...

Conditioning fidelity is then measurable: the band profile of a sample
generated from file F's embedding should sit closer to F's profile than to
a spectrally different file's (examples/profile_conditional_eval.py).
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_diffusion_tpu.data import wav_read
from audio_diffusion_tpu.eval import band_profile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="directory of .wav files")
    ap.add_argument("--out", required=True, help="output .npy directory")
    ap.add_argument("--sample-rate", type=int, default=48000)
    ap.add_argument("--tokens", type=int, default=8)
    ap.add_argument("--features", type=int, default=32)
    args = ap.parse_args()

    files = sorted(Path(args.data).glob("*.wav"))
    assert files, f"no .wav files under {args.data}"
    profiles = {}
    for f in files:
        audio = wav_read(str(f))
        profiles[f.stem] = band_profile(audio, args.sample_rate)

    mat = np.stack(list(profiles.values()))
    mean, std = mat.mean(axis=0), mat.std(axis=0) + 1e-6

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for stem, prof in profiles.items():
        z = (prof - mean) / std
        # Fit/pad the profile to `features`, then rotate per token.
        feat = np.zeros(args.features, np.float32)
        n = min(len(z), args.features)
        feat[:n] = z[:n]
        emb = np.stack([np.roll(feat, j) for j in range(args.tokens)])
        np.save(out / f"{stem}.npy", emb.astype(np.float32))
    np.save(out / "_corpus_stats.npy",
            np.stack([mean, std]).astype(np.float32))
    print(f"wrote {len(profiles)} embeddings [{args.tokens}, "
          f"{args.features}] to {out}")


if __name__ == "__main__":
    main()

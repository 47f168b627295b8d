"""CorpusEmbedder + embedding-space Fréchet distance (VERDICT r4 #5)."""
import numpy as np
import jax
import pytest

from audio_diffusion_tpu import CorpusEmbedder, frechet_embedding_distance
from audio_diffusion_tpu.eval import frechet_band_distance


def _toy_corpus(n_files=6, frames=4096, sr=8000, seed=0):
    """Distinct per-file textures: tones at different pitches + one noise
    file — separable by any embedding worth its name."""
    rng = np.random.default_rng(seed)
    t = np.arange(frames) / sr
    files = []
    for i in range(n_files - 1):
        f0 = 120 * (i + 1)
        x = np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2.7 * f0 * t)
        files.append((x * 0.4).astype(np.float32))
    files.append(rng.standard_normal(frames).astype(np.float32) * 0.2)
    return np.stack(files)[:, None, :]  # [n, 1, frames]


def _tiny_embedder():
    return CorpusEmbedder(features=8, sample_rate=8000, crop=1024,
                          n_mels=24, n_fft=256, hop=64, widths=(24, 32))


def test_train_separates_files_and_embeds_unit_vectors():
    corpus = _toy_corpus()
    emb = _tiny_embedder()
    params = emb.train(corpus, key=jax.random.key(0), steps=150, batch=16)

    feats = emb.embed(params, corpus[:, :, :2048])
    assert feats.shape == (6, 8)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-4)
    # The classifier actually learned: same-file crops embed closer than
    # cross-file pairs on average.
    a = emb.embed(params, corpus[:, :, :1024])
    b = emb.embed(params, corpus[:, :, 1024:2048])
    same = np.mean(np.sum(a * b, -1))
    cross = np.mean([np.dot(a[i], b[j]) for i in range(6) for j in range(6)
                     if i != j])
    assert same > cross + 0.1, (same, cross)


def test_frechet_embedding_orderings():
    """The validation contract: self-split floor < shifted-texture set <
    white-noise set, mirroring the band-metric orderings."""
    corpus = _toy_corpus(n_files=8)
    emb = _tiny_embedder()
    params = emb.train(corpus, key=jax.random.key(1), steps=150, batch=16)

    rng = np.random.default_rng(3)
    ref = emb.embed(params, corpus[:, :, :2048])
    ref2 = emb.embed(params, corpus[:, :, 2048:4096])
    noise = emb.embed(params, rng.standard_normal(
        (8, 1, 2048)).astype(np.float32) * 0.2)
    # "Near-miss" set: the same tones, half amplitude + added hiss.
    near = emb.embed(params, corpus[:, :, :2048] * 0.5
                     + rng.standard_normal((8, 1, 2048)).astype(
                         np.float32) * 0.05)
    floor = frechet_embedding_distance(ref, ref2)
    d_near = frechet_embedding_distance(ref, near)
    d_noise = frechet_embedding_distance(ref, noise)
    assert floor < d_near < d_noise, (floor, d_near, d_noise)


def test_save_load_roundtrip(tmp_path):
    corpus = _toy_corpus()
    emb = _tiny_embedder()
    params = emb.train(corpus, key=jax.random.key(0), steps=20, batch=8)
    before = emb.embed(params, corpus[:, :, :1024])
    emb.save(params, tmp_path / "emb")

    emb2 = _tiny_embedder()
    restored = emb2.load(tmp_path / "emb", num_classes=6)
    after = emb2.embed(restored, corpus[:, :, :1024])
    np.testing.assert_allclose(before, after, atol=1e-6)


def test_band_frechet_numerics_unchanged():
    """The _frechet_gaussian refactor must not move frechet_band_distance
    (its round-3/4 numbers are cited throughout PERFORMANCE.md): check
    against an independent direct implementation."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 1, 2048)).astype(np.float32) * 0.3
    b = rng.standard_normal((8, 1, 2048)).astype(np.float32) * 0.1
    got = frechet_band_distance(a, b, 8000)

    from audio_diffusion_tpu.eval import band_profile

    pa = np.stack([band_profile(s, 8000) for s in a])
    pb = np.stack([band_profile(s, 8000) for s in b])
    ca = np.cov(pa, rowvar=False) + 1e-6 * np.eye(pa.shape[1])
    cb = np.cov(pb, rowvar=False) + 1e-6 * np.eye(pb.shape[1])
    wa, va = np.linalg.eigh(ca)
    sqrt_ca = (va * np.sqrt(np.maximum(wa, 0))) @ va.T
    wi = np.linalg.eigvalsh(sqrt_ca @ cb @ sqrt_ca)
    want = float(((pa.mean(0) - pb.mean(0)) ** 2).sum() + np.trace(ca)
                 + np.trace(cb) - 2 * np.sqrt(np.maximum(wi, 0)).sum())
    assert got == pytest.approx(max(want, 0.0), rel=1e-9)

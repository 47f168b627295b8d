"""The captioned-corpus capstone harness (examples/make_caption_corpus.py
+ examples/caption_conditional_eval.py): combo bookkeeping, truthful
rendering, and the ingredient probe's ability to read real audio.

The reference's text workflow (reference README.md:60-76) has no offline
quality story at all; this harness is how the rebuild PROVES semantic
text conditioning without T5 weights."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from make_caption_corpus import (COMBOS, HELD_OUT, NAMES,  # noqa: E402
                                 TRAIN_COMBOS, caption_for, render)
import caption_conditional_eval as cc  # noqa: E402


def test_combo_bookkeeping():
    # 20 combos: C(5,2) + C(5,3); held-out ones never in the train set.
    assert len(COMBOS) == 20
    assert len(set(COMBOS)) == 20
    assert all(h in COMBOS for h in HELD_OUT)
    assert not set(HELD_OUT) & set(TRAIN_COMBOS)
    assert len(TRAIN_COMBOS) == 16
    # Every ingredient still appears in several TRAIN combos (held-out
    # tests composition, not unseen vocabulary).
    for i in range(len(NAMES)):
        assert sum(i in c for c in TRAIN_COMBOS) >= 4


def test_captions_are_truthful_and_parseable():
    for combo in COMBOS:
        cap = caption_for(combo)
        y = cc.parse_labels(cap)
        assert y.sum() == len(combo)
        assert all(y[i] == 1 for i in combo)


def test_render_is_finite_and_stereo():
    rng = np.random.default_rng(0)
    x = render(rng, (0, 2), 0.5)
    assert x.shape[0] == 2 and x.shape[1] == 24_000
    assert np.isfinite(x).all()
    assert 0.5 < np.abs(x).max() <= 0.71  # peak-normalized to 0.7


def test_features_shape_and_finiteness():
    rng = np.random.default_rng(1)
    x = render(rng, (2, 3), 1.0)
    f = cc.features(x)
    assert f.ndim == 1 and np.isfinite(f).all()


@pytest.mark.slow
def test_probe_reads_real_audio():
    """End-to-end probe check on tiny fresh corpora: per-ingredient
    accuracy on audio it never saw must beat the all-ones baseline by a
    wide margin (full-size corpora measure 0.93+; the tiny fixture here
    is noisier, so gate at 0.75)."""
    rng = np.random.default_rng(0)

    def mini_corpus(combos, n, seed):
        feats, labels = [], []
        for i in range(n):
            combo = combos[i % len(combos)]
            r = np.random.default_rng(seed * 1000 + i)
            x = render(r, combo, 1.5)
            crop = 48_000
            off = int(rng.integers(0, x.shape[-1] - crop))
            feats.append(cc.features(x[..., off:off + crop]))
            labels.append(cc.parse_labels(caption_for(combo)))
        return np.stack(feats), np.stack(labels)

    tr_f, tr_y = mini_corpus(TRAIN_COMBOS, 48, seed=0)
    va_f, va_y = mini_corpus(COMBOS, 20, seed=7)
    probe = cc.Probe().fit(tr_f, tr_y)
    s = cc.score(probe.predict(va_f), va_y)
    assert s["per_ingredient_acc"] > 0.75, s


def test_score_and_ci():
    p = np.array([[1, 0, 1, 0, 0], [1, 1, 0, 0, 0]], np.float32)
    t = np.array([[1, 0, 1, 0, 0], [1, 0, 1, 0, 0]], np.float32)
    s = cc.score(p, t)
    assert s["exact_set"] == 0.5
    assert s["per_ingredient_acc"] == 0.8
    lo, hi = s["exact_set_ci95"]
    assert 0.0 <= lo < 0.5 < hi <= 1.0

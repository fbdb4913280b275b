"""PLDA scoring tests: estimation, closed-form LLR, clustering integration.

The reference delegates speaker scoring to pyannote internals
(/root/reference/whisperx/diarize.py:11-83); here PLDA is a first-class
trainable component (whisperx_tpu/diarize/plda.py), so it gets its own
unit coverage: the vectorized LLR matrix is pinned against a direct 2x2
Gaussian evaluation, and fit() must recover a known generative model.
"""

import numpy as np
import pytest

from whisperx_tpu.diarize.plda import (
    PLDA,
    load_plda,
    plda_distances,
    self_trained_plda,
)


def _synthetic_speakers(rng, n_speakers=6, per=20, d=12,
                        between=4.0, within=0.25):
    """Draw embeddings from the exact two-covariance generative model."""
    mu = rng.normal(0, 1, d)
    xs, labels = [], []
    for s in range(n_speakers):
        v = rng.normal(0, np.sqrt(between), d)
        xs.append(mu + v + rng.normal(0, np.sqrt(within), (per, d)))
        labels += [s] * per
    return np.concatenate(xs), np.array(labels)


def test_llr_matrix_matches_direct_2x2_gaussian():
    """The separated (GEMM) form must equal the naive per-pair 2x2
    Gaussian LLR for arbitrary params."""
    rng = np.random.default_rng(0)
    d = 5
    plda = PLDA(
        mean=rng.normal(0, 1, d),
        transform=rng.normal(0, 1, (d, d)),
        psi=rng.uniform(0.2, 5.0, d),
        length_norm=False,
    )
    x = rng.normal(0, 2, (7, d))
    got = plda.llr_matrix(x)

    u = plda.transform_embeddings(x)
    psi = plda.psi
    expect = np.zeros((7, 7))
    for i in range(7):
        for j in range(7):
            llr = 0.0
            for dd in range(d):
                a, b = 1.0 + psi[dd], psi[dd]
                det_s = a * a - b * b
                ui, uj = u[i, dd], u[j, dd]
                q_same = (a * ui * ui - 2 * b * ui * uj + a * uj * uj) / det_s
                log_same = -0.5 * (np.log(det_s) + q_same)
                log_diff = -0.5 * (2 * np.log(a) + (ui * ui + uj * uj) / a)
                llr += log_same - log_diff
            expect[i, j] = llr
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)


def test_llr_matrix_symmetric_and_same_beats_diff():
    rng = np.random.default_rng(1)
    x, labels = _synthetic_speakers(rng)
    plda = PLDA.fit(x, labels, length_norm=False)
    # score HELD-OUT draws from two of the speakers
    x2, labels2 = _synthetic_speakers(np.random.default_rng(2))
    llr = plda.llr_matrix(x2)
    np.testing.assert_allclose(llr, llr.T, atol=1e-9)
    same = labels2[:, None] == labels2[None, :]
    off = ~np.eye(len(x2), dtype=bool)
    assert llr[same & off].mean() > llr[~same].mean() + 1.0


def test_fit_recovers_subspace_scale():
    """On data drawn from the model itself, transformed within-class
    variance must be ~1 and leading psi must be substantially larger."""
    rng = np.random.default_rng(3)
    x, labels = _synthetic_speakers(rng, n_speakers=10, per=40,
                                    between=9.0, within=1.0)
    plda = PLDA.fit(x, labels, length_norm=False)
    u = plda.transform_embeddings(x)
    within = []
    for s in np.unique(labels):
        us = u[labels == s]
        within.append((us - us.mean(0)).var(axis=0, ddof=1))
    within = np.mean(within, axis=0)
    np.testing.assert_allclose(within.mean(), 1.0, rtol=0.25)
    assert plda.psi.max() > 3.0


def test_fit_rejects_degenerate_labels():
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (10, 4))
    with pytest.raises(ValueError):
        PLDA.fit(x, np.arange(10))  # all singletons
    with pytest.raises(ValueError):
        PLDA.fit(x, np.zeros(10))  # one class


def test_fit_rank_guard_high_dim_low_n():
    """Self-training regime: far fewer samples than dims. Without the
    PCA rank guard the singular within-scatter gets floored and its
    null-space directions dominate the LLR with pure noise."""
    rng = np.random.default_rng(8)
    d, n_spk, per = 64, 4, 3  # N=12 << D=64
    mu = rng.normal(0, 1, d)
    xs, labels = [], []
    for s in range(n_spk):
        v = rng.normal(0, 2.0, d)
        xs.append(mu + v + rng.normal(0, 0.3, (per, d)))
        labels += [s] * per
    x, labels = np.concatenate(xs), np.array(labels)
    plda = PLDA.fit(x, labels, length_norm=False)
    # transform projected to the measurable rank, not [D, D]
    assert plda.transform.shape[0] <= 12 - n_spk + 1
    assert plda.transform.shape[1] == d
    llr = plda.llr_matrix(x)
    same = labels[:, None] == labels[None, :]
    off = ~np.eye(len(x), dtype=bool)
    assert np.isfinite(llr).all()
    assert llr[same & off].mean() > llr[~same].mean()


def test_save_load_accepts_suffixless_path(tmp_path):
    """np.savez appends .npz — save('p') then load('p') must round-trip,
    and load_plda must honor a suffixless WHISPERX_TPU_PLDA_CKPT."""
    rng = np.random.default_rng(9)
    x, labels = _synthetic_speakers(rng)
    plda = PLDA.fit(x, labels)
    bare = str(tmp_path / "plda")  # no .npz
    plda.save(bare)
    loaded = PLDA.load(bare)
    np.testing.assert_allclose(
        loaded.llr_matrix(x[:4]), plda.llr_matrix(x[:4]), rtol=1e-12
    )
    assert load_plda(bare) is not None


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    x, labels = _synthetic_speakers(rng)
    plda = PLDA.fit(x, labels)
    path = str(tmp_path / "plda.npz")
    plda.save(path)
    loaded = PLDA.load(path)
    np.testing.assert_allclose(
        loaded.llr_matrix(x[:6]), plda.llr_matrix(x[:6]), rtol=1e-12
    )
    assert loaded.length_norm == plda.length_norm
    assert load_plda(path) is not None
    assert load_plda(str(tmp_path / "missing.npz")) is None


def test_plda_distance_clustering_recovers_speakers():
    rng = np.random.default_rng(6)
    x, labels = _synthetic_speakers(rng, n_speakers=3, per=15)
    plda = PLDA.fit(x, labels, length_norm=False)
    from whisperx_tpu.diarize.clustering import agglomerative_cluster

    got = agglomerative_cluster(
        x, distances=plda_distances(x, plda), threshold=0.0
    )
    assert len(set(got.tolist())) == 3
    # every predicted cluster is pure
    for g in set(got.tolist()):
        assert len(set(labels[got == g].tolist())) == 1


def test_self_trained_plda_unsupervised():
    rng = np.random.default_rng(7)
    x, labels = _synthetic_speakers(rng, n_speakers=4, per=12,
                                    between=6.0, within=0.15)
    plda = self_trained_plda(x)
    assert plda is not None
    llr = plda.llr_matrix(x)
    same = labels[:, None] == labels[None, :]
    off = ~np.eye(len(x), dtype=bool)
    assert llr[same & off].mean() > llr[~same].mean()
    # too few items → None (caller falls back to cosine)
    assert self_trained_plda(x[:4]) is None


def test_diarization_pipeline_plda_option(tmp_path, monkeypatch):
    """End-to-end: clustering='plda' with a trained checkpoint separates
    two alternating synthetic voices at >90% grid purity (the same
    construction and metric as the cosine-path purity test)."""
    import sys
    from collections import Counter
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_diarize import _voice

    from whisperx_tpu.diarize import DiarizationPipeline
    from whisperx_tpu.diarize.embedding import SpectralEmbedding
    from whisperx_tpu.diarize.plda import PLDA
    from whisperx_tpu.vad import load_vad_model

    SR = 16000
    turn_s, gap_s, n_turns = 3.0, 0.5, 6
    va = _voice(110.0, turn_s, bright=0.95, seed=1)
    vb = _voice(260.0, turn_s, bright=1.05, seed=2)
    gap = np.zeros(int(gap_s * SR), np.float32)
    parts, truth, t0 = [], [], 0.0
    for i in range(n_turns):
        parts += [(va if i % 2 == 0 else vb), gap]
        truth.append((t0, t0 + turn_s, i % 2))
        t0 += turn_s + gap_s
    audio = np.concatenate(parts)

    # train PLDA on clean 2 s windows of each voice (disjoint seeds)
    emb = SpectralEmbedding()
    win = 2 * SR
    wins, labs = [], []
    for lab, v in ((0, _voice(110.0, 4.0, bright=0.95, seed=7)),
                   (1, _voice(260.0, 4.0, bright=1.05, seed=8))):
        for s in range(0, 2 * SR + 1, SR // 2):
            wins.append(v[s: s + win])
            labs.append(lab)
    plda = PLDA.fit(emb.embed(np.stack(wins)), np.array(labs))
    ckpt = str(tmp_path / "plda.npz")
    plda.save(ckpt)
    monkeypatch.setenv("WHISPERX_TPU_PLDA_CKPT", ckpt)

    pipe = DiarizationPipeline(
        clustering="plda", vad_model=load_vad_model("energy")
    )
    df = pipe(audio, num_speakers=2)
    assert len(df) >= 2

    preds = []
    for ts, te, true in truth:
        for t in np.arange(ts + 0.4, te - 0.4, 0.25):
            cover = df[(df["start"] <= t) & (df["end"] > t)]
            if len(cover):
                preds.append((true, cover.iloc[0]["speaker"]))
    assert len(preds) >= 20
    mapping = {}
    for true in (0, 1):
        c = Counter(p for tr, p in preds if tr == true)
        assert c, f"voice {true} never covered"
        mapping[true] = c.most_common(1)[0][0]
    assert mapping[0] != mapping[1]
    purity = sum(mapping[tr] == p for tr, p in preds) / len(preds)
    assert purity > 0.9, purity


def test_diarization_pipeline_rejects_unknown_clustering():
    from whisperx_tpu.diarize import DiarizationPipeline

    with pytest.raises(ValueError):
        DiarizationPipeline(clustering="kmeans")

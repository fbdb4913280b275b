"""Diarization tests: clustering, turns, speaker assignment."""

import numpy as np
import pandas as pd

from whisperx_tpu.diarize import (
    DiarizationPipeline,
    agglomerative_cluster,
    assign_word_speakers,
)


def test_agglomerative_cluster_two_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.01, (10, 8)) + np.array([1, 0, 0, 0, 0, 0, 0, 0])
    b = rng.normal(0, 0.01, (10, 8)) + np.array([0, 1, 0, 0, 0, 0, 0, 0])
    x = np.vstack([a, b])
    labels = agglomerative_cluster(x, num_clusters=2)
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_agglomerative_threshold_auto_k():
    rng = np.random.default_rng(1)
    base = np.eye(3)
    x = np.vstack([rng.normal(0, 0.005, (5, 3)) + base[i] for i in range(3)])
    labels = agglomerative_cluster(x, threshold=0.5)
    assert len(set(labels.tolist())) == 3


def test_agglomerative_edge_cases():
    assert len(agglomerative_cluster(np.zeros((0, 4)))) == 0
    assert agglomerative_cluster(np.ones((1, 4))).tolist() == [0]


def test_assign_word_speakers_by_overlap():
    diarize_df = pd.DataFrame(
        [
            {"start": 0.0, "end": 5.0, "speaker": "SPEAKER_00"},
            {"start": 5.0, "end": 10.0, "speaker": "SPEAKER_01"},
        ]
    )
    result = {
        "segments": [
            {
                "start": 1.0,
                "end": 4.0,
                "text": "a",
                "words": [
                    {"word": "a", "start": 1.0, "end": 2.0},
                    {"word": "b", "start": 6.0, "end": 7.0},
                ],
            },
            {"start": 6.0, "end": 9.0, "text": "b", "words": []},
        ]
    }
    out = assign_word_speakers(diarize_df, result)
    assert out["segments"][0]["speaker"] == "SPEAKER_00"
    assert out["segments"][1]["speaker"] == "SPEAKER_01"
    assert out["segments"][0]["words"][0]["speaker"] == "SPEAKER_00"
    assert out["segments"][0]["words"][1]["speaker"] == "SPEAKER_01"


def test_assign_word_speakers_no_overlap():
    diarize_df = pd.DataFrame(
        [{"start": 0.0, "end": 1.0, "speaker": "SPEAKER_00"}]
    )
    result = {"segments": [{"start": 5.0, "end": 6.0, "text": "x", "words": []}]}
    out = assign_word_speakers(diarize_df, result)
    assert "speaker" not in out["segments"][0]
    out2 = assign_word_speakers(diarize_df, result, fill_nearest=True)
    assert out2["segments"][0]["speaker"] == "SPEAKER_00"


def test_diarization_pipeline_runs(speech_5s):
    # two "speakers": original audio and a pitch-shifted copy
    shifted = speech_5s[::2].repeat(2)[: len(speech_5s)]
    audio = np.concatenate([speech_5s, np.zeros(8000, np.float32), shifted])
    pipe = DiarizationPipeline()
    df = pipe(audio, max_speakers=4)
    assert set(["start", "end", "speaker"]).issubset(df.columns)
    if len(df):
        assert (df["end"] > df["start"]).all()


def test_diarization_embeddings_return(speech_5s):
    pipe = DiarizationPipeline()
    df, emb = pipe(speech_5s, return_embeddings=True)
    if len(df):
        assert emb and all(isinstance(v, list) for v in emb.values())

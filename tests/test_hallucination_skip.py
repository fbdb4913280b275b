"""Hallucination-silence skipping in the sequential seek loop.

Pins the upstream-Whisper semantics of ``hallucination_silence_threshold``
(reference contract: the option surface at
reference/whisperx/backends/mlx_whisper.py:72-99 forwards it into
mlx_whisper.transcribe, which implements OpenAI Whisper's anomaly-scoring
silence skipper): word-level anomaly scores, leading-silence skip with
window re-decode, and eviction of anomalous segments surrounded by silence.
"""


import numpy as np

import whisperx_tpu.decoding.transcribe as tr_mod
import pytest

from whisperx_tpu.decoding.decode import DecodingResult
from whisperx_tpu.decoding.transcribe import (
    _is_segment_anomaly,
    _last_word_end,
    _next_words_segment,
    _word_anomaly_score,
    transcribe,
)


def _word(word=" ok", start=0.0, end=0.2, probability=0.9):
    return {"word": word, "start": start, "end": end, "probability": probability}


class TestAnomalyScore:
    def test_confident_normal_word_scores_zero(self):
        assert _word_anomaly_score(_word()) == 0.0

    def test_low_probability_adds_one(self):
        assert _word_anomaly_score(_word(probability=0.1)) == 1.0

    def test_too_fast_word_penalized(self):
        s = _word_anomaly_score(_word(start=0.0, end=0.05))
        assert s == pytest.approx((0.133 - 0.05) * 15)

    def test_too_slow_word_penalized(self):
        assert _word_anomaly_score(_word(start=0.0, end=3.0)) == pytest.approx(1.0)

    def test_missing_probability_counts_as_low(self):
        w = {"word": " x", "start": 0.0, "end": 0.2}
        assert _word_anomaly_score(w) == 1.0


class TestSegmentAnomaly:
    def test_none_and_wordless_are_not_anomalies(self):
        assert not _is_segment_anomaly(None)
        assert not _is_segment_anomaly({"words": []})
        assert not _is_segment_anomaly({})

    def test_good_segment_is_normal(self):
        seg = {"words": [_word(start=i * 0.3, end=i * 0.3 + 0.2) for i in range(5)]}
        assert not _is_segment_anomaly(seg)

    def test_all_low_probability_words_flagged(self):
        seg = {"words": [
            _word(start=i * 0.3, end=i * 0.3 + 0.2, probability=0.01)
            for i in range(3)
        ]}
        # score 3 >= 3 and score >= len(words)
        assert _is_segment_anomaly(seg)

    def test_punctuation_words_excluded_from_scoring(self):
        seg = {"words": [
            _word(word=",", probability=0.0, start=0.0, end=0.0),
            _word(word=".", probability=0.0, start=0.0, end=0.0),
            _word(word=" fine", start=0.0, end=0.2, probability=0.9),
        ]}
        assert not _is_segment_anomaly(seg)

    def test_only_first_eight_words_considered(self):
        words = [_word(start=i * 0.3, end=i * 0.3 + 0.2) for i in range(8)]
        words += [_word(probability=0.0, start=9.0, end=15.0)] * 10
        assert not _is_segment_anomaly({"words": words})


class TestHelpers:
    def test_next_words_segment_skips_wordless(self):
        segs = [{"words": []}, {"words": [_word()], "tag": 1}]
        assert _next_words_segment(segs)["tag"] == 1
        assert _next_words_segment([{"words": []}]) is None

    def test_last_word_end(self):
        segs = [
            {"words": [_word(end=1.0)]},
            {"words": [_word(end=2.0), _word(end=2.5)]},
            {"words": []},
        ]
        assert _last_word_end(segs) == 2.5
        assert _last_word_end([{"words": []}]) is None
        assert _last_word_end([]) is None


class _FakeDims:
    n_mels = 80


class _FakeModel:
    dims = _FakeDims()
    is_multilingual = False
    num_languages = 99
    vocab_path = None


@pytest.fixture
def seek_loop_harness(monkeypatch):
    """Drive the real seek loop with scripted decode outputs and scripted
    word attachments: ``script`` is a list of (rel_segments, words_fn)
    per window, where rel_segments is [(start_rel, end_rel, text_token)]
    encoded via timestamp tokens."""
    from whisperx_tpu.decoding.tokenizer import get_tokenizer

    tok = get_tokenizer(False, num_languages=99)
    ts0 = tok.timestamp_begin

    state = {"script": [], "call": 0, "decode_seeks": []}

    def fake_decode(model, mel, opts):
        i = min(state["call"], len(state["script"]) - 1)
        state["call"] += 1
        rel_segments = state["script"][i][0]
        tokens = []
        for s_rel, e_rel, txt_tok in rel_segments:
            tokens += [ts0 + int(round(s_rel / 0.02)), txt_tok,
                       ts0 + int(round(e_rel / 0.02))]
        return DecodingResult(
            audio_features=None, language="en", tokens=tokens,
            text="x", avg_logprob=-0.1, no_speech_prob=0.0,
            temperature=0.0, compression_ratio=1.0,
        )

    def fake_add_words(*, segments, **kw):
        i = min(state["call"] - 1, len(state["script"]) - 1)
        words_fn = state["script"][i][1]
        for seg in segments:
            seg["words"] = words_fn(seg)

    monkeypatch.setattr(tr_mod, "decode", fake_decode)
    import whisperx_tpu.timing as timing_mod

    monkeypatch.setattr(timing_mod, "add_word_timestamps", fake_add_words)
    return state


def _good_words(seg):
    n = max(1, int((seg["end"] - seg["start"]) / 0.3))
    return [
        _word(start=seg["start"] + i * 0.3, end=seg["start"] + i * 0.3 + 0.25)
        for i in range(n)
    ]


def _hallucinated_words(seg):
    return [
        _word(start=seg["start"], end=seg["start"] + 3.0, probability=0.01),
        _word(start=seg["start"] + 3.0, end=seg["end"], probability=0.01),
    ]


def test_leading_gap_hallucination_skipped(seek_loop_harness):
    """Window 1 produces anomalous segments 20 s into silence: the whole
    window output is discarded and the loop re-decodes from the claimed
    start. Window 2's clean segments are the only output."""
    state = seek_loop_harness
    state["script"] = [
        # two anomalous segments starting after a 20 s silent gap
        ([(20.0, 22.0, 65), (22.0, 25.0, 66)], _hallucinated_words),
        ([(0.0, 2.0, 67), (2.0, 5.0, 68)], _good_words),  # after re-seek
    ]
    audio = np.zeros(16000 * 35, np.float32)
    result = transcribe(
        _FakeModel(), audio, language="en", temperature=0.0,
        word_timestamps=True, hallucination_silence_threshold=2.0,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert state["call"] == 2
    # the whole first window was dropped; segments come from the re-seek
    assert len(result["segments"]) == 2
    assert all(s["seek"] == 2000 for s in result["segments"])
    assert result["segments"][0]["start"] == pytest.approx(20.0)
    assert result["segments"][1]["start"] == pytest.approx(22.0)


def test_surrounded_hallucination_evicted(seek_loop_harness):
    """A mid-window anomalous segment with silence on both sides is evicted
    (with everything after it) and the loop re-seeks to just before it."""
    state = seek_loop_harness
    state["script"] = [
        # clean [0,2], anomalous [10,12] (8 s silence before, silence after)
        ([(0.0, 2.0, 65), (10.0, 12.0, 66)],
         lambda seg: (_good_words if seg["start"] < 5 else _hallucinated_words)(seg)),
        # decoded after the re-seek to frame 1000 (10 s)
        ([(0.0, 1.0, 67), (1.0, 2.0, 68)], _good_words),
    ]
    audio = np.zeros(16000 * 35, np.float32)
    result = transcribe(
        _FakeModel(), audio, language="en", temperature=0.0,
        word_timestamps=True, hallucination_silence_threshold=2.0,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    texts = [s["text"] for s in result["segments"]]
    assert "A" in texts  # the clean leading segment survives
    assert "B" not in texts  # the surrounded hallucination was evicted
    assert "C" in texts and "D" in texts  # re-decode from the anomaly start
    # window 2 decoded from the anomaly's start (frame 1000)
    assert all(
        s["seek"] == 1000 for s in result["segments"] if s["text"] in "CD"
    )


def test_no_threshold_keeps_anomalies(seek_loop_harness):
    """Without hallucination_silence_threshold the anomalous segments are
    kept — the filter is strictly opt-in (upstream default None)."""
    state = seek_loop_harness
    state["script"] = [
        ([(20.0, 22.0, 65), (22.0, 25.0, 66)], _hallucinated_words),
    ]
    audio = np.zeros(16000 * 30, np.float32)
    result = transcribe(
        _FakeModel(), audio, language="en", temperature=0.0,
        word_timestamps=True,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert any(s["start"] == pytest.approx(20.0) for s in result["segments"])


class TestEvictSurroundedAnomalies:
    """The shared eviction rule (seek loop + batched per-chunk path)."""

    @staticmethod
    def _run(segments, threshold=2.0, t0=0.0, t1=30.0, last_speech=0.0,
             keep_tail=False):
        from whisperx_tpu.decoding.transcribe import evict_surrounded_anomalies

        return evict_surrounded_anomalies(
            segments, threshold=threshold, time_offset=t0,
            window_end_time=t1, segment_duration=t1 - t0,
            last_speech_timestamp=last_speech, keep_tail=keep_tail,
        )

    @staticmethod
    def _seg(start, end, good=True):
        seg = {"start": start, "end": end, "text": "x"}
        seg["words"] = (_good_words if good else _hallucinated_words)(seg)
        return seg

    def test_clean_segments_pass_through(self):
        segs = [self._seg(0.0, 2.0), self._seg(2.5, 5.0)]
        kept, evicted = self._run(segs)
        assert kept == segs and evicted is None

    def test_surrounded_anomaly_and_tail_evicted(self):
        segs = [
            self._seg(0.0, 2.0),
            self._seg(10.0, 12.0, good=False),  # 8 s silence both sides
            self._seg(25.0, 27.0),
        ]
        kept, evicted = self._run(segs, last_speech=0.0)
        assert [s["start"] for s in kept] == [0.0]
        assert evicted["start"] == 10.0

    def test_anomaly_adjacent_to_speech_kept(self):
        # anomalous but speech directly before AND after → not surrounded
        segs = [
            self._seg(0.0, 9.9),
            self._seg(10.0, 12.0, good=False),
            self._seg(12.1, 14.0),
        ]
        # place it away from window edges: window [0, 30], ends 16 s early
        kept, evicted = self._run(segs, t1=30.0)
        # silence_after requires >threshold gap / anomaly / window tail <2 s
        # — none hold, so the segment survives
        assert evicted is None and len(kept) == 3

    def test_keep_tail_evicts_anomaly_but_keeps_tail(self):
        """Batched path (keep_tail=True): the surrounded anomaly goes, the
        already-decoded tail stays — a VAD-bounded chunk has nothing to
        re-seek into, so dropping the tail would lose good speech."""
        segs = [
            self._seg(0.0, 2.0),
            self._seg(10.0, 12.0, good=False),  # 8 s silence both sides
            self._seg(25.0, 27.0),
        ]
        kept, evicted = self._run(segs, keep_tail=True)
        assert [s["start"] for s in kept] == [0.0, 25.0]
        assert evicted["start"] == 10.0

    def test_keep_tail_silence_baseline_skips_evicted(self):
        """An evicted hallucination is not speech: the silence baseline for
        the next candidate must not advance past it. bad2 starts 1 s after
        bad1 ends — only silent-before if bad1's end is ignored."""
        segs = [
            self._seg(0.0, 2.0),
            self._seg(15.0, 19.0, good=False),
            self._seg(20.0, 22.0, good=False),
            self._seg(27.0, 29.0),
        ]
        kept, evicted = self._run(segs, keep_tail=True)
        assert [s["start"] for s in kept] == [0.0, 27.0]
        assert evicted["start"] == 15.0

    def test_wordless_segments_ignored(self):
        segs = [{"start": 0.0, "end": 1.0, "text": "x", "words": []}]
        kept, evicted = self._run(segs)
        assert kept == segs and evicted is None


def test_batched_pipeline_warns_without_word_timestamps(nano_model):
    """hallucination_silence_threshold without word_timestamps warns and is
    ignored on the batched path (upstream requires word timestamps too)."""
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.vad import load_vad_model
    from tests.conftest import synth_speech

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=load_vad_model("energy"),
        asr_options={
            "hallucination_silence_threshold": 2.0,
            "temperatures": (0.0,),
            "sample_len": 4,
            "log_prob_threshold": None,
            "compression_ratio_threshold": None,
            "no_speech_threshold": None,
        },
        language="en",
        batch_size=2,
    )
    with pytest.warns(UserWarning, match="word_timestamps"):
        pipe.transcribe(synth_speech(4.0, seed=3), batch_size=2)


def test_sequential_backend_forwards_threshold(monkeypatch):
    """SequentialJAXBackend must pass hallucination_silence_threshold from
    asr_options to the seek loop (regression: it was silently dropped)."""
    import whisperx_tpu.decoding.transcribe as tr_mod
    from whisperx_tpu.backends import SequentialJAXBackend

    seen = {}

    def fake_transcribe(model, audio, **kwargs):
        seen.update(kwargs)
        return {"segments": [], "language": "en"}

    monkeypatch.setattr(tr_mod, "transcribe", fake_transcribe)
    backend = SequentialJAXBackend(
        "test-nano",
        asr_options={
            "hallucination_silence_threshold": 2.0,
            "word_timestamps": True,
        },
        language="en",
    )
    backend.transcribe(np.zeros(16000, np.float32))
    assert seen.get("hallucination_silence_threshold") == 2.0
    assert seen.get("word_timestamps") is True

"""Micro-CTC forced-alignment proof (round-4 VERDICT Missing #2 / Next #2).

Until round 5 the wav2vec2 alignment stack had only ever run with RANDOM
weights ("timings meaningless" — alignment/aligner.py warning). Here a tiny
wav2vec2-CTC is TRAINED in CI (train/ctc_micro.py, char-tone corpus with
exact known char onsets, zero egress) and the PRODUCT path runs end to end:
``load_align_model`` resolves the converted checkpoint (NOT the
random-weights fallback), ``align()`` → batched emissions → trellis DP →
beam backtrack → char→word→sentence aggregation — and the recovered word
onsets are checked against the corpus' ground-truth onset grid.

Reference bar: whisperx/alignment.py:113-380 and short.json word_segments.
"""

import numpy as np
import pytest

from whisperx_tpu.train.ctc_micro import (
    CHAR_GAP_SECONDS,
    CHAR_SECONDS,
    PHRASES,
    char_lexicon,
    clean_words,
    render_chars,
)

# Tolerances: the CTC frame grid is 20 ms and the aligner maps trellis
# frames to seconds through a linear ratio over the segment span, so a
# frame or two of quantization is inherent. Starts are the headline
# deliverable; ends may additionally absorb the closing char's blank tail.
START_TOL = 0.09
END_TOL = 0.14


@pytest.fixture(scope="module")
def ctc_align(tmp_path_factory):
    """(aligner, metadata) loaded through the PRODUCT loader from the
    cached CI-trained checkpoint."""
    from whisperx_tpu.alignment import load_align_model
    from whisperx_tpu.train.ctc_micro import ctc_checkpoint_cached

    base, report = ctc_checkpoint_cached()
    # the trainer's certificate is a HELD-OUT generalization test (online
    # training never repeats a sample): >=90% of never-seen renderings
    # greedy-decode exactly; the residual misses are CTC repeat-char
    # greedy edge cases, benign under forced alignment
    assert report["heldout_exact"] >= 0.9 * report["heldout_total"], report
    assert report["final_loss"] < 0.1, report
    aligner, metadata = load_align_model("en", model_dir=base)
    return aligner, metadata


def _compose(layout, vocab, lex, tail_s=0.5):
    """layout: [(onset_s, phrase)] → (audio, [(word, abs_onset, abs_end)])."""
    sr = 16000
    rendered = [render_chars(text, vocab, lex) for _, text in layout]
    end = max(
        onset + len(r[0]) / sr for (onset, _), r in zip(layout, rendered)
    )
    audio = np.zeros(int((end + tail_s) * sr), np.float32)
    words = []
    for (onset, text), (clip, onsets) in zip(layout, rendered):
        i = int(onset * sr)
        audio[i : i + len(clip)] += clip
        for w, t in onsets:
            dur = len(w) * CHAR_SECONDS + (len(w) - 1) * CHAR_GAP_SECONDS
            words.append((w, onset + t, onset + t + dur))
    return audio, words


def test_loads_as_real_weights(ctc_align):
    """The converted-checkpoint branch resolves — alignment is NOT skipped
    by the random-weights guard."""
    aligner, metadata = ctc_align
    assert metadata["random_weights"] is False
    assert metadata["type"] == "jax"
    assert "|" in metadata["dictionary"]


def test_align_recovers_word_onsets(ctc_align):
    """align() end to end on a held-out composition: every word's start
    within START_TOL of its true tone onset, scores well above chance."""
    from whisperx_tpu.alignment import align
    from whisperx_tpu.alignment.aligner import DEFAULT_EN_VOCAB

    aligner, metadata = ctc_align
    lex = char_lexicon(DEFAULT_EN_VOCAB)
    layout = [
        (0.37, PHRASES[0]),
        (3.11, PHRASES[2]),
        (6.84, PHRASES[5]),
    ]
    audio, gold = _compose(layout, DEFAULT_EN_VOCAB, lex)
    transcript = []
    for onset, text in layout:
        words = clean_words(text, DEFAULT_EN_VOCAB)
        dur = sum(
            len(w) * CHAR_SECONDS + (len(w) - 1) * CHAR_GAP_SECONDS
            for w in words
        ) + 0.16 * (len(words) - 1)
        # realistic whisper segment bounds: timestamp tokens land near
        # speech onset. The trellis' first char absorbs ALL leading
        # in-segment silence back to the segment start (reference
        # backtrack semantics, alignment.py:447-481), so a segment that
        # starts far before speech shifts the first word early by that
        # slack — an estimator property, not a model error.
        transcript.append(
            {
                "text": text,
                "start": max(0.0, onset - 0.05),
                "end": onset + dur + 0.1,
            }
        )

    result = align(transcript, aligner, metadata, audio, device="cpu")
    got = result["word_segments"]
    assert len(got) == len(gold), (got, gold)
    errs = []
    for w, (gw, gs, ge) in zip(got, gold):
        assert w["word"].strip(" .?").lower() == gw, (w, gw)
        errs.append(abs(w["start"] - gs))
        assert abs(w["start"] - gs) <= START_TOL, (w, gs)
        assert abs(w["end"] - ge) <= END_TOL, (w, ge)
        assert w["score"] >= 0.3, w
    # the aggregate must be frame-scale, not merely under the gate
    assert float(np.mean(errs)) <= 0.07, errs


def test_align_segment_fields(ctc_align):
    """Aligned segments carry interpolated sentence times + per-word lists
    (reference return-shape parity)."""
    from whisperx_tpu.alignment import align
    from whisperx_tpu.alignment.aligner import DEFAULT_EN_VOCAB

    aligner, metadata = ctc_align
    lex = char_lexicon(DEFAULT_EN_VOCAB)
    audio, gold = _compose([(0.5, PHRASES[1])], DEFAULT_EN_VOCAB, lex)
    transcript = [{"text": PHRASES[1], "start": 0.2, "end": len(audio) / 16000}]
    result = align(
        transcript,
        aligner,
        metadata,
        audio,
        device="cpu",
        return_char_alignments=True,
    )
    assert result["segments"], result
    seg = result["segments"][0]
    assert seg["words"] and seg["chars"]
    assert seg["start"] <= seg["words"][0]["start"]
    for w in seg["words"]:
        assert w["end"] > w["start"]

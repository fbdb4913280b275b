"""Speaker diarization + per-word speaker assignment.

Replaces reference whisperx/diarize.py (pyannote.audio dependency) with a
TPU/host hybrid: VAD speech regions → sliding embedding windows (JAX/mel on
device, neural embedding model when converted weights exist) → cosine AHC →
speaker turns. ``assign_word_speakers`` reproduces the reference's
max-summed-intersection rule (diarize.py:104-133) in plain numpy.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd

from whisperx_tpu.audio import SAMPLE_RATE, load_audio
from whisperx_tpu.diarize.clustering import agglomerative_cluster
from whisperx_tpu.diarize.embedding import SpectralEmbedding

WINDOW_S = 2.0
HOP_S = 0.5


class DiarizationPipeline:
    """API parity with reference DiarizationPipeline (diarize.py:11-83):
    callable returning a DataFrame with columns [segment, label, speaker,
    start, end] (+ optional embeddings dict)."""

    def __init__(
        self,
        model_name: Optional[str] = None,
        use_auth_token=None,
        device: str = "tpu",
        embedding_model=None,
        vad_model=None,
    ):
        self.model_name = model_name or "pyannote-tpu"
        if embedding_model is None:
            import os

            ckpt = os.environ.get("WHISPERX_TPU_SPEAKER_CKPT")
            if ckpt and os.path.isdir(ckpt):
                from whisperx_tpu.models.resnet_speaker.model import (
                    ResNetSpeakerEmbedding,
                )

                embedding_model = ResNetSpeakerEmbedding.from_checkpoint(ckpt)
            else:
                embedding_model = SpectralEmbedding()
        self.embedding = embedding_model
        if vad_model is None:
            from whisperx_tpu.vad import load_vad_model

            vad_model = load_vad_model("silero")
        self.vad_model = vad_model

    def __call__(
        self,
        audio: Union[str, np.ndarray],
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
        return_embeddings: bool = False,
    ):
        if isinstance(audio, str):
            audio = load_audio(audio)
        audio = np.asarray(audio, np.float32).reshape(-1)

        speech = self.vad_model({"waveform": audio, "sample_rate": SAMPLE_RATE})

        # sliding windows inside speech regions
        win = int(WINDOW_S * SAMPLE_RATE)
        hop = int(HOP_S * SAMPLE_RATE)
        windows = []  # (start_s, end_s, samples)
        for seg in speech:
            s = int(seg.start * SAMPLE_RATE)
            e = int(seg.end * SAMPLE_RATE)
            pos = s
            while pos < e:
                chunk = audio[pos : pos + win]
                if len(chunk) < win // 4:
                    break
                if len(chunk) < win:
                    chunk = np.pad(chunk, (0, win - len(chunk)))
                windows.append((pos / SAMPLE_RATE, min(e, pos + win) / SAMPLE_RATE, chunk))
                pos += hop

        if not windows:
            df = pd.DataFrame(columns=["segment", "label", "speaker", "start", "end"])
            return (df, None) if return_embeddings else df

        embeds = self.embedding.embed(np.stack([w[2] for w in windows]))
        labels = agglomerative_cluster(
            embeds,
            num_clusters=num_speakers,
            min_clusters=min_speakers or 1,
            max_clusters=max_speakers,
        )

        # windows → merged speaker turns
        turns = []
        for (start, end, _), lab in zip(windows, labels):
            name = f"SPEAKER_{lab:02d}"
            if turns and turns[-1][2] == name and start <= turns[-1][1] + HOP_S:
                turns[-1][1] = max(turns[-1][1], end)
            else:
                turns.append([start, end, name])

        rows = [
            {
                "segment": (s, e),
                "label": spk,
                "speaker": spk,
                "start": s,
                "end": e,
            }
            for s, e, spk in turns
        ]
        df = pd.DataFrame(rows)

        if return_embeddings:
            speaker_embeddings = {}
            for lab in sorted(set(labels.tolist())):
                name = f"SPEAKER_{lab:02d}"
                speaker_embeddings[name] = (
                    embeds[labels == lab].mean(axis=0).tolist()
                )
            return df, speaker_embeddings
        return df


def assign_word_speakers(
    diarize_df: pd.DataFrame,
    transcript_result: dict,
    speaker_embeddings: Optional[dict] = None,
    fill_nearest: bool = False,
) -> dict:
    """Attach ``speaker`` to segments and words by maximum summed time
    intersection with diarization turns (parity: reference diarize.py:86-139).
    """
    if len(diarize_df) == 0:
        return transcript_result
    starts = diarize_df["start"].to_numpy(np.float64)
    ends = diarize_df["end"].to_numpy(np.float64)
    speakers = diarize_df["speaker"].to_numpy()

    def best_speaker(t0: float, t1: float) -> Optional[str]:
        intersection = np.minimum(ends, t1) - np.maximum(starts, t0)
        if not fill_nearest:
            mask = intersection > 0
            if not mask.any():
                return None
            inter, spk = intersection[mask], speakers[mask]
        else:
            inter, spk = intersection, speakers
        totals = {}
        for s, v in zip(spk, inter):
            totals[s] = totals.get(s, 0.0) + float(v)
        return max(totals.items(), key=lambda kv: kv[1])[0]

    for seg in transcript_result["segments"]:
        speaker = best_speaker(seg["start"], seg["end"])
        if speaker is not None:
            seg["speaker"] = speaker
        for word in seg.get("words", []):
            if "start" in word:
                speaker = best_speaker(word["start"], word["end"])
                if speaker is not None:
                    word["speaker"] = speaker

    if speaker_embeddings is not None:
        transcript_result["speaker_embeddings"] = speaker_embeddings
    return transcript_result


class Segment:
    """Tiny start/end/speaker struct (parity: diarize.py:142-146)."""

    def __init__(self, start, end, speaker: Optional[str] = None):
        self.start = start
        self.end = end
        self.speaker = speaker


__all__ = [
    "DiarizationPipeline",
    "Segment",
    "SpectralEmbedding",
    "agglomerative_cluster",
    "assign_word_speakers",
]

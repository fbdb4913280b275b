"""Alignment model wrapper: batched wav2vec2 emissions + vocab dictionary.

Replaces reference load_align_model (alignment.py:77-110). Models load from
converted checkpoints (whisperx_tpu/convert/wav2vec2_hf.py); with none
available a random-weight model keeps the pipeline structurally functional
(hermetic test mode). Emission lengths are bucketed to powers of two so XLA
compiles a handful of programs instead of one per segment length.

Timing accuracy is proven end to end with MEANINGFUL weights in CI: a
micro wav2vec2-CTC trained online on a char-tone corpus with exact known
onsets (train/ctc_micro.py) loads through this module's converted-
checkpoint branch and ``align()`` recovers every held-out word onset
within ±0.09 s, mean error ≤3 frames (tests/test_ctc_learned.py — the
regime the "RANDOM weights" warning below used to be the only alternative
to).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.models.wav2vec2.model import (
    BASE_CONFIG,
    LARGE_XLSR_CONFIG,
    TEST_CONFIG,
    Wav2Vec2Config,
    forward,
    init_params,
)

# Registry of default per-language alignment models (conversion sources).
# Parity: reference alignment.py:31-74.
DEFAULT_ALIGN_MODELS_TORCH = {
    "en": "WAV2VEC2_ASR_BASE_960H",
    "fr": "VOXPOPULI_ASR_BASE_10K_FR",
    "de": "VOXPOPULI_ASR_BASE_10K_DE",
    "es": "VOXPOPULI_ASR_BASE_10K_ES",
    "it": "VOXPOPULI_ASR_BASE_10K_IT",
}

DEFAULT_ALIGN_MODELS_HF = {
    "ja": "jonatasgrosman/wav2vec2-large-xlsr-53-japanese",
    "zh": "jonatasgrosman/wav2vec2-large-xlsr-53-chinese-zh-cn",
    "nl": "jonatasgrosman/wav2vec2-large-xlsr-53-dutch",
    "uk": "Yehor/wav2vec2-xls-r-300m-uk-with-small-lm",
    "pt": "jonatasgrosman/wav2vec2-large-xlsr-53-portuguese",
    "ar": "jonatasgrosman/wav2vec2-large-xlsr-53-arabic",
    "cs": "comodoro/wav2vec2-xls-r-300m-cs-250",
    "ru": "jonatasgrosman/wav2vec2-large-xlsr-53-russian",
    "pl": "jonatasgrosman/wav2vec2-large-xlsr-53-polish",
    "hu": "jonatasgrosman/wav2vec2-large-xlsr-53-hungarian",
    "fi": "jonatasgrosman/wav2vec2-large-xlsr-53-finnish",
    "fa": "jonatasgrosman/wav2vec2-large-xlsr-53-persian",
    "el": "jonatasgrosman/wav2vec2-large-xlsr-53-greek",
    "tr": "mpoyraz/wav2vec2-xls-r-300m-cv7-turkish",
    "da": "saattrupdan/wav2vec2-xls-r-300m-ftspeech",
    "he": "imvladikon/wav2vec2-xls-r-300m-hebrew",
    "vi": "nguyenvulebinh/wav2vec2-base-vi",
    "ko": "kresnik/wav2vec2-large-xlsr-korean",
    "ur": "kingabzpro/wav2vec2-large-xls-r-300m-Urdu",
    "te": "anuragshas/wav2vec2-large-xlsr-53-telugu",
    "hi": "theainerd/Wav2Vec2-large-xlsr-hindi",
    "ca": "softcatala/wav2vec2-large-xlsr-catala",
    "ml": "gvs/wav2vec2-large-xlsr-malayalam",
    "no": "NbAiLab/nb-wav2vec2-1b-bokmaal-v2",
    "nn": "NbAiLab/nb-wav2vec2-1b-nynorsk",
    "sk": "comodoro/wav2vec2-xls-r-300m-sk-cv8",
    "sl": "anton-l/wav2vec2-large-xlsr-53-slovenian",
    "hr": "classla/wav2vec2-xls-r-parlaspeech-hr",
    "ro": "gigant/romanian-wav2vec2",
    "eu": "stefan-it/wav2vec2-large-xlsr-53-basque",
    "gl": "ifrz/wav2vec2-large-xlsr-galician",
    "ka": "xsway/wav2vec2-large-xlsr-georgian",
    "lv": "jimregan/wav2vec2-large-xlsr-latvian-cv",
    "tl": "Khalsuu/filipino-wav2vec2-l-xls-r-300m-official",
}

# wav2vec2 CTC character vocabulary (the published base-960h label set);
# used in hermetic mode and as the default for converted torchaudio bundles.
DEFAULT_EN_VOCAB = {
    "<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4,
    "e": 5, "t": 6, "a": 7, "o": 8, "n": 9, "i": 10, "h": 11, "s": 12,
    "r": 13, "d": 14, "l": 15, "u": 16, "m": 17, "w": 18, "c": 19, "f": 20,
    "g": 21, "y": 22, "p": 23, "b": 24, "v": 25, "k": 26, "'": 27, "x": 28,
    "j": 29, "q": 30, "z": 31,
}


class Wav2Vec2Aligner:
    """Callable producing CTC log-prob emissions for audio segments."""

    def __init__(
        self,
        params,
        config: Wav2Vec2Config,
        dictionary: Dict[str, int],
        language: str = "en",
        name: str = "wav2vec2",
    ):
        self.params = params
        self.config = config
        self.dictionary = dictionary
        self.language = language
        self.name = name
        self._jitted = jax.jit(lambda p, a: forward(p, config, a))

    @property
    def blank_id(self) -> int:
        for tok in ("<pad>", "[pad]"):
            if tok in self.dictionary:
                return self.dictionary[tok]
        return 0

    def emissions(self, audio: np.ndarray) -> np.ndarray:
        """[samples] or [B, samples] → log-prob emissions [B, T, V].

        Pads the sample axis up to the next power-of-two bucket (min 4096)
        to bound the number of XLA compilations across segment lengths.
        """
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        n = audio.shape[1]
        bucket = 4096
        while bucket < n:
            bucket *= 2
        padded = np.zeros((audio.shape[0], bucket), np.float32)
        padded[:, :n] = audio
        ems = np.asarray(self._jitted(self.params, jnp.asarray(padded)))
        # trim emissions to the frames corresponding to real samples
        from whisperx_tpu.models.wav2vec2.model import output_lengths

        t_real = output_lengths(self.config, max(n, 400))
        return ems[:, :t_real]

    def emissions_batch(self, waves) -> list:
        """Emissions for many variable-length segments with MINIMAL device
        calls: segments grouped by power-of-two length bucket, one batched
        forward per bucket, per-segment frame trim. (The reference ran one
        torch forward per segment — its own TODO at alignment.py:237.)"""
        from whisperx_tpu.models.wav2vec2.model import output_lengths

        results: list = [None] * len(waves)
        buckets: Dict[int, list] = {}
        for i, w in enumerate(waves):
            n = max(len(w), 400)
            bucket = 4096
            while bucket < n:
                bucket *= 2
            buckets.setdefault(bucket, []).append(i)

        for bucket, idxs in buckets.items():
            batch = np.zeros((len(idxs), bucket), np.float32)
            for row, i in enumerate(idxs):
                batch[row, : len(waves[i])] = waves[i]
            ems = np.asarray(self._jitted(self.params, jnp.asarray(batch)))
            for row, i in enumerate(idxs):
                t_real = output_lengths(self.config, max(len(waves[i]), 400))
                results[i] = ems[row, :t_real]
        return results


def load_align_model(
    language_code: str,
    device: str = "tpu",
    model_name: Optional[str] = None,
    model_dir: Optional[str] = None,
):
    """Returns (aligner, metadata) — metadata parity with reference:
    {"language", "dictionary", "type"}."""
    if model_name is None:
        if language_code in DEFAULT_ALIGN_MODELS_TORCH:
            model_name = DEFAULT_ALIGN_MODELS_TORCH[language_code]
        elif language_code in DEFAULT_ALIGN_MODELS_HF:
            model_name = DEFAULT_ALIGN_MODELS_HF[language_code]
        else:
            raise ValueError(
                f"No default align-model for language: {language_code}. "
                "Convert a wav2vec2 checkpoint and pass --align_model."
            )

    search_dirs = [
        model_dir,
        os.environ.get("WHISPERX_TPU_ALIGN_DIR"),
        os.path.expanduser("~/.cache/whisperx_tpu/align"),
    ]
    ckpt_path = None
    for d in search_dirs:
        if not d:
            continue
        candidate = os.path.join(d, model_name.replace("/", "__"))
        if os.path.isdir(candidate):
            ckpt_path = candidate
            break
        candidate = os.path.join(d, language_code)
        if os.path.isdir(candidate):
            ckpt_path = candidate
            break

    if ckpt_path is not None:
        from whisperx_tpu.convert.checkpoint import load_checkpoint

        params, cfg_json = load_checkpoint(ckpt_path)
        config = Wav2Vec2Config(**cfg_json["config"])
        dictionary = {k.lower(): v for k, v in cfg_json["dictionary"].items()}
        aligner = Wav2Vec2Aligner(
            params, config, dictionary, language=language_code, name=model_name
        )
    else:
        import warnings

        warnings.warn(
            f"No converted wav2vec2 checkpoint for {model_name!r}; using "
            "RANDOM weights (alignment output will be structurally valid "
            "but timings meaningless). Run whisperx_tpu.convert.",
            stacklevel=2,
        )
        config = TEST_CONFIG
        params = init_params(config, jax.random.PRNGKey(0))
        aligner = Wav2Vec2Aligner(
            params, config, dict(DEFAULT_EN_VOCAB), language=language_code,
            name=f"{model_name}-random",
        )

    metadata = {
        "language": language_code,
        "dictionary": aligner.dictionary,
        "type": "jax",
        # callers (CLI) skip alignment rather than emit garbage timings
        "random_weights": aligner.name.endswith("-random"),
    }
    return aligner, metadata

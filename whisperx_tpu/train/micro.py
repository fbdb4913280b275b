"""CI-trainable micro-Whisper: learned weights with zero egress.

Every end-to-end run of this framework previously used random weights,
which never emit EOT — so natural stopping, ragged per-row batch lengths,
no-speech windows, and the quality gates in a non-degenerate regime were
only ever unit-tested with synthetic token arrays. This module closes that
gap (reference bar: the gold-WER loop at reference accuracy_test.py:50-58
and the batch decoder's all-rows-finished early exit at reference
mlx_whisper_batch_decoder.py:357-358) by TRAINING a micro-Whisper, in
minutes on one CPU core, to transcribe a synthetic tone-coded corpus:

  - each lexicon word is rendered as a pure tone at a word-specific
    frequency (plus word gaps), so a clip's mel spectrogram deterministically
    encodes its transcript and its time extent;
  - the decoder (token/pos embeddings, self/cross attention, MLPs — the
    parts that drive EOT, timestamps and the no-speech logit) is trained by
    teacher forcing against full Whisper target sequences
    ``sot lang task <|t0|> text <|t1|> eot``, noise clips against
    ``sot <|nospeech|> eot``;
  - the encoder stays at its random initialization and is used as a frozen
    featurizer (a random conv+attention stack maps distinct narrowband
    inputs to distinct features — a reservoir). Freezing it lets training
    precompute encoder features ONCE and fit the decoder in seconds, while
    the saved checkpoint still contains the full model: at inference the
    REAL encoder_forward runs inside the production ``_decode_jit``.

The result is a loadable checkpoint (convert/checkpoint.py format) whose
pipeline runs exercise learned logits end to end: rows finish at different
steps via real EOT, silent windows score high no-speech probability, and
``tools/accuracy_test.py`` reports WER 0.0 against the corpus transcript.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from whisperx_tpu.audio.constants import N_SAMPLES, SAMPLE_RATE

# ---------------------------------------------------------------------------
# Tone-coded corpus
# ---------------------------------------------------------------------------

# Default phrase set: every token round-trips through the recovered partial
# vocabulary (assets/gold_vocab_en.json) and none is in the standard
# suppress list, so decoded text is byte-exact against these strings.
PHRASES: Tuple[str, ...] = (
    " Hello world.",
    " The quick brown fox.",
    " This is a test.",
    " Thank you very much.",
    " See you tomorrow.",
    " How are you today?",
    " The weather is nice.",
    " We are almost done.",
)

TONE_SECONDS = 0.28
GAP_SECONDS = 0.07
_PRECISION = 0.02  # whisper timestamp grid


def _lexicon(phrases: Sequence[str]) -> Dict[str, float]:
    """word -> tone frequency (Hz), log-spaced well inside the mel range."""
    words = sorted({w for p in phrases for w in _words(p)})
    lo, hi = 320.0, 3800.0
    n = max(len(words), 2)
    return {
        w: lo * (hi / lo) ** (i / (n - 1)) for i, w in enumerate(words)
    }


def _words(text: str) -> List[str]:
    return [
        "".join(ch for ch in w.lower() if ch.isalpha())
        for w in text.split()
        if any(ch.isalpha() for ch in w)
    ]


def phrase_duration(text: str) -> float:
    n = len(_words(text))
    return n * TONE_SECONDS + max(0, n - 1) * GAP_SECONDS


def render_phrase(
    text: str,
    lexicon: Optional[Dict[str, float]] = None,
    lead_s: float = 0.0,
    sr: int = SAMPLE_RATE,
) -> np.ndarray:
    """Render a phrase as its tone code, preceded by ``lead_s`` of silence."""
    if lexicon is None:
        lexicon = _lexicon(PHRASES)
    tone_n = int(TONE_SECONDS * sr)
    gap_n = int(GAP_SECONDS * sr)
    ramp = np.minimum(np.arange(tone_n) / (0.01 * sr), 1.0)
    ramp = np.minimum(ramp, ramp[::-1]).astype(np.float32)  # de-click
    parts = [np.zeros(int(lead_s * sr), np.float32)]
    for i, w in enumerate(_words(text)):
        t = np.arange(tone_n) / sr
        tone = 0.35 * np.sin(2 * math.pi * lexicon[w] * t).astype(np.float32)
        parts.append(tone * ramp)
        parts.append(np.zeros(gap_n, np.float32))
    parts = parts[:-1] if len(parts) > 1 else parts
    return np.concatenate(parts)


@dataclasses.dataclass
class Example:
    audio: np.ndarray  # padded to N_SAMPLES
    events: List[Tuple[float, str]]  # (onset_s, text) per phrase; [] = noise
    is_noise: bool = False

    @property
    def text(self) -> str:
        return "".join(t for _, t in self.events)


def compose_file(
    events: Sequence[Tuple[float, str]], lex=None, tail_s: float = 1.0
) -> np.ndarray:
    """Arbitrary-length recording with phrases at the given onsets."""
    if lex is None:
        lex = _lexicon(PHRASES)
    end = max(t + phrase_duration(x) for t, x in events) + tail_s
    a = np.zeros(int(end * SAMPLE_RATE), np.float32)
    for onset, text in events:
        r = render_phrase(text, lex)
        i = int(onset * SAMPLE_RATE)
        a[i : i + len(r)] += r
    return a


DEFAULT_CHUNK_SIZE = 8.0  # seconds; pass the same value to transcribe()


def build_files(
    phrases: Sequence[str] = PHRASES,
    n_files: int = 12,
    seed: int = 0,
) -> List[Tuple[np.ndarray, List[Tuple[float, str]]]]:
    """Synthetic recordings: every phrase once per file, shuffled order,
    continuously-varying gaps — so across files each phrase occurs at many
    onsets and both 'more speech follows' and 'window ends here' contexts
    are populated."""
    lex = _lexicon(phrases)
    rng = np.random.default_rng(seed)
    files = []
    for _ in range(n_files):
        t = 0.8 + 0.6 * float(rng.random())
        events: List[Tuple[float, str]] = []
        for pi in rng.permutation(len(phrases)):
            text = phrases[int(pi)]
            events.append((round(t, 2), text))
            t += phrase_duration(text) + 0.9 + 1.4 * float(rng.random())
        files.append((compose_file(events, lex), events))
    return files


def chunk_examples(
    files: Sequence[Tuple[np.ndarray, List[Tuple[float, str]]]],
    chunk_size: float = DEFAULT_CHUNK_SIZE,
) -> List[Example]:
    """Slice files into decode windows with the PRODUCT chunker.

    Training windows are produced by the same energy VAD + ``merge_chunks``
    the batched pipeline runs (asr.py::_segment_with_vad), so the model
    trains on exactly the chunk geometry inference will hand it — VAD
    boundary jitter, merged multi-phrase windows, chunk-relative onsets and
    all. (Hand-built windows measurably fail here: the pipeline's chunks
    start ~0.05 s before the first tone, not at a designed lead.)
    """
    from whisperx_tpu.vad import load_vad_model, merge_chunks

    vad_model = load_vad_model("energy")
    onset = getattr(vad_model, "vad_onset", 0.5)
    offset = getattr(vad_model, "vad_offset", 0.363)
    out: List[Example] = []
    for audio, events in files:
        segs = vad_model(
            {"waveform": audio, "sample_rate": SAMPLE_RATE},
            max_speech_duration_s=chunk_size,
        )
        for ch in merge_chunks(segs, chunk_size, onset=onset, offset=offset):
            s = int(ch["start"] * SAMPLE_RATE)
            e = min(int(ch["end"] * SAMPLE_RATE), len(audio))
            seg = audio[s : min(e, s + N_SAMPLES)]
            seg = np.pad(seg, (0, N_SAMPLES - len(seg)))
            # clamp at 0: an event admitted up to 0.05 s before the chunk
            # start would otherwise produce a NEGATIVE onset, and
            # timestamp_begin - 2 is <|nospeech|> — a corrupted target the
            # inference-time timestamp rules can never reproduce
            rel = [
                (max(0.0, round(t - s / SAMPLE_RATE, 4)), x)
                for t, x in events
                if ch["start"] - 0.05 <= t < ch["end"]
            ]
            if rel:
                out.append(Example(seg, rel))
    return out


def build_corpus(
    phrases: Sequence[str] = PHRASES,
    n_files: int = 12,
    chunk_size: float = DEFAULT_CHUNK_SIZE,
    n_noise: int = 2,
    seed: int = 0,
) -> List[Example]:
    """VAD-chunked multi-phrase windows plus noise clips.

    The batched product path VAD-segments the audio and ``merge_chunks``
    PACKS adjacent speech regions into windows (the whisperx batching
    strategy) — so a decode window routinely holds several phrases
    separated by silence and the model must emit the full multi-segment
    timestamp transcript ``<|t0|> p1 <|t1|><|t2|> p2 <|t3|> … eot``.
    Noise clips train the no-speech head (VAD never forwards silence to
    the batched decode; the no-speech probability is exercised by direct
    ``decode()``).
    """
    rng = np.random.default_rng(seed + 1)
    out = chunk_examples(build_files(phrases, n_files, seed), chunk_size)
    for _ in range(n_noise):
        a = (0.006 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
        out.append(Example(a, [], is_noise=True))
    return out


def target_tokens(tokenizer, ex: Example) -> List[int]:
    """Full Whisper training target for one example."""
    if ex.is_noise:
        return [tokenizer.sot, tokenizer.no_speech, tokenizer.eot]
    seq = list(tokenizer.sot_sequence)
    for onset, text in ex.events:
        ts0 = tokenizer.timestamp_begin + round(onset / _PRECISION)
        ts1 = tokenizer.timestamp_begin + round(
            (onset + phrase_duration(text)) / _PRECISION
        )
        seq += [ts0] + tokenizer.encode(text) + [ts1]
    return seq + [tokenizer.eot]


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def train_micro(
    model_name: str = "test-nano",
    phrases: Sequence[str] = PHRASES,
    steps: int = 600,
    full_steps: int = 40,
    lr: float = 7e-3,
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[dict, object, dict]:
    """Overfit the decoder on the tone corpus. Returns (params, dims, report).

    ``params`` is the FULL model pytree (frozen random encoder + trained
    decoder) in float32, ready for ``save_micro_checkpoint``.

    Two frozen-featurizer tricks keep a CI run under ~2 minutes on one CPU
    core without changing what the checkpoint can do at inference:

      - the cross-attention KEY/VALUE projections stay at their random init
        alongside the encoder, so the per-layer cross-KV tensors are
        precomputed once for the whole fixed corpus instead of re-projected
        [B, 1500, d] every step (the trained query learns to address the
        random keys — the information is a fixed random rotation away);
      - phase 1 (``steps``) trains cross-entropy over only the ~10² token
        ids that appear in targets — the expensive [*, d, 51865] logits
        matmul shrinks ~400×; phase 2 (``full_steps``) fine-tunes with the
        FULL-vocabulary softmax so every untrained token's logit is pushed
        below the learned ones (argmax at inference runs over all 51865).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from whisperx_tpu.audio.mel import log_mel_batch
    from whisperx_tpu.decoding.tokenizer import get_tokenizer
    from whisperx_tpu.models.whisper import get_dims
    from whisperx_tpu.models.whisper.model import (
        KVCache,
        decoder_forward,
        encoder_forward,
        init_params,
        precompute_cross_kv,
    )

    dims = get_dims(model_name)
    tokenizer = get_tokenizer(
        dims.is_multilingual,
        num_languages=dims.num_languages,
        language="en",
        task="transcribe",
    )
    corpus = build_corpus(phrases, seed=seed)

    params = init_params(dims, jax.random.PRNGKey(seed), dtype=jnp.float32)

    # Features + cross-KV once: encoder AND cross K/V projections are
    # frozen, so neither changes across steps. [L][B, 1500, H, Dh] float32.
    mels = log_mel_batch(np.stack([ex.audio for ex in corpus]), dims.n_mels)
    feats = jax.jit(encoder_forward, static_argnames=("n_head",))(
        params, mels, dims.n_audio_head
    )
    cross_k, cross_v = jax.jit(
        precompute_cross_kv, static_argnames=("n_head",)
    )(params, feats, dims.n_text_head)
    cross_k = jax.device_get(cross_k)
    cross_v = jax.device_get(cross_v)
    del feats

    seqs = [target_tokens(tokenizer, ex) for ex in corpus]
    t_max = max(len(s) for s in seqs)
    tokens = np.full((len(seqs), t_max), tokenizer.eot, np.int32)
    # mask[i, j] = 1 where position j+1 is a real target of sequence i
    mask = np.zeros((len(seqs), t_max - 1), np.float32)
    for i, s in enumerate(seqs):
        tokens[i, : len(s)] = s
        mask[i, : len(s) - 1] = 1.0

    # phase-1 active vocabulary: every id that appears in any target
    active = np.asarray(sorted({t for s in seqs for t in s}), np.int32)
    remap = np.zeros(int(active.max()) + 1, np.int32)
    remap[active] = np.arange(len(active), dtype=np.int32)
    tgt_small = remap[tokens[:, 1:]]

    # phase 2 sees EVERY row: fine-tuning the full-vocab softmax on a
    # stop-biased subset (rows whose targets end right after the first end
    # timestamp) re-biases that position toward EOT and the model stops
    # after the first phrase of a merged window — measured, not
    # hypothetical
    sub = np.arange(len(corpus), dtype=np.int64)

    cross_k = tuple(jnp.asarray(x) for x in cross_k)
    cross_v = tuple(jnp.asarray(x) for x in cross_v)
    cross_k_sub = tuple(x[sub] for x in cross_k)
    cross_v_sub = tuple(x[sub] for x in cross_v)
    tokens_j = jnp.asarray(tokens)
    mask_j = jnp.asarray(mask)
    tgt_small_j = jnp.asarray(tgt_small)
    active_j = jnp.asarray(active)
    remap_j = jnp.asarray(remap)

    n_head = dims.n_text_head
    dh = dims.n_text_state // n_head

    def _logits(decoder_params, tokens, ck, cv):
        """Production decoder stack, teacher-forced over the whole target."""
        p = {"decoder": decoder_params}
        b, t = tokens.shape
        zeros = tuple(
            jnp.zeros((b, t, n_head, dh), jnp.float32)
            for _ in range(dims.n_text_layer)
        )
        cache = KVCache(zeros, zeros, ck, cv)
        logits, _, _ = decoder_forward(p, tokens, cache, jnp.int32(0), n_head)
        return logits

    def _ce(logits, tgt, mask):
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return (nll * mask).sum() / mask.sum()

    def loss_active(dec_small, tokens, tgt_small, mask):
        # phase 1 trains a COMPACT [n_active, d] embedding in place of the
        # full [51865, d] table: the restricted logits matmul is ~400×
        # smaller, and (measured) Adam's moment updates + the gather
        # gradient scatter over 3.3M embedding params were dominating the
        # step. Inputs are full-vocab ids re-embedded via the remapped ids.
        logits = _logits(dec_small, remap_j[tokens], cross_k, cross_v)
        return _ce(logits, tgt_small, mask)

    def loss_full(decoder_params, tokens, mask):
        return _ce(
            _logits(decoder_params, tokens, cross_k_sub, cross_v_sub),
            tokens[:, 1:],
            mask,
        )

    # warmup + cosine decay: full-batch overfitting tolerates a high peak
    # lr once past the noisy first steps, roughly halving the step count
    # a flat 3e-3 needed
    opt = optax.adam(
        optax.warmup_cosine_decay_schedule(
            init_value=lr / 20,
            peak_value=lr,
            warmup_steps=30,
            decay_steps=steps + full_steps,
            end_value=lr / 60,
        )
    )
    dec = params["decoder"]
    dec_small = {**dec, "tok_emb": dec["tok_emb"][active_j]}
    opt_state = opt.init(dec_small)

    @jax.jit
    def step_active(dec_small, opt_state, tokens, tgt_small, mask):
        loss, grads = jax.value_and_grad(loss_active)(
            dec_small, tokens, tgt_small, mask
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(dec_small, updates), opt_state, loss

    # phase 2 is a fine-tune: small constant lr, fresh moments — its job is
    # pushing the 51k untrained token logits down, not reshaping the
    # learned ordering (too high a lr here measurably undoes phase 1)
    opt_full = optax.adam(6e-4)

    @jax.jit
    def step_full(dec, opt_state, tokens, mask):
        loss, grads = jax.value_and_grad(loss_full)(dec, tokens, mask)
        updates, opt_state = opt_full.update(grads, opt_state)
        return optax.apply_updates(dec, updates), opt_state, loss

    loss = float("nan")
    for i in range(steps):
        dec_small, opt_state, loss = step_active(
            dec_small, opt_state, tokens_j, tgt_small_j, mask_j
        )
        if log_every and (i + 1) % log_every == 0:
            print(f"[active] step {i + 1}/{steps} loss {float(loss):.4f}")

    # scatter the trained active rows back into the full table, then
    # fine-tune with the full softmax so every untrained token's logit
    # lands below the learned ones (inference argmaxes over all 51865)
    dec = {
        **dec_small,
        "tok_emb": dec["tok_emb"].at[active_j].set(dec_small["tok_emb"]),
    }
    opt_state = opt_full.init(dec)
    tokens_sub = tokens_j[sub]
    mask_sub = mask_j[sub]
    for i in range(full_steps):
        dec, opt_state, loss = step_full(dec, opt_state, tokens_sub, mask_sub)
        if log_every and (i + 1) % log_every == 0:
            print(f"[full] step {i + 1}/{full_steps} loss {float(loss):.4f}")

    # Exactness certificate. Greedy decoding free-runs: it reproduces the
    # targets token-for-token IFF at EVERY teacher-forced target position
    # the target token wins the full-vocabulary argmax (then the generated
    # context never leaves the target path). Average loss cannot certify
    # that — a single sub-0.5-probability position flips one phrase, and
    # such flips were observed to depend on which XLA compile cache the
    # run hit. Train until the worst-position MARGIN (target logit minus
    # best competitor) clears a buffer that also absorbs bf16 inference
    # noise.
    @jax.jit
    def _margins(dec):
        logits = _logits(dec, tokens_j, cross_k, cross_v)[:, :-1]
        tgt = tokens_j[:, 1:]
        tgt_logit = jnp.take_along_axis(logits, tgt[..., None], -1)[..., 0]
        masked = logits.at[
            jnp.arange(tokens.shape[0])[:, None],
            jnp.arange(t_max - 1)[None, :],
            tgt,
        ].set(-jnp.inf)
        margin = tgt_logit - masked.max(-1)
        return jnp.where(mask_j > 0, margin, jnp.inf).min()

    target_margin = 2.0
    extra_rounds = 0
    min_margin = float(_margins(dec))
    opt_cert = optax.adam(1.5e-3)  # constant lr: no schedule restart spikes

    @jax.jit
    def step_cert(dec_small, opt_state, tokens, tgt_small, mask):
        loss, grads = jax.value_and_grad(loss_active)(
            dec_small, tokens, tgt_small, mask
        )
        updates, opt_state = opt_cert.update(grads, opt_state)
        return optax.apply_updates(dec_small, updates), opt_state, loss

    while min_margin < target_margin and extra_rounds < 6:
        extra_rounds += 1
        dec_small = {**dec, "tok_emb": dec["tok_emb"][active_j]}
        opt_state_a = opt_cert.init(dec_small)
        for _ in range(80):
            dec_small, opt_state_a, loss = step_cert(
                dec_small, opt_state_a, tokens_j, tgt_small_j, mask_j
            )
        dec = {
            **dec_small,
            "tok_emb": dec["tok_emb"].at[active_j].set(dec_small["tok_emb"]),
        }
        opt_state = opt_full.init(dec)
        for _ in range(15):
            dec, opt_state, loss = step_full(
                dec, opt_state, tokens_sub, mask_sub
            )
        min_margin = float(_margins(dec))
        if log_every:
            print(
                f"[certify] round {extra_rounds}: min margin "
                f"{min_margin:.2f} (target {target_margin})"
            )

    params["decoder"] = jax.device_get(dec)
    report = {
        "final_loss": float(loss),
        "steps": steps,
        "full_steps": full_steps,
        "examples": len(corpus),
        "t_max": t_max,
        "active_vocab": int(len(active)),
        "min_margin": round(min_margin, 3),
        "certify_rounds": extra_rounds,
    }
    return params, dims, report


def micro_checkpoint_cached(cache_root: Optional[str] = None) -> Tuple[str, dict]:
    """Train-once cache: the trained checkpoint keyed by a hash of this
    module's source (training is deterministic given the code — same idea
    as XLA's persistent compile cache, for the ~5-10 min CPU training).
    Returns (checkpoint_dir, train_report)."""
    import hashlib
    import json
    import os

    src = open(os.path.abspath(__file__), "rb").read()
    key = hashlib.sha256(src).hexdigest()[:16]
    root = cache_root or os.path.expanduser("~/.cache/whisperx_tpu")
    path = os.path.join(root, f"micro_ckpt_{key}")
    report_path = os.path.join(path, "train_report.json")
    if os.path.exists(os.path.join(path, "weights.npz")) and os.path.exists(
        report_path
    ):
        with open(report_path) as f:
            return path, json.load(f)
    params, dims, report = train_micro()
    save_micro_checkpoint(path, params, dims, report)
    with open(report_path, "w") as f:
        json.dump(report, f)
    return path, report


def save_micro_checkpoint(
    path: str, params, dims, report: Optional[dict] = None,
    alignment_heads=None,
) -> str:
    """Persist as a standard convert/checkpoint.py directory that
    ``whisperx_tpu.asr.load_model`` (and the CLI ``--model``) accepts.
    ``alignment_heads``: [(layer, head)] to pin for the DTW timing path
    (the attention-supervised trainer trains SPECIFIC heads)."""
    from whisperx_tpu.convert.checkpoint import save_checkpoint

    config = {
        "name": "micro-learned",
        "family": "whisper",
        "dims": dataclasses.asdict(dims),
        "alignment_heads": [list(x) for x in alignment_heads]
        if alignment_heads
        else None,
        "micro_train": report or {},
    }
    save_checkpoint(path, params, config)
    return path

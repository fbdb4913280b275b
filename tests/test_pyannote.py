"""PyanNet segmentation model + converter + pyannote-style VAD tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.models.pyannote.model import (
    TEST_CONFIG,
    PyanNetConfig,
    forward,
    init_params,
)
from whisperx_tpu.vad.pyannote_vad import PyannoteVAD


def test_pyannet_forward_shapes():
    params = init_params(TEST_CONFIG, jax.random.PRNGKey(0))
    audio = jnp.zeros((2, 16000), jnp.float32)
    out = forward(params, TEST_CONFIG, audio)
    assert out.ndim == 3 and out.shape[0] == 2
    assert out.shape[2] == TEST_CONFIG.num_classes
    # log-softmax rows: logsumexp == 0
    lse = np.asarray(jax.nn.logsumexp(out, axis=-1))
    np.testing.assert_allclose(lse, 0.0, atol=1e-4)


def test_pyannote_vad_weightless_fallback(speech_5s):
    vad = PyannoteVAD(vad_onset=0.5, vad_offset=0.363, chunk_size=30.0)
    audio = np.concatenate(
        [np.zeros(16000, np.float32), speech_5s, np.zeros(16000, np.float32)]
    )
    segs = vad({"waveform": audio, "sample_rate": 16000})
    assert segs, "pyannote VAD (energy scores) found no speech"
    assert all(0 <= s.start < s.end <= len(audio) / 16000 for s in segs)


def test_pyannote_vad_max_duration_mincut(speech_5s):
    long_audio = np.tile(speech_5s, 9)  # 45 s continuous-ish speech
    vad = PyannoteVAD(chunk_size=20.0)
    segs = vad({"waveform": long_audio, "sample_rate": 16000})
    assert all(s.end - s.start <= 20.5 for s in segs)


def test_sinc_filter_materialization():
    from whisperx_tpu.convert.pyannote import materialize_sinc_filters

    low = np.array([100.0, 300.0])
    band = np.array([100.0, 200.0])
    filt = materialize_sinc_filters(low, band, kernel_size=251)
    assert filt.shape == (251, 1, 2)
    # band-pass: frequency response peaks inside the band, ~0 at DC
    for i, (lo, hi) in enumerate([(150, 250), (350, 550)]):
        h = filt[:, 0, i]
        freqs = np.fft.rfftfreq(4096, d=1 / 16000)
        resp = np.abs(np.fft.rfft(h, n=4096))
        in_band = resp[(freqs > lo) & (freqs < hi)].mean()
        at_dc = resp[0]
        assert in_band > 10 * (at_dc + 1e-9)


def test_pyannote_converter_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    h, d_lin, n_cls = 16, 16, 3
    sd = {
        "sincnet.conv1d.0.low_hz_": t(8, 1),
        "sincnet.conv1d.0.band_hz_": t(8, 1),
        "sincnet.norm1d.0.weight": t(8),
        "sincnet.norm1d.0.bias": t(8),
        "sincnet.wav_norm1d.weight": t(1),
        "sincnet.wav_norm1d.bias": t(1),
        "sincnet.conv1d.1.weight": t(8, 8, 5),
        "sincnet.norm1d.1.weight": t(8),
        "sincnet.norm1d.1.bias": t(8),
        "sincnet.conv1d.2.weight": t(8, 8, 5),
        "sincnet.norm1d.2.weight": t(8),
        "sincnet.norm1d.2.bias": t(8),
        "lstm.weight_ih_l0": t(4 * h, 8),
        "lstm.weight_hh_l0": t(4 * h, h),
        "lstm.bias_ih_l0": t(4 * h),
        "lstm.bias_hh_l0": t(4 * h),
        "lstm.weight_ih_l0_reverse": t(4 * h, 8),
        "lstm.weight_hh_l0_reverse": t(4 * h, h),
        "lstm.bias_ih_l0_reverse": t(4 * h),
        "lstm.bias_hh_l0_reverse": t(4 * h),
        "linear.0.weight": t(d_lin, 2 * h),
        "linear.0.bias": t(d_lin),
        "classifier.weight": t(n_cls, d_lin),
        "classifier.bias": t(n_cls),
    }
    src = tmp_path / "pyannote"
    src.mkdir()
    torch.save({"state_dict": sd}, src / "pytorch_model.bin")

    from whisperx_tpu.convert.pyannote import convert_pyannote_segmentation

    out = str(tmp_path / "seg_out")
    convert_pyannote_segmentation(str(src), out)

    from whisperx_tpu.convert.checkpoint import load_checkpoint

    params, meta = load_checkpoint(out)
    cfg = PyanNetConfig(
        **{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in meta["config"].items()
        }
    )
    assert cfg.num_classes == n_cls
    scores = forward(params, cfg, jnp.zeros((1, 16000), jnp.float32))
    assert scores.shape[2] == n_cls
    assert bool(jnp.isfinite(scores).all())


def test_model_frame_scores_monotonic_aggregated(speech_5s):
    """Overlapping sliding windows must be AGGREGATED onto one monotonic
    frame grid before binarization (regression: per-window frames were
    concatenated, handing Binarize duplicated non-monotonic timestamps)."""
    params = init_params(TEST_CONFIG, jax.random.PRNGKey(0))
    vad = PyannoteVAD()
    vad._model = params
    vad._cfg = TEST_CONFIG
    audio = np.concatenate([speech_5s] * 6)  # 30 s → ~21 overlapping windows
    scores, times = vad._frame_scores(audio)
    assert len(scores) == len(times)
    assert (np.diff(times) > 0).all(), "timestamps must be strictly increasing"
    assert times[-1] <= len(audio) / 16000 + 0.5
    assert scores.min() >= 0.0 and scores.max() <= 1.0
    # and the full __call__ path produces ordered, in-range segments
    segs = vad({"waveform": audio})
    for s in segs:
        assert 0.0 <= s.start < s.end <= len(audio) / 16000 + 1e-6

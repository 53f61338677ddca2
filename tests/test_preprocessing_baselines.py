import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.data.preprocessing import (
    avg_pool_audio,
    candor_utterance_windows,
    downsample_mean,
    l2l_export_windows,
    load_melspec_features,
    mel_filterbank,
    melspectrogram,
    vico_process_clip,
)
from dyadic_interaction_modeling_tpu.metrics.baselines import (
    nn_motion_baseline,
    random_retrieval_baseline,
    score_baseline,
)
from dyadic_interaction_modeling_tpu.metrics.sentiment import (
    SentimentMLP,
    classify_clips,
    threshold_classifier,
    train_probe,
)


def test_downsample_mean_matches_reference_quirk():
    x = np.arange(100, dtype=np.float64)[:, None].repeat(3, 1)
    out = downsample_mean(x, 0.6)
    assert out.shape == (60, 3)
    # window = int(100/60) = 1 -> first 60 frames copied (tail dropped)
    np.testing.assert_allclose(out[:, 0], np.arange(60))
    x2 = np.arange(50, dtype=np.float64)[:, None]
    out2 = downsample_mean(x2, 0.6)  # new_t=30, window=1
    assert out2.shape == (30, 1)


def test_avg_pool_audio():
    x = np.arange(100, dtype=np.float64)[:, None].repeat(768, 1)
    out = avg_pool_audio(x, 10)
    assert out.shape == (10, 768)
    np.testing.assert_allclose(out[0, 0], np.mean(np.arange(10)))


def test_melspectrogram_against_librosa_semantics():
    """No librosa in-image: check structural properties + parseval sanity."""
    sr = 16000
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    s = melspectrogram(wave, sr)
    assert s.shape[0] == 128  # n_mels
    # ~1s at 10ms hop -> ~100 frames
    assert 95 <= s.shape[1] <= 105
    # energy concentrated near 440 Hz: peak mel bin should be in the low range
    peak_bin = int(np.argmax(s.sum(axis=1)))
    fb = mel_filterbank(sr, 512)
    freqs = np.linspace(0, sr / 2, fb.shape[1])
    center = freqs[np.argmax(fb[peak_bin])]
    assert 300 < center < 650, center


def test_load_melspec_features_resize():
    wave = np.random.RandomState(0).randn(16000).astype(np.float32)
    out = load_melspec_features(wave, num_frames=30)
    assert out.shape == (128, 120)  # 4x frame rate


def test_candor_utterance_windows():
    rng = np.random.RandomState(0)
    audio = rng.randn(500, 768)  # 10 s at 50 fps
    video = {s: {str(i).zfill(6): rng.randn(56) for i in range(60)}
             for s in ("A", "B")}
    rows = [("utt1", "A", 0.2, 2.0), ("utt2", "B", 2.0, 4.0)]
    out = candor_utterance_windows(rows, audio, video)
    assert set(out) == {"utt1", "utt2"}
    u = out["utt1"]
    assert u["speaker"]["video"].shape == (9, 56)   # frames 1..9
    assert u["speaker"]["audio"].shape == (9, 768)
    assert u["listener"]["video"].shape == (9, 56)  # shifted +1 frame


def test_vico_process_clip():
    rng = np.random.RandomState(0)
    clip = vico_process_clip(rng.randn(100, 768), rng.randn(70, 56), rng.randn(65, 56))
    assert clip["audio"].shape == clip["video_speaker"].shape[:1] + (768,)
    n = clip["audio"].shape[0]
    assert n == min(60, 70, 65)


def test_l2l_export_windows():
    rng = np.random.RandomState(0)
    v_s = rng.randn(200, 56)
    v_l = rng.randn(200, 56)
    wave = rng.randn(16000 * 4).astype(np.float32)
    out = l2l_export_windows(v_s, v_l, wave, "clipX")
    # 200 // 64 = 3 segments, minus the last -> 2 windows
    assert len(out["speak_faces"]) == 2
    assert out["speak_faces"][0].shape == (64, 56)
    assert out["speak_audio"][0].shape == (256, 128)


def test_baselines_and_scoring():
    rng = np.random.default_rng(0)
    train_l = [rng.standard_normal((64, 56)) for _ in range(6)]
    train_s = [rng.standard_normal((64, 56)) for _ in range(6)]
    test_s = [rng.standard_normal((64, 56)) for _ in range(4)]
    test_l = [rng.standard_normal((64, 56)) for _ in range(4)]
    ids = ["a", "a", "b", "b"]
    pred, gt, x = random_retrieval_baseline(train_l, test_s, test_l, ids, rng)
    assert len(pred) == 2  # grouped by clip id
    scores = score_baseline(gt, pred)
    assert np.isfinite(scores["fid_exp"]) and np.isfinite(scores["fid_pose"])
    pred2, gt2, x2 = nn_motion_baseline(train_s, train_l, test_s, test_l, ids)
    assert len(pred2) == 2


def test_sentiment_probe_and_thresholds():
    rng = np.random.default_rng(0)
    # three separable gaussian blobs
    frames = np.concatenate([rng.normal(i * 3.0, 0.3, (200, 56)) for i in range(3)])
    labels = np.repeat(np.arange(3), 200)
    model, state = train_probe(frames, labels, epochs=20, lr=1e-3, batch_size=64)
    import jax, jax.numpy as jnp

    logits = model.apply(state["params"], jnp.asarray(frames))
    acc = float((np.asarray(logits).argmax(-1) == labels).mean())
    assert acc > 0.9, acc
    probs = np.array([[0.5, 0.4, 0.1], [0.3, 0.69, 0.01], [0.2, 0.75, 0.05]])
    np.testing.assert_array_equal(threshold_classifier(probs), [2, 1, 2])
    clips = [frames[:200], frames[200:400]]
    preds = classify_clips(model, state["params"], clips)
    assert preds.shape == (2,)

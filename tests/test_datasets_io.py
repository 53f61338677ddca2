"""Exercise the real on-disk dataset readers with generated fixture files
matching the reference's formats (pickles, CSVs, .pth segments, wav/npy)."""

import os
import pickle
import wave

import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.data.datasets import (
    BiwiDataset,
    BiwiEmocaDataset,
    CandorDataset,
    LmListenerDataset,
    ViCoDataset,
    ViCoListenerDataset,
    candor_split,
)


def _write_pickle(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def _vico_fixture(tmp_path, n=3):
    rng = np.random.RandomState(0)
    data_dir = tmp_path / "vico"
    rows = []
    for i in range(n):
        uid = f"clip{i}"
        t = 20 + i
        _write_pickle(str(data_dir / f"{uid}.pkl"), {
            "video_speaker": rng.randn(t, 56).astype(np.float32),
            "video_listener": rng.randn(t, 56).astype(np.float32),
            "audio": rng.randn(t, 768).astype(np.float32),
        })
        # columns: sentiment, uid, listener_file, speaker_file, listener_id,
        # speaker_id, split   (indices 0,1,2,3,4,5,6 as the reference reads)
        rows.append(["neutral", uid, f"l{i}", f"s{i}", i, i + 1,
                     "train" if i < n - 1 else "test"])
    import pandas as pd

    meta = tmp_path / "RLD_data.csv"
    pd.DataFrame(rows, columns=["sentiment", "uid", "lf", "sf", "lid", "sid",
                                "split"]).to_csv(meta, index=False)
    return str(data_dir), str(meta)


def test_vico_datasets_from_files(tmp_path):
    data_dir, meta = _vico_fixture(tmp_path)
    ds = ViCoDataset(data_dir, meta, "train")
    assert len(ds) == 2
    combined, listener, path, sp, li, sent = ds[0]
    assert combined.shape[1] == 56 + 768
    # speaker video replaced by ones (reference quirk, data_loader.py:147)
    np.testing.assert_array_equal(combined[:, :56], 1.0)
    assert sent == 0
    dsl = ViCoListenerDataset(data_dir, meta, "test")
    assert len(dsl) == 1
    motion, p = dsl[0]
    assert motion.shape[1] == 56


def test_candor_split_and_dataset(tmp_path):
    rng = np.random.RandomState(1)
    sp_root = tmp_path / "speaker"
    li_root = tmp_path / "listener"
    for conv in ("aaa", "bbb", "ccc"):
        for utt in range(2):
            t = 30
            _write_pickle(str(sp_root / f"{conv}_{utt}.pkl"), {
                "video": rng.randn(t, 56).astype(np.float32),
                "audio": rng.randn(t, 768).astype(np.float32)})
            _write_pickle(str(li_root / f"{conv}_{utt}.pkl"), {
                "video": rng.randn(t, 56).astype(np.float32)})
    train, val = candor_split(str(sp_root), str(li_root))
    assert len(train) + len(val) == 6
    ds = CandorDataset(train or val)
    combined, listener, _, _, _, _ = ds[0]
    assert combined.shape == (30, 824) and listener.shape == (30, 56)


def test_lm_listener_dataset_with_hubert(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    items = []
    for i, t in enumerate((30, 40)):
        items.append({
            "p0_exp": rng.randn(t, 50).astype(np.float32),
            "p0_pose": rng.randn(t, 6).astype(np.float32),
            "p1_exp": rng.randn(t, 50).astype(np.float32),
            "p1_pose": rng.randn(t, 6).astype(np.float32),
            "hubert_feat": rng.randn(t * 2, 768).astype(np.float32),
            "split_start_time": 0.0, "split_end_time": float(t),
            "fname": f"seg{i}",
        })
    torch.save(items, str(tmp_path / "segments_train.pth"))
    ds = LmListenerDataset(str(tmp_path), "train")
    assert len(ds) == 2
    combined, listener, fname = ds[0]
    assert combined.shape == (30, 56 + 768)  # hubert interpolated to motion len
    assert listener.shape == (30, 56)


def _write_wav(path, n_samples=16000, sr=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    samples = (np.sin(np.linspace(0, 100, n_samples)) * 20000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())


def test_biwi_read_data_from_files(tmp_path):
    rng = np.random.RandomState(3)
    root = tmp_path / "BIWI"
    n_v = 50
    templates = {"F2": rng.randn(n_v, 3).astype(np.float32)}
    os.makedirs(root, exist_ok=True)
    with open(root / "templates.pkl", "wb") as f:
        pickle.dump(templates, f)
    for sent in (1, 33, 37):  # train / val / test sentence ids
        name = f"F2_{sent:02d}"
        _write_wav(str(root / "wav" / f"{name}.wav"), 8000)
        os.makedirs(root / "vertices_npy", exist_ok=True)
        np.save(str(root / "vertices_npy" / f"{name}.npy"),
                rng.randn(10, n_v * 3).astype(np.float32))
    train, val, test, subjects = BiwiDataset.read_data(
        str(root), "wav", "vertices_npy", "templates.pkl", "BIWI",
        "F2 F3", "F2", "F2", read_audio=True)
    assert len(train) == 1 and len(val) == 1 and len(test) == 1
    assert train[0]["audio"].shape == (8000,)
    ds = BiwiDataset(train, subjects["train"], "train", read_audio=True)
    audio, vertice, template, one_hot, name = ds[0]
    assert vertice.shape == (10, 150) and template.shape == (150,)

    # BiwiEmocaDataset with precomputed features
    items = [dict(train[0], emoca=rng.randn(10, 56).astype(np.float32),
                  audio=rng.randn(25, 768).astype(np.float32))]
    eds = BiwiEmocaDataset(items)
    a, v, t, e, n = eds[0]
    assert a.shape == (10, 768)  # interpolated to vertex frames
    assert e.shape == (10, 56)

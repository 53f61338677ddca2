"""Datasets (L1) - readers for the reference's on-disk formats.

Parity targets (``/root/reference/code/dataset/data_loader.py``):

* ``ViCoDataset``           (:108-152) - per-clip pickle with keys
  ``video_speaker`` / ``video_listener`` / ``audio``; speaker video REPLACED
  BY ONES (quirk at :147); sentiment + speaker/listener ids from RLD_data.csv;
  clips filtered to 5 <= len <= 1024 with aligned modalities.
* ``ViCoSpeaker/ListenerDataset`` (:154-206) - single-stream variants.
* ``Candor*Dataset``        (:44-106)  - pickle-per-utterance speaker/listener
  pairs, split 95/5 by conversation id with random.seed(42) (:357-387).
* ``LmListenerDataset``     (:208-245) - ``segments_{mode}.pth`` with
  p0/p1 pose+exp, zero audio, >=24-frame filter, 1024-frame chunking.
* BIWI ``Dataset``          (:14-42) + ``read_data`` (:247-307) - wav/vertices
  pairs, subject templates, sentence-id splits.

Everything returns numpy (the framework is torch-free on the data path);
torch is used only to unpickle ``.pth`` files the reference produced.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

SENTIMENT2IDX = {"neutral": 0, "positive": 1, "negative": 2}


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


class ViCoDataset:
    """Dyadic ViCo clips: (combined speaker feats, listener motion, meta)."""

    def __init__(self, data_path: str, meta_data_path: str, mode: str = "train",
                 min_len: int = 5, max_len: int = 1024):
        import pandas as pd

        meta = pd.read_csv(meta_data_path).values
        data_ids = [meta[i, 1] for i in range(len(meta)) if meta[i, 6] == mode]
        self.paths: List[str] = []
        for did in data_ids:
            p = os.path.join(data_path, f"{did}.pkl")
            if not os.path.exists(p):
                continue
            d = _load_pickle(p)
            if (len(d["video_speaker"]) == len(d["audio"]) == len(d["video_listener"])
                    and max_len >= len(d["video_speaker"]) >= min_len):
                self.paths.append(p)
        print(f"Loaded {len(self.paths)} data points for {mode}")
        self.id2speaker = {meta[i, 1]: meta[i, 5] for i in range(len(meta))}
        self.id2listener = {meta[i, 1]: meta[i, 4] for i in range(len(meta))}
        self.id2sentiment = {meta[i, 1]: SENTIMENT2IDX[meta[i, 0]]
                             for i in range(len(meta))}

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int):
        p = self.paths[index]
        d = _load_pickle(p)
        uid = os.path.basename(p).split(".")[0]
        video_speaker = np.asarray(d["video_speaker"], dtype=np.float32)
        # reference quirk: speaker video zeroed out via ones_like (:147)
        video_speaker = np.ones_like(video_speaker)
        audio = np.asarray(d["audio"], dtype=np.float32)
        combined = np.concatenate([video_speaker, audio], axis=1)
        listener = np.asarray(d["video_listener"], dtype=np.float32)
        return (combined, listener, p, self.id2speaker[uid],
                self.id2listener[uid], self.id2sentiment[uid])


class _SingleStreamViCo:
    key: str = "video_listener"

    def __init__(self, data_path: str, meta_data_path: str, mode: str = "train",
                 min_len: int = 5, max_len: int = 1024):
        import pandas as pd

        meta = pd.read_csv(meta_data_path).values
        data_ids = [meta[i, 1] for i in range(len(meta)) if meta[i, 6] == mode]
        self.paths = []
        for did in data_ids:
            p = os.path.join(data_path, f"{did}.pkl")
            if not os.path.exists(p):
                continue
            d = _load_pickle(p)
            if (len(d["video_speaker"]) == len(d["audio"]) == len(d["video_listener"])
                    and max_len >= len(d["video_speaker"]) >= min_len):
                self.paths.append(p)
        print(f"Loaded {len(self.paths)} data points for {mode}")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int):
        d = _load_pickle(self.paths[index])
        return np.asarray(d[self.key], dtype=np.float32), self.paths[index]


class ViCoListenerDataset(_SingleStreamViCo):
    key = "video_listener"


class ViCoSpeakerDataset(_SingleStreamViCo):
    key = "video_speaker"


def candor_split(speaker_root: str, listener_root: str,
                 min_len: int = 5, max_len: int = 250,
                 train_frac: float = 0.95, seed: int = 42):
    """95/5 split by conversation id with random.seed(42)
    (data_loader.py:357-387)."""
    all_data = sorted(os.listdir(speaker_root))
    unique_ids = list(set(f.split("_")[0] for f in all_data))
    rng = random.Random(seed)
    rng.shuffle(unique_ids)
    train_ids = set(unique_ids[: int(len(unique_ids) * train_frac)])
    train, val = [], []
    for fid in all_data:
        sp = os.path.join(speaker_root, fid)
        lp = os.path.join(listener_root, fid)
        if not os.path.exists(lp):
            continue
        ds = _load_pickle(sp)
        dl = _load_pickle(lp)
        if not (min_len <= len(ds["video"]) <= max_len) or \
                len(ds["audio"]) != len(ds["video"]) or \
                len(ds["video"]) != len(dl["video"]):
            continue
        (train if fid.split("_")[0] in train_ids else val).append((sp, lp))
    return train, val


class CandorDataset:
    """Dyadic CANDOR utterances (data_loader.py:83-106)."""

    def __init__(self, pairs: Sequence[Tuple[str, str]]):
        self.pairs = list(pairs)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index: int):
        sp, lp = self.pairs[index]
        ds = _load_pickle(sp)
        dl = _load_pickle(lp)
        combined = np.concatenate(
            [np.asarray(ds["video"], dtype=np.float32),
             np.asarray(ds["audio"], dtype=np.float32)], axis=1)
        listener = np.asarray(dl["video"], dtype=np.float32)
        # the speaker path identifies the clip (used as the collate `name`:
        # eval data_ids + the engine's per-clip VQ token cache)
        return combined, listener, sp, 0, 0, 0


class CandorListenerDataset:
    def __init__(self, paths: Sequence[str]):
        self.paths = list(paths)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int):
        d = _load_pickle(self.paths[index])
        return np.asarray(d["video"], dtype=np.float32), self.paths[index]


class CandorSpeakerDataset(CandorListenerDataset):
    pass


def _interp_to_length(array: np.ndarray, new_t: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=True) over time
    (l2l.py:23-29 / biwi.py:37-43 ``downsample_mean``)."""
    t = array.shape[0]
    if t == new_t:
        return np.asarray(array, np.float32)
    pos = np.linspace(0.0, t - 1.0, new_t)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, t - 1)
    w = (pos - lo)[:, None]
    return (array[lo] * (1 - w) + array[hi] * w).astype(np.float32)


class LmListenerDataset:
    """LM-Listener segments (data_loader.py:208-245 + l2l.py:31-76):
    pose+exp concat, precomputed ``hubert_feat`` audio (interpolated to the
    motion length) or zero 768-d audio, clips >= 24 frames, 1024-frame
    chunking."""

    def __init__(self, data_path: str, mode: str = "train", chunk: int = 1024,
                 use_hubert: bool = True):
        import torch

        payload = torch.load(os.path.join(data_path, f"segments_{mode}.pth"),
                             map_location="cpu", weights_only=False)
        self.data = []
        for item in payload:
            if use_hubert and "hubert_feat" in item:
                s, e = item.get("split_start_time"), item.get("split_end_time")
                if s is not None and s == e:
                    continue  # l2l.py:41-43
                item = dict(item)
                item["hubert_feat"] = _interp_to_length(
                    np.asarray(item["hubert_feat"]), len(item["p0_exp"]))
            if len(item["p0_exp"]) != len(item["p1_exp"]) or len(item["p0_exp"]) < 24:
                continue
            if len(item["p0_exp"]) < chunk:
                self.data.append(item)
            else:
                n = len(item["p0_exp"]) // chunk
                keys = ("p0_exp", "p1_exp", "p0_pose", "p1_pose") + (
                    ("hubert_feat",) if "hubert_feat" in item else ())
                for j in range(n):
                    self.data.append({
                        k: item[k][j * chunk: (j + 1) * chunk] for k in keys
                    } | {"fname": item["fname"]})

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int):
        it = self.data[index]
        sp = np.concatenate([np.asarray(it["p1_pose"], np.float32),
                             np.asarray(it["p1_exp"], np.float32)], axis=1)
        li = np.concatenate([np.asarray(it["p0_pose"], np.float32),
                             np.asarray(it["p0_exp"], np.float32)], axis=1)
        if "hubert_feat" in it:
            audio = np.asarray(it["hubert_feat"], np.float32)
        else:
            audio = np.zeros((sp.shape[0], 768), dtype=np.float32)
        combined = np.concatenate([sp, audio], axis=1)
        return combined, li, it["fname"]


class BiwiEmocaDataset:
    """BIWI speaker items (reference ``dataset/biwi.py:45-66``): audio features
    linearly interpolated to the vertex-frame count, raw vertices, template,
    EMOCA coefficients, name. Items carry precomputed 768-d audio features;
    ``read_biwi_emoca_data`` below builds them from a raw BIWI tree with
    on-the-fly HuBERT extraction (``models.hubert.make_hubert_extractor``)."""

    def __init__(self, items: Sequence[Dict], data_type: str = "train",
                 read_audio: bool = True):
        self.items = list(items)
        self.data_type = data_type
        self.read_audio = read_audio

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int):
        d = self.items[index]
        vertice = np.asarray(d["vertice"], np.float32)
        template = np.asarray(d["template"], np.float32)
        emoca = np.asarray(d["emoca"], np.float32)
        if self.read_audio:
            audio = _interp_to_length(np.asarray(d["audio"]), vertice.shape[0])
            return audio, vertice, template, emoca, d["name"]
        return vertice, template, emoca, d["name"]


BIWI_SPLITS = {
    "vocaset": {"train": range(1, 41), "val": range(21, 41), "test": range(21, 41)},
    "BIWI": {"train": range(1, 33), "val": range(33, 37), "test": range(37, 41)},
}

# the speaker-pipeline reader's split table differs from data_loader.py's:
# val == test == sentences 37-40 (reference biwi.py:151-152)
BIWI_EMOCA_SPLITS = {
    "vocaset": {"train": range(1, 41), "val": range(21, 41), "test": range(21, 41)},
    "BIWI": {"train": range(1, 33), "val": range(37, 41), "test": range(37, 41)},
}

BIWI_EMOCA_TRAIN_SUBJECTS = "F2 F3 F4 M3 M4 M5"
BIWI_EMOCA_TEST_SUBJECTS = "F1 F5 F6 F7 F8 M1 M2 M6"


def read_biwi_emoca_data(data_root: str, hubert_extractor=None, *,
                         wav_path: str = "wav",
                         vertices_path: str = "vertices_npy",
                         template_file: str = "templates.pkl",
                         emoca_dir: str = "emoca_biwi",
                         dataset: str = "BIWI",
                         train_subjects: str = BIWI_EMOCA_TRAIN_SUBJECTS,
                         val_subjects: str = BIWI_EMOCA_TRAIN_SUBJECTS,
                         test_subjects: str = BIWI_EMOCA_TEST_SUBJECTS):
    """Walk a raw BIWI tree into speaker-pipeline item lists with on-the-fly
    768-d audio feature extraction (reference ``biwi.py:69-166`` read_data).

    Per wav clip: 16 kHz waveform -> ``hubert_extractor`` features (the
    reference runs s3prl HuBERT inside the loader, biwi.py:83-113; build one
    with ``models.hubert.make_hubert_extractor``), template from
    ``templates.pkl``, raw vertices from ``vertices_npy``, EMOCA pose+exp
    concatenated per sorted frame from ``emoca_biwi/{clip}.pkl``
    (biwi.py:127-137). Any per-clip failure skips the clip (the reference's
    corrupt-sample strategy, biwi.py:104-141). ``hubert_extractor=None``
    mirrors ``read_audio=False`` (VQ training skips audio, biwi.py:15).

    Returns ``(train, valid, test, subjects_dict)`` item lists consumable by
    ``BiwiEmocaDataset`` (audio is interpolated to the vertex count there,
    matching biwi.py:37-52).
    """
    audio_dir = os.path.join(data_root, wav_path)
    vert_dir = os.path.join(data_root, vertices_path)
    emoca_root = os.path.join(data_root, emoca_dir)
    with open(os.path.join(data_root, template_file), "rb") as f:
        templates = pickle.load(f, encoding="latin1")
    data: Dict[str, Dict] = {}
    for r, _, fs in os.walk(audio_dir):
        for fname in sorted(fs):
            if not fname.endswith("wav"):
                continue
            try:
                key = fname.replace("wav", "npy")
                vert_path = os.path.join(vert_dir, key)
                if not os.path.exists(vert_path):
                    continue
                audio = None
                if hubert_extractor is not None:
                    audio = np.asarray(hubert_extractor(
                        _load_wav_16k(os.path.join(r, fname))), np.float32)
                subject_id = "_".join(key.split("_")[:-1])
                vertice = np.load(vert_path, allow_pickle=True)
                if dataset == "vocaset":
                    vertice = vertice[::2, :]  # memory limit (biwi.py:125)
                with open(os.path.join(emoca_root,
                                       fname.split(".")[0] + ".pkl"), "rb") as f:
                    emoca_data = pickle.load(f)
                emoca = np.array([
                    np.concatenate([emoca_data[frame]["pose"],
                                    emoca_data[frame]["exp"]])
                    for frame in sorted(emoca_data.keys())])
                data[key] = {
                    "name": fname,
                    "audio": audio,
                    "template": np.asarray(templates[subject_id]).reshape(-1),
                    "vertice": vertice,
                    "emoca": emoca,
                }
            except Exception:  # noqa: BLE001 - corrupt-sample skip
                continue
    subjects = {
        "train": train_subjects.split(" "),
        "val": val_subjects.split(" "),
        "test": test_subjects.split(" "),
    }
    splits = BIWI_EMOCA_SPLITS[dataset]
    out = {"train": [], "val": [], "test": []}
    for k, v in data.items():
        subject_id = "_".join(k.split("_")[:-1])
        sentence_id = int(k.split(".")[0][-2:])
        for part in ("train", "val", "test"):
            if subject_id in subjects[part] and sentence_id in splits[part]:
                out[part].append(v)
    return out["train"], out["val"], out["test"], subjects


class BiwiDataset:
    """BIWI vertices + templates (+ optional raw audio) (data_loader.py:14-42).

    Items: (vertice (L, 70110), template (70110,), one_hot, name) with
    optional audio as leading element, mirroring ``Dataset.__getitem__``.
    """

    def __init__(self, items: Sequence[Dict], train_subjects: Sequence[str],
                 data_type: str = "train", read_audio: bool = False):
        self.items = list(items)
        self.train_subjects = list(train_subjects)
        self.data_type = data_type
        self.read_audio = read_audio
        self.one_hot_labels = np.eye(len(self.train_subjects), dtype=np.float32)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int):
        d = self.items[index]
        name = d["name"]
        vertice = np.asarray(d["vertice"], dtype=np.float32)
        template = np.asarray(d["template"], dtype=np.float32)
        if self.data_type == "train":
            subject = "_".join(name.split("_")[:-1])
            one_hot = self.one_hot_labels[self.train_subjects.index(subject)]
        else:
            one_hot = self.one_hot_labels
        if self.read_audio:
            return (np.asarray(d["audio"], dtype=np.float32), vertice, template,
                    one_hot, name)
        return vertice, template, one_hot, name

    @classmethod
    def read_data(cls, data_root: str, wav_path: str, vertices_path: str,
                  template_file: str, dataset: str, train_subjects: str,
                  val_subjects: str, test_subjects: str, read_audio: bool = False):
        """Walk the BIWI layout and build train/val/test item lists
        (data_loader.py:247-307)."""
        audio_dir = os.path.join(data_root, wav_path)
        vert_dir = os.path.join(data_root, vertices_path)
        with open(os.path.join(data_root, template_file), "rb") as f:
            templates = pickle.load(f, encoding="latin1")
        data: Dict[str, Dict] = {}
        for r, _, fs in os.walk(audio_dir):
            for fname in fs:
                if not fname.endswith("wav"):
                    continue
                key = fname.replace("wav", "npy")
                vert_path = os.path.join(vert_dir, key)
                if not os.path.exists(vert_path):
                    continue
                subject_id = "_".join(key.split("_")[:-1])
                vertice = np.load(vert_path, allow_pickle=True)
                if dataset == "vocaset":
                    vertice = vertice[::2, :]
                entry = {
                    "name": fname,
                    "template": np.asarray(templates[subject_id]).reshape(-1),
                    "vertice": vertice,
                    "audio": None,
                }
                if read_audio:
                    # the reference feeds librosa audio through the HF
                    # Wav2Vec2Processor (per-utterance zero-mean/unit-var,
                    # data_loader.py:257,269) before the conv extractor
                    from ..models.wav2vec2 import processor_normalize

                    entry["audio"] = processor_normalize(
                        _load_wav_16k(os.path.join(r, fname)))
                data[key] = entry
        subjects = {
            "train": train_subjects.split(" "),
            "val": val_subjects.split(" "),
            "test": test_subjects.split(" "),
        }
        splits = BIWI_SPLITS[dataset]
        out = {"train": [], "val": [], "test": []}
        for k, v in data.items():
            subject_id = "_".join(k.split("_")[:-1])
            sentence_id = int(k.split(".")[0][-2:])
            for part in ("train", "val", "test"):
                if subject_id in subjects[part] and sentence_id in splits[part]:
                    out[part].append(v)
        return out["train"], out["val"], out["test"], subjects


def _load_wav_16k(path: str) -> np.ndarray:
    """16 kHz mono waveform. librosa is unavailable in this image; uses
    soundfile if present, else the stdlib wave reader (16-bit PCM only)."""
    try:
        import soundfile as sf

        data, sr = sf.read(path, dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
    except ImportError:
        import wave

        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            raw = w.readframes(w.getnframes())
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            if w.getnchannels() > 1:
                data = data.reshape(-1, w.getnchannels()).mean(axis=1)
    if sr != 16000:
        n_out = int(len(data) * 16000 / sr)
        data = np.interp(np.linspace(0, len(data) - 1, n_out),
                         np.arange(len(data)), data).astype(np.float32)
    return data

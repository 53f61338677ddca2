"""HuBERT audio features (L1/L2).

The reference extracts 768-d HuBERT features on the fly with s3prl (+ an
IEMOCAP-finetuned checkpoint) for the BIWI pipeline
(``/root/reference/code/dataset/biwi.py:83-113``) and consumes precomputed
``hubert_feat`` arrays for LM-Listener (``code/dataset/l2l.py:31-76``).

HuBERT-base shares the wav2vec2-base trunk (conv feature extractor +
post-norm transformer); here it is the same flax ``Wav2Vec2Model`` with
HuBERT weights imported from an s3prl/fairseq/HF state_dict. The ubiquitous
50 fps -> motion-frame alignment (torch ``F.interpolate(mode='linear',
align_corners=True)``, biwi.py:37-43) is ``interpolate_to_length``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .wav2vec2 import W2VConfig, Wav2Vec2Model, hf_wav2vec2_to_flax, linear_interpolation

Array = jax.Array


def hubert_base_config() -> W2VConfig:
    """HuBERT-base trunk == wav2vec2-base trunk dimensions."""
    return W2VConfig()


class HubertModel(Wav2Vec2Model):
    """Alias module: HuBERT-base forward is the wav2vec2 trunk."""


def interpolate_to_length(features: Array, new_t: int) -> Array:
    """(T, C) or (B, T, C) -> length ``new_t`` via linear align_corners
    interpolation (biwi.py:37-43 / l2l.py:23-29 ``downsample_mean``)."""
    squeeze = features.ndim == 2
    if squeeze:
        features = features[None]
    out = linear_interpolation(features, 1, 1, output_len=new_t)
    return out[0] if squeeze else out


def hf_hubert_to_flax(state_dict: Mapping[str, Any], cfg: Optional[W2VConfig] = None
                      ) -> Dict:
    """HF ``HubertModel`` / s3prl upstream state_dict -> flax params.

    HF HuBERT lacks wav2vec2's masked_spec_embed-adjacent fields under the
    same names; keys are normalised first.
    """
    cfg = cfg or hubert_base_config()
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("hubert.", "").replace("upstream.model.", "")
        sd[k] = v
    if "masked_spec_embed" not in sd:
        import numpy as _np

        sd["masked_spec_embed"] = _np.zeros((cfg.hidden_size,), _np.float32)
    return hf_wav2vec2_to_flax(sd, cfg)


def extract_hubert_features(model: Wav2Vec2Model, params, waveform: np.ndarray,
                            target_frames: Optional[int] = None) -> np.ndarray:
    """waveform (samples,) 16 kHz -> (T', 768) features, optionally linearly
    interpolated to ``target_frames`` (the biwi.py on-the-fly path)."""
    feats = model.apply(params, jnp.asarray(waveform, jnp.float32)[None],
                        "none")  # no dataset-specific trimming
    feats = feats[0]
    if target_frames is not None:
        feats = interpolate_to_length(feats, target_frames)
    return np.asarray(feats)

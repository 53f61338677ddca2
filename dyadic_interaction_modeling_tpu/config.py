"""Configuration system (L0).

Behavioral parity with the reference config layer
(``/root/reference/code/base/config.py``):

* YAML files are organised in sections (DATA / NETWORK / VQuantizer / TRAIN /
  Distributed / TEST); sections are flattened one level so every leaf key is a
  top-level attribute (reference ``load_cfg_from_cfg_file``, config.py:60-73).
* CLI overrides are trailing ``KEY VALUE`` pairs; values are coerced with
  ``ast.literal_eval`` falling back to string (reference ``merge_cfg_from_list``
  + ``_decode_cfg_value``, config.py:76-117) and type-checked against the
  existing value with list<->tuple casts allowed
  (``_check_and_coerce_cfg_value_type``, config.py:120-159).

On top of the reference semantics we add typed default bundles for each model
family so configs work standalone (the reference hard-codes many dims inside
model constructors, e.g. seq2seq_pretrain.py:116-129).
"""

from __future__ import annotations

import copy
import os
from ast import literal_eval
from typing import Any, Dict, List, Optional


class CfgNode(dict):
    """Dict with attribute access; nested dicts become nested ``CfgNode``."""

    def __init__(self, init_dict: Optional[Dict[str, Any]] = None):
        init_dict = {} if init_dict is None else dict(init_dict)
        for k, v in init_dict.items():
            if isinstance(v, dict):
                init_dict[k] = CfgNode(v)
        super().__init__(init_dict)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_or(self, name: str, default: Any) -> Any:
        """Return ``self[name]`` if present and not None, else ``default``."""
        v = self.get(name)
        return default if v is None else v

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __str__(self) -> str:
        lines = []
        for k, v in sorted(self.items()):
            sep = "\n" if isinstance(v, CfgNode) else " "
            lines.append(f"{k}:{sep}{v}")
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({super().__repr__()})"


def load_cfg_from_cfg_file(file: str) -> CfgNode:
    """Load a sectioned YAML config, flattening sections one level."""
    import yaml

    if not (os.path.isfile(file) and (file.endswith(".yaml") or file.endswith(".yml"))):
        raise ValueError(f"{file} is not a yaml file")
    with open(file, "r") as f:
        cfg_from_file = yaml.safe_load(f) or {}

    cfg: Dict[str, Any] = {}
    for key, section in cfg_from_file.items():
        if isinstance(section, dict):
            cfg.update(section)
        else:
            cfg[key] = section
    return CfgNode(cfg)


def _decode_cfg_value(v: Any) -> Any:
    if not isinstance(v, str):
        return v
    try:
        return literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def _check_and_coerce_cfg_value_type(replacement, original, key, full_key):
    original_type = type(original)
    replacement_type = type(replacement)
    if replacement_type == original_type or original is None:
        return replacement
    casts = [(tuple, list), (list, tuple), (int, float)]
    for from_type, to_type in casts:
        if replacement_type is from_type and original_type is to_type:
            return to_type(replacement)
    raise ValueError(
        f"Type mismatch ({original_type} vs. {replacement_type}) with values "
        f"({original} vs. {replacement}) for config key: {full_key}"
    )


def merge_cfg_from_list(cfg: CfgNode, cfg_list: List[str]) -> CfgNode:
    """Merge trailing ``KEY VALUE`` CLI pairs into a copy of ``cfg``."""
    new_cfg = cfg.clone()
    if len(cfg_list) % 2 != 0:
        raise ValueError(f"Override list must have even length: {cfg_list}")
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        subkey = full_key.split(".")[-1]
        if subkey not in cfg:
            raise KeyError(f"Non-existent config key: {full_key}")
        value = _decode_cfg_value(v)
        value = _check_and_coerce_cfg_value_type(value, cfg[subkey], subkey, full_key)
        setattr(new_cfg, subkey, value)
    return new_cfg


class StaticCfg:
    """Immutable, hashable attribute-access view of a config mapping.

    flax module fields that are plain dicts get converted to FrozenDict
    (losing attribute access); fields of this type pass through untouched.
    Lists are converted to tuples so the object is hashable, which flax
    requires for module equality.
    """

    __slots__ = ("_items", "_map")

    def __init__(self, mapping):
        if isinstance(mapping, StaticCfg):
            mapping = dict(mapping._map)
        items = []
        for k, v in dict(mapping).items():
            if isinstance(v, list):
                v = tuple(v)
            elif isinstance(v, dict):
                v = StaticCfg(v)
            items.append((k, v))
        items.sort(key=lambda kv: kv[0])
        object.__setattr__(self, "_items", tuple(items))
        object.__setattr__(self, "_map", dict(items))

    @classmethod
    def wrap(cls, mapping) -> "StaticCfg":
        return mapping if isinstance(mapping, cls) else cls(mapping)

    def __getattr__(self, name):
        try:
            return self._map[name]
        except KeyError:
            raise AttributeError(name) from None

    def __getitem__(self, name):
        return self._map[name]

    def __contains__(self, name):
        return name in self._map

    def get(self, name, default=None):
        return self._map.get(name, default)

    def get_or(self, name, default):
        v = self._map.get(name)
        return default if v is None else v

    def __setattr__(self, name, value):
        raise AttributeError("StaticCfg is immutable")

    def __hash__(self):
        return hash(self._items)

    def __eq__(self, other):
        return isinstance(other, StaticCfg) and self._items == other._items

    def __repr__(self):
        return f"StaticCfg({dict(self._items)!r})"

    def to_cfg(self) -> "CfgNode":
        return CfgNode({k: (list(v) if isinstance(v, tuple) else v) for k, v in self._items})

    def replace(self, **kwargs) -> "StaticCfg":
        d = dict(self._map)
        d.update(kwargs)
        return StaticCfg(d)


# ---------------------------------------------------------------------------
# Typed default bundles.
#
# The reference ships two YAMLs (config.yaml / config_speaker.yaml) and
# hard-codes the SLM-family hyperparameters inside the model constructors
# (seq2seq_pretrain.py:116-129,369-386; seq2seq.py:177-188). We expose them all
# as explicit defaults so the framework is usable without the original files.
# ---------------------------------------------------------------------------

def vq_listener_defaults() -> CfgNode:
    """Listener / generic VQ-VAE (reference code/config.yaml)."""
    return CfgNode(dict(
        # NETWORK (config.yaml:15-25)
        arch="stage1_BIWI",
        in_dim=56,
        hidden_size=384,
        num_hidden_layers=6,
        num_attention_heads=8,
        intermediate_size=1536,
        quant_factor=0,
        face_quan_num=1,
        neg=0.2,
        INaffine=False,
        # VQuantizer (config.yaml:28-30)
        n_embed=512,
        zquant_dim=128,
        # LOSS
        quant_loss_weight=1.0,
        # TRAIN (subset used by engines)
        base_lr=1e-4,
        batch_size=1,
        batch_size_val=1,
        epochs=40,
        weight_decay=0.002,
        manual_seed=131,
        # dtype policy for TPU
        dtype="float32",
    ))


def vq_speaker_defaults() -> CfgNode:
    """Audio-visual speaker VQ-VAE (reference code/config_speaker.yaml).

    in_dim = 56 motion + 768 audio = 824; 8 codes per frame.
    """
    cfg = vq_listener_defaults()
    cfg.arch = "stage1_speaker_BIWI"
    cfg.in_dim = 824
    cfg.hidden_size = 768
    cfg.face_quan_num = 8
    cfg.epochs = 100
    return cfg


def slm_defaults() -> CfgNode:
    """SLM / SLMFT / SpeakerSLMFT transformer dims (seq2seq_pretrain.py:116-133)."""
    return CfgNode(dict(
        dim_in=56,
        dim=384,
        dim_audio=768,
        enc_depth=4,
        enc_heads=12,
        enc_max_seq_len=2048,
        dec_depth=4,
        dec_heads=12,
        dec_max_seq_len=2048,
        # per-head width of every encoder/decoder attention. 64 matches the
        # reference's x-transformers default (checkpoint-compatible); on TPU
        # the 128-wide MXU lane makes heads=6 x attn_dim_head=128 1.57x
        # faster on the joint pass at identical FLOPs (PERF.md round-5 shape
        # experiment) - a from-scratch training knob, not a parity one.
        attn_dim_head=64,
        # grouped-query attention: K/V heads per attention (0 = heads, the
        # reference's multi-head layout). The decode loop is element-rate
        # limited on KV-cache reads (PERF.md), so kv_heads divides decode
        # cache traffic heads/kv_heads-fold - a from-scratch TPU serving
        # knob, not a parity one (fewer K/V projection params).
        attn_kv_heads=0,
        num_tokens=512,
        mask_ratio=0.15,
        contrastive_temp=0.05,
        epochs=10,
        dtype="float32",
    ))


def listener_generator_defaults() -> CfgNode:
    """Non-pretrained seq2seq ListenerGenerator dims (seq2seq.py:177-192)."""
    return CfgNode(dict(
        dim=512,
        enc_depth=6,
        enc_heads=8,
        enc_max_seq_len=1024,
        dec_num_tokens=512,
        dec_depth=6,
        dec_heads=8,
        dec_max_seq_len=1024,
        num_identities=100,
        id_embed_dim=256,
        epochs=10,
        dtype="float32",
    ))


def codetalker_defaults() -> CfgNode:
    """Stage-2 CodeTalker (reference code/models/stage2.py + BIWI config)."""
    cfg = vq_listener_defaults()
    cfg.update(dict(
        arch="stage2",
        dataset="BIWI",
        feature_dim=1024,
        vertice_dim=70110,
        # the stage-2 VQ is the vertex autoencoder: its motion dim IS the
        # mesh dim (CodeTalker BIWI stage-1; the 56-d in_dim inherited from
        # the EMOCA VQ defaults would break decode + template addition)
        in_dim=70110,
        n_head=4,
        num_layers=6,
        period=25,
        train_subjects="F2 F3 F4 M3 M4 M5",
        motion_weight=1.0,
        reg_weight=1.0,
    ))
    return cfg

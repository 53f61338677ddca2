"""PIRender FaceGenerator checkpoint interchange: torch <-> flax.

The reference renders with a pretrained PIRender generator loaded from a
torch checkpoint (``/root/reference/code/Pirender/trainers/base.py`` loads
``net_G``/``net_G_ema`` state_dicts; inference uses the EMA weights). This
module maps that exact layout (``face_model.py`` module naming) onto our
``render.generator.FaceGenerator`` param tree and back, so

* a reference user's released/trained renderer runs on TPU unchanged, and
* a TPU-trained renderer can be handed back to the torch pipeline.

Strict key accounting (the HuBERT-importer standard): every state_dict key
must be consumed or the import raises; the exporter emits a state_dict the
reference module loads with ``strict=True`` (pinned against the ACTUAL
reference ``generators/face_model.py`` in tests/test_render_import.py).

Layout conversions:

* Conv2d ``(O, I, kh, kw)`` -> flax ``(kh, kw, I, O)``;
* Conv1d ``(O, I, k)`` -> ``(k, I, O)``;
* ConvTranspose2d ``(I, O, kh, kw)`` -> ``(kh, kw, I, O)`` with BOTH spatial
  axes flipped - torch's transposed conv convolves (flips), flax's
  ``ConvTranspose`` correlates (verified empirically in the tests; the
  matching explicit padding lives in ``generator.ADAINDecoderBlock``);
* Linear ``(O, I)`` -> ``(I, O)``; LayerNorm2d ``(C, 1, 1)`` -> ``(C,)``.

``use_spect=True`` checkpoints store ``weight_orig``/``weight_u``/
``weight_v`` per spectral-normed conv; the importer resolves them to the
EFFECTIVE weight (``W / u^T W v``) for inference parity. (Resuming spectral
-norm TRAINING from a torch checkpoint would additionally need the power-
iteration vectors mapped into flax's ``batch_stats``; the shipped configs
train with use_spect=False, face.yaml.)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


class _Reader:
    """state_dict view with strict consumption accounting."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = dict(sd)
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing key in FaceGenerator state_dict: {key}")
        self.used.add(key)
        return _np(self.sd[key])

    def weight(self, prefix: str) -> np.ndarray:
        """Effective conv/linear weight at ``prefix`` (resolving torch
        spectral-norm triplets when present)."""
        if f"{prefix}.weight" in self.sd:
            return self.take(f"{prefix}.weight")
        w = self.take(f"{prefix}.weight_orig")
        u = self.take(f"{prefix}.weight_u")
        v = self.take(f"{prefix}.weight_v")
        sigma = float(u @ w.reshape(w.shape[0], -1) @ v)
        return w / sigma

    def finish(self):
        left = sorted(set(self.sd) - self.used)
        if left:
            raise KeyError("unconsumed FaceGenerator state_dict keys "
                           f"({len(left)}): {left[:8]} ...")


def _conv2d(r: _Reader, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": r.weight(prefix).transpose(2, 3, 1, 0),
            "bias": r.take(f"{prefix}.bias")}


def _convT2d(r: _Reader, prefix: str) -> Dict[str, np.ndarray]:
    w = r.weight(prefix).transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w),
            "bias": r.take(f"{prefix}.bias")}


def _conv1d(r: _Reader, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": r.weight(prefix).transpose(2, 1, 0),
            "bias": r.take(f"{prefix}.bias")}


def _linear(r: _Reader, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": r.weight(prefix).T,
            "bias": r.take(f"{prefix}.bias")}


def _ln2d(r: _Reader, prefix: str) -> Dict[str, np.ndarray]:
    return {"weight": r.take(f"{prefix}.weight").reshape(-1),
            "bias": r.take(f"{prefix}.bias").reshape(-1)}


def _adain(r: _Reader, prefix: str) -> Dict[str, Any]:
    return {"mlp_shared": _linear(r, f"{prefix}.mlp_shared.0"),
            "mlp_gamma": _linear(r, f"{prefix}.mlp_gamma"),
            "mlp_beta": _linear(r, f"{prefix}.mlp_beta")}


def torch_face_generator_to_flax(
        state_dict: Mapping[str, Any], *, mapping_layers: int = 3,
        encoder_layers: int = 5, decoder_layers: int = 3,
        editing_layers: int = 3, num_res_blocks: int = 2
) -> Dict[str, Any]:
    """Reference ``FaceGenerator().state_dict()`` -> our param tree
    (wrap as ``{"params": ...}`` for ``FaceGenerator.apply``)."""
    r = _Reader(state_dict)

    mapping: Dict[str, Any] = {
        "pre": _conv1d(r, "mapping_net.pre"),
        "first": _conv1d(r, "mapping_net.first.0"),
    }
    for i in range(mapping_layers):
        # Sequential(nonlinearity, conv) -> index 1 (face_model.py:52-54)
        mapping[f"encoder{i}"] = _conv1d(r, f"mapping_net.encoder{i}.1")

    hg = "warpping_net.hourglass"
    hourglass: Dict[str, Any] = {
        "input_layer": _conv2d(r, f"{hg}.encoder.input_layer")}
    for i in range(encoder_layers):
        p = f"{hg}.encoder.encoder{i}"
        hourglass[f"encoder{i}"] = {
            "norm_0": _adain(r, f"{p}.norm_0"),
            "norm_1": _adain(r, f"{p}.norm_1"),
            "conv_0": _conv2d(r, f"{p}.conv_0"),
            "conv_1": _conv2d(r, f"{p}.conv_1")}
    for i in range(encoder_layers - decoder_layers, encoder_layers):
        p = f"{hg}.decoder.decoder{i}"
        hourglass[f"decoder{i}"] = {
            "norm_s": _adain(r, f"{p}.norm_s"),
            "norm_0": _adain(r, f"{p}.norm_0"),
            "norm_1": _adain(r, f"{p}.norm_1"),
            "conv_s": _convT2d(r, f"{p}.conv_s"),
            "conv_0": _conv2d(r, f"{p}.conv_0"),
            "conv_1": _convT2d(r, f"{p}.conv_1")}
    warp = {"hourglass": hourglass,
            "flow_norm": _ln2d(r, "warpping_net.flow_out.0"),
            "flow_conv": _conv2d(r, "warpping_net.flow_out.2")}

    edit: Dict[str, Any] = {
        "enc_first": _conv2d(r, "editing_net.encoder.first.model.0"),
        "enc_first_norm": _ln2d(r, "editing_net.encoder.first.model.1")}
    for i in range(editing_layers):
        edit[f"down{i}"] = _conv2d(r, f"editing_net.encoder.down{i}.model.0")
        edit[f"down{i}_norm"] = _ln2d(r, f"editing_net.encoder.down{i}.model.1")
    for i in range(editing_layers):
        edit[f"up{i}"] = _conv2d(r, f"editing_net.decoder.up{i}.model.0")
        edit[f"up{i}_norm"] = _ln2d(r, f"editing_net.decoder.up{i}.model.1")
        edit[f"jump{i}"] = _conv2d(r, f"editing_net.decoder.jump{i}.model.0")
        edit[f"jump{i}_norm"] = _ln2d(r, f"editing_net.decoder.jump{i}.model.1")
        for b in range(num_res_blocks):
            p = f"editing_net.decoder.res{i}.res{b}"
            edit[f"res{i}_{b}"] = {
                "conv1": _conv2d(r, f"{p}.conv1"),
                "conv2": _conv2d(r, f"{p}.conv2"),
                "norm1": _adain(r, f"{p}.norm1"),
                "norm2": _adain(r, f"{p}.norm2")}
    edit["final"] = _conv2d(r, "editing_net.decoder.final.model.0")

    r.finish()
    return {"mapping_net": mapping, "warpping_net": warp, "editing_net": edit}


# ---------------------------------------------------------------------------
# inverse: flax -> reference-layout state_dict
# ---------------------------------------------------------------------------


def _w(out: Dict[str, np.ndarray], prefix: str, node, kind: str):
    k, b = _np(node["kernel"]), _np(node["bias"])
    if kind == "conv2d":
        k = k.transpose(3, 2, 0, 1)
    elif kind == "convT2d":
        k = np.ascontiguousarray(k[::-1, ::-1]).transpose(2, 3, 0, 1)
    elif kind == "conv1d":
        k = k.transpose(2, 1, 0)
    else:  # linear
        k = k.T
    out[f"{prefix}.weight"] = np.ascontiguousarray(k)
    out[f"{prefix}.bias"] = b


def _w_adain(out, prefix, node):
    _w(out, f"{prefix}.mlp_shared.0", node["mlp_shared"], "linear")
    _w(out, f"{prefix}.mlp_gamma", node["mlp_gamma"], "linear")
    _w(out, f"{prefix}.mlp_beta", node["mlp_beta"], "linear")


def _w_ln2d(out, prefix, node):
    out[f"{prefix}.weight"] = _np(node["weight"]).reshape(-1, 1, 1)
    out[f"{prefix}.bias"] = _np(node["bias"]).reshape(-1, 1, 1)


def flax_face_generator_to_torch(
        params: Mapping[str, Any], *, mapping_layers: int = 3,
        encoder_layers: int = 5, decoder_layers: int = 3,
        editing_layers: int = 3, num_res_blocks: int = 2
) -> Dict[str, np.ndarray]:
    """Our param tree -> reference-layout state_dict (loads strict=True into
    ``generators.face_model.FaceGenerator`` built with use_spect=False).
    Wrap values with ``utils.torch_export.to_torch_state_dict`` for .pt."""
    p = params.get("params", params)
    out: Dict[str, np.ndarray] = {}

    m = p["mapping_net"]
    _w(out, "mapping_net.pre", m["pre"], "conv1d")
    _w(out, "mapping_net.first.0", m["first"], "conv1d")
    for i in range(mapping_layers):
        _w(out, f"mapping_net.encoder{i}.1", m[f"encoder{i}"], "conv1d")

    w = p["warpping_net"]
    hg = w["hourglass"]
    _w(out, "warpping_net.hourglass.encoder.input_layer",
       hg["input_layer"], "conv2d")
    for i in range(encoder_layers):
        pref = f"warpping_net.hourglass.encoder.encoder{i}"
        node = hg[f"encoder{i}"]
        _w_adain(out, f"{pref}.norm_0", node["norm_0"])
        _w_adain(out, f"{pref}.norm_1", node["norm_1"])
        _w(out, f"{pref}.conv_0", node["conv_0"], "conv2d")
        _w(out, f"{pref}.conv_1", node["conv_1"], "conv2d")
    for i in range(encoder_layers - decoder_layers, encoder_layers):
        pref = f"warpping_net.hourglass.decoder.decoder{i}"
        node = hg[f"decoder{i}"]
        _w_adain(out, f"{pref}.norm_s", node["norm_s"])
        _w_adain(out, f"{pref}.norm_0", node["norm_0"])
        _w_adain(out, f"{pref}.norm_1", node["norm_1"])
        _w(out, f"{pref}.conv_s", node["conv_s"], "convT2d")
        _w(out, f"{pref}.conv_0", node["conv_0"], "conv2d")
        _w(out, f"{pref}.conv_1", node["conv_1"], "convT2d")
    _w_ln2d(out, "warpping_net.flow_out.0", w["flow_norm"])
    _w(out, "warpping_net.flow_out.2", w["flow_conv"], "conv2d")

    e = p["editing_net"]
    _w(out, "editing_net.encoder.first.model.0", e["enc_first"], "conv2d")
    _w_ln2d(out, "editing_net.encoder.first.model.1", e["enc_first_norm"])
    for i in range(editing_layers):
        _w(out, f"editing_net.encoder.down{i}.model.0", e[f"down{i}"], "conv2d")
        _w_ln2d(out, f"editing_net.encoder.down{i}.model.1", e[f"down{i}_norm"])
        _w(out, f"editing_net.decoder.up{i}.model.0", e[f"up{i}"], "conv2d")
        _w_ln2d(out, f"editing_net.decoder.up{i}.model.1", e[f"up{i}_norm"])
        _w(out, f"editing_net.decoder.jump{i}.model.0", e[f"jump{i}"], "conv2d")
        _w_ln2d(out, f"editing_net.decoder.jump{i}.model.1",
                e[f"jump{i}_norm"])
        for b in range(num_res_blocks):
            pref = f"editing_net.decoder.res{i}.res{b}"
            node = e[f"res{i}_{b}"]
            _w(out, f"{pref}.conv1", node["conv1"], "conv2d")
            _w(out, f"{pref}.conv2", node["conv2"], "conv2d")
            _w_adain(out, f"{pref}.norm1", node["norm1"])
            _w_adain(out, f"{pref}.norm2", node["norm2"])
    _w(out, "editing_net.decoder.final.model.0", e["final"], "conv2d")
    return out

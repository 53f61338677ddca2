"""CodeTalker: speech-driven vertex animation (L3, stage 2).

Parity target: ``/root/reference/code/models/stage2.py``:

* wav2vec2 audio encoder (frozen conv feature extractor) + Linear 768 ->
  feature_dim (:18-21),
* motion embedding + learnable per-subject style embedding (:23,33),
* periodic positional encoding (period=25) + ALiBi-style biased causal mask
  (:25-27),
* torch ``nn.TransformerDecoder`` (post-norm, ReLU feedforward 2x dim) with
  the alignment ``enc_dec_mask`` against the audio memory (:28-29, :82-83),
* zero-initialised ``feat_map`` to fq*zq pre-quant features (:31,36), frozen
  stage-1 VQ decode (:88-92),
* losses: motion MSE + quantized-feature regression MSE (:95-98).

TPU redesign: ``predict`` keeps the reference's algorithm (re-run the decoder
over the growing motion prefix each frame - stage2.py:102-157) but as a jitted
``lax.fori_loop`` over fixed-size buffers with validity masks, so the whole
AR loop compiles once instead of re-tracing 600 python iterations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.positional import PeriodicPositionalEncoding, enc_dec_mask, init_biased_mask
from .vq_vae import CfgModule, VQAutoEncoder
from .wav2vec2 import W2VConfig, Wav2Vec2Model

Array = jax.Array

NEG_INF = float("-inf")


class TorchDecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer semantics: post-norm, ReLU FF.

    self-attn (additive float tgt_mask) -> add+norm -> cross-attn
    (boolean memory_mask, True = disallowed) -> add+norm -> ff -> add+norm.
    """

    dim: int
    heads: int
    ff_dim: int
    dtype: jnp.dtype = jnp.float32

    def _mha(self, q_in, kv_in, bias, bool_mask, prefix):
        nh, hd = self.heads, self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name=f"{prefix}_q")(q_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name=f"{prefix}_k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name=f"{prefix}_v")(kv_in)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd).transpose(0, 2, 1, 3)

        dots = jnp.einsum("bhid,bhjd->bhij", split(q), split(k),
                          preferred_element_type=jnp.float32) * hd ** -0.5
        if bias is not None:  # (H, Lq, Lk) additive (may contain -inf)
            dots = dots + bias[None]
        if bool_mask is not None:  # True = masked out
            dots = jnp.where(bool_mask[None, None], NEG_INF, dots)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = jnp.where(jnp.isfinite(dots).any(-1, keepdims=True), attn, 0.0)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), split(v),
                         preferred_element_type=jnp.float32).astype(q_in.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(q_in.shape[0], q_in.shape[1], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name=f"{prefix}_out")(out)

    @nn.compact
    def __call__(self, x: Array, memory: Array, tgt_bias: Optional[Array],
                 memory_mask: Optional[Array]) -> Array:
        h = self._mha(x, x, tgt_bias, None, "self")
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + h)
        h = self._mha(x, memory, None, memory_mask, "cross")
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + h)
        h = nn.Dense(self.ff_dim, dtype=self.dtype, name="ff1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff2")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x + h)


class CodeTalker(CfgModule):
    """Stage-2 speech-to-motion model."""

    cfg: object
    w2v_cfg: Optional[W2VConfig] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        assert cfg.in_dim == cfg.vertice_dim, (
            f"stage-2 VQ decodes motion of dim in_dim ({cfg.in_dim}); it must "
            f"equal vertice_dim ({cfg.vertice_dim}) - the autoencoder here is "
            f"the vertex VQ, not the 56-d EMOCA one")
        self.audio_encoder = Wav2Vec2Model(self.w2v_cfg or W2VConfig(),
                                           dtype=self.dtype)
        self.audio_feature_map = nn.Dense(cfg.feature_dim, dtype=self.dtype)
        self.vertice_map = nn.Dense(cfg.feature_dim, dtype=self.dtype)
        self.ppe = PeriodicPositionalEncoding(cfg.feature_dim, period=cfg.period,
                                              max_seq_len=600, dtype=self.dtype)
        self.decoder_layers = [
            TorchDecoderLayer(cfg.feature_dim, cfg.n_head, 2 * cfg.feature_dim,
                              dtype=self.dtype, name=f"dec_{i}")
            for i in range(cfg.num_layers)]
        self.feat_map = nn.Dense(cfg.face_quan_num * cfg.zquant_dim,
                                 use_bias=False, dtype=self.dtype,
                                 kernel_init=nn.initializers.zeros)
        n_subjects = len(cfg.train_subjects.split())
        self.learnable_style_emb = nn.Embed(n_subjects, cfg.feature_dim,
                                            dtype=self.dtype)
        variant = "vocaset" if cfg.get("autoencoder", "stage1_BIWI") == "stage1_vocaset" \
            else "BIWI"
        self.autoencoder = VQAutoEncoder(self.cfg, variant=variant, dtype=self.dtype)

    def _decode_feats(self, vertice_input: Array, hidden_states: Array,
                      t_valid: Optional[Array] = None) -> Array:
        """Run the decoder stack with biased causal mask + alignment mask."""
        cfg = self.cfg
        lt, ls = vertice_input.shape[1], hidden_states.shape[1]
        bias = init_biased_mask(cfg.n_head, 600, cfg.period)[:, :lt, :lt]
        mem_mask = enc_dec_mask(cfg.dataset, lt, ls)
        if t_valid is not None:
            # restrict to the live prefix (predict path)
            live_q = jnp.arange(lt) < t_valid
            bias = jnp.where(live_q[None, None, :], bias, NEG_INF)
        h = vertice_input
        for layer in self.decoder_layers:
            h = layer(h, hidden_states, bias, mem_mask)
        return self.feat_map(h)

    def __call__(self, audio: Array, template: Array, vertice: Array,
                 one_hot: Array) -> Tuple[Array, Tuple[Array, Array]]:
        """Teacher-forced training forward (stage2.py:50-98).

        audio: (B, samples); template: (B, V*3); vertice: (B, L, V*3);
        one_hot: (B, n_subjects). Returns (weighted loss, (motion, reg)).
        """
        cfg = self.cfg
        template = template[:, None, :]
        obj_emb = self.learnable_style_emb(jnp.argmax(one_hot, axis=1))[:, None, :]
        frame_num = vertice.shape[1]
        hidden_states = self.audio_encoder(audio, cfg.dataset, frame_num=frame_num)
        if cfg.dataset == "BIWI" and hidden_states.shape[1] < frame_num * 2:
            frame_num = hidden_states.shape[1] // 2
            vertice = vertice[:, :frame_num]
        hidden_states = self.audio_feature_map(hidden_states)

        feat_q_gt, _ = self.autoencoder.get_quant(vertice - template)
        feat_q_gt = jnp.transpose(feat_q_gt, (0, 2, 1))

        vertice_input = jnp.concatenate([template, vertice[:, :-1]], axis=1) - template
        vertice_input = self.vertice_map(vertice_input) + obj_emb
        vertice_input = self.ppe(vertice_input)
        feat_out = self._decode_feats(vertice_input, hidden_states)
        feat_out = feat_out.reshape(feat_out.shape[0],
                                    feat_out.shape[1] * cfg.face_quan_num, -1)
        q = self.autoencoder.quantize(feat_out)
        vertice_out = self.autoencoder.decode(q.z_q) + template

        loss_motion = jnp.mean(jnp.square(vertice_out - vertice))
        loss_reg = jnp.mean(jnp.square(feat_out - jax.lax.stop_gradient(feat_q_gt)))
        total = cfg.get_or("motion_weight", 1.0) * loss_motion + \
            cfg.get_or("reg_weight", 1.0) * loss_reg
        return total, (loss_motion, loss_reg)

    def predict(self, audio: Array, template: Array, one_hot: Array,
                one_hot2: Optional[Array] = None,
                weight_of_one_hot: Optional[float] = None) -> Array:
        """Autoregressive inference (stage2.py:102-157) as one jitted loop.

        Keeps the reference algorithm - each frame re-runs the decoder over
        the full motion-embedding prefix and VQ-decodes the prefix to feed
        the last frame back - with fixed-size buffers + validity masks so
        XLA compiles a single program.
        """
        cfg = self.cfg
        template = template[:, None, :]
        obj_emb = self.learnable_style_emb(jnp.argmax(one_hot, axis=1))
        if one_hot2 is not None and weight_of_one_hot is not None:
            obj2 = self.learnable_style_emb(jnp.argmax(one_hot2, axis=1))
            obj_emb = obj_emb * weight_of_one_hot + obj2 * (1 - weight_of_one_hot)
        style = obj_emb[:, None, :]

        hidden_states = self.audio_encoder(audio, cfg.dataset)
        frame_num = (hidden_states.shape[1] // 2 if cfg.dataset == "BIWI"
                     else hidden_states.shape[1])
        hidden_states = self.audio_feature_map(hidden_states)
        b = audio.shape[0]
        dim = cfg.feature_dim

        emb_buf = jnp.zeros((b, frame_num, dim), dtype=self.dtype)
        emb_buf = emb_buf.at[:, 0].set(style[:, 0])

        def body(i, emb_buf):
            vertice_input = self.ppe(emb_buf)
            feat_out = self._decode_feats(vertice_input, hidden_states,
                                          t_valid=i + 1)
            feat_out = feat_out.reshape(b, frame_num * cfg.face_quan_num, -1)
            q = self.autoencoder.quantize(feat_out)
            lengths = jnp.full((b,), (i + 1) * cfg.face_quan_num, jnp.int32)
            vertice_out_q = self.autoencoder.decode(q.z_q, lengths=lengths)
            last = jnp.take_along_axis(
                vertice_out_q, jnp.full((b, 1, 1), i, jnp.int32)
                .repeat(vertice_out_q.shape[-1], -1), axis=1)[:, 0]
            new_emb = self.vertice_map(last) + style[:, 0]
            return jax.lax.dynamic_update_slice(
                emb_buf, new_emb[:, None, :], (0, i + 1, 0))

        emb_buf = jax.lax.fori_loop(0, frame_num - 1, body, emb_buf)

        vertice_input = self.ppe(emb_buf)
        feat_out = self._decode_feats(vertice_input, hidden_states)
        feat_out = feat_out.reshape(b, frame_num * cfg.face_quan_num, -1)
        q = self.autoencoder.quantize(feat_out)
        vertice_out = self.autoencoder.decode(q.z_q)
        return vertice_out + template

"""SLM family: dyadic pretraining + listener / speaker finetunes (L3).

Parity targets (``/root/reference/code/seq2seq_pretrain.py``):

* ``SLM``          (:72-323)  - dyadic masked pretraining on CANDOR: frozen
  speaker/listener VQ tokenizers, three continuous encoders, cross-prediction
  AR decoder, InfoNCE contrastive loss, continuous VQ-decoded loss.
* ``SLMFT``        (:325-514) - listener finetune/eval: causal speaker
  encoder, AR decoder with mask_prob=0.15, generate() at eval.
* ``SpeakerSLMFT`` (:516-757) - BIWI speaker finetune: converter front-end,
  speaker-ID embedding, audio-conditioned AR decoding to EMOCA codes, BiLSTM
  mesh head.
* ``EmocaConverter`` (:759-842) - EMOCA-56 -> BIWI-mesh regressor.

TPU redesign highlights:

* ``forward_vq`` is VECTORIZED: the reference encodes each sample's unpadded
  sequence in a python loop (seq2seq_pretrain.py:185-199); here one batched
  masked encode produces identical code sequences (see
  models/vq_vae.TransformerEncoder lengths path), padded speaker codes with 0
  and listener codes with -100 exactly like the reference (:192-195).
* random 15% unstructured masking is drawn under an explicit PRNG key with a
  per-row exact count, matching ``random_masking_unstructured`` (:171-183).
* generation runs as a KV-cached ``lax.scan`` (models/xtrans.generate_tokens)
  instead of a full re-forward per token.

Frozen-submodule semantics (requires_grad toggles at :100-113, :352-366,
:540-573) are expressed as optimizer masks - see engine.train_state
(freeze specs exported here as ``SLM_FREEZE`` etc.).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import StaticCfg, slm_defaults, vq_listener_defaults
from ..metrics.loss import pairwise_distance_loss
from ..ops.rnn import LSTM
from .vq_vae import CfgModule, VQAutoEncoder
from .xtrans import (
    ContinuousTransformerWrapper,
    TokenDecoder,
    ar_cross_entropy,
    ar_inputs_targets,
    ar_mask_prob_kv_mask,
)

Array = jax.Array

IGNORE = -100


def random_masking_unstructured(rng: jax.Array, valid_mask: Array,
                                mask_ratio: float) -> Array:
    """Per-row random masking of exactly ``floor(len * ratio)`` valid positions.

    Vectorizes the reference's python loop (seq2seq_pretrain.py:171-183).
    Returns bool (B, L), True = masked.
    """
    b, l = valid_mask.shape
    noise = jax.random.uniform(rng, (b, l))
    noise = jnp.where(valid_mask, noise, jnp.inf)
    order = jnp.argsort(noise, axis=1)
    ranks = jnp.argsort(order, axis=1)
    lens = jnp.sum(valid_mask, axis=1)
    k = (lens * mask_ratio).astype(jnp.int32)
    return ranks < k[:, None]


def masked_mean(x: Array, valid_mask: Array) -> Array:
    """Mean over valid frames per sample: (B, L, D), (B, L) -> (B, D)."""
    m = valid_mask.astype(x.dtype)[:, :, None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def info_nce(s_rep: Array, l_rep: Array, valid_mask: Array,
             temp: float = 0.05) -> Tuple[Array, Array]:
    """InfoNCE between masked-mean speaker/listener reps
    (seq2seq_pretrain.py:270-298, single-directional default)."""
    s = masked_mean(s_rep, valid_mask)
    l = masked_mean(l_rep, valid_mask)
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
    l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-12)
    total = (s @ l.T) / temp
    logsm = jax.nn.log_softmax(total, axis=0)
    nce = -jnp.mean(jnp.diag(logsm))
    pred = jnp.argmax(jax.nn.softmax(total, axis=0), axis=0)
    c_acc = jnp.mean((pred == jnp.arange(total.shape[0])).astype(jnp.float32))
    return nce, c_acc


def continuous_loss(pred: Array, target: Array, frame_mask: Array) -> Array:
    """Masked pose/exp pairwise-distance loss (seq2seq_pretrain.py:256-268).

    pred: (B, Lp, C) VQ-decoded frames (Lp = L-1 after the AR shift);
    target: (B, L, C) - frame 0 dropped; frame_mask: (B, L) bool.
    """
    target = target[:, 1:, :]
    mask = frame_mask[:, 1:]
    lp = min(pred.shape[1], target.shape[1])
    pred = pred[:, :lp].reshape(-1, pred.shape[-1])
    target = target[:, :lp].reshape(-1, target.shape[-1])
    mask = mask[:, :lp].reshape(-1)
    return pairwise_distance_loss(pred, target, mask)


class SLMOutputs(NamedTuple):
    total_loss: Array
    logs: Dict[str, Array]
    pred: Optional[Array]


class _SLMBase(CfgModule):
    """Shared construction of the SLM transformer stack
    (seq2seq_pretrain.py:116-165, identical in all three variants)."""

    cfg: object
    vq_cfg: object
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if not isinstance(self.vq_cfg, StaticCfg):
            object.__setattr__(self, "vq_cfg", StaticCfg.wrap(self.vq_cfg))
        super().__post_init__()

    def _make_stack(self, dec_use_abs_pos_emb: bool):
        c = self.cfg
        assert c.num_tokens == self.vq_cfg.n_embed, (
            f"decoder vocab ({c.num_tokens}) must equal the VQ codebook size "
            f"({self.vq_cfg.n_embed}) - the decoder predicts VQ code indices")
        dh = getattr(c, "attn_dim_head", 64)
        kvh = getattr(c, "attn_kv_heads", 0) or None  # 0/None = multi-head
        enc = dict(dim=c.dim, dim_out=c.dim, max_seq_len=c.enc_max_seq_len,
                   depth=c.enc_depth, heads=c.enc_heads, dim_head=dh,
                   kv_heads=kvh, dtype=self.dtype)
        self.encoder_s = ContinuousTransformerWrapper(**enc)
        self.encoder_l = ContinuousTransformerWrapper(**enc)
        self.encoder_joint = ContinuousTransformerWrapper(**enc)
        self.patch_embed_s = self.param("patch_embed_s", nn.initializers.zeros,
                                        (1, 1, c.dim_in))
        self.patch_embed_l = self.param("patch_embed_l", nn.initializers.zeros,
                                        (1, 1, c.dim_in))
        self.patch_embed_dec_s = self.param("patch_embed_dec_s", nn.initializers.zeros,
                                            (1, 1, c.dim))
        self.patch_embed_dec_l = self.param("patch_embed_dec_l", nn.initializers.zeros,
                                            (1, 1, c.dim))
        self.norm_s = nn.LayerNorm(dtype=self.dtype)
        self.norm_l = nn.LayerNorm(dtype=self.dtype)
        self.norm = nn.LayerNorm(dtype=self.dtype)
        self.decoder_joint = TokenDecoder(
            num_tokens=c.num_tokens, dim=c.dim + c.dim_audio,
            max_seq_len=c.dec_max_seq_len, depth=c.dec_depth, heads=c.dec_heads,
            dim_head=dh, kv_heads=kvh, use_abs_pos_emb=dec_use_abs_pos_emb,
            dtype=self.dtype)

    # --- shared vectorized tokenization (seq2seq_pretrain.py:185-199) ---

    def forward_vq(self, v_speaker: Array, v_listener: Array, valid_mask: Array
                   ) -> Tuple[Array, Array]:
        lengths = jnp.sum(valid_mask, axis=1).astype(jnp.int32)
        fq = self.vq_cfg.face_quan_num
        idx_s = self.speaker_vq.encode_indices(v_speaker, lengths=lengths)
        idx_l = self.listener_vq.encode_indices(v_listener, lengths=lengths)
        pos_s = jnp.arange(idx_s.shape[1])[None, :]
        pos_l = jnp.arange(idx_l.shape[1])[None, :]
        z_s = jnp.where(pos_s < (lengths * fq)[:, None], idx_s, 0)
        z_l = jnp.where(pos_l < lengths[:, None], idx_l, IGNORE)
        return z_s, z_l

    # --- shared streaming decode support (serving/ drives these) ---

    def stream_cross_kv(self, ctx_chunk):
        """Per-decoder-layer (k, v) projections of a context chunk - linear
        per position, so appending chunks equals ``decoder_joint.cross_kv``
        of the full context."""
        return self.decoder_joint.cross_kv(ctx_chunk)

    def stream_decode_step(self, token, cache, t, cross_kv, context_mask):
        return self.decoder_joint.decode_step(token, cache, t, cross_kv,
                                              context_mask)


class SLM(_SLMBase):
    """Dyadic masked pretraining model (seq2seq_pretrain.py:72-323)."""

    cfg: object
    vq_cfg: object
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.speaker_vq = VQAutoEncoder(self.vq_cfg, variant="BIWI", dtype=self.dtype)
        self.listener_vq = VQAutoEncoder(self.vq_cfg, variant="BIWI", dtype=self.dtype)
        self._make_stack(dec_use_abs_pos_emb=True)

    def forward_encoder(self, v_speaker, v_listener, valid_mask, rng):
        c = self.cfg
        r1, r2 = jax.random.split(rng)
        mask_speaker = random_masking_unstructured(r1, valid_mask, c.mask_ratio)
        mask_listener = random_masking_unstructured(r2, valid_mask, c.mask_ratio)
        v_s = v_speaker + self.patch_embed_s
        v_l = v_listener + self.patch_embed_l
        v_s = jnp.where(mask_speaker[:, :, None], 0.0, v_s)
        v_l = jnp.where(mask_listener[:, :, None], 0.0, v_l)
        x_s = self.encoder_s(v_s, mask=valid_mask, return_embeddings=True)
        x_l = self.encoder_l(v_l, mask=valid_mask, return_embeddings=True)
        x_joint = self.encoder_joint(
            jnp.concatenate([x_s, x_l], axis=1),
            mask=jnp.concatenate([valid_mask, valid_mask], axis=-1),
            return_embeddings=True)
        # the two marginal joint passes (seq2seq_pretrain.py:221-223) share
        # weights and length - run them as ONE batched pass (identical
        # numerics, half the kernel launches; MXU likes the bigger batch)
        b = x_l.shape[0]
        y = self.encoder_joint(
            jnp.concatenate([x_l, x_s], axis=0),
            mask=jnp.concatenate([valid_mask, valid_mask], axis=0),
            return_embeddings=True)
        x_l, x_s = y[:b], y[b:]
        return (self.norm_s(x_s), self.norm_l(x_l), self.norm(x_joint),
                mask_speaker, mask_listener)

    def forward_decoder(self, x_s, x_l, z_s, z_l, x_a, valid_mask):
        """Cross-prediction: decode speaker codes attending the listener stream
        and vice versa (seq2seq_pretrain.py:225-239)."""
        x_s = jnp.concatenate([x_s + self.patch_embed_dec_s, x_a], axis=-1)
        x_l = jnp.concatenate([x_l + self.patch_embed_dec_l, x_a], axis=-1)
        inp_s, tgt_s = ar_inputs_targets(z_s)
        inp_l, tgt_l = ar_inputs_targets(z_l)
        # the two cross-prediction passes share decoder weights - batch them
        # (identical numerics to sequential calls)
        b = inp_s.shape[0]
        px = self.decoder_joint(
            jnp.concatenate([inp_s, inp_l], axis=0),
            context=jnp.concatenate([x_l, x_s], axis=0),
            context_mask=jnp.concatenate([valid_mask, valid_mask], axis=0))
        px_s, px_l = px[:b], px[b:]
        l_ce_s = ar_cross_entropy(px_s, tgt_s)
        l_ce_l = ar_cross_entropy(px_l, tgt_l)
        return l_ce_s, l_ce_l, px_s, px_l

    def forward_vq_decoder(self, logits_s, logits_l):
        pred_s = jnp.argmax(logits_s, axis=-1)
        pred_l = jnp.argmax(logits_l, axis=-1)
        return (self.speaker_vq.decode_indices(pred_s),
                self.listener_vq.decode_indices(pred_l))

    def __call__(self, v_speaker, v_listener, v_audio, valid_mask, rng,
                 mode: str = "train", vq_tokens=None) -> SLMOutputs:
        """``vq_tokens``: optional precomputed (z_s, z_l) from
        ``forward_vq`` - the frozen tokenizers are deterministic, so
        engines can tokenize a dataset ONCE and skip the two 6-layer VQ
        encoder passes every step (~16% of the step, PERF.md breakdown).
        Identical numerics either way."""
        if vq_tokens is not None:
            z_s, z_l = vq_tokens
        else:
            z_s, z_l = jax.lax.stop_gradient(
                self.forward_vq(v_speaker, v_listener, valid_mask))
        rng, r_enc = jax.random.split(rng)
        x_s, x_l, x_joint, mask_speaker, mask_listener = self.forward_encoder(
            v_speaker, v_listener, valid_mask, r_enc)
        nce, c_acc = info_nce(x_s, x_l, valid_mask, self.cfg.contrastive_temp)
        L = x_s.shape[1]
        x_joint_s, x_joint_l = x_joint[:, :L], x_joint[:, L:]
        # only masked positions remain CE targets (seq2seq_pretrain.py:307-309)
        z_s = jnp.where(mask_speaker, z_s, IGNORE)
        z_l = jnp.where(mask_listener, z_l, IGNORE)
        l_ce_s, l_ce_l, px_s, px_l = self.forward_decoder(
            x_joint_s, x_joint_l, z_s, z_l, v_audio, valid_mask)
        pred_s, pred_l = self.forward_vq_decoder(px_s, px_l)
        l_cont_s = continuous_loss(pred_s, v_speaker, mask_speaker)
        l_cont_l = continuous_loss(pred_l, v_listener, mask_listener)
        total = l_ce_s + l_ce_l + l_cont_s + l_cont_l + nce
        logs = {"l_ce_s": l_ce_s, "l_ce_l": l_ce_l, "l_cont_s": l_cont_s,
                "l_cont_l": l_cont_l, "nce": nce, "c_acc": c_acc}
        return SLMOutputs(total, logs, None)


class SLMFT(_SLMBase):
    """Listener finetune / eval (seq2seq_pretrain.py:325-514)."""

    cfg: object
    vq_cfg: object
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.speaker_vq = VQAutoEncoder(self.vq_cfg, variant="BIWI", dtype=self.dtype)
        self.listener_vq = VQAutoEncoder(self.vq_cfg, variant="BIWI", dtype=self.dtype)
        # SLMFT's decoder has NO absolute positional embedding (quirk:
        # seq2seq_pretrain.py:386 defaults use_abs_pos_emb to False)
        self._make_stack(dec_use_abs_pos_emb=False)

    def forward_encoder(self, v_speaker, valid_mask):
        """Causal speaker encoding (triangular attn_mask,
        seq2seq_pretrain.py:431-442)."""
        l = v_speaker.shape[1]
        attn_mask = jnp.tril(jnp.ones((l, l), dtype=bool))
        x_s = self.encoder_s(v_speaker + self.patch_embed_s, mask=valid_mask,
                             attn_mask=attn_mask, return_embeddings=True)
        x_s = self.encoder_joint(x_s, mask=valid_mask, attn_mask=attn_mask,
                                 return_embeddings=True)
        return self.norm_s(x_s)

    def decode_train(self, x_s, z_l, x_a, valid_mask, rng):
        ctx = jnp.concatenate([x_s + self.patch_embed_dec_s, x_a], axis=-1)
        inp, tgt = ar_inputs_targets(z_l)
        kv_mask = None
        if rng is not None:  # mask_prob=0.15 input corruption (train only)
            kv_mask = ar_mask_prob_kv_mask(rng, inp.shape[0], inp.shape[1], 0.15)
        logits = self.decoder_joint(inp, context=ctx, self_key_mask=kv_mask,
                                    context_mask=valid_mask)
        return ar_cross_entropy(logits, tgt), logits

    def decoder_context(self, x_s, x_a):
        return jnp.concatenate([x_s + self.patch_embed_dec_s, x_a], axis=-1)

    def forward_vq_decoder_train(self, logits_l):
        return self.listener_vq.decode_indices(jnp.argmax(logits_l, axis=-1))

    def decode_tokens_to_motion(self, tokens, lengths=None):
        return self.listener_vq.decode_indices(tokens, lengths=lengths)

    def __call__(self, v_speaker, v_listener, v_audio, valid_mask, rng=None,
                 mode: str = "train", vq_tokens=None) -> SLMOutputs:
        """Teacher-forced path (reference mode='train'; the generate path is
        driven by engine.pt_engine via ``encode_context``/xtrans.generate_tokens
        because sampling loops live outside the module).

        ``vq_tokens``: optional precomputed (z_s, z_l) - see SLM.__call__."""
        if vq_tokens is not None:
            _, z_l = vq_tokens
        else:
            _, z_l = jax.lax.stop_gradient(
                self.forward_vq(v_speaker, v_listener, valid_mask))
        x_s = self.forward_encoder(v_speaker, valid_mask)
        l_ce_l, logits_l = self.decode_train(x_s, z_l, v_audio, valid_mask, rng)
        pred_l = self.forward_vq_decoder_train(logits_l)
        l_cont_l = continuous_loss(pred_l, v_listener, valid_mask)
        total = l_ce_l + l_cont_l
        logs = {"l_ce_s": jnp.zeros(()), "l_ce_l": l_ce_l,
                "l_cont_s": jnp.zeros(()), "l_cont_l": l_cont_l,
                "nce": jnp.zeros(()), "c_acc": jnp.zeros(())}
        return SLMOutputs(total, logs, pred_l)

    # --- eval/generation support (engine drives xtrans.generate_tokens) ---

    def encode_context(self, v_speaker, v_listener, v_audio, valid_mask):
        """Returns (decoder context, first listener codes) for AR generation
        (seq2seq_pretrain.py:450: prompt = z_l[:, 0])."""
        _, z_l = self.forward_vq(v_speaker, v_listener, valid_mask)
        x_s = self.forward_encoder(v_speaker, valid_mask)
        ctx = jnp.concatenate([x_s + self.patch_embed_dec_s, v_audio], axis=-1)
        prompt = jnp.maximum(z_l[:, :1], 0)  # first code; -100 pad -> 0
        return ctx, prompt

    # --- streaming serving support (serving/streaming.py drives these) ---
    # The speaker encoders run under a triangular attn_mask
    # (seq2seq_pretrain.py:437), so frame t's encoding never changes as later
    # frames arrive - incremental KV-cached extension is EXACT, and a live
    # session can interleave speaker-frame arrival with listener generation.

    def encode_context_chunk(self, v_speaker_chunk, v_audio_chunk,
                             enc_s_cache, enc_j_cache, t):
        """Causally encode a (B, C, dim_in) speaker chunk starting at absolute
        frame ``t`` against encoder KV caches; returns the decoder-context
        chunk (== rows [t, t+C) of ``decoder_context``) and updated caches."""
        h = v_speaker_chunk + self.patch_embed_s
        x, enc_s_cache = self.encoder_s.extend(h, enc_s_cache, t)
        x, enc_j_cache = self.encoder_joint.extend(x, enc_j_cache, t)
        x = self.norm_s(x)
        ctx = jnp.concatenate([x + self.patch_embed_dec_s, v_audio_chunk],
                              axis=-1)
        return ctx, enc_s_cache, enc_j_cache

    def tokenize_listener_frames(self, v_listener):
        """Frame-rate listener codes for building a streaming prompt
        (z_l[:, 0] equivalent when only the first frames are known)."""
        idx = self.listener_vq.encode_indices(v_listener)
        return jnp.maximum(idx, 0)


class SpeakerSLMFT(_SLMBase):
    """BIWI speaker finetune (seq2seq_pretrain.py:516-757).

    Inputs: raw BIWI vertices (70110-d), EMOCA coefficients (56-d), HuBERT
    audio (768-d), subject template; predicts EMOCA codes autoregressively
    conditioned on audio + speaker embedding, decodes to EMOCA and then to
    mesh through the converter's BiLSTM head.
    """

    cfg: object
    vq_cfg: object
    vertice_dim: int = 70110
    n_speakers: int = 15
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.speaker_vq = VQAutoEncoder(self.vq_cfg, variant="BIWI", dtype=self.dtype)
        self.listener_vq = VQAutoEncoder(self.vq_cfg, variant="BIWI", dtype=self.dtype)
        self._make_stack(dec_use_abs_pos_emb=True)
        # converter front-end (frozen; seq2seq_pretrain.py:563-573)
        self.vertice_mapping = nn.Dense(self.cfg.dim_in, dtype=self.dtype)
        from ..ops.convseq import ConvSquasher

        self.squasher = ConvSquasher(self.cfg.dim_in, quant_factor=0, neg=0.2,
                                     affine=False, dtype=self.dtype)
        # mesh heads (from EmocaConverter; :563-568)
        self.vertice_map_reverse_lstm = LSTM(hidden_size=384, num_layers=2,
                                             bidirectional=True, dtype=self.dtype)
        self.vertice_map_reverse = MeshHead(self.vertice_dim, dtype=self.dtype)
        self.vertice_map_reverse_lstm_2 = LSTM(hidden_size=384, num_layers=2,
                                               bidirectional=True, dtype=self.dtype)
        self.vertice_map_reverse2 = MeshHead(self.vertice_dim, dtype=self.dtype)
        self.speaker_embed = nn.Embed(self.n_speakers, self.cfg.dim, dtype=self.dtype)
        self.W = self.param("W", nn.initializers.normal(1.0), (2,))

    def convert_front(self, verts, template):
        v = verts - template[:, None, :]
        v = nn.leaky_relu(self.vertice_mapping(v), negative_slope=0.2)
        return self.squasher(v)

    def decode_emoca(self, tokens_or_logits, from_logits: bool):
        pred = (jnp.argmax(tokens_or_logits, axis=-1) if from_logits
                else tokens_or_logits)
        emoca = self.speaker_vq.decode_indices(pred)
        mesh = self.vertice_map_reverse(self.vertice_map_reverse_lstm(emoca))
        return mesh, emoca

    def __call__(self, v_speaker_verts, v_speaker_emoca, v_audio, valid_mask,
                 template, speaker_ids=None, mouth_map=None,
                 mode: str = "train") -> SLMOutputs:
        v56 = self.convert_front(v_speaker_verts, template)
        _, z_s_emoca = jax.lax.stop_gradient(
            self.forward_vq(v56, v_speaker_emoca, valid_mask))
        if speaker_ids is None:
            x_l = jnp.zeros((v_audio.shape[0], v_audio.shape[1], self.cfg.dim),
                            dtype=self.dtype)
        else:
            x_l = jnp.repeat(self.speaker_embed(speaker_ids)[:, None, :],
                             v_audio.shape[1], axis=1)
        ctx = jnp.concatenate([x_l + self.patch_embed_dec_l, v_audio], axis=-1)
        inp, tgt = ar_inputs_targets(z_s_emoca)
        logits = self.decoder_joint(inp, context=ctx, context_mask=valid_mask)
        l_ce = ar_cross_entropy(logits, tgt)
        mesh, emoca = self.decode_emoca(logits, from_logits=True)
        mesh = mesh + template[:, None, :]
        l_emoca = jnp.mean(jnp.square(emoca - v_speaker_emoca[:, 1:, :]))
        if mouth_map is not None:
            mm = mesh.reshape(mesh.shape[0], mesh.shape[1], -1, 3)[:, :, mouth_map]
            gt = v_speaker_verts[:, 1:].reshape(
                mesh.shape[0], mesh.shape[1], -1, 3)[:, :, mouth_map]
            l_mouth = jnp.mean(jnp.square(mm - gt))
        else:
            l_mouth = jnp.zeros(())
        # total = CE + EMOCA MSE (mouth/mesh losses are logged only,
        # seq2seq_pretrain.py:747-748)
        total = l_ce + l_emoca
        logs = {"l_ce_s": jnp.zeros(()), "l_ce_l": l_ce,
                "l_cont_s": l_mouth, "l_cont_l": l_emoca,
                "nce": jnp.zeros(()), "c_acc": jnp.zeros(())}
        return SLMOutputs(total, logs, emoca)

    def encode_context(self, v_speaker_verts, v_speaker_emoca, v_audio,
                       valid_mask, template, speaker_ids=None):
        """Context + first-code prompt for AR generation (test_biwi path)."""
        v56 = self.convert_front(v_speaker_verts, template)
        _, z_s_emoca = self.forward_vq(v56, v_speaker_emoca, valid_mask)
        if speaker_ids is None:
            x_l = jnp.zeros((v_audio.shape[0], v_audio.shape[1], self.cfg.dim),
                            dtype=self.dtype)
        else:
            x_l = jnp.repeat(self.speaker_embed(speaker_ids)[:, None, :],
                             v_audio.shape[1], axis=1)
        ctx = jnp.concatenate([x_l + self.patch_embed_dec_l, v_audio], axis=-1)
        prompt = jnp.maximum(z_s_emoca[:, :1], 0)
        return ctx, prompt

    # --- streaming serving support (serving/speaker.py drives these) ---
    # Unlike SLMFT, the speaker context has NO temporal mixing: each frame's
    # context row is speaker_embed + that frame's audio features
    # (seq2seq_pretrain.py:699-704) - so streaming is exact by construction.

    def stream_speaker_context(self, v_audio_chunk, speaker_ids=None):
        """Per-frame decoder-context chunk == rows of ``encode_context``'s
        ctx for the same frames."""
        b, cl = v_audio_chunk.shape[0], v_audio_chunk.shape[1]
        if speaker_ids is None:
            x_l = jnp.zeros((b, cl, self.cfg.dim), dtype=self.dtype)
        else:
            x_l = jnp.repeat(self.speaker_embed(speaker_ids)[:, None, :],
                             cl, axis=1)
        return jnp.concatenate([x_l + self.patch_embed_dec_l, v_audio_chunk],
                               axis=-1)

    def tokenize_emoca_frames(self, v_emoca):
        """EMOCA-frame codes for building a streaming prompt (the z_s_emoca
        [:, :1] equivalent when only the first frames are known)."""
        idx = self.speaker_vq.encode_indices(v_emoca)
        return jnp.maximum(idx, 0)

    def stream_decode_emoca(self, tokens, template):
        """Codes -> (mesh, emoca) for a live stream; the BiLSTM mesh head is
        BIDIRECTIONAL over the prefix (like the VQ decode), so production
        streams re-decode a trailing window as codes accumulate."""
        mesh, emoca = self.decode_emoca(tokens, from_logits=False)
        return mesh + template[:, None, :], emoca


class MeshHead(nn.Module):
    """Linear(768,768) -> LeakyReLU(0.2) -> Linear(768, 70110)
    (seq2seq_pretrain.py:815-819)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(768, dtype=self.dtype, name="l1")(x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="l2")(h)


class EmocaConverter(CfgModule):
    """EMOCA-56 -> BIWI-mesh-70110 regressor (seq2seq_pretrain.py:759-842).

    Frozen speaker-VQ roundtrip -> 2-layer BiLSTM(384) -> MeshHead, plus a
    (trainable but unused-in-forward) vertices front-end that SpeakerSLMFT
    borrows.
    """

    cfg: object  # VQ cfg for the speaker VQ
    vertice_dim: int = 70110
    emoca_dim: int = 56
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.speaker_vq = VQAutoEncoder(self.cfg, variant="BIWI", dtype=self.dtype)
        self.vertice_mapping = nn.Dense(self.emoca_dim, dtype=self.dtype)
        from ..ops.convseq import ConvSquasher

        self.squasher = ConvSquasher(self.emoca_dim, quant_factor=0, neg=0.2,
                                     affine=False, dtype=self.dtype)
        self.vertice_map_reverse_lstm = LSTM(hidden_size=384, num_layers=2,
                                             bidirectional=True, dtype=self.dtype)
        self.vertice_map_reverse = MeshHead(self.vertice_dim, dtype=self.dtype)
        self.vertice_map_reverse_lstm_2 = LSTM(hidden_size=384, num_layers=2,
                                               bidirectional=True, dtype=self.dtype)
        self.vertice_map_reverse2 = MeshHead(self.vertice_dim, dtype=self.dtype)

    def __call__(self, template: Array, v_speaker: Array) -> Array:
        """v_speaker: (B, L, 56) EMOCA coeffs -> (B, L, 70110) mesh."""
        dec, _, _ = self.speaker_vq(v_speaker)
        out = self.vertice_map_reverse(self.vertice_map_reverse_lstm(dec))
        return out + template[:, None, :]


# ---------------------------------------------------------------------------
# freeze specs: path-substring predicates for optimizer masks, mirroring the
# reference's requires_grad toggles.
# ---------------------------------------------------------------------------

# SLM: VQ quantizers+encoders frozen, decoders trainable (:100-113)
SLM_FROZEN_SUBSTRINGS = (
    "speaker_vq/quantize", "speaker_vq/encoder",
    "listener_vq/quantize", "listener_vq/encoder",
)
# SLMFT: entire VQs frozen (:352-366)
SLMFT_FROZEN_SUBSTRINGS = ("speaker_vq/", "listener_vq/")
# SpeakerSLMFT: listener VQ + converter front-end + speaker quantize/encoder
# frozen; speaker decoder trainable (:540-573)
SPEAKER_SLMFT_FROZEN_SUBSTRINGS = (
    "listener_vq/", "speaker_vq/quantize", "speaker_vq/encoder",
    "vertice_mapping/", "squasher/",
)
# EmocaConverter: the whole speaker VQ frozen (:777-779)
CONVERTER_FROZEN_SUBSTRINGS = ("speaker_vq/",)


def make_slm(variant: str = "slm", cfg=None, vq_cfg=None, dtype=jnp.float32):
    """Factory mirroring the reference constructors (hard-coded dims)."""
    cfg = cfg or slm_defaults()
    vq_cfg = vq_cfg or vq_listener_defaults()
    if variant == "slm":
        return SLM(cfg, vq_cfg, dtype=dtype)
    if variant == "slmft":
        return SLMFT(cfg, vq_cfg, dtype=dtype)
    if variant == "speaker_slmft":
        return SpeakerSLMFT(cfg, vq_cfg, dtype=dtype)
    if variant == "converter":
        return EmocaConverter(vq_cfg, dtype=dtype)
    raise ValueError(f"unknown SLM variant: {variant}")

"""Non-pretrained seq2seq listener generation (L3).

Parity target: ``/root/reference/code/seq2seq.py``:

* ``Transformer``          (:13-74)   - continuous encoder + token decoder
  (AR wrapper), optional listener-id embedding prepended to the encoder
  output (with mask update and a leading -100 target, :50-58, logits
  re-sliced :67-68),
* ``ContinuousTransformer`` (:76-135) - continuous AR decoder with MSE loss,
* ``ListenerGenerator``    (:138-290) - frozen speaker VQ (continuous quant
  features as encoder input, padded 0) + frozen-encoder listener VQ (codes as
  targets, padded -100), speaker/listener ID embeddings, CE + VQ-decoded
  pairwise-distance loss, AR ``generate``,
* ``SimpleLSTM``           (:292-309) - BiLSTM baseline.

The per-sample VQ loops (:216-223) are replaced by the batched masked encode
(models.vq_vae lengths path), exactly as in models.slm.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import StaticCfg
from ..ops.rnn import LSTM
from .slm import IGNORE, continuous_loss
from .vq_vae import CfgModule, VQAutoEncoder
from .xtrans import (
    ContinuousTransformerWrapper,
    TokenDecoder,
    ar_cross_entropy,
    ar_inputs_targets,
)

Array = jax.Array


class Seq2SeqTransformer(CfgModule):
    """Continuous-encoder -> token-decoder pair (seq2seq.py:13-74)."""

    cfg: object
    dim_in: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = ContinuousTransformerWrapper(
            dim=c.dim, dim_out=c.dim, max_seq_len=c.enc_max_seq_len,
            depth=c.enc_depth, heads=c.enc_heads, dtype=self.dtype)
        self.decoder = TokenDecoder(
            num_tokens=c.dec_num_tokens, dim=c.dim, max_seq_len=c.dec_max_seq_len,
            depth=c.dec_depth, heads=c.dec_heads, dtype=self.dtype)

    def __call__(self, src: Array, tgt: Array, mask: Optional[Array] = None,
                 listener_ids_decoded: Optional[Array] = None
                 ) -> Tuple[Array, Array]:
        enc = self.encoder(src, mask=mask, return_embeddings=True)
        if listener_ids_decoded is not None:
            # prepend listener context token (seq2seq.py:50-58)
            enc = jnp.concatenate([listener_ids_decoded[:, None, :], enc], axis=1)
            if mask is not None:
                ones = jnp.ones((mask.shape[0], 1), dtype=bool)
                mask = jnp.concatenate([ones, mask], axis=1)
            lead = jnp.full((tgt.shape[0], 1), IGNORE, dtype=tgt.dtype)
            tgt = jnp.concatenate([lead, tgt], axis=1)
        inp, targets = ar_inputs_targets(tgt)
        logits = self.decoder(inp, context=enc, context_mask=mask)
        loss = ar_cross_entropy(logits, targets)
        if listener_ids_decoded is not None:
            logits = logits[:, 1:, :]
        return loss, logits

    def encode_src(self, src: Array, mask: Optional[Array] = None) -> Array:
        return self.encoder(src, mask=mask, return_embeddings=True)


class ContinuousSeq2Seq(CfgModule):
    """Continuous encoder-decoder with MSE AR loss (seq2seq.py:76-135)."""

    cfg: object
    out_dim: int = 56
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = ContinuousTransformerWrapper(
            dim=c.dim, dim_out=c.dim, max_seq_len=c.enc_max_seq_len,
            depth=c.enc_depth, heads=c.enc_heads, dtype=self.dtype)
        # the reference's "decoder" is a continuous wrapper over an Encoder
        # stack reading the encoder output directly (seq2seq.py:104-110)
        self.decoder = ContinuousTransformerWrapper(
            dim=c.dim, dim_out=self.out_dim, max_seq_len=c.enc_max_seq_len,
            depth=c.dec_depth, heads=c.dec_heads, dtype=self.dtype)

    def __call__(self, src: Array, tgt: Array, mask: Optional[Array] = None) -> Array:
        enc = self.encoder(src, mask=mask, return_embeddings=True)
        inp, target = enc[:, :-1], tgt[:, 1:]
        pred = self.decoder(inp, mask=None if mask is None else mask[:, :-1])
        se = jnp.square(pred - target)
        if mask is not None:
            m = mask[:, 1:, None].astype(se.dtype)
            return jnp.sum(se * m) / jnp.maximum(jnp.sum(m) * se.shape[-1], 1.0)
        return jnp.mean(se)


class LGOutputs(NamedTuple):
    loss: Array
    pred_cont_seq: Array


class ListenerGenerator(CfgModule):
    """Frozen-VQ seq2seq listener generator (seq2seq.py:138-290)."""

    cfg: object
    vq_cfg_speaker: object
    vq_cfg_listener: object
    dtype: jnp.dtype = jnp.float32
    # "reference": reproduce the reference's memory REINTERPRETATION of the
    # (B, zq, fq*L) quant tensor into (B, L, fq*zq) via .view WITHOUT a
    # transpose (seq2seq.py:227-228) - the per-frame rows are scrambled
    # across codebook channels, but reference-trained encoder weights expect
    # exactly that order (caught by tests/test_train_parity_torch.py's LG
    # lockstep). "frames": the clean per-frame layout (opt-out).
    speaker_feature_layout: str = "reference"

    def __post_init__(self):
        for f in ("vq_cfg_speaker", "vq_cfg_listener"):
            v = getattr(self, f)
            if not isinstance(v, StaticCfg):
                object.__setattr__(self, f, StaticCfg.wrap(v))
        super().__post_init__()

    def setup(self):
        c = self.cfg
        assert c.dec_num_tokens == self.vq_cfg_listener.n_embed, (
            f"decoder vocab ({c.dec_num_tokens}) must equal the listener VQ "
            f"codebook size ({self.vq_cfg_listener.n_embed})")
        self.speaker_vq = VQAutoEncoder(self.vq_cfg_speaker, variant="BIWI",
                                        dtype=self.dtype)
        self.listener_vq = VQAutoEncoder(self.vq_cfg_listener, variant="BIWI",
                                         dtype=self.dtype)
        sp = self.vq_cfg_speaker
        self.generator = Seq2SeqTransformer(
            c, dim_in=sp.face_quan_num * sp.zquant_dim, dtype=self.dtype)
        self.speaker_embeddings = nn.Embed(c.num_identities, c.id_embed_dim,
                                           dtype=self.dtype)
        self.listener_embeddings = nn.Embed(c.num_identities, c.id_embed_dim,
                                            dtype=self.dtype)
        self.fc_speaker = nn.Dense(c.enc_max_seq_len, dtype=self.dtype)
        self.fc_listener = nn.Dense(c.dim, dtype=self.dtype)

    def _encode_streams(self, v_speaker, v_listener, mask):
        """Batched equivalent of the per-sample VQ loops (seq2seq.py:216-223):
        speaker -> continuous quant features (padding 0), listener -> code
        indices (padding -100)."""
        lengths = jnp.sum(mask, axis=1).astype(jnp.int32)
        sp = self.vq_cfg_speaker
        enc_s = self.speaker_vq.encode(v_speaker, lengths=lengths)
        quant = enc_s.quant  # (B, zq, L*fq)
        b = quant.shape[0]
        if self.speaker_feature_layout == "reference":
            # reference quirk: pad with 0 on the LAST axis then .view to
            # (B, L, fq*zq) - a row-major memory reinterpretation, NOT a
            # transpose (seq2seq.py:220-228)
            valid = (jnp.arange(quant.shape[-1])[None, :]
                     < (lengths * sp.face_quan_num)[:, None])
            quant = jnp.where(valid[:, None, :], quant, 0.0)
            x_speaker = quant.reshape(b, -1, sp.face_quan_num * sp.zquant_dim)
        else:  # "frames": clean per-frame codebook features
            quant = jnp.transpose(quant, (0, 2, 1))
            valid = (jnp.arange(quant.shape[1])[None, :]
                     < (lengths * sp.face_quan_num)[:, None])
            quant = jnp.where(valid[:, :, None], quant, 0.0)
            x_speaker = quant.reshape(b, -1, sp.face_quan_num * sp.zquant_dim)
        idx_l = self.listener_vq.encode_indices(v_listener, lengths=lengths)
        z_listener = jnp.where(
            jnp.arange(idx_l.shape[1])[None, :] < lengths[:, None], idx_l, IGNORE)
        return x_speaker, z_listener

    def __call__(self, v_speaker, v_listener, mask, speaker_ids=None,
                 listener_ids=None) -> LGOutputs:
        x_speaker, z_listener = jax.lax.stop_gradient(
            self._encode_streams(v_speaker, v_listener, mask))
        b, l = mask.shape
        if speaker_ids is not None:
            sp_dec = self.fc_speaker(nn.relu(self.speaker_embeddings(speaker_ids)))
            # reference projects ids to 1024 and prepends as first encoder
            # input row (seq2seq.py:230-232); slice to the input width
            sp_dec = sp_dec[:, : x_speaker.shape[-1]]
            x_speaker = jnp.concatenate([sp_dec[:, None, :], x_speaker], axis=1)
            mask_updated = jnp.concatenate(
                [jnp.ones((b, 1), dtype=bool), mask], axis=1)
        else:
            mask_updated = mask
        li_dec = None
        if listener_ids is not None:
            li_dec = self.fc_listener(nn.relu(self.listener_embeddings(listener_ids)))
        loss, logits = self.generator(x_speaker, z_listener, mask_updated, li_dec)
        pred_seq = jnp.argmax(logits, axis=-1)
        pred_cont_seq = self.listener_vq.decode_indices(pred_seq)
        loss_cont = continuous_loss(pred_cont_seq, v_listener, mask)
        return LGOutputs(loss + loss_cont, pred_cont_seq)

    def encode_context(self, v_speaker, v_listener, mask):
        """(encoder embeddings, first listener codes) for AR generation
        (seq2seq.py:266-290)."""
        x_speaker, z_listener = self._encode_streams(v_speaker, v_listener, mask)
        enc = self.generator.encode_src(x_speaker, mask)
        prompt = jnp.maximum(z_listener[:, :1], 0)
        return enc, prompt

    def decode_tokens_to_motion(self, tokens):
        return self.listener_vq.decode_indices(tokens)


class SimpleLSTM(nn.Module):
    """BiLSTM baseline (seq2seq.py:292-309)."""

    in_dim: int = 56 + 768
    hidden: int = 256
    out_dim: int = 56
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, x_target: Array,
                 mask: Optional[Array] = None) -> Tuple[Array, Array]:
        h = LSTM(hidden_size=self.hidden, num_layers=3, bidirectional=True,
                 dtype=self.dtype, name="model")(x)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(h)
        loss = jnp.mean(jnp.square(out - x_target))
        return loss, out

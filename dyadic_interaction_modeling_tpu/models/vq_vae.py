"""VQ-VAE facial-motion tokenizers (L3).

Parity targets:

* ``VQAutoEncoder`` / ``TransformerEncoder`` / ``TransformerDecoder``
  (BIWI variant with pre/post linear embeddings) -
  ``/root/reference/code/models/stage1_BIWI.py:10-411``
* ``VQSpeakerAutoEncoder`` (dual motion+audio decoders) -
  ``stage1_BIWI.py:140-251``
* vocaset variant (no pre/post linears, template subtraction in forward,
  biased output projection) - ``/root/reference/code/models/stage1_vocaset.py``

TPU design: all tensors live in (B, L, C); the encode -> quantize -> decode
round trip is one jitted function; the quantizer matmul and the transformer
attention dominate and both map to the MXU. The per-frame code layout
follows the reference: the encoder emits (B, L, face_quan_num * zquant_dim)
which is reshaped to (B, L * face_quan_num, zquant_dim) before quantization
(stage1_BIWI.py:22-27), i.e. ``face_quan_num`` codes per frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CfgNode, StaticCfg
from ..ops.convseq import ConvExpander, ConvSquasher
from ..ops.positional import PositionalEncoding
from ..ops.quantizer import VQResult, VectorQuantizer
from ..ops.transformer import LinearEmbedding, Transformer

Array = jax.Array


class CfgModule(nn.Module):
    """flax Module whose ``cfg`` field is normalised to an immutable StaticCfg.

    Lets callers pass plain dicts / CfgNode without flax converting them to
    FrozenDict (which loses attribute access).
    """

    def __post_init__(self):
        if hasattr(self, "cfg") and not isinstance(self.cfg, StaticCfg):
            object.__setattr__(self, "cfg", StaticCfg.wrap(self.cfg))
        super().__post_init__()


class VQEncodeResult(NamedTuple):
    quant: Array        # (B, zquant_dim, L*fq) straight-through latents (ref layout B,C,L)
    emb_loss: Array     # scalar quantization loss
    perplexity: Array
    indices: Array      # (B, L*fq) int32 codes


class TransformerEncoder(CfgModule):
    """Motion -> pre-quant latents (stage1_BIWI.py:254-317).

    vertice_mapping -> squasher -> linear embedding -> positional encoding
    (reference's batch-axis quirk) -> transformer [-> post linear when
    ``project_to_quant`` - the BIWI variant's hidden -> fq*zq projection].
    """

    cfg: object
    project_to_quant: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 lengths: Optional[Array] = None) -> Array:
        """``lengths`` enables the vectorized per-sample-equivalent encode:
        the reference encodes each sample's unpadded sequence alone in a
        python loop (seq2seq_pretrain.py:185-199); with ``lengths`` this
        batched path reproduces those outputs at every valid position
        (edge-filled conv, masked instance norm, key-masked attention,
        batch-size-1 positional mode)."""
        cfg = self.cfg
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="vertice_mapping")(x)
        h = nn.leaky_relu(h, negative_slope=cfg.neg)
        h = ConvSquasher(cfg.hidden_size, cfg.quant_factor, cfg.neg, cfg.INaffine,
                         dtype=self.dtype, name="squasher")(h, lengths)
        h = LinearEmbedding(cfg.hidden_size, dtype=self.dtype,
                            name="encoder_linear_embedding")(h)
        h = PositionalEncoding(cfg.hidden_size, dtype=self.dtype,
                               name="encoder_pos_embedding")(
            h, deterministic=deterministic,
            mode="single" if lengths is not None else None)
        key_mask = None
        if lengths is not None:
            key_mask = (jnp.arange(h.shape[1])[None, :] < lengths[:, None])[:, None, :]
        h = Transformer(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            dtype=self.dtype,
            name="encoder_transformer",
        )(h, mask=key_mask)
        if self.project_to_quant:
            h = LinearEmbedding(cfg.face_quan_num * cfg.zquant_dim, dtype=self.dtype,
                                name="encoder_linear_embedding_post")(h)
        return h


class TransformerDecoder(CfgModule):
    """Quantized latents -> motion (stage1_BIWI.py:320-411).

    ``project_from_quant``: BIWI variant's fq*zq -> hidden pre-linear
    (stage1_BIWI.py:369-371). ``out_bias``: vocaset's output projection has a
    bias, BIWI's does not (stage1_BIWI.py:374 vs stage1_vocaset.py:247).
    """

    cfg: object
    out_dim: int
    project_from_quant: bool = True
    out_bias: bool = False
    is_audio: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: Array, deterministic: bool = True,
                 return_feats: bool = False,
                 lengths: Optional[Array] = None) -> Array:
        """``lengths`` enables the per-sample-equivalent masked decode (same
        machinery as the encoder's lengths path); used by CodeTalker.predict
        which decodes growing prefixes inside a jitted loop."""
        cfg = self.cfg
        if self.project_from_quant:
            h = LinearEmbedding(cfg.hidden_size, dtype=self.dtype,
                                name="decoder_linear_embedding_pre")(h)
        h = ConvExpander(cfg.hidden_size, cfg.quant_factor, self.is_audio,
                         cfg.neg, cfg.INaffine, dtype=self.dtype,
                         name="expander")(h, lengths)
        h = LinearEmbedding(cfg.hidden_size, dtype=self.dtype,
                            name="decoder_linear_embedding")(h)
        h = PositionalEncoding(cfg.hidden_size, dtype=self.dtype,
                               name="decoder_pos_embedding")(
            h, deterministic=deterministic,
            mode="single" if lengths is not None else None)
        key_mask = None
        if lengths is not None:
            key_mask = (jnp.arange(h.shape[1])[None, :] < lengths[:, None])[:, None, :]
        h = Transformer(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            dtype=self.dtype,
            name="decoder_transformer",
        )(h, mask=key_mask)
        if return_feats:
            return h
        return nn.Dense(self.out_dim, use_bias=self.out_bias, dtype=self.dtype,
                        name="vertice_map_reverse")(h)


def _fold_codes(h: Array, face_quan_num: int, zquant_dim: int) -> Array:
    """(B, L, fq*zq) -> (B, L*fq, zq) (stage1_BIWI.py:24-25)."""
    b, l, _ = h.shape
    return h.reshape(b, l * face_quan_num, zquant_dim)


def _unfold_codes(quant_bcl: Array, face_quan_num: int, zquant_dim: int) -> Array:
    """(B, zq, L*fq) -> (B, L, fq*zq) (stage1_BIWI.py:31-34)."""
    b = quant_bcl.shape[0]
    h = jnp.transpose(quant_bcl, (0, 2, 1))          # (B, L*fq, zq)
    return h.reshape(b, -1, face_quan_num * zquant_dim)


class VQAutoEncoder(CfgModule):
    """Listener / generic motion VQ-VAE (stage1_BIWI.py:10-137).

    ``variant='BIWI'`` uses pre/post linear embeddings and an unbiased output
    projection; ``variant='vocaset'`` omits them, adds the output bias, and
    subtracts/re-adds a face template in ``__call__``
    (stage1_vocaset.py:42-52).
    """

    cfg: object
    variant: str = "BIWI"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        biwi = self.variant == "BIWI"
        self.encoder = TransformerEncoder(self.cfg, project_to_quant=biwi, dtype=self.dtype)
        self.decoder = TransformerDecoder(
            self.cfg, self.cfg.in_dim, project_from_quant=biwi, out_bias=not biwi,
            dtype=self.dtype)
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.zquant_dim,
                                        beta=0.25, dtype=self.dtype)

    def encode(self, x: Array, deterministic: bool = True,
               lengths: Optional[Array] = None) -> VQEncodeResult:
        h = self.encoder(x, deterministic=deterministic, lengths=lengths)
        h = _fold_codes(h, self.cfg.face_quan_num, self.cfg.zquant_dim)
        q: VQResult = self.quantize(h)
        return VQEncodeResult(q.z_q, q.loss, q.perplexity, q.indices)

    def encode_indices(self, x: Array, lengths: Optional[Array] = None) -> Array:
        """Vectorized tokenization: (B, L, C) [+ lengths] -> (B, L*fq) codes."""
        return self.encode(x, lengths=lengths).indices

    def decode(self, quant_bcl: Array, deterministic: bool = True,
               lengths: Optional[Array] = None) -> Array:
        h = _unfold_codes(quant_bcl, self.cfg.face_quan_num, self.cfg.zquant_dim)
        if lengths is not None:
            lengths = lengths // self.cfg.face_quan_num  # frame-level lengths
        return self.decoder(h, deterministic=deterministic, lengths=lengths)

    def decode_indices(self, indices: Array, deterministic: bool = True,
                       lengths: Optional[Array] = None) -> Array:
        """(B, L*fq) codes -> motion, via codebook lookup + decode.

        ``lengths`` (token-level, (B,)) enables the per-sample-equivalent
        masked decode: padded tail codes never influence the valid prefix
        (serving decodes fixed-capacity buffers this way)."""
        z_q = self.quantize.get_codebook_entry(indices.reshape(-1), shape=None)
        z_q = z_q.reshape(indices.shape[0], indices.shape[1], -1)
        return self.decode(jnp.transpose(z_q, (0, 2, 1)),
                           deterministic=deterministic, lengths=lengths)

    def decode_feats(self, quant_bcl: Array, deterministic: bool = True) -> Array:
        h = _unfold_codes(quant_bcl, self.cfg.face_quan_num, self.cfg.zquant_dim)
        return self.decoder(h, deterministic=deterministic, return_feats=True)

    def __call__(self, x: Array, template: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Array, VQEncodeResult]:
        if self.variant == "vocaset":
            assert template is not None, "vocaset variant requires a template"
            x = x - template[:, None, :]
        enc = self.encode(x, deterministic=deterministic)
        dec = self.decode(enc.quant, deterministic=deterministic)
        if self.variant == "vocaset":
            dec = dec + template[:, None, :]
        return dec, enc.emb_loss, enc

    # --- code-space utilities (stage1_BIWI.py:73-116) ---

    def get_quant(self, x: Array) -> Tuple[Array, Array]:
        enc = self.encode(x)
        return enc.quant, enc.indices

    def get_distances(self, x: Array) -> Array:
        h = self.encoder(x)
        h = _fold_codes(h, self.cfg.face_quan_num, self.cfg.zquant_dim)
        return self.quantize.get_distance(jnp.transpose(h, (0, 2, 1)))

    def decode_to_img(self, indices: Array, zshape: Tuple[int, int, int]) -> Array:
        """indices (any shape) + zshape (B, L, C) -> motion (stage1_BIWI.py:98-105)."""
        z_q = self.quantize.get_codebook_entry(indices.reshape(-1), shape=zshape)
        return self.decode(jnp.transpose(z_q, (0, 2, 1)))

    def entry_to_feature(self, indices: Array, zshape: Tuple[int, ...]) -> Array:
        z_q = self.quantize.get_codebook_entry(indices.reshape(-1), shape=None)
        return z_q.reshape(zshape)

    def decode_logit(self, logits: Array, zshape: Tuple[int, int, int]) -> Array:
        """(B, N, n_embed) logits -> top-1 codes -> motion; 2-D input is
        treated as code indices directly (stage1_BIWI.py:108-116)."""
        if logits.ndim == 3:
            ix = jnp.argmax(jax.nn.softmax(logits, axis=-1), axis=-1)
        else:
            ix = logits
        return self.decode_to_img(ix.reshape(-1, 1), zshape)


def get_logit(rng: jax.Array, logits: Array, sample: bool = True,
              temperature: float = 0.7, top_p: float = 0.9
              ) -> Tuple[Array, Array]:
    """Sample code indices from (B, N, n_embed) logits (stage1_BIWI.py:118-137).

    Reference quirks reproduced: ``top_p`` is accepted but NEVER applied (the
    docstring there says nucleus sampling; the body does plain multinomial
    after temperature 0.7), and ``sample_idx`` is hardwired to 0. ``sample=
    False`` returns the argmax. Returns (indices (B, N), probs (B, N, E)).
    """
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    if sample:
        ix = jax.random.categorical(rng, jnp.log(jnp.maximum(probs, 1e-38)),
                                    axis=-1)
    else:
        ix = jnp.argmax(probs, axis=-1)
    return ix, probs


class VQSpeakerAutoEncoder(CfgModule):
    """Audio-visual speaker VQ-VAE (stage1_BIWI.py:140-251).

    One encoder over concat [motion(56), audio(768)]; two decoders - visual
    (56-d) and audio (768-d) - whose outputs are concatenated.
    """

    cfg: object
    motion_dim: int = 56
    audio_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TransformerEncoder(self.cfg, project_to_quant=True, dtype=self.dtype)
        self.decoder_v = TransformerDecoder(self.cfg, self.motion_dim, dtype=self.dtype)
        self.decoder_a = TransformerDecoder(self.cfg, self.audio_dim, dtype=self.dtype)
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.zquant_dim,
                                        beta=0.25, dtype=self.dtype)

    def encode(self, x: Array, deterministic: bool = True) -> VQEncodeResult:
        h = self.encoder(x, deterministic=deterministic)
        h = _fold_codes(h, self.cfg.face_quan_num, self.cfg.zquant_dim)
        q: VQResult = self.quantize(h)
        return VQEncodeResult(q.z_q, q.loss, q.perplexity, q.indices)

    def decode(self, quant_bcl: Array, deterministic: bool = True) -> Array:
        h = _unfold_codes(quant_bcl, self.cfg.face_quan_num, self.cfg.zquant_dim)
        dec_a = self.decoder_a(h, deterministic=deterministic)
        dec_v = self.decoder_v(h, deterministic=deterministic)
        return jnp.concatenate([dec_v, dec_a], axis=-1)

    def __call__(self, x: Array, deterministic: bool = True):
        enc = self.encode(x, deterministic=deterministic)
        dec = self.decode(enc.quant, deterministic=deterministic)
        return dec, enc.emb_loss, enc

    def get_quant(self, x: Array) -> Tuple[Array, Array]:
        enc = self.encode(x)
        return enc.quant, enc.indices

    def decode_to_img(self, indices: Array, zshape: Tuple[int, int, int]) -> Array:
        z_q = self.quantize.get_codebook_entry(indices.reshape(-1), shape=zshape)
        return self.decode(jnp.transpose(z_q, (0, 2, 1)))

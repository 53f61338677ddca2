"""FaceGenerator (reference: ``code/Pirender/generators/face_model.py`` +
``base_function.py``).

Architecture (all NHWC):

* ``MappingNet``: 1-D convs over a coefficient window -> 256-d descriptor,
  including the DIM modification's ``pre`` 1x1 conv 58 -> 73
  (face_model.py:39-67),
* ``WarpingNet``: ADAIN hourglass -> 2-ch flow -> bilinear warp
  (face_model.py:71-105),
* ``EditingNet``: FineEncoder over [input, warp] + ADAIN FineDecoder
  (face_model.py:109-134).

Reproduced quirks: ``FineADAINResBlock2d`` computes its second branch from
``conv2(x)`` not ``conv2(dx)`` (base_function.py:344-347); UpBlock uses
nearest x2 upsampling (torch F.interpolate default, base_function.py:295);
LayerNorm2d normalises over (C, H, W) jointly with per-channel affine
(base_function.py:11-29).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .flow import convert_flow_to_deformation, warp_image

Array = jax.Array

LRELU = lambda x: nn.leaky_relu(x, negative_slope=0.1)  # noqa: E731


def _sn(conv: nn.Module, use_spect: bool, x: Array, train: bool) -> Array:
    """Optionally apply spectral normalization (reference
    ``base_function.py:151-156``: every ADAIN/Fine block conv goes through
    ``spectral_norm(conv, use_spect)``; shipped configs use False).

    flax's power-iteration state lives in the ``batch_stats`` collection;
    pass ``train=True`` (with ``mutable=['batch_stats']``) to update it.
    """
    if use_spect:
        return nn.SpectralNorm(conv)(x, update_stats=train)
    return conv(x)


class LayerNorm2d(nn.Module):
    """Normalise over (H, W, C) per sample; per-channel affine."""

    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # stats in fp32 even under a bf16 compute dtype: mean/var over
        # 256*256*C elements lose precision in bf16 accumulation, and the
        # cast is a no-op for fp32 inputs
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        h = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        w = self.param("weight", nn.initializers.ones, (self.n_out,))
        b = self.param("bias", nn.initializers.zeros, (self.n_out,))
        return h * w.astype(x.dtype) + b.astype(x.dtype)


class ADAIN(nn.Module):
    """Instance norm modulated by the descriptor (base_function.py:159-190)."""

    norm_nc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, z: Array) -> Array:
        # instance-norm stats in fp32 (no-op for fp32 inputs; see LayerNorm2d)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        normalized = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        z = z.reshape(z.shape[0], -1)
        h = nn.relu(nn.Dense(128, dtype=self.dtype, name="mlp_shared")(z))
        gamma = nn.Dense(self.norm_nc, dtype=self.dtype, name="mlp_gamma")(h)
        beta = nn.Dense(self.norm_nc, dtype=self.dtype, name="mlp_beta")(h)
        return normalized * (1 + gamma[:, None, None, :]) + beta[:, None, None, :]


def _conv(features, kernel, stride=1, padding="SAME", name=None, dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, dtype=dtype, name=name)


class ADAINEncoderBlock(nn.Module):
    out_nc: int
    use_spect: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, z: Array, train: bool = False) -> Array:
        h = ADAIN(x.shape[-1], dtype=self.dtype, name="norm_0")(x, z)
        h = _sn(_conv(self.out_nc, 4, 2, ((1, 1), (1, 1)), "conv_0", self.dtype),
                self.use_spect, LRELU(h), train)
        g = ADAIN(self.out_nc, dtype=self.dtype, name="norm_1")(h, z)
        return _sn(_conv(self.out_nc, 3, 1, "SAME", "conv_1", self.dtype),
                   self.use_spect, LRELU(g), train)


class ADAINDecoderBlock(nn.Module):
    out_nc: int
    hidden_nc: int
    use_spect: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, z: Array, train: bool = False) -> Array:
        # torch ConvTranspose2d(k=3, s=2, padding=1, output_padding=1)
        # (base_function.py:120) == explicit transpose padding (k-1-p, k-1-p+op)
        # = (1, 2); flax's "SAME" is a DIFFERENT pad layout (verified vs torch
        # in tests/test_render_import.py).
        tpad = ((1, 2), (1, 2))
        # shortcut: ADAIN -> act -> transposed conv x2
        s = ADAIN(x.shape[-1], dtype=self.dtype, name="norm_s")(x, z)
        s = _sn(nn.ConvTranspose(self.out_nc, (3, 3), strides=(2, 2), padding=tpad,
                                 dtype=self.dtype, name="conv_s"),
                self.use_spect, LRELU(s), train)
        h = ADAIN(x.shape[-1], dtype=self.dtype, name="norm_0")(x, z)
        h = _sn(_conv(self.hidden_nc, 3, 1, "SAME", "conv_0", self.dtype),
                self.use_spect, LRELU(h), train)
        h = ADAIN(self.hidden_nc, dtype=self.dtype, name="norm_1")(h, z)
        h = _sn(nn.ConvTranspose(self.out_nc, (3, 3), strides=(2, 2), padding=tpad,
                                 dtype=self.dtype, name="conv_1"),
                self.use_spect, LRELU(h), train)
        return s + h


class ADAINHourglass(nn.Module):
    """Encoder-decoder with skip concatenation (base_function.py:31-90)."""

    image_nc: int = 3
    ngf: int = 32
    img_f: int = 256
    encoder_layers: int = 5
    decoder_layers: int = 3
    use_spect: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, z: Array, train: bool = False) -> Array:
        h = _conv(self.ngf, 7, 1, "SAME", "input_layer", self.dtype)(x)
        skips: List[Array] = [h]
        for i in range(self.encoder_layers):
            out_nc = min(self.ngf * (2 ** (i + 1)), self.img_f)
            h = ADAINEncoderBlock(out_nc, self.use_spect, dtype=self.dtype,
                                  name=f"encoder{i}")(h, z, train)
            skips.append(h)
        out = skips.pop()
        for i in reversed(range(self.encoder_layers - self.decoder_layers,
                                self.encoder_layers)):
            out_nc = min(self.ngf * (2 ** i), self.img_f)
            out = ADAINDecoderBlock(out_nc, out_nc, self.use_spect, dtype=self.dtype,
                                    name=f"decoder{i}")(out, z, train)
            out = jnp.concatenate([out, skips.pop()], axis=-1)
        return out


class MappingNet(nn.Module):
    """Coefficient window -> descriptor (face_model.py:39-67).

    input: (B, coeff_nc, T); 'pre' 1x1 conv (the DIM 58->73 modification is
    active when flame_coeff_nc != coeff_nc), k=7 'first' conv (VALID), then
    ``layer`` dilation-3 k=3 convs with residual crops, adaptive mean pool.
    """

    flame_coeff_nc: int = 58
    coeff_nc: int = 73
    descriptor_nc: int = 256
    layer: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coeffs: Array) -> Array:
        min_t = 7 + 6 * self.layer  # k=7 VALID + layer x (k=3, dilation 3)
        assert coeffs.shape[-1] >= min_t, (
            f"MappingNet window length {coeffs.shape[-1]} < {min_t}: the VALID "
            f"convolutions need semantic_radius >= {(min_t - 1) // 2} "
            f"(the reference's shipped semantic_radius=1 config would crash "
            f"its own MappingNet the same way)")
        h = jnp.transpose(coeffs, (0, 2, 1))  # (B, T, C)
        h = nn.Conv(self.coeff_nc, (1,), padding="VALID", dtype=self.dtype,
                    name="pre")(h)
        h = nn.Conv(self.descriptor_nc, (7,), padding="VALID", dtype=self.dtype,
                    name="first")(h)
        for i in range(self.layer):
            d = nn.Conv(self.descriptor_nc, (3,), padding="VALID",
                        kernel_dilation=(3,), dtype=self.dtype,
                        name=f"encoder{i}")(LRELU(h))
            h = d + h[:, 3:-3]
        return jnp.mean(h, axis=1)  # adaptive avg pool over time -> (B, 256)


class WarpingNet(nn.Module):
    descriptor_nc: int = 256
    base_nc: int = 32
    max_nc: int = 256
    encoder_layer: int = 5
    decoder_layer: int = 3
    use_spect: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_image: Array, descriptor: Array,
                 train: bool = False) -> Dict[str, Array]:
        h = ADAINHourglass(input_image.shape[-1], self.base_nc, self.max_nc,
                           self.encoder_layer, self.decoder_layer, self.use_spect,
                           dtype=self.dtype, name="hourglass")(
            input_image, descriptor, train)
        h = LayerNorm2d(h.shape[-1], dtype=self.dtype, name="flow_norm")(h)
        flow = _conv(2, 7, 1, "SAME", "flow_conv", self.dtype)(LRELU(h))
        # the flow field / sampling grid must be fp32: bf16 coordinates on a
        # 256-px grid have ~1-px quantization, which visibly degrades the warp
        flow = flow.astype(jnp.float32)
        deformation = convert_flow_to_deformation(flow)
        return {"flow_field": flow,
                "warp_image": warp_image(input_image, deformation)}


class FineADAINResBlock(nn.Module):
    """QUIRK kept: second branch reads conv2(x), not conv2(dx)
    (base_function.py:344-348)."""

    nc: int
    use_spect: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, z: Array, train: bool = False) -> Array:
        dx = _sn(_conv(self.nc, 3, 1, "SAME", "conv1", self.dtype),
                 self.use_spect, x, train)
        dx = LRELU(ADAIN(self.nc, dtype=self.dtype, name="norm1")(dx, z))
        dx = ADAIN(self.nc, dtype=self.dtype, name="norm2")(
            _sn(_conv(self.nc, 3, 1, "SAME", "conv2", self.dtype),
                self.use_spect, x, train), z)
        return dx + x


class EditingNet(nn.Module):
    descriptor_nc: int = 256
    layer: int = 3
    base_nc: int = 64
    max_nc: int = 256
    num_res_blocks: int = 2
    use_spect: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_image: Array, warp_image: Array,
                 descriptor: Array, train: bool = False) -> Array:
        x = jnp.concatenate([input_image, warp_image], axis=-1)
        # FineEncoder (base_function.py:193-213)
        h = _sn(_conv(self.base_nc, 7, 1, "SAME", "enc_first", self.dtype),
                self.use_spect, x, train)
        h = LRELU(LayerNorm2d(self.base_nc, dtype=self.dtype, name="enc_first_norm")(h))
        skips = [h]
        for i in range(self.layer):
            out_nc = min(self.base_nc * (2 ** (i + 1)), self.max_nc)
            h = _sn(_conv(out_nc, 3, 1, "SAME", f"down{i}", self.dtype),
                    self.use_spect, h, train)
            h = LRELU(LayerNorm2d(out_nc, dtype=self.dtype, name=f"down{i}_norm")(h))
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            skips.append(h)
        # FineDecoder (base_function.py:215-245)
        out = skips.pop()
        for i in reversed(range(self.layer)):
            out_nc = min(self.base_nc * (2 ** i), self.max_nc)
            for r in range(self.num_res_blocks):
                out = FineADAINResBlock(out.shape[-1], self.use_spect,
                                        dtype=self.dtype,
                                        name=f"res{i}_{r}")(out, descriptor, train)
            b, hh, ww, cc = out.shape
            out = jax.image.resize(out, (b, hh * 2, ww * 2, cc), method="nearest")
            out = _sn(_conv(out_nc, 3, 1, "SAME", f"up{i}", self.dtype),
                      self.use_spect, out, train)
            out = LRELU(LayerNorm2d(out_nc, dtype=self.dtype, name=f"up{i}_norm")(out))
            skip = skips.pop()
            skip = _sn(_conv(skip.shape[-1], 3, 1, "SAME", f"jump{i}", self.dtype),
                       self.use_spect, skip, train)
            skip = LRELU(LayerNorm2d(skip.shape[-1], dtype=self.dtype,
                                     name=f"jump{i}_norm")(skip))
            out = out + skip
        out = _sn(_conv(input_image.shape[-1], 7, 1, "SAME", "final", self.dtype),
                  self.use_spect, out, train)
        return jnp.tanh(out)


class FaceGenerator(nn.Module):
    """mapping -> warping -> editing (face_model.py:15-35)."""

    flame_coeff_nc: int = 58
    coeff_nc: int = 73
    descriptor_nc: int = 256
    mapping_layers: int = 3
    use_spect: bool = False
    dtype: jnp.dtype = jnp.float32
    # warp_dtype overrides the WarpingNet compute dtype (None = ``dtype``).
    # ``dtype=bf16, warp_dtype=f32`` is the mixed-precision serving config:
    # the flow path stays exact (bf16 hourglass activations cost ~2% relative
    # flow error, visible on high-gradient sources) while the EditingNet -
    # the bulk of the 256x256 conv FLOPs - runs bf16.
    warp_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.mapping_net = MappingNet(self.flame_coeff_nc, self.coeff_nc,
                                      self.descriptor_nc, self.mapping_layers,
                                      dtype=self.dtype)
        self.warpping_net = WarpingNet(self.descriptor_nc,
                                       use_spect=self.use_spect,
                                       dtype=self.warp_dtype or self.dtype)
        self.editing_net = EditingNet(self.descriptor_nc,
                                      use_spect=self.use_spect, dtype=self.dtype)

    def __call__(self, input_image: Array, driving_source: Array,
                 stage: Optional[str] = None, train: bool = False
                 ) -> Dict[str, Array]:
        """input_image (B, H, W, 3); driving_source (B, coeff_nc, T_window).

        ``train`` only matters with ``use_spect=True``: it updates the
        power-iteration state (requires ``mutable=['batch_stats']``)."""
        descriptor = self.mapping_net(driving_source)
        output = dict(self.warpping_net(input_image, descriptor, train))
        if stage != "warp":
            output["fake_image"] = self.editing_net(
                input_image, output["warp_image"], descriptor, train)
        return output

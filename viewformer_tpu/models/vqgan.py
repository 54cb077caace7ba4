"""VQ-GAN codebook model (encoder / EMA-VQ / decoder) in Flax, NHWC, TPU-first.

Parity targets: /root/reference/viewformer/models/vqgan_th.py (architecture +
training semantics; the tf twin vqgan.py:127-364 is the same net). One single
jax implementation replaces the reference's torch/tf twin pair:

  Encoder: conv_in 3x3 -> per-level [num_res_blocks x ResnetBlock (+ AttnBlock
  at attn_resolutions)] + stride-2 Downsample (asymmetric (0,1) pad) ->
  mid(Resnet, Attn, Resnet) -> GroupNorm/swish/conv_out(z_channels)
  Decoder: mirror with nearest-x2 Upsample and num_res_blocks+1 blocks/level.

Compute dtype is configurable (bf16 on TPU); parameters stay float32. The EMA
quantizer is a pure function over an explicit state pytree (ops/quantizer.py)
carried in the train state rather than hidden module variables. remat=True
rematerializes Resnet/Attn blocks in the backward pass (jax.checkpoint) so
the reference's global batch 352 @128px fits one chip's HBM.
"""
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VQGANConfig
from ..ops import quantizer as vq


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 statistics regardless of compute dtype."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        out = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                           param_dtype=jnp.float32)(x.astype(jnp.float32))
        return out.astype(orig_dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    precision: object = None

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(name='norm1')(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, precision=self.precision, name='conv1')(h)
        h = GroupNorm32(name='norm2')(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, precision=self.precision, name='conv2')(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, precision=self.precision, name='nin_shortcut')(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial positions (1x1-conv q/k/v)."""
    dtype: jnp.dtype = jnp.float32
    precision: object = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(name='norm')(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, precision=self.precision, name='q')(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, precision=self.precision, name='k')(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, precision=self.precision, name='v')(h).reshape(B, H * W, C)
        scores = jnp.einsum('bqc,bkc->bqk', q, k, precision=self.precision,
                            preferred_element_type=jnp.float32) * (C ** -0.5)
        weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum('bqk,bkc->bqc', weights, v, precision=self.precision).reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, precision=self.precision, name='proj_out')(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric (0,1)x(0,1) pad + 3x3 stride-2 VALID conv."""
    dtype: jnp.dtype = jnp.float32
    precision: object = None

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding='VALID',
                       dtype=self.dtype, precision=self.precision, name='conv')(x)


class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv."""
    dtype: jnp.dtype = jnp.float32
    precision: object = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(C, (3, 3), dtype=self.dtype, precision=self.precision, name='conv')(x)


class Encoder(nn.Module):
    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    z_channels: int
    image_size: int
    dtype: jnp.dtype = jnp.float32
    precision: object = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        ResnetBlock_ = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        AttnBlock_ = nn.remat(AttnBlock) if self.remat else AttnBlock
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, precision=self.precision, name='conv_in')(x)
        curr_res = self.image_size
        num_levels = len(self.ch_mult)
        for i_level in range(num_levels):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock_(block_out, dtype=self.dtype, precision=self.precision,
                                name=f'down_{i_level}_block_{i_block}')(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock_(dtype=self.dtype, precision=self.precision,
                                  name=f'down_{i_level}_attn_{i_block}')(h)
            if i_level != num_levels - 1:
                h = Downsample(dtype=self.dtype, precision=self.precision, name=f'down_{i_level}_downsample')(h)
                curr_res //= 2
        h = ResnetBlock_(h.shape[-1], dtype=self.dtype, precision=self.precision, name='mid_block_1')(h)
        h = AttnBlock_(dtype=self.dtype, precision=self.precision, name='mid_attn_1')(h)
        h = ResnetBlock_(h.shape[-1], dtype=self.dtype, precision=self.precision, name='mid_block_2')(h)
        h = GroupNorm32(name='norm_out')(h)
        h = swish(h)
        return nn.Conv(self.z_channels, (3, 3), dtype=self.dtype, precision=self.precision, name='conv_out')(h)


class Decoder(nn.Module):
    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    image_size: int
    dtype: jnp.dtype = jnp.float32
    precision: object = None
    remat: bool = False

    @nn.compact
    def __call__(self, z):
        ResnetBlock_ = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        AttnBlock_ = nn.remat(AttnBlock) if self.remat else AttnBlock
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_levels - 1]
        curr_res = self.image_size // 2 ** (num_levels - 1)
        h = nn.Conv(block_in, (3, 3), dtype=self.dtype, precision=self.precision, name='conv_in')(z)
        h = ResnetBlock_(block_in, dtype=self.dtype, precision=self.precision, name='mid_block_1')(h)
        h = AttnBlock_(dtype=self.dtype, precision=self.precision, name='mid_attn_1')(h)
        h = ResnetBlock_(block_in, dtype=self.dtype, precision=self.precision, name='mid_block_2')(h)
        for i_level in reversed(range(num_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock_(block_out, dtype=self.dtype, precision=self.precision,
                                name=f'up_{i_level}_block_{i_block}')(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock_(dtype=self.dtype, precision=self.precision,
                                  name=f'up_{i_level}_attn_{i_block}')(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, precision=self.precision, name=f'up_{i_level}_upsample')(h)
                curr_res *= 2
        h = GroupNorm32(name='norm_out')(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, precision=self.precision, name='conv_out')(h)


class VQGAN(nn.Module):
    """encode: image [-1,1] NHWC -> (quantized latents, e_latent_loss, codes).

    The EMA codebook state is a flax variable collection 'quantizer'; during
    training call with mutable=['quantizer'] so the EMA update is carried."""
    config: VQGANConfig
    dtype: jnp.dtype = jnp.float32
    precision: object = None
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(ch=cfg.ch, ch_mult=tuple(cfg.ch_mult),
                               num_res_blocks=cfg.num_res_blocks,
                               attn_resolutions=tuple(cfg.attn_resolutions),
                               z_channels=cfg.z_channels, image_size=cfg.image_size,
                               dtype=self.dtype, precision=self.precision,
                               remat=self.remat)
        self.decoder = Decoder(ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=tuple(cfg.ch_mult),
                               num_res_blocks=cfg.num_res_blocks,
                               attn_resolutions=tuple(cfg.attn_resolutions),
                               image_size=cfg.image_size, dtype=self.dtype,
                               precision=self.precision, remat=self.remat)
        self.quant_conv = nn.Conv(cfg.embed_dim, (1, 1), dtype=self.dtype, precision=self.precision, name='quant_conv')
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), dtype=self.dtype,
                                       precision=self.precision, name='post_quant_conv')
        # EMA codebook state (variables declared in setup so every method —
        # encode/decode_code — can read them under apply)
        init_key = self.make_rng('quantizer') if self.has_rng('quantizer') else jax.random.PRNGKey(0)
        self._q_embeddings = self.variable(
            'quantizer', 'embeddings',
            lambda: jax.random.uniform(init_key, (cfg.embed_dim, cfg.n_embed),
                                       jnp.float32, -jnp.sqrt(3.0), jnp.sqrt(3.0)))
        self._q_cluster = self.variable('quantizer', 'ema_cluster_size_hidden',
                                        lambda: jnp.zeros((cfg.n_embed,), jnp.float32))
        self._q_dw = self.variable('quantizer', 'ema_dw_hidden',
                                   lambda: jnp.zeros((cfg.embed_dim, cfg.n_embed), jnp.float32))
        self._q_counter = self.variable('quantizer', 'counter', lambda: jnp.zeros((), jnp.int32))

    def _quantizer_state(self):
        return self._q_embeddings, self._q_cluster, self._q_dw, self._q_counter

    def encode(self, x, training=False):
        h = self.encoder(x.astype(self.dtype))
        h = self.quant_conv(h)
        embeddings, cluster, dw, counter = self._quantizer_state()
        state = vq.QuantizerState(embeddings.value, cluster.value, dw.value, counter.value)
        quant, e_latent_loss, codes, new_state = vq.quantize_ema(
            state, h.astype(jnp.float32), training=training)
        if training and not self.is_initializing():
            embeddings.value = new_state.embeddings
            cluster.value = new_state.ema_cluster_size_hidden
            dw.value = new_state.ema_dw_hidden
            counter.value = new_state.counter
        return quant, e_latent_loss, codes

    def decode(self, quant):
        h = self.post_quant_conv(quant.astype(self.dtype))
        return self.decoder(h).astype(jnp.float32)

    def decode_code(self, codes):
        embeddings, *_ = self._quantizer_state()
        quant = vq.embed_code(embeddings.value, codes)
        return self.decode(quant)

    def __call__(self, x, training=False):
        quant, e_latent_loss, codes = self.encode(x, training=training)
        dec = self.decode(quant)
        return dec, e_latent_loss, quant, codes

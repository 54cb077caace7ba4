import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.config import VQGANConfig
from viewformer_tpu.models.vqgan import VQGAN
from viewformer_tpu.ops import quantizer as vq
from viewformer_tpu.utils.convert import import_vqgan_from_torch

TINY = VQGANConfig(ch=16, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[8],
                   z_channels=8, embed_dim=8, n_embed=16, image_size=16)


# ---------------------------------------------------------------------------
# Torch oracle: the reference VQ-GAN architecture rebuilt in torch for tests,
# emitting reference-style state_dict names (encoder.down.0.block.0.norm1...).
# ---------------------------------------------------------------------------

def _build_torch_vqgan(cfg, seed=0):
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)

    def norm(c):
        return tnn.GroupNorm(4, c, eps=1e-6)  # tiny config: 4 groups won't divide 16? use 4

    class Swish(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    class ResnetBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = tnn.GroupNorm(4, cin, eps=1e-6)
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = tnn.GroupNorm(4, cout, eps=1e-6)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            if cin != cout:
                self.nin_shortcut = tnn.Conv2d(cin, cout, 1)
            self.cin, self.cout = cin, cout

        def forward(self, x):
            h = self.norm1(x)
            h = self.conv1(h * torch.sigmoid(h))
            h = self.norm2(h)
            h = self.conv2(h * torch.sigmoid(h))
            sc = self.nin_shortcut(x) if self.cin != self.cout else x
            return sc + h

    class AttnBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(4, c, eps=1e-6)
            self.q = tnn.Conv2d(c, c, 1)
            self.k = tnn.Conv2d(c, c, 1)
            self.v = tnn.Conv2d(c, c, 1)
            self.proj_out = tnn.Conv2d(c, c, 1)

        def forward(self, x):
            h = self.norm(x)
            q, k, v = self.q(h), self.k(h), self.v(h)
            b, c, hh, ww = q.shape
            q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
            k = k.reshape(b, c, hh * ww)
            w = torch.bmm(q, k) * (c ** -0.5)
            w = torch.softmax(w, dim=2)
            v = v.reshape(b, c, hh * ww)
            out = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
            return x + self.proj_out(out)

    class Downsample(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

        def forward(self, x):
            return self.conv(tnn.functional.pad(x, (0, 1, 0, 1)))

    class Upsample(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(tnn.functional.interpolate(x, scale_factor=2.0, mode='nearest'))

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            ch, mult = cfg.ch, cfg.ch_mult
            self.conv_in = tnn.Conv2d(cfg.in_channels, ch, 3, padding=1)
            in_mult = (1,) + tuple(mult)
            self.down = tnn.ModuleList()
            curr_res = cfg.image_size
            for i in range(len(mult)):
                level = tnn.Module()
                level.block = tnn.ModuleList()
                level.attn = tnn.ModuleList()
                cin, cout = ch * in_mult[i], ch * mult[i]
                for _ in range(cfg.num_res_blocks):
                    level.block.append(ResnetBlock(cin, cout))
                    cin = cout
                    if curr_res in cfg.attn_resolutions:
                        level.attn.append(AttnBlock(cin))
                if i != len(mult) - 1:
                    level.downsample = Downsample(cin)
                    curr_res //= 2
                self.down.append(level)
            self.mid = tnn.Module()
            self.mid.block_1 = ResnetBlock(cin, cin)
            self.mid.attn_1 = AttnBlock(cin)
            self.mid.block_2 = ResnetBlock(cin, cin)
            self.norm_out = tnn.GroupNorm(4, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, cfg.z_channels, 3, padding=1)

        def forward(self, x):
            h = self.conv_in(x)
            curr_res = cfg.image_size
            for i, level in enumerate(self.down):
                for j, block in enumerate(level.block):
                    h = block(h)
                    if len(level.attn) > 0:
                        h = level.attn[j](h)
                if hasattr(level, 'downsample'):
                    h = level.downsample(h)
            h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
            h = self.norm_out(h)
            h = h * torch.sigmoid(h)
            return self.conv_out(h)

    class Decoder(tnn.Module):
        def __init__(self):
            super().__init__()
            ch, mult = cfg.ch, cfg.ch_mult
            n = len(mult)
            cin = ch * mult[n - 1]
            curr_res = cfg.image_size // 2 ** (n - 1)
            self.conv_in = tnn.Conv2d(cfg.z_channels, cin, 3, padding=1)
            self.mid = tnn.Module()
            self.mid.block_1 = ResnetBlock(cin, cin)
            self.mid.attn_1 = AttnBlock(cin)
            self.mid.block_2 = ResnetBlock(cin, cin)
            up = [None] * n
            for i in reversed(range(n)):
                level = tnn.Module()
                level.block = tnn.ModuleList()
                level.attn = tnn.ModuleList()
                cout = ch * mult[i]
                for _ in range(cfg.num_res_blocks + 1):
                    level.block.append(ResnetBlock(cin, cout))
                    cin = cout
                    if curr_res in cfg.attn_resolutions:
                        level.attn.append(AttnBlock(cin))
                if i != 0:
                    level.upsample = Upsample(cin)
                    curr_res *= 2
                up[i] = level
            self.up = tnn.ModuleList(up)
            self.norm_out = tnn.GroupNorm(4, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, cfg.out_ch, 3, padding=1)

        def forward(self, z):
            h = self.conv_in(z)
            h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
            for i in reversed(range(len(self.up))):
                level = self.up[i]
                for j, block in enumerate(level.block):
                    h = block(h)
                    if len(level.attn) > 0:
                        h = level.attn[j](h)
                if hasattr(level, 'upsample'):
                    h = level.upsample(h)
            h = self.norm_out(h)
            h = h * torch.sigmoid(h)
            return self.conv_out(h)

    class TorchVQGAN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.quant_conv = tnn.Conv2d(cfg.z_channels, cfg.embed_dim, 1)
            self.post_quant_conv = tnn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
            import math
            embeddings = torch.rand(cfg.embed_dim, cfg.n_embed) * 2 * math.sqrt(3.0) - math.sqrt(3.0)
            self.register_buffer('quantize_embeddings', embeddings)

        def state_dict_reference_names(self):
            sd = {}
            for k, v in self.state_dict().items():
                if k == 'quantize_embeddings':
                    sd['quantize.embeddings'] = v
                else:
                    sd[k] = v
            sd['quantize.ema_cluster_size_hidden'] = torch.zeros(cfg.n_embed)
            sd['quantize.ema_dw_hidden'] = torch.zeros(cfg.embed_dim, cfg.n_embed)
            sd['quantize.counter'] = torch.tensor(0, dtype=torch.int64)
            return sd

    return TorchVQGAN()


@pytest.fixture(scope='module')
def torch_and_flax():
    import torch

    # Our flax GroupNorm32 uses 32 groups; tiny channels (16) aren't divisible,
    # so use a config with channels divisible by 32 for the parity fixture.
    cfg = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[8],
                      z_channels=32, embed_dim=8, n_embed=16, image_size=16)
    model_th = _build_torch_vqgan(cfg, seed=0)
    # patch torch groupnorms to 32 groups to match
    for module in model_th.modules():
        if isinstance(module, torch.nn.GroupNorm):
            module.num_groups = 32
    sd = model_th.state_dict_reference_names()
    variables = import_vqgan_from_torch({k: v for k, v in sd.items()}, cfg)
    variables = jax.tree.map(jnp.asarray, variables)
    model_jax = VQGAN(cfg, precision=jax.lax.Precision.HIGHEST)
    return cfg, model_th, model_jax, variables


def test_torch_parity_encode(torch_and_flax):
    import torch

    cfg, model_th, model_jax, variables = torch_and_flax
    x = np.random.RandomState(0).randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        z_th = model_th.quant_conv(model_th.encoder(torch.from_numpy(x).permute(0, 3, 1, 2)))
    z_th = z_th.permute(0, 2, 3, 1).numpy()

    def encode_pre_quant(vars_, x):
        def fn(module, x):
            return module.quant_conv(module.encoder(x))
        return model_jax.apply(vars_, x, method=fn)

    z_jax = np.asarray(jax.jit(encode_pre_quant)(variables, jnp.asarray(x)))
    np.testing.assert_allclose(z_jax, z_th, atol=2e-4)


def test_torch_parity_full_roundtrip(torch_and_flax):
    import torch

    cfg, model_th, model_jax, variables = torch_and_flax
    x = np.random.RandomState(1).randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)

    with torch.no_grad():
        z = model_th.quant_conv(model_th.encoder(torch.from_numpy(x).permute(0, 3, 1, 2)))
        # torch-side quantization using the same codebook
        flat = z.permute(0, 2, 3, 1).reshape(-1, cfg.embed_dim)
        emb = model_th.quantize_embeddings
        dist = flat.pow(2).sum(1, keepdim=True) - 2 * flat @ emb + emb.pow(2).sum(0, keepdim=True)
        idx = (-dist).max(1).indices
        quant = torch.nn.functional.embedding(idx, emb.t()).reshape(2, 8, 8, cfg.embed_dim)
        dec_th = model_th.decoder(model_th.post_quant_conv(quant.permute(0, 3, 1, 2)))
    dec_th = dec_th.permute(0, 2, 3, 1).numpy()

    dec_jax, _, _, codes_jax = model_jax.apply(variables, jnp.asarray(x), training=False)
    np.testing.assert_array_equal(np.asarray(codes_jax).reshape(-1), idx.numpy())
    np.testing.assert_allclose(np.asarray(dec_jax), dec_th, atol=5e-4)


def test_decode_code(torch_and_flax):
    cfg, _, model_jax, variables = torch_and_flax
    codes = np.random.RandomState(0).randint(0, cfg.n_embed, (2, 8, 8))
    out = model_jax.apply(variables, jnp.asarray(codes), method=VQGAN.decode_code)
    assert out.shape == (2, 16, 16, 3)


# ---------------------------------------------------------------------------
# Quantizer unit tests
# ---------------------------------------------------------------------------

def test_quantizer_ema_update_math():
    key = jax.random.PRNGKey(0)
    state = vq.init_quantizer_state(key, 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    quantized, loss, indices, new_state = vq.quantize_ema(state, x, training=True)
    assert new_state.counter == 1
    # naive numpy recomputation
    emb = np.asarray(state.embeddings)
    flat = np.asarray(x)
    d = (flat ** 2).sum(1, keepdims=True) - 2 * flat @ emb + (emb ** 2).sum(0, keepdims=True)
    idx = np.argmin(d, 1)
    np.testing.assert_array_equal(np.asarray(indices), idx)
    onehot = np.eye(8)[idx]
    cluster_hidden = 0 + (onehot.sum(0) - 0) * 0.01
    dw_hidden = 0 + (flat.T @ onehot - 0) * 0.01
    correction = 1 - 0.99 ** 1
    cluster = cluster_hidden / correction
    dw = dw_hidden / correction
    n = cluster.sum()
    smoothed = (cluster + 1e-5) / (n + 8 * 1e-5) * n
    expected_emb = dw / smoothed
    np.testing.assert_allclose(np.asarray(new_state.embeddings), expected_emb, rtol=1e-5)


def test_quantizer_straight_through_gradient():
    state = vq.init_quantizer_state(jax.random.PRNGKey(0), 4, 8)

    def loss_fn(x):
        quantized, _, _, _ = vq.quantize_ema(state, x, training=False)
        return jnp.sum(quantized * jnp.arange(4.0))

    g = jax.grad(loss_fn)(jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(g), np.tile(np.arange(4.0), (2, 1)))


def test_quantizer_eval_does_not_mutate():
    state = vq.init_quantizer_state(jax.random.PRNGKey(0), 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    _, _, _, new_state = vq.quantize_ema(state, x, training=False)
    assert new_state is state


def test_quantizer_sharded_matches_single_device():
    """EMA statistics under a sharded batch must equal the single-device
    result — the implicit-psum property the reference implements by hand."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(np.array(devices[:8]), ('data',))
    state = vq.init_quantizer_state(jax.random.PRNGKey(0), 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 4))

    step = jax.jit(lambda s, x: vq.quantize_ema(s, x, training=True))
    _, _, _, ref_state = step(state, x)

    x_sharded = jax.device_put(x, NamedSharding(mesh, P('data', None)))
    state_repl = jax.device_put(state, NamedSharding(mesh, P()))
    with mesh:
        _, _, _, sharded_state = step(state_repl, x_sharded)
    np.testing.assert_allclose(np.asarray(sharded_state.embeddings),
                               np.asarray(ref_state.embeddings), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(sharded_state.ema_cluster_size_hidden),
                               np.asarray(ref_state.ema_cluster_size_hidden), rtol=1e-5)


def test_vqgan_training_updates_ema():
    cfg = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
                      z_channels=32, embed_dim=8, n_embed=16, image_size=16)
    model = VQGAN(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0), 'quantizer': jax.random.PRNGKey(1)},
                           x, training=False)
    (dec, e_loss, quant, codes), mutated = model.apply(
        variables, x, training=True, mutable=['quantizer'])
    assert dec.shape == x.shape
    assert int(mutated['quantizer']['counter']) == 1
    assert not np.allclose(np.asarray(mutated['quantizer']['ema_cluster_size_hidden']), 0)

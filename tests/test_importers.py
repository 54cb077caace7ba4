"""Checkpoint-importer tests against real TF/torch checkpoint machinery."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.models.migt import MIGT
from viewformer_tpu.utils.schedules import Schedule

TINY = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2, dropout=0.0,
                  sequence_size=4, token_image_size=2, total_steps=100,
                  n_loss_skip=1, localization_weight=Schedule.from_str('1'))


@pytest.mark.tf_oracle
def test_migt_tf_checkpoint_import(tmp_path):
    """Write a Keras-layout TF checkpoint with the reference's variable
    structure (wte/wpe/h.N/ln/pose heads), then import it through
    read_tf_checkpoint + resolve_keras_object_paths + import_migt_from_tf."""
    tf = pytest.importorskip('tensorflow')

    from viewformer_tpu.utils.convert import (import_migt_from_tf,
                                              read_tf_checkpoint,
                                              resolve_keras_object_paths)

    d = TINY.d_model
    rng = np.random.RandomState(0)

    class Dense(tf.Module):
        def __init__(self, nin, nout, name=None):
            super().__init__(name=name)
            self.weight = tf.Variable(rng.randn(nin, nout).astype(np.float32))
            self.bias = tf.Variable(rng.randn(1, nout).astype(np.float32))

    class MLP(tf.Module):
        def __init__(self, nin, inner, nout, name=None):
            super().__init__(name=name)
            self.c_fc = Dense(nin, inner)
            self.c_proj = Dense(inner, nout)

    class LN(tf.Module):
        def __init__(self, n, name=None):
            super().__init__(name=name)
            self.gamma = tf.Variable(rng.randn(n).astype(np.float32))
            self.beta = tf.Variable(rng.randn(n).astype(np.float32))

    class Attn(tf.Module):
        def __init__(self, name=None):
            super().__init__(name=name)
            self.c_attn = Dense(d, 3 * d)
            self.c_proj = Dense(d, d)

    class Block(tf.Module):
        def __init__(self, name=None):
            super().__init__(name=name)
            self.ln_1 = LN(d)
            self.attn = Attn()
            self.ln_2 = LN(d)
            self.mlp = MLP(d, 4 * d, d)

    class PoseCriterion(tf.Module):
        def __init__(self, name=None):
            super().__init__(name=name)
            self.pose_classifier = MLP(d, 2 * d, 7)

    class RefModel(tf.Module):
        def __init__(self):
            super().__init__()
            self.wte = tf.Module()
            self.wte.weight = tf.Variable(
                rng.randn(TINY.n_embeddings + 2, d).astype(np.float32))
            self.wpe = tf.Variable(rng.randn(256, d).astype(np.float32))
            self.pose_embedding = MLP(7, 2 * d, d)
            self.pose_criterion = PoseCriterion()
            self.h = [Block() for _ in range(TINY.n_layer)]
            self.ln_f = LN(d)

    ref = RefModel()
    ckpt = tf.train.Checkpoint(model=ref)
    prefix = ckpt.save(str(tmp_path / 'ckpt'))

    variables = read_tf_checkpoint(prefix)
    resolved = resolve_keras_object_paths(variables)
    imported = import_migt_from_tf(resolved, TINY)

    params = imported['params']
    np.testing.assert_array_equal(params['wte']['embedding'], ref.wte.weight.numpy())
    np.testing.assert_array_equal(params['wpe'], ref.wpe.numpy())
    np.testing.assert_array_equal(params['h_0']['attn']['c_attn']['kernel'],
                                  ref.h[0].attn.c_attn.weight.numpy())
    np.testing.assert_array_equal(params['h_0']['attn']['c_attn']['bias'],
                                  ref.h[0].attn.c_attn.bias.numpy().reshape(-1))
    np.testing.assert_array_equal(params['h_1']['ln_2']['scale'],
                                  ref.h[1].ln_2.gamma.numpy())
    np.testing.assert_array_equal(params['pose_criterion']['pose_classifier']['c_fc']['kernel'],
                                  ref.pose_criterion.pose_classifier.c_fc.weight.numpy())

    # the imported tree must slot into a real MIGT apply
    model = MIGT(TINY)
    poses = jnp.asarray(rng.randn(1, 4, 7), jnp.float32)
    tokens = jnp.asarray(rng.randint(0, 16, (1, 4, 2, 2)))
    init_vars = model.init(jax.random.PRNGKey(0), poses, tokens, compute_losses=True)
    # same tree structure
    assert jax.tree_util.tree_structure(init_vars['params']) == \
        jax.tree_util.tree_structure(jax.tree.map(jnp.asarray, params))
    out = model.apply({'params': jax.tree.map(jnp.asarray, params)}, poses, tokens,
                      compute_losses=True)
    assert np.isfinite(float(jnp.mean(out['loss'])))


def test_lpips_forward_matches_torch_oracle():
    """The jax LPIPS port vs a torch implementation of the same architecture
    with identical RANDOM weights (real VGG weights are unavailable offline;
    this validates the port's math, not the calibration)."""
    torch = pytest.importorskip('torch')
    import torch.nn as tnn

    from viewformer_tpu.models.lpips import _VGG_SLICES, _lpips_forward

    rng = np.random.RandomState(0)
    params = {}
    convs = []
    conv_idx = 0
    for cin, cout, n_convs in _VGG_SLICES:
        cur = cin
        for _ in range(n_convs):
            w = (rng.randn(3, 3, cur, cout) * 0.05).astype(np.float32)
            b = (rng.randn(cout) * 0.01).astype(np.float32)
            params[f'conv{conv_idx}_w'] = w
            params[f'conv{conv_idx}_b'] = b
            convs.append((w, b))
            conv_idx += 1
            cur = cout
    for i in range(5):
        params[f'lin{i}_w'] = np.abs(rng.randn(_VGG_SLICES[i][1])).astype(np.float32)

    img0 = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    img1 = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1

    import jax.numpy as jnp
    ours = np.asarray(_lpips_forward({k: jnp.asarray(v) for k, v in params.items()},
                                     jnp.asarray(img0), jnp.asarray(img1)))

    # torch oracle
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    x0 = (torch.from_numpy(img0).permute(0, 3, 1, 2) - shift) / scale
    x1 = (torch.from_numpy(img1).permute(0, 3, 1, 2) - shift) / scale
    total = torch.zeros(2)
    conv_idx = 0
    with torch.no_grad():
        for block_idx, (_, _, n_convs) in enumerate(_VGG_SLICES):
            for _ in range(n_convs):
                w, b = convs[conv_idx]
                conv = tnn.Conv2d(w.shape[2], w.shape[3], 3, padding=1)
                conv.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1))
                conv.bias.data = torch.from_numpy(b)
                x0 = torch.relu(conv(x0))
                x1 = torch.relu(conv(x1))
                conv_idx += 1
            f0 = x0 / (x0.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            f1 = x1 / (x1.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            diff = (f0 - f1) ** 2
            lin = torch.from_numpy(params[f'lin{block_idx}_w']).view(1, -1, 1, 1)
            total += (diff * lin).sum(1).mean((1, 2))
            if block_idx < 4:
                x0 = torch.max_pool2d(x0, 2)
                x1 = torch.max_pool2d(x1, 2)
    np.testing.assert_allclose(ours, total.numpy(), rtol=2e-3, atol=1e-5)

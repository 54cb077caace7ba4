"""Tensor-parallel (dp x tp) transformer training on a 2x2 device mesh.

The reference has no TP (SURVEY §2.5); this validates the TPU-native scaling
extension in parallel/sharding.py: Megatron-style param layouts over the
'model' axis run through the UNCHANGED jitted train step, and produce the
same gradients/losses as the replicated-params (dp-only) run on the same
mesh — GSPMD inserts the 'model'-axis collectives.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.parallel import mesh as mesh_lib
from viewformer_tpu.parallel.sharding import (migt_param_shardings,
                                              shard_transformer_state)
from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                              init_transformer_state,
                                              make_transformer_train_step)
from viewformer_tpu.utils.schedules import Schedule

TINY = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2, dropout=0.1,
                  sequence_size=4, token_image_size=2, total_steps=100,
                  n_loss_skip=1, learning_rate=1e-3, weight_decay=0.01,
                  batch_size=4, localization_weight=Schedule.from_str('1'))


def _mesh_2x2():
    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip('needs 4 devices')
    return mesh_lib.create_mesh(data_parallelism=2, model_parallelism=2,
                                devices=devices[:4])


def _batch(mesh):
    rs = np.random.RandomState(0)
    poses = rs.randn(4, 4, 7).astype(np.float32)
    poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
    tokens = rs.randint(0, 16, (4, 4, 2, 2)).astype(np.int32)
    return mesh_lib.shard_batch(mesh, (poses, tokens))


def test_param_shardings_rules():
    mesh = _mesh_2x2()
    optimizer, _ = create_transformer_optimizer(TINY)
    _, state = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer)
    shardings = migt_param_shardings(state.params, mesh)
    flat = {'/'.join(str(k.key) for k in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
    assert flat['h_0/attn/c_attn/kernel'].spec == P(None, 'model')
    assert flat['h_0/attn/c_attn/bias'].spec == P('model')
    assert flat['h_0/attn/c_proj/kernel'].spec == P('model', None)
    assert flat['h_0/attn/c_proj/bias'].spec == P()
    assert flat['h_0/mlp/c_fc/kernel'].spec == P(None, 'model')
    assert flat['h_0/mlp/c_proj/kernel'].spec == P('model', None)
    assert flat['wte/embedding'].spec == P()
    assert flat['ln_f/scale'].spec == P()
    # pose head kernel (64, 7): out dim 7 not divisible by 2 -> replicated
    assert flat['pose_criterion/pose_classifier/c_proj/kernel'].spec == P()


def test_tp_matches_dp_gradients_and_steps():
    mesh = _mesh_2x2()
    optimizer, _ = create_transformer_optimizer(TINY)
    model, state0 = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer)
    step_fn = make_transformer_train_step(model, TINY, optimizer, donate=False)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def grads_of(params, batch, rng):
        poses, tokens = batch
        dropout_rng, pose_rng = jax.random.split(jax.random.fold_in(rng, 0))

        def loss_fn(p):
            out = model.apply({'params': p}, poses, tokens, compute_losses=True,
                              deterministic=False, step=jnp.zeros((), jnp.int32),
                              rngs={'dropout': dropout_rng, 'pose_noise': pose_rng})
            return jnp.mean(out['loss'])
        return jax.value_and_grad(loss_fn)(params)

    with mesh:
        batch = _batch(mesh)
        # dp-only reference: params replicated over the whole mesh
        dp_state = mesh_lib.replicate(mesh, state0)
        dp_loss, dp_grads = grads_of(dp_state.params, batch, key)

        # dp x tp: params sharded over 'model'
        tp_state = shard_transformer_state(state0, mesh, optimizer)
        tp_loss, tp_grads = grads_of(tp_state.params, batch, key)

        np.testing.assert_allclose(float(dp_loss), float(tp_loss),
                                   rtol=1e-5, atol=1e-6)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(jax.device_get(dp_grads))[0],
                jax.tree_util.tree_flatten_with_path(jax.device_get(tp_grads))[0]):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg='/'.join(str(k.key) for k in pa))

        # grads of sharded params come back with the params' shardings
        gflat = {'/'.join(str(k.key) for k in path): leaf.sharding
                 for path, leaf in
                 jax.tree_util.tree_flatten_with_path(tp_grads)[0]}
        assert gflat['h_0/attn/c_attn/kernel'].spec == P(None, 'model')

        # the full optimizer step executes under tp and matches dp losses
        tp_s, dp_s = tp_state, dp_state
        for _ in range(3):
            tp_s, tp_metrics = step_fn(tp_s, batch, key)
            dp_s, dp_metrics = step_fn(dp_s, batch, key)
        np.testing.assert_allclose(float(tp_metrics['loss']),
                                   float(dp_metrics['loss']),
                                   rtol=1e-4, atol=1e-5)
        assert int(tp_s.step) == 3
        # tp layouts survive the donated update chain
        pflat = {'/'.join(str(k.key) for k in path): leaf.sharding
                 for path, leaf in
                 jax.tree_util.tree_flatten_with_path(tp_s.params)[0]}
        assert pflat['h_0/mlp/c_fc/kernel'].spec == P(None, 'model')

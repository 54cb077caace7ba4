"""Context (sequence) parallelism: residual streams sharded over frames.

The reference is data-parallel only (SURVEY §2.5); this validates the second
TPU-native scaling extension (after tensor parallelism): `MIGT(sp_axis='seq')`
pins each residual stream's frame axis to the mesh's 'seq' axis via GSPMD
sharding constraints (models/migt._sp_constrain), so LN/MLP/embeddings/
dropout activations live seq-sharded and XLA inserts the K/V all-gathers
inside attention. Correctness bar: losses, gradients and full optimizer
steps equal the unconstrained (dp-only) run on the same mesh — the
constraint must be a pure layout annotation.

Validated on the CPU virtual-device mesh (dense attention path, like the tp
tests). On TPU the fused Mosaic kernels run inside the shard_map wrap from
ops/branching_attention._shard_plan (operands replicated along 'seq' inside
the manual region — attention needs all frames anyway); that path is pinned
by test_attention_shardmap and the v5e-8 topology compile in
tools/lowering_check_fullsize.py --tpu-topology.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.parallel import mesh as mesh_lib
from viewformer_tpu.parallel.sharding import shard_transformer_state
from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                              init_transformer_state,
                                              make_transformer_train_step)
from viewformer_tpu.utils.schedules import Schedule

TINY = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2, dropout=0.1,
                  sequence_size=4, token_image_size=2, total_steps=100,
                  n_loss_skip=1, learning_rate=1e-3, weight_decay=0.01,
                  batch_size=4, localization_weight=Schedule.from_str('1'))


def _mesh(data, seq, model=1):
    devices = jax.devices()
    need = data * seq * model
    if len(devices) < need:
        pytest.skip(f'needs {need} devices')
    return mesh_lib.create_mesh(data_parallelism=data, model_parallelism=model,
                                devices=devices[:need], seq_parallelism=seq)


def _batch(mesh, batch_size=4):
    rs = np.random.RandomState(0)
    poses = rs.randn(batch_size, 4, 7).astype(np.float32)
    poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
    tokens = rs.randint(0, 16, (batch_size, 4, 2, 2)).astype(np.int32)
    return mesh_lib.shard_batch(mesh, (poses, tokens))


def _grads_of(model):
    @jax.jit
    def grads(params, batch, rng):
        poses, tokens = batch
        dropout_rng, pose_rng = jax.random.split(jax.random.fold_in(rng, 0))

        def loss_fn(p):
            out = model.apply({'params': p}, poses, tokens, compute_losses=True,
                              deterministic=False, step=jnp.zeros((), jnp.int32),
                              rngs={'dropout': dropout_rng, 'pose_noise': pose_rng})
            return jnp.mean(out['loss'])
        return jax.value_and_grad(loss_fn)(params)
    return grads


def test_sp_matches_dp_gradients_and_steps():
    mesh = _mesh(data=2, seq=2)
    optimizer, _ = create_transformer_optimizer(TINY)
    model_dp, state0 = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer)
    model_sp, _ = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer,
                                         sp_axis='seq')
    key = jax.random.PRNGKey(1)

    with mesh:
        batch = _batch(mesh)
        state = mesh_lib.replicate(mesh, state0)
        dp_loss, dp_grads = _grads_of(model_dp)(state.params, batch, key)
        sp_loss, sp_grads = _grads_of(model_sp)(state.params, batch, key)

        np.testing.assert_allclose(float(dp_loss), float(sp_loss),
                                   rtol=1e-5, atol=1e-6)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(jax.device_get(dp_grads))[0],
                jax.tree_util.tree_flatten_with_path(jax.device_get(sp_grads))[0]):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg='/'.join(str(k.key) for k in pa))

        # full optimizer steps through the UNCHANGED train step
        step_dp = make_transformer_train_step(model_dp, TINY, optimizer, donate=False)
        step_sp = make_transformer_train_step(model_sp, TINY, optimizer, donate=False)
        s_dp = s_sp = state
        for _ in range(3):
            s_dp, m_dp = step_dp(s_dp, batch, key)
            s_sp, m_sp = step_sp(s_sp, batch, key)
        np.testing.assert_allclose(float(m_dp['loss']), float(m_sp['loss']),
                                   rtol=1e-4, atol=1e-5)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(jax.device_get(s_dp.params))[0],
                jax.tree_util.tree_flatten_with_path(jax.device_get(s_sp.params))[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg='/'.join(str(k.key) for k in pa))


def test_dp_sp_tp_combined_step():
    """All three parallelism axes at once on a (2, 2, 2) mesh: batch over
    'data', frames over 'seq' (activation constraints), transformer matmuls
    over 'model' (param layouts) — one train step matches the dp-only run."""
    mesh = _mesh(data=2, seq=2, model=2)
    optimizer, _ = create_transformer_optimizer(TINY)
    model_dp, state0 = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer)
    model_sp, _ = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer,
                                         sp_axis='seq')
    key = jax.random.PRNGKey(1)

    with mesh:
        batch = _batch(mesh)
        dp_state = mesh_lib.replicate(mesh, state0)
        tp_state = shard_transformer_state(state0, mesh, optimizer)
        # params carry tp layouts on the 3-axis mesh
        pflat = {'/'.join(str(k.key) for k in path): leaf.sharding
                 for path, leaf in
                 jax.tree_util.tree_flatten_with_path(tp_state.params)[0]}
        assert pflat['h_0/attn/c_attn/kernel'].spec == P(None, 'model')

        step_dp = make_transformer_train_step(model_dp, TINY, optimizer, donate=False)
        step_3d = make_transformer_train_step(model_sp, TINY, optimizer, donate=False)
        s_dp, m_dp = step_dp(dp_state, batch, key)
        s_3d, m_3d = step_3d(tp_state, batch, key)
        np.testing.assert_allclose(float(m_dp['loss']), float(m_3d['loss']),
                                   rtol=1e-4, atol=1e-5)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(jax.device_get(s_dp.params))[0],
                jax.tree_util.tree_flatten_with_path(jax.device_get(s_3d.params))[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg='/'.join(str(k.key) for k in pa))


@pytest.mark.slow
def test_train_transformer_seq_parallel_e2e(tmp_path):
    """The CLI-level loop runs with --seq-parallelism 2 (mesh (k, 2, 1))."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 devices')
    from viewformer_tpu.data import generate_dataset_from_loader, transform_dataset
    from viewformer_tpu.data.loaders import build
    from viewformer_tpu.train.transformer import train_transformer

    for split, n in (('train', 4), ('test', 2)):
        loader = build('colors', split=split, num_sequences=n, sequence_size=8,
                       image_size=16)
        generate_dataset_from_loader(loader, split, str(tmp_path / 'img' / 'colors'),
                                     max_sequences_per_shard=2, progress=False)

    class FakeCodes:
        def output_features(self, features):
            return ['codes', 'cameras']

        def update_dataset_info(self, info):
            info['token_image_size'] = 2
            return info

        def __call__(self, split, dataset):
            for item in dataset:
                codes = (item['frames'][:, ::8, ::8, 0] // 16).astype(np.int64)
                yield dict(cameras=item['cameras'], codes=codes)

    transform_dataset(str(tmp_path / 'img'), str(tmp_path / 'codes'), FakeCodes(),
                      progress=False)

    config = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=1,
                        dropout=0.0, sequence_size=4, token_image_size=2,
                        total_steps=4, batch_size=4, n_loss_skip=1,
                        localization_weight=Schedule.from_str('1'))
    state = train_transformer(config, str(tmp_path / 'codes'), str(tmp_path / 'job'),
                              epochs=2, use_bf16=False, progress=False,
                              profile_batch=0, seq_parallelism=2)
    assert int(state.step) == 4

"""Full-size tensor-parallel layout binding — the cheap (no-compile) half of
tools/lowering_check_fullsize.py, kept in the suite so a regression in
parallel/sharding.py's divisibility guard or path rules is caught
immediately. The expensive half (AOT compile of the full-size train step on
(8,1) and (4,2) virtual meshes + collective inspection) lives in the tool;
its captured output is LOWERING_r03.json."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.models.migt import MIGT
from viewformer_tpu.parallel import mesh as mesh_lib
from viewformer_tpu.parallel.sharding import (migt_param_shardings,
                                              shard_transformer_state,
                                              transformer_state_shardings)
from viewformer_tpu.train.transformer import (TransformerTrainState,
                                              create_transformer_optimizer,
                                              init_transformer_state)


def _abstract_fullsize_state():
    config = MIGTConfig(n_layer=12, d_model=768, n_head=12, sequence_size=20,
                        token_image_size=8, total_steps=200_000)
    optimizer, _ = create_transformer_optimizer(config)
    model = MIGT(config, dtype=jnp.bfloat16)

    def _init(rng):
        return model.init(rng, jnp.zeros((1, 20, 7), jnp.float32),
                          jnp.zeros((1, 20, 8, 8), jnp.int32),
                          compute_losses=True)

    variables = jax.eval_shape(_init, jax.random.PRNGKey(0))
    params = variables['params']
    opt = jax.eval_shape(optimizer.init, params)
    return config, TransformerTrainState(
        params, opt, jax.ShapeDtypeStruct((), jnp.int32))


def test_fullsize_tp_layouts_bind():
    """At reference size (12L/768d) on a (4 data, 2 model) mesh, every
    transformer-block matmul kernel + column-parallel bias must carry a
    'model'-sharded spec (no silent replication fall-back), and every Adam
    moment of those params must inherit it."""
    config, state = _abstract_fullsize_state()
    mesh = mesh_lib.create_mesh(data_parallelism=4, model_parallelism=2)
    shardings = transformer_state_shardings(state, mesh)

    flat = jax.tree_util.tree_flatten_with_path(shardings.params)[0]
    sharded = {'/'.join(str(getattr(p, 'key', '')) for p in path)
               for path, s in flat if 'model' in str(s.spec)}
    # 4 kernels + 2 column-parallel biases per block
    assert len(sharded) == config.n_layer * 6, sorted(sharded)[:8]
    for layer in range(config.n_layer):
        for want in (f'h_{layer}/attn/c_attn/kernel',
                     f'h_{layer}/attn/c_proj/kernel',
                     f'h_{layer}/mlp/c_fc/kernel',
                     f'h_{layer}/mlp/c_proj/kernel',
                     f'h_{layer}/attn/c_attn/bias',
                     f'h_{layer}/mlp/c_fc/bias'):
            assert want in sharded, want
    # embeddings / layer norms / pose heads replicate
    for never in ('wte/embedding', 'wpe', 'ln_f/scale',
                  'pose_embedding/c_fc/kernel'):
        assert not any(never in p for p in sharded), never

    flat_opt = jax.tree_util.tree_flatten_with_path(shardings.opt_state)[0]
    opt_sharded = [path for path, s in flat_opt if 'model' in str(s.spec)]
    assert len(opt_sharded) == 2 * config.n_layer * 6  # mu + nu


def test_fullsize_sharded_dims_divide():
    """The divisibility guard must never fire at reference size with a
    2- or 4-way model axis: every dim a spec shards must divide evenly."""
    config, state = _abstract_fullsize_state()
    for tp in (2, 4):
        mesh = mesh_lib.create_mesh(data_parallelism=8 // tp,
                                    model_parallelism=tp)
        shardings = migt_param_shardings(state.params, mesh)

        def check(leaf, s):
            for dim, name in zip(leaf.shape, s.spec):
                if name == 'model':
                    assert dim % tp == 0, (leaf.shape, s.spec, tp)
        jax.tree.map(check, state.params, shardings)


def test_shard_transformer_state_preserves_opt_moments():
    """Re-placement keeps existing Adam moments (ADVICE r2: the old code
    re-ran optimizer.init, silently zeroing a resumed optimizer)."""
    config = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2,
                        sequence_size=4, token_image_size=2, total_steps=100)
    optimizer, _ = create_transformer_optimizer(config)
    model, state = init_transformer_state(config, jax.random.PRNGKey(0),
                                          optimizer)
    # fabricate non-zero moments (as a resumed checkpoint would have)
    opt_state = jax.tree.map(
        lambda a: (a + 0.125).astype(a.dtype) if a.dtype == jnp.float32 else a,
        state.opt_state)
    state = TransformerTrainState(state.params, opt_state, state.step)
    mesh = mesh_lib.create_mesh(data_parallelism=4, model_parallelism=2)
    placed = shard_transformer_state(state, mesh, optimizer)
    for before, after in zip(jax.tree.leaves(state.opt_state),
                             jax.tree.leaves(placed.opt_state)):
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # and the params themselves kept their values under the tp layouts
    for before, after in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(placed.params)):
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))

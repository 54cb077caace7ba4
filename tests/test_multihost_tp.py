"""Multi-process dp x tp equality: 2 processes x 2 devices each on a global
(2 data, 2 model) mesh vs the SAME mesh inside one process.

Closes the round-2 gap where multi-process (test_multihost.py, pure dp) and
tensor-parallel (test_tensor_parallel.py, single-process) were only ever
tested apart: here the Megatron-style layouts from parallel/sharding.py span
a process boundary on the data axis (model axis stays process-local, as it
would stay intra-host on real hardware), and the full transformer train step
(AdamW + per-tensor clip + dropout rng) must produce the same losses,
gradients, and Adam moments as the identical mesh in a single process.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
mode = sys.argv[1]
out_path = sys.argv[2]
n_local = 2 if mode == 'multi' else 4
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + f' --xla_force_host_platform_device_count={n_local}')
import jax
jax.config.update('jax_platforms', 'cpu')
if mode == 'multi':
    coordinator, process_id = sys.argv[3], int(sys.argv[4])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=process_id)
else:
    process_id = 0
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
sys.path.insert(0, os.environ['REPO'])
from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.parallel import mesh as mesh_lib
from viewformer_tpu.parallel.sharding import transformer_state_shardings
from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                              init_transformer_state,
                                              make_transformer_train_step)
from viewformer_tpu.utils.schedules import Schedule

assert jax.device_count() == 4, jax.device_count()
# (2 data, 2 model): data axis spans the process boundary, model axis is
# process-local (mesh.devices reshape keeps each process's devices in one
# data row)
mesh = mesh_lib.create_mesh(data_parallelism=2, model_parallelism=2)

tconfig = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2,
                     dropout=0.1, sequence_size=4, token_image_size=2,
                     total_steps=100, n_loss_skip=1, learning_rate=1e-3,
                     weight_decay=0.01, batch_size=4,
                     localization_weight=Schedule.from_str('1'))
optimizer, _ = create_transformer_optimizer(tconfig)
model, state = init_transformer_state(tconfig, jax.random.PRNGKey(0), optimizer)

# place with the tensor-parallel layouts; multi-process placement goes
# through make_array_from_process_local_data (model-sharded leaves are
# process-local, so the full host value IS the process-local view)
shardings = transformer_state_shardings(state, mesh)
def put(x, s):
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    return jax.make_array_from_process_local_data(s, np.asarray(x))
state = jax.tree.map(put, state, shardings)

# sanity: tp layouts actually bind (c_attn kernel sharded over 'model')
spec = shardings.params['h_0']['attn']['c_attn']['kernel'].spec
assert 'model' in str(spec), spec

step_fn = make_transformer_train_step(model, tconfig, optimizer, donate=False)
rs = np.random.RandomState(0)
poses = rs.randn(4, 4, 7).astype(np.float32)
poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
tokens = rs.randint(0, 16, (4, 4, 2, 2)).astype(np.int32)
if mode == 'multi':
    lo, hi = process_id * 2, process_id * 2 + 2
    local = (poses[lo:hi], tokens[lo:hi])
else:
    local = (poses, tokens)
key = jax.random.PRNGKey(1)

@jax.jit
def t_grads(params, batch, rng):
    poses_, tokens_ = batch
    dropout_rng, pose_rng = jax.random.split(jax.random.fold_in(rng, 0))
    def loss_fn(p):
        out = model.apply({'params': p}, poses_, tokens_, compute_losses=True,
                          deterministic=False, step=jnp.zeros((), jnp.int32),
                          rngs={'dropout': dropout_rng, 'pose_noise': pose_rng})
        return jnp.mean(out['loss'])
    return jax.value_and_grad(loss_fn)(params)

def fetch(x):
    # model-sharded leaves are not fully addressable per process under
    # multi: allgather to a global host value (tiled = assembled)
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))

results = {}
with mesh:
    batch = mesh_lib.shard_batch(mesh, local)
    loss0, grads = t_grads(state.params, batch, key)
    for _ in range(2):
        batch = mesh_lib.shard_batch(mesh, local)
        state, metrics = step_fn(state, batch, key)
results['grad_loss'] = fetch(loss0)
results['loss'] = fetch(metrics['loss'])
results['step'] = fetch(state.step)
for i, leaf in enumerate(jax.tree.leaves(grads)):
    results[f'grad_{i}'] = fetch(leaf)
# Adam moments after 2 steps: proves the tp-placed optimizer state updates
# identically across the process boundary
flat_opt = jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
mu_leaves = [leaf for path, leaf in flat_opt
             if any(getattr(p, 'name', '') == 'mu' for p in path)]
assert mu_leaves
for i, leaf in enumerate(mu_leaves):
    results[f'mu_{i}'] = fetch(leaf)

if process_id == 0:
    np.savez(out_path, **results)
print(f'proc {process_id} TPOK', flush=True)
'''


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_tp_matches_single_process(tmp_path):
    import numpy as np
    script = tmp_path / 'tp_worker.py'
    script.write_text(_WORKER)
    env = dict(os.environ)
    env['REPO'] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop('XLA_FLAGS', None)

    multi_out = tmp_path / 'multi.npz'
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), 'multi', str(multi_out),
         f'127.0.0.1:{port}', str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outputs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f'multi process {i} failed:\n{out}'
        assert f'proc {i} TPOK' in out

    single_out = tmp_path / 'single.npz'
    p = subprocess.run([sys.executable, str(script), 'single', str(single_out)],
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       env=env, timeout=600)
    assert p.returncode == 0, f'single-process run failed:\n{p.stdout.decode()}'

    multi = np.load(str(multi_out))
    single = np.load(str(single_out))
    assert set(multi.files) == set(single.files)
    assert any(k.startswith('mu_') for k in multi.files)
    for key in multi.files:
        a, b = multi[key], single[key]
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(
                a, b, err_msg=f'{key} differs between 2-process dp x tp and '
                              f'single-process runs')
        else:
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=1e-6,
                err_msg=f'{key} differs between 2-process dp x tp and '
                        f'single-process runs beyond reduction-order noise')

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.config import VQGANConfig
from viewformer_tpu.data import generate_dataset_from_loader
from viewformer_tpu.data.loaders import build
from viewformer_tpu.parallel import mesh as mesh_lib
from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                           init_codebook_state,
                                           make_codebook_eval_step,
                                           make_codebook_train_step,
                                           train_codebook)

TINY = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
                   z_channels=32, embed_dim=8, n_embed=16, image_size=16,
                   perceptual_weight=0.0, batch_size=8, learning_rate=1e-3)


def test_train_step_decreases_loss():
    optimizer = create_codebook_optimizer(TINY)
    model, state = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    train_step = make_codebook_train_step(model, TINY, optimizer, donate=False)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(8, 16, 16, 3) * 2 - 1, jnp.float32)
    losses = []
    for _ in range(12):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics['total_loss']))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12
    assert int(state.quantizer['counter']) == 12


def test_train_step_sharded_on_mesh():
    mesh = mesh_lib.create_mesh()
    optimizer = create_codebook_optimizer(TINY)
    model, state = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    state = mesh_lib.replicate(mesh, state)
    train_step = make_codebook_train_step(model, TINY, optimizer, donate=False)
    batch = np.random.RandomState(0).rand(16, 16, 16, 3).astype(np.float32)
    with mesh:
        sharded = mesh_lib.shard_batch(mesh, batch)
        state2, metrics = train_step(state, sharded)
    assert np.isfinite(float(metrics['total_loss']))

    # sharded result equals single-device result
    model_s, state_s = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    step_s = make_codebook_train_step(model_s, TINY, optimizer, donate=False)
    state_single, metrics_single = step_s(state_s, jnp.asarray(batch))
    np.testing.assert_allclose(float(metrics['total_loss']),
                               float(metrics_single['total_loss']), rtol=1e-5)
    leaves = jax.tree.leaves(state2.params)
    leaves_single = jax.tree.leaves(state_single.params)
    for a, b in zip(leaves, leaves_single):
        # after one Adam step, params must agree to well under one update
        # (lr=1e-3); near-zero-gradient leaves amplify reduction-order noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.slow
def test_train_codebook_end_to_end(tmp_path):
    loader = build('colors', split='train', num_sequences=4, sequence_size=4, image_size=16)
    generate_dataset_from_loader(loader, 'train', str(tmp_path / 'ds' / 'colors'),
                                 max_sequences_per_shard=2, progress=False)
    loader = build('colors', split='test', num_sequences=2, sequence_size=4, image_size=16)
    generate_dataset_from_loader(loader, 'test', str(tmp_path / 'ds' / 'colors'),
                                 max_sequences_per_shard=2, progress=False)

    job_dir = str(tmp_path / 'job')
    import dataclasses
    cfg = dataclasses.replace(TINY, total_steps=6, batch_size=4)
    state = train_codebook(cfg, str(tmp_path / 'ds'), job_dir, epochs=2,
                           use_bf16=False, progress=False, num_val_batches=1)
    assert int(state.step) == 6

    # config.json written and checkpoint restorable
    import os
    assert os.path.exists(os.path.join(job_dir, 'config.json'))
    from viewformer_tpu.train.checkpoint import restore_checkpoint
    abstract = jax.tree.map(np.asarray, jax.device_get(state))
    restored, step = restore_checkpoint(job_dir, abstract, prefer='last')
    assert step == 6
    np.testing.assert_allclose(
        np.asarray(restored['quantizer']['counter']), np.asarray(state.quantizer['counter']))

    # resume continues from step 6
    cfg2 = dataclasses.replace(cfg, total_steps=8)
    state2 = train_codebook(cfg2, str(tmp_path / 'ds'), job_dir, epochs=2,
                            use_bf16=False, progress=False, num_val_batches=1)
    assert int(state2.step) == 8


def test_remat_matches_no_remat():
    """Rematerialized towers must give identical losses/grads."""
    optimizer = create_codebook_optimizer(TINY)
    _, state = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    model_r, state_r = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer,
                                           remat=True)
    model_n, _ = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    step_r = make_codebook_train_step(model_r, TINY, optimizer, donate=False)
    step_n = make_codebook_train_step(model_n, TINY, optimizer, donate=False)
    batch = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 3) * 2 - 1, jnp.float32)
    out_r, metrics_r = step_r(state_r, batch)
    out_n, metrics_n = step_n(state, batch)
    np.testing.assert_allclose(float(metrics_r['total_loss']),
                               float(metrics_n['total_loss']), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_r.params), jax.tree.leaves(out_n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multi_step_matches_sequential():
    """k scanned steps == k sequential steps (same batches)."""
    from viewformer_tpu.train.codebook import make_codebook_multi_step
    optimizer = create_codebook_optimizer(TINY)
    model, state = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    _, state_m = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    single = make_codebook_train_step(model, TINY, optimizer, donate=False)
    multi = make_codebook_multi_step(model, TINY, optimizer, donate=False)
    rng = np.random.RandomState(0)
    batches = jnp.asarray(rng.rand(3, 4, 16, 16, 3) * 2 - 1, jnp.float32)
    for i in range(3):
        state, m_seq = single(state, batches[i])
    state_m, m_scan = multi(state_m, batches)
    assert int(state_m.step) == 3
    np.testing.assert_allclose(float(m_scan['total_loss']), float(m_seq['total_loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state_m.params)):
        # scan vs unrolled reduction order; near-zero-grad leaves amplify noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.quantizer['embeddings']),
                               np.asarray(state_m.quantizer['embeddings']), atol=1e-4)


def test_train_step_uint8_equals_f32():
    """The wire-efficient uint8 input path matches the f32 path to float
    rounding (XLA constant-folds /255*2 into one multiply, so ~1 ulp of the
    normalize differs from the host's two-op order — nothing more)."""
    optimizer = create_codebook_optimizer(TINY)
    model, state_a = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    _, state_b = init_codebook_state(TINY, jax.random.PRNGKey(0), optimizer)
    train_step = make_codebook_train_step(model, TINY, optimizer, donate=False)
    rng = np.random.RandomState(0)
    raw = (rng.rand(8, 16, 16, 3) * 255).astype(np.uint8)
    f32 = jnp.asarray(raw.astype(np.float32) / 255.0 * 2.0 - 1.0)
    for i in range(3):
        state_a, ma = train_step(state_a, f32)
        state_b, mb = train_step(state_b, jnp.asarray(raw))
        # the full loss trajectory stays equal to float noise (per-param
        # bit-parity is NOT meaningful: Adam normalizes near-zero grads, so
        # a 1-ulp input difference flips tiny-update signs)
        np.testing.assert_allclose(np.asarray(ma['total_loss']),
                                   np.asarray(mb['total_loss']),
                                   rtol=1e-5, atol=1e-6, err_msg=f'step {i}')


@pytest.mark.slow
def test_train_log_cadence_survives_epoch_drift(tmp_path):
    """Train-metric logging must keep firing when the step counter drifts off
    the modulo grid: the reference-faithful epoch length 1+N//epochs (ref
    train_codebook_th.py limit_train_batches) plus scanned multi-step calls
    left step = 1 (mod steps_per_call) after epoch 1, and a `step %
    log_every == 0` cadence then starved train logs for the rest of the run
    (observed: 9 epochs without a train entry, 2026-08-18). The cadence is
    interval-based now; assert no gap between consecutive train entries
    exceeds log_every + steps_per_call."""
    import json
    import os

    loader = build('colors', split='train', num_sequences=4, sequence_size=4,
                   image_size=16)
    generate_dataset_from_loader(loader, 'train', str(tmp_path / 'ds' / 'colors'),
                                 max_sequences_per_shard=2, progress=False)
    loader = build('colors', split='test', num_sequences=2, sequence_size=4,
                   image_size=16)
    generate_dataset_from_loader(loader, 'test', str(tmp_path / 'ds' / 'colors'),
                                 max_sequences_per_shard=2, progress=False)

    import dataclasses
    cfg = dataclasses.replace(TINY, total_steps=40, batch_size=4)
    job_dir = str(tmp_path / 'job')
    # epochs=3 -> steps_per_epoch = 1 + 40//3 = 14: off the modulo grid
    train_codebook(cfg, str(tmp_path / 'ds'), job_dir, epochs=3,
                   use_bf16=False, progress=False, num_val_batches=1,
                   steps_per_call=5, log_every=10)
    steps = []
    with open(os.path.join(job_dir, 'metrics.jsonl')) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith('train/') for k in rec):
                steps.append(rec['step'])
    assert steps[-1] == 40
    gaps = [b - a for a, b in zip(steps, steps[1:])]
    assert steps[0] <= 15 and all(g <= 15 for g in gaps), (steps, gaps)

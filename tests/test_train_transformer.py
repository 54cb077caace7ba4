import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                              init_transformer_state,
                                              make_transformer_train_step,
                                              process_batch,
                                              warmup_cosine_schedule)
from viewformer_tpu.utils.schedules import Schedule

TINY = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2, dropout=0.0,
                  sequence_size=4, token_image_size=2, total_steps=100,
                  n_loss_skip=1, learning_rate=1e-3, weight_decay=0.01,
                  batch_size=4, localization_weight=Schedule.from_str('1'))


def _batch(rng, B=4):
    poses = rng.randn(B, 4, 7).astype(np.float32)
    poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
    tokens = rng.randint(0, 16, (B, 4, 2, 2))
    return jnp.asarray(poses), jnp.asarray(tokens)


def test_warmup_cosine_schedule():
    sched = warmup_cosine_schedule(1.0, 10000, warmup_steps=2000)
    assert float(sched(0)) == 0.0
    assert float(sched(1000)) == pytest.approx(0.5)
    assert float(sched(2000)) == pytest.approx(1.0)
    assert float(sched(6000)) == pytest.approx(0.5, abs=1e-6)
    assert float(sched(10000)) == pytest.approx(0.0, abs=1e-6)
    assert float(sched(20000)) == pytest.approx(0.0, abs=1e-6)


def test_train_step_learns():
    optimizer, _ = create_transformer_optimizer(TINY)
    model, state = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer)
    train_step = make_transformer_train_step(model, TINY, optimizer, donate=False)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, metrics = train_step(state, batch, key)
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30
    assert 0.0 <= float(metrics['acc']) <= 1.0
    assert float(metrics['localization_weight']) == 1.0


def test_weight_decay_mask():
    from viewformer_tpu.train.transformer import _weight_decay_mask
    optimizer, _ = create_transformer_optimizer(TINY)
    model, state = init_transformer_state(TINY, jax.random.PRNGKey(0), optimizer)
    mask = _weight_decay_mask(state.params)
    assert mask['h_0']['ln_1']['scale'] is False
    assert mask['h_0']['ln_1']['bias'] is False
    assert mask['h_0']['attn']['c_attn']['kernel'] is True
    assert mask['h_0']['attn']['c_attn']['bias'] is False
    assert mask['wte']['embedding'] is True


def test_process_batch_relative():
    rng = np.random.RandomState(0)
    q = rng.randn(4, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cameras = np.concatenate([rng.randn(4, 3), q], -1).astype(np.float32)
    tokens = rng.randint(0, 16, (4, 2, 2))
    out_cameras, out_tokens = process_batch(cameras, tokens, 'relative', 'train')
    # first camera canonicalized to origin + identity rotation
    np.testing.assert_allclose(out_cameras[0, :3], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.abs(out_cameras[0, 3]), 1.0, atol=1e-6)
    np.testing.assert_allclose(out_cameras[0, 4:], 0.0, atol=1e-6)
    # relative distances preserved
    orig_d = np.linalg.norm(cameras[1, :3] - cameras[2, :3])
    new_d = np.linalg.norm(out_cameras[1, :3] - out_cameras[2, :3])
    assert orig_d == pytest.approx(new_d, rel=1e-5)
    # quaternions normalized with positive w
    assert (out_cameras[:, 3] >= 0).all()


def test_process_batch_no_augment_eval():
    rng = np.random.RandomState(1)
    q = rng.randn(3, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cameras = np.concatenate([rng.randn(3, 3), q], -1).astype(np.float32)
    out, _ = process_batch(cameras, None, 'simple', 'test')
    # eval split: no augmentation beyond normalize+sign
    expected = cameras.copy()
    sign = np.sign(expected[:, 3:4])
    expected[:, 3:] *= sign
    np.testing.assert_allclose(out, expected, atol=1e-6)


@pytest.mark.slow
def test_train_transformer_end_to_end(tmp_path):
    from viewformer_tpu.data import generate_dataset_from_loader, transform_dataset
    from viewformer_tpu.data.loaders import build
    from viewformer_tpu.train.transformer import train_transformer

    for split, n in (('train', 4), ('test', 2)):
        loader = build('colors', split=split, num_sequences=n, sequence_size=8, image_size=16)
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
                n = len(item['frames'])
                codes = (item['frames'][:, ::8, ::8, 0] // 16).astype(np.int64)
                yield dict(cameras=item['cameras'], codes=codes)

    transform_dataset(str(tmp_path / 'img'), str(tmp_path / 'codes'), FakeCodes(),
                      progress=False)

    cfg = dataclasses.replace(TINY, total_steps=4, batch_size=2)
    state = train_transformer(cfg, str(tmp_path / 'codes'), str(tmp_path / 'job'),
                              epochs=2, use_bf16=False, progress=False)
    assert int(state.step) == 4

    # finetune from the checkpoint: step counter carries over
    cfg2 = dataclasses.replace(cfg, total_steps=6)
    state2 = train_transformer(cfg2, str(tmp_path / 'codes'), str(tmp_path / 'job2'),
                               finetune_from=str(tmp_path / 'job'),
                               epochs=2, use_bf16=False, progress=False)
    assert int(state2.step) == 6


def test_clamp_steps_per_call_guards_backend_killer(capsys):
    """Full-size-class configs must not launch >20-wide scanned dispatches:
    --steps-per-call 40 at 12L/768d crashed the TPU worker before the first
    step (tools/backend_crash_history.jsonl, 2026-08-18)."""
    from viewformer_tpu.train.transformer import (
        MAX_SAFE_STEPS_PER_CALL_FULLSIZE, clamp_steps_per_call)

    full = MIGTConfig(n_layer=12, d_model=768, n_head=12)
    # full size: clamped with a warning
    assert clamp_steps_per_call(40, full) == MAX_SAFE_STEPS_PER_CALL_FULLSIZE
    assert 'backend_crash_history' in capsys.readouterr().err
    # at or under the limit: untouched
    assert clamp_steps_per_call(20, full) == 20
    assert clamp_steps_per_call(1, full) == 1
    # explicit override keeps the requested width (still warns)
    assert clamp_steps_per_call(40, full, force=True) == 40
    assert 'force-wide-scan' in capsys.readouterr().err
    # tiny/debug configs are never clamped
    assert clamp_steps_per_call(64, TINY) == 64


def test_warn_policy_snapshot_hbm(capsys):
    """Activation-saving remat policies + mid-epoch snapshot saves exceeded
    HBM at full size (runtime RESOURCE_EXHAUSTED, 2026-08-19); the trainer
    must warn on the combination and stay silent otherwise."""
    from viewformer_tpu.train.transformer import warn_policy_snapshot_hbm

    full = MIGTConfig(n_layer=12, d_model=768, n_head=12)
    assert warn_policy_snapshot_hbm('attn', 50, full)
    assert 'RESOURCE_EXHAUSTED' in capsys.readouterr().err
    for policy, every, cfg in [('attn', 0, full), ('attn', None, full),
                               ('full', 50, full), (None, 50, full),
                               ('attn', 50, TINY)]:
        assert not warn_policy_snapshot_hbm(policy, every, cfg)
    assert capsys.readouterr().err == ''


def test_remat_policy_dots_matches_full_remat():
    """remat_policy trades memory for recompute only — the train step's
    metrics and updated params are identical to classic full remat (and to
    no remat at all): jax.checkpoint policies never change the math."""
    optimizer, _ = create_transformer_optimizer(TINY)
    variants = {}
    for name, kwargs in [('full', dict(remat=True)),
                         ('dots', dict(remat=True, remat_policy='dots')),
                         ('attn', dict(remat=True, remat_policy='attn')),
                         ('attn_mlp', dict(remat=True,
                                           remat_policy='attn_mlp')),
                         ('none', dict(remat=False))]:
        model, state = init_transformer_state(TINY, jax.random.PRNGKey(0),
                                              optimizer, **kwargs)
        train_step = make_transformer_train_step(model, TINY, optimizer,
                                                 donate=False)
        batch = _batch(np.random.RandomState(0))
        key = jax.random.PRNGKey(7)
        for _ in range(2):
            state, metrics = train_step(state, batch, key)
        variants[name] = (state, metrics)
    ref_state, ref_metrics = variants['full']
    for name in ('dots', 'attn', 'attn_mlp', 'none'):
        state, metrics = variants[name]
        assert float(metrics['loss']) == pytest.approx(
            float(ref_metrics['loss']), rel=1e-6), name
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
            state.params, ref_state.params)


def test_resolve_remat_policy_rejects_unknown():
    from viewformer_tpu.train.transformer import resolve_remat_policy
    assert resolve_remat_policy(None) is None
    assert resolve_remat_policy('full') is None
    assert resolve_remat_policy('dots') is not None
    assert resolve_remat_policy('attn') is not None
    assert resolve_remat_policy('attn_mlp') is not None
    with pytest.raises(ValueError):
        resolve_remat_policy('bogus')

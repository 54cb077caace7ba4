import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.models.migt import MIGT
from viewformer_tpu.utils.schedules import Schedule

TINY = MIGTConfig(n_embeddings=32, n_head=2, d_model=32, n_layer=2, dropout=0.0,
                  sequence_size=4, token_image_size=2, total_steps=100, n_loss_skip=1,
                  localization_weight=Schedule.from_str('1'))


@pytest.fixture(scope='module')
def model_and_vars():
    model = MIGT(TINY)
    rng = np.random.RandomState(0)
    poses = jnp.asarray(rng.randn(2, 4, 7), jnp.float32)
    tokens = jnp.asarray(rng.randint(0, 32, (2, 4, 2, 2)))
    variables = model.init(jax.random.PRNGKey(0), poses, tokens, compute_losses=True)
    return model, variables, poses, tokens


def test_train_forward_outputs(model_and_vars):
    model, variables, poses, tokens = model_and_vars
    out = model.apply(variables, poses, tokens, compute_losses=True, step=50)
    assert out['logits'].shape == (2, 4, 2, 2, 32)
    assert out['loss'].shape == (2,)
    assert out['ce_loss'].shape == (2,)
    assert out['pose_prediction'].shape == (2, 4, 4, 7)  # [B, T, L, 7]
    assert np.isfinite(np.asarray(out['loss'])).all()
    assert float(out['localization_weight']) == 1.0
    # quaternions normalized
    norms = np.linalg.norm(np.asarray(out['pose_prediction'])[..., 3:], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_eval_single_shot_generation(model_and_vars):
    """The evaluate-transformer path: context codes + mask-token last frame."""
    model, variables, poses, tokens = model_and_vars
    masked = jnp.concatenate([tokens[:, :-1],
                              jnp.full_like(tokens[:, :1], model.mask_token)], 1)
    out = model.apply(variables, poses, masked, compute_losses=False)
    assert out['logits'].shape == (2, 4, 2, 2, 32)
    assert 'ce_loss' not in out
    generated = jnp.argmax(out['logits'], -1)[:, -1]
    assert generated.shape == (2, 2, 2)


def test_eval_localization_path(model_and_vars):
    """Localization: full codes, poses for all but the query frame
    (ref evaluate_transformer.py:134-136)."""
    model, variables, poses, tokens = model_and_vars
    out = model.apply(variables, poses[:, :-1], tokens, compute_losses=False)
    assert out['pose_prediction'].shape == (2, 4, 4, 7)
    reduced = model.apply(variables, out['pose_prediction'][:, -1:],
                          method=MIGT.reduce_cameras)
    assert reduced.shape == (2, 1, 7)


def test_eval_multictx_path(model_and_vars):
    """Multi-context eval: explicit localization_tokens + output_poses
    (ref evaluate_transformer_multictx.py:59-77)."""
    model, variables, poses, tokens = model_and_vars
    masked = jnp.concatenate([tokens[:, :-1],
                              jnp.full_like(tokens[:, :1], model.mask_token)], 1)
    ctx_poses = jnp.concatenate([poses[:, :-1], jnp.zeros_like(poses[:, :1])], 1)
    query_poses = jnp.tile(poses[:, -1:], (1, 4, 1))
    query_tokens = jnp.tile(tokens[:, -1:], (1, 4, 1, 1))
    out = model.apply(variables, ctx_poses, masked,
                      localization_tokens=query_tokens, output_poses=query_poses,
                      compute_losses=False)
    assert out['logits'].shape == (2, 4, 2, 2, 32)
    assert out['pose_prediction'].shape == (2, 4, 4, 7)


def test_multictx_equals_per_context_size(model_and_vars):
    """THE correctness check for branching attention (SURVEY hard part #1):
    the position-t output of the generation stream with tiled query must
    equal a separate single-query forward with context size t."""
    model, variables, poses, tokens = model_and_vars
    query_poses = jnp.tile(poses[:, -1:], (1, 4, 1))
    multictx = model.apply(variables, poses, tokens,
                           output_poses=query_poses, compute_losses=False)
    logits_all = np.asarray(multictx['logits'])

    for ctx in range(1, 4):
        # single-shot forward with ctx context frames + masked query frame
        ids = jnp.concatenate([tokens[:, :ctx],
                               jnp.full_like(tokens[:, :1], model.mask_token)], 1)
        p = jnp.concatenate([poses[:, :ctx], poses[:, -1:]], 1)
        single = model.apply(variables, p, ids, compute_losses=False)
        single_logits = np.asarray(single['logits'])[:, -1]
        np.testing.assert_allclose(logits_all[:, ctx], single_logits, atol=2e-4,
                                   err_msg=f'context size {ctx}')


def test_label_smoothing_and_skip():
    import dataclasses
    cfg = dataclasses.replace(TINY, label_smoothing=0.1, n_loss_skip=2)
    model = MIGT(cfg)
    rng = np.random.RandomState(1)
    poses = jnp.asarray(rng.randn(1, 4, 7), jnp.float32)
    tokens = jnp.asarray(rng.randint(0, 32, (1, 4, 2, 2)))
    variables = model.init(jax.random.PRNGKey(0), poses, tokens, compute_losses=True)
    out = model.apply(variables, poses, tokens, compute_losses=True)
    assert np.isfinite(float(out['loss'][0]))


def test_localization_weight_schedule():
    import dataclasses
    cfg = dataclasses.replace(TINY, localization_weight=Schedule.from_str('cosine(0,1,100)'))
    model = MIGT(cfg)
    rng = np.random.RandomState(1)
    poses = jnp.asarray(rng.randn(1, 4, 7), jnp.float32)
    tokens = jnp.asarray(rng.randint(0, 32, (1, 4, 2, 2)))
    variables = model.init(jax.random.PRNGKey(0), poses, tokens, compute_losses=True)
    out0 = model.apply(variables, poses, tokens, compute_losses=True, step=0)
    out50 = model.apply(variables, poses, tokens, compute_losses=True, step=50)
    assert float(out0['localization_weight']) == pytest.approx(0.0)
    assert float(out50['localization_weight']) == pytest.approx(0.5)


def test_no_localization_when_weight_zero():
    import dataclasses
    cfg = dataclasses.replace(TINY, localization_weight=Schedule.zero())
    model = MIGT(cfg)
    rng = np.random.RandomState(1)
    poses = jnp.asarray(rng.randn(1, 4, 7), jnp.float32)
    tokens = jnp.asarray(rng.randint(0, 32, (1, 4, 2, 2)))
    variables = model.init(jax.random.PRNGKey(0), poses, tokens, compute_losses=True)
    out = model.apply(variables, poses, tokens, compute_losses=True)
    assert 'pose_prediction' not in out
    assert 'pose_loss' not in out


def test_dropout_rngs():
    import dataclasses
    cfg = dataclasses.replace(TINY, dropout=0.2, random_pose_multiplier=2.0)
    model = MIGT(cfg)
    rng = np.random.RandomState(1)
    poses = jnp.asarray(rng.randn(1, 4, 7), jnp.float32)
    tokens = jnp.asarray(rng.randint(0, 32, (1, 4, 2, 2)))
    variables = model.init(jax.random.PRNGKey(0), poses, tokens, compute_losses=True)
    out1 = model.apply(variables, poses, tokens, compute_losses=True, deterministic=False,
                       rngs={'dropout': jax.random.PRNGKey(1),
                             'pose_noise': jax.random.PRNGKey(2)})
    out2 = model.apply(variables, poses, tokens, compute_losses=True, deterministic=False,
                       rngs={'dropout': jax.random.PRNGKey(3),
                             'pose_noise': jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(out1['loss']), np.asarray(out2['loss']))

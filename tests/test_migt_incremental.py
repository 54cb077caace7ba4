"""KV-cached incremental generation must match the one-shot forward exactly."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.models import migt_incremental as inc
from viewformer_tpu.models.migt import MIGT
from viewformer_tpu.utils.schedules import Schedule

TINY = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2, dropout=0.0,
                  sequence_size=4, token_image_size=2, total_steps=100,
                  n_loss_skip=1, localization_weight=Schedule.zero())


@pytest.fixture(scope='module')
def setup():
    model = MIGT(TINY)
    rng = np.random.RandomState(0)
    poses = rng.randn(2, 4, 7).astype(np.float32)
    poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
    tokens = rng.randint(0, 16, (2, 4, 2, 2))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(poses),
                           jnp.asarray(tokens), compute_losses=True)
    return model, variables['params'], jnp.asarray(poses), jnp.asarray(tokens)


def test_incremental_matches_one_shot(setup):
    model, params, poses, tokens = setup
    B, T = tokens.shape[:2]

    # one-shot: 3 context frames + masked query frame
    masked = jnp.concatenate([tokens[:, :3],
                              jnp.full_like(tokens[:, :1], model.mask_token)], 1)
    one_shot = model.apply({'params': params}, poses, masked, compute_losses=False)
    expected = np.asarray(one_shot['logits'])[:, -1]

    # incremental: extend cache with 3 context frames, generate the query
    cache = inc.init_cache(TINY, B, max_frames=8)
    for t in range(3):
        cache = inc.extend_cache(model, params, cache, tokens[:, t], poses[:, t])
    assert int(cache['n']) == 3
    logits = np.asarray(inc.generate_frame(model, params, cache, poses[:, -1]))
    np.testing.assert_allclose(logits, expected, atol=2e-4)


def test_incremental_each_context_size(setup):
    """Chained generation: logits after n cached frames == one-shot with n
    context frames, for every n."""
    model, params, poses, tokens = setup
    B = tokens.shape[0]
    cache = inc.init_cache(TINY, B, max_frames=8)
    for n in range(1, 4):
        cache = inc.extend_cache(model, params, cache, tokens[:, n - 1], poses[:, n - 1])
        logits = np.asarray(inc.generate_frame(model, params, cache, poses[:, -1]))
        masked = jnp.concatenate([tokens[:, :n],
                                  jnp.full_like(tokens[:, :1], model.mask_token)], 1)
        p = jnp.concatenate([poses[:, :n], poses[:, -1:]], 1)
        one_shot = model.apply({'params': params}, p, masked, compute_losses=False)
        np.testing.assert_allclose(logits, np.asarray(one_shot['logits'])[:, -1],
                                   atol=2e-4, err_msg=f'context size {n}')


def test_scan_cache_build_matches_sequential(setup):
    """Building the cache with lax.scan over frames (the bench --serve /
    batch-serving path) must equal sequential extend_cache calls."""
    model, params, poses, tokens = setup
    B = tokens.shape[0]

    seq_cache = inc.init_cache(TINY, B, max_frames=8)
    for t in range(3):
        seq_cache = inc.extend_cache(model, params, seq_cache, tokens[:, t], poses[:, t])

    @jax.jit
    def build(params, tokens, poses):
        cache = inc.init_cache(TINY, B, max_frames=8)

        def step(cache, inp):
            tok, pose = inp
            return inc.extend_cache(model, params, cache, tok, pose), None

        cache, _ = jax.lax.scan(
            step, cache, (tokens.transpose(1, 0, 2, 3), poses.transpose(1, 0, 2)))
        return cache

    scan_cache = build(params, tokens[:, :3], poses[:, :3])
    assert int(scan_cache['n']) == 3
    np.testing.assert_allclose(np.asarray(scan_cache['k']),
                               np.asarray(seq_cache['k']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scan_cache['v']),
                               np.asarray(seq_cache['v']), atol=1e-5)


def test_prefill_matches_sequential(setup):
    """Batched prefill (one block-causal pass) must equal sequential
    extend_cache frame appends, and prefill+generate must equal the one-shot
    forward."""
    model, params, poses, tokens = setup
    B = tokens.shape[0]

    seq_cache = inc.init_cache(TINY, B, max_frames=8)
    for t in range(3):
        seq_cache = inc.extend_cache(model, params, seq_cache, tokens[:, t], poses[:, t])

    pre_cache = inc.prefill_cache(model, params, tokens[:, :3], poses[:, :3],
                                  max_frames=8)
    assert int(pre_cache['n']) == 3
    assert pre_cache['k'].shape == seq_cache['k'].shape
    np.testing.assert_allclose(np.asarray(pre_cache['k']),
                               np.asarray(seq_cache['k']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pre_cache['v']),
                               np.asarray(seq_cache['v']), atol=1e-5)

    masked = jnp.concatenate([tokens[:, :3],
                              jnp.full_like(tokens[:, :1], model.mask_token)], 1)
    one_shot = model.apply({'params': params}, poses, masked, compute_losses=False)
    logits = np.asarray(inc.generate_frame(model, params, pre_cache, poses[:, -1]))
    np.testing.assert_allclose(logits, np.asarray(one_shot['logits'])[:, -1],
                               atol=2e-4)


def test_localize_matches_one_shot_eval():
    """localize_frame == the one-shot eval localization path (query frame in
    stream 0 with the loc-token embedding as its pose; ref migt.py:387-390)."""
    config = dataclasses.replace(TINY, localization_weight=Schedule.from_str('1'))
    model = MIGT(config)
    rng = np.random.RandomState(1)
    poses = rng.randn(2, 4, 7).astype(np.float32)
    poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
    tokens = jnp.asarray(rng.randint(0, 16, (2, 4, 2, 2)))
    poses = jnp.asarray(poses)
    variables = model.init(jax.random.PRNGKey(2), poses, tokens,
                           compute_losses=True)
    params = variables['params']

    one_shot = model.apply({'params': params}, poses[:, :3], tokens,
                           compute_losses=False)
    expected = np.asarray(one_shot['pose_prediction'])[:, -1]  # [B, L, 7]

    cache = inc.prefill_cache(model, params, tokens[:, :3], poses[:, :3])
    pred = np.asarray(inc.localize_frame(model, params, cache, tokens[:, 3]))
    np.testing.assert_allclose(pred, expected, atol=2e-4)


def test_prefill_trailing_pad_frame_is_inert(setup):
    """valid_frames semantics: prefilling T+1 frames (trailing dummy) with
    valid_frames=T produces identical generate_frame output — block-causal
    attention means trailing frames cannot affect earlier frames' K/V."""
    model, params, poses, tokens = setup
    plain = inc.prefill_cache(model, params, tokens[:, :3], poses[:, :3])
    padded_tokens = jnp.concatenate(
        [tokens[:, :3], jnp.zeros_like(tokens[:, :1])], 1)
    padded = inc.prefill_cache(model, params, padded_tokens, poses,
                               valid_frames=3)
    assert int(padded['n']) == 3
    np.testing.assert_allclose(np.asarray(padded['k'][:, :, :, :3]),
                               np.asarray(plain['k']), atol=1e-6)
    a = np.asarray(inc.generate_frame(model, params, plain, poses[:, -1]))
    b = np.asarray(inc.generate_frame(model, params, padded, poses[:, -1]))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_prefill_jits_without_padding(setup):
    model, params, poses, tokens = setup
    B = tokens.shape[0]
    pre = jax.jit(lambda p, t, po: inc.prefill_cache(model, p, t, po))
    cache = pre(params, tokens[:, :3], poses[:, :3])
    assert cache['k'].shape[3] == 3
    logits = inc.generate_frame(model, params, cache, poses[:, -1])
    assert np.isfinite(np.asarray(logits)).all()


def test_incremental_jits(setup):
    model, params, poses, tokens = setup
    B = tokens.shape[0]
    cache = inc.init_cache(TINY, B, max_frames=8)
    extend = jax.jit(lambda p, c, t, po: inc.extend_cache(model, p, c, t, po))
    generate = jax.jit(lambda p, c, po: inc.generate_frame(model, p, c, po))
    for t in range(3):
        cache = extend(params, cache, tokens[:, t], poses[:, t])
    logits = generate(params, cache, poses[:, -1])
    assert logits.shape == (B, 2, 2, 16)
    assert np.isfinite(np.asarray(logits)).all()


def test_non_square_grid_cache(setup):
    """The cache carries its (h, w) grid as static aux (ADVICE r2 #2): a
    non-square token grid must reshape generate_frame logits correctly (the
    old isqrt guess transposed 2x4 grids), survive jit/extend, and the
    localization path must accept the same grid."""
    model, params, poses, _ = setup
    rng = np.random.RandomState(3)
    tokens = jnp.asarray(rng.randint(0, 16, (2, 4, 2, 4)))  # 2x4 grid, L=8

    cache = inc.prefill_cache(model, params, tokens[:, :3], poses[:, :3])
    assert cache.grid == (2, 4)
    logits = inc.generate_frame(model, params, cache, poses[:, -1])
    assert logits.shape == (2, 2, 4, 16)

    # one-shot oracle on the same non-square grid
    masked = jnp.concatenate([tokens[:, :3],
                              jnp.full_like(tokens[:, :1], model.mask_token)], 1)
    one_shot = model.apply({'params': params}, poses, masked,
                           compute_losses=False)
    expected = np.asarray(one_shot['logits'])[:, -1].reshape(2, 2, 4, 16)
    np.testing.assert_allclose(np.asarray(logits), expected, atol=2e-4)

    # grid survives a jitted extend (static aux through tracing)
    extend = jax.jit(lambda p, c, t, po: inc.extend_cache(model, p, c, t, po))
    cache2 = extend(params, cache, tokens[:, 3], poses[:, 3])
    assert cache2.grid == (2, 4)
    assert int(cache2['n']) == 4

"""ServingSession (KV-cache serving path) must match the one-shot eval path,
and the `viewformer-cli serve` JSONL protocol must drive it end to end."""
import io
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.config import MIGTConfig, VQGANConfig
from viewformer_tpu.models.migt import MIGT
from viewformer_tpu.models.vqgan import VQGAN
from viewformer_tpu.ops.image import resize
from viewformer_tpu.serve import ServingSession
from viewformer_tpu.utils.schedules import Schedule

CCONFIG = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                      attn_resolutions=[], z_channels=32, embed_dim=8,
                      n_embed=16, image_size=32, perceptual_weight=0.0)
TCONFIG = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2,
                     dropout=0.0, sequence_size=5, token_image_size=16,
                     total_steps=10, n_loss_skip=1,
                     localization_weight=Schedule.from_str('1'))


@pytest.fixture(scope='module')
def setup():
    cmodel = VQGAN(CCONFIG)
    tmodel = MIGT(TCONFIG)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    cvars = cmodel.init({'params': k1, 'quantizer': k2},
                        jnp.zeros((1, 32, 32, 3), jnp.float32), training=False)
    tvars = tmodel.init(k3, jnp.zeros((1, 5, 7), jnp.float32),
                        jnp.zeros((1, 5, 16, 16), jnp.int32),
                        compute_losses=False)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (2, 4, 32, 32, 3)).astype(np.uint8)
    cameras = rng.randn(2, 4, 7).astype(np.float32)
    cameras[..., 3:] /= np.linalg.norm(cameras[..., 3:], axis=-1, keepdims=True)
    return cmodel, cvars, tmodel, tvars, images, cameras


def one_shot_predict(cmodel, cvars, tmodel, tvars, images, cameras):
    """The evaluate-path one-shot forward: encode context+query, mask the
    query frame, one transformer pass (mirrors evaluate/transformer.py)."""
    from viewformer_tpu.evaluate.transformer import (normalize_cameras,
                                                     to_relative_cameras)

    B, S = images.shape[:2]
    x = resize(images.reshape((-1,) + images.shape[2:]), CCONFIG.image_size)
    x = jnp.asarray(x.astype(np.float32) / 255.0 * 2.0 - 1.0)
    cv = {'params': cvars['params'], 'quantizer': cvars['quantizer']}
    _q, _l, codes = cmodel.apply(cv, x, training=False, method=VQGAN.encode)
    codes = codes.reshape(B, S, *codes.shape[-2:]).astype(jnp.int32)

    cams = jnp.asarray(cameras)
    if tmodel.config.augment_poses == 'relative':
        cams, _ = to_relative_cameras(cams)
    cams = normalize_cameras(cams)
    masked = jnp.concatenate(
        [codes[:, :-1], jnp.full_like(codes[:, :1], tmodel.mask_token)], 1)
    out = tmodel.apply({'params': tvars['params']}, cams, masked,
                       compute_losses=False)
    logits = np.asarray(out['logits'])[:, -1]
    gen_codes = logits.argmax(-1)
    dec = cmodel.apply(cv, jnp.asarray(gen_codes), method=VQGAN.decode_code)
    dec = ((jnp.clip(dec, -1, 1) / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)
    return logits, gen_codes, np.asarray(dec)


def test_session_render_matches_one_shot(setup):
    cmodel, cvars, tmodel, tvars, images, cameras = setup
    assert tmodel.config.augment_poses == 'relative'  # the interesting path
    session = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                             max_frames=8)
    session.start(images[:, :3], cameras[:, :3])
    assert session.context_frames == 3

    expected_logits, expected_codes, expected_images = one_shot_predict(
        cmodel, cvars, tmodel, tvars, images, cameras)

    logits = session.render_logits(cameras[:, 3:4])
    np.testing.assert_allclose(logits[:, 0], expected_logits, atol=2e-4)
    rendered, codes = session.render(cameras[:, 3], return_tokens=True)
    np.testing.assert_array_equal(codes, expected_codes)
    np.testing.assert_array_equal(rendered, expected_images)


def test_observe_extends_context(setup):
    """start(2 frames) + observe(1 frame) == one-shot with 3 context frames
    (the stored canonicalization transform must keep matching the one-shot
    relative-camera path, which is anchored to frame 0)."""
    cmodel, cvars, tmodel, tvars, images, cameras = setup
    session = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                             max_frames=8)
    session.start(images[:, :2], cameras[:, :2])
    session.observe(images[:, 2], cameras[:, 2])
    assert session.context_frames == 3

    expected_logits, _, _ = one_shot_predict(
        cmodel, cvars, tmodel, tvars, images, cameras)
    logits = session.render_logits(cameras[:, 3:4])
    np.testing.assert_allclose(logits[:, 0], expected_logits, atol=2e-4)


def test_localize_matches_one_shot_eval(setup):
    """session.localize == the evaluate-path localization (full-codes pass,
    pose head on the query frame, quaternion-mean reduce, un-canonicalize)."""
    from viewformer_tpu.evaluate.transformer import (from_relative_cameras,
                                                     normalize_cameras,
                                                     to_relative_cameras)

    cmodel, cvars, tmodel, tvars, images, cameras = setup
    session = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                             max_frames=8)
    session.start(images[:, :3], cameras[:, :3])
    assert session.can_localize
    predicted = session.localize(images[:, 3])

    # oracle: the one-shot eval localization (mirrors evaluate/transformer.py
    # LOCALIZE stage: context poses + ALL codes incl. the query frame)
    x = resize(images.reshape((-1,) + images.shape[2:]), CCONFIG.image_size)
    x = jnp.asarray(x.astype(np.float32) / 255.0 * 2.0 - 1.0)
    cv = {'params': cvars['params'], 'quantizer': cvars['quantizer']}
    _q, _l, codes = cmodel.apply(cv, x, training=False, method=VQGAN.encode)
    codes = codes.reshape(2, 4, *codes.shape[-2:]).astype(jnp.int32)
    cams, transform = to_relative_cameras(jnp.asarray(cameras))
    cams = normalize_cameras(cams)
    out = tmodel.apply({'params': tvars['params']}, cams[:, :3], codes,
                       compute_losses=False)
    reduced = tmodel.apply({'params': tvars['params']},
                           out['pose_prediction'][:, -1:],
                           method=MIGT.reduce_cameras)
    expected = np.asarray(from_relative_cameras(reduced, transform))[:, 0]
    np.testing.assert_allclose(predicted, expected, atol=2e-4)


def test_render_many_views_via_vmap(setup):
    """[B, N, 7] rendering (vmap over queries, shared cache) must equal
    per-view rendering."""
    cmodel, cvars, tmodel, tvars, images, cameras = setup
    session = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                             max_frames=8)
    session.start(images[:, :3], cameras[:, :3])
    queries = np.stack([cameras[:, 3], cameras[:, 0]], 1)  # [B, 2, 7]
    batch = session.render(queries)
    assert batch.shape == (2, 2, 32, 32, 3)
    for n in range(2):
        single = session.render(queries[:, n])
        np.testing.assert_array_equal(batch[:, n], single)


def test_session_errors(setup):
    cmodel, cvars, tmodel, tvars, images, cameras = setup
    session = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                             max_frames=3)
    with pytest.raises(RuntimeError, match='start'):
        session.render(cameras[:, 0])
    with pytest.raises(RuntimeError, match='start'):
        session.observe(images[:, 0], cameras[:, 0])
    session.start(images[:, :3], cameras[:, :3])
    with pytest.raises(RuntimeError, match='context full'):
        session.observe(images[:, 3], cameras[:, 3])
    with pytest.raises(ValueError, match='images'):
        session.start(images[:, :3, 0], cameras[:, :3])  # missing frame axis
    with pytest.raises(ValueError, match='context size'):
        ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                       max_frames=2).start(images[:, :3], cameras[:, :3])


def test_serve_loop_protocol(tmp_path):
    """Drive the full `viewformer-cli serve` JSONL protocol against tiny
    checkpoints on disk: ready banner, start, observe, render (file output),
    error reporting, stop."""
    from PIL import Image

    from viewformer_tpu.commands.serve import serve_loop
    from viewformer_tpu.train.checkpoint import CheckpointManager
    from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                               init_codebook_state)
    from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                                  init_transformer_state)

    coptimizer = create_codebook_optimizer(CCONFIG)
    _, cstate = init_codebook_state(CCONFIG, jax.random.PRNGKey(0), coptimizer)
    mgr = CheckpointManager(str(tmp_path / 'codebook'), CCONFIG)
    mgr.save(0, cstate)
    mgr.close()
    toptimizer, _ = create_transformer_optimizer(TCONFIG)
    _, tstate = init_transformer_state(TCONFIG, jax.random.PRNGKey(1), toptimizer)
    tmgr = CheckpointManager(str(tmp_path / 'transformer'), TCONFIG)
    tmgr.save(0, tstate)
    tmgr.close()

    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    cameras = rng.randn(4, 7)
    cameras[:, 3:] /= np.linalg.norm(cameras[:, 3:], axis=-1, keepdims=True)
    paths = []
    for i, frame in enumerate(frames):
        path = str(tmp_path / f'ctx{i}.png')
        Image.fromarray(frame).save(path)
        paths.append(path)
    out_png = str(tmp_path / 'render.png')

    requests = [
        {'op': 'status'},
        {'op': 'start', 'images': paths[:2],
         'cameras': cameras[:2].tolist()},
        {'op': 'observe', 'image': paths[2], 'camera': cameras[2].tolist()},
        {'op': 'render', 'camera': cameras[3].tolist(), 'output': out_png},
        {'op': 'localize', 'image': paths[3]},
        {'op': 'bogus'},
        {'op': 'stop'},
    ]
    stdin = io.StringIO(''.join(json.dumps(r) + '\n' for r in requests))
    stdout = io.StringIO()
    serve_loop(str(tmp_path / 'transformer'), str(tmp_path / 'codebook'),
               use_bfloat16=False, input_stream=stdin, output_stream=stdout)

    responses = [json.loads(line) for line in stdout.getvalue().splitlines()]
    assert responses[0] == {'ok': True, 'op': 'ready', 'max_frames': 4,
                            'image_size': 32, 'localize': True}
    assert responses[1]['ok'] and not responses[1]['started']
    assert responses[1]['localize'] is True
    assert responses[2]['ok'] and responses[2]['context_frames'] == 2
    assert responses[3]['ok'] and responses[3]['context_frames'] == 3
    assert responses[4]['ok'] and responses[4]['outputs'] == [out_png]
    assert responses[5]['ok'] and len(responses[5]['camera']) == 7
    assert np.isfinite(responses[5]['camera']).all()
    assert not responses[6]['ok'] and 'bogus' in responses[6]['error']
    assert responses[7] == {'ok': True, 'op': 'stop'}
    assert os.path.exists(out_png)
    assert np.asarray(Image.open(out_png)).shape == (32, 32, 3)


def test_session_mesh_equals_single(setup):
    """A mesh-sharded session (scene batch over the data axis) must produce
    identical renders/localizations to the single-device session."""
    from viewformer_tpu.parallel import mesh as mesh_lib

    cmodel, cvars, tmodel, tvars, images, cameras = setup
    single = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                            max_frames=8)
    mesh = mesh_lib.create_mesh_for_batch(2)
    assert mesh.shape['data'] == 2
    sharded = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                             max_frames=8, mesh=mesh)
    for session in (single, sharded):
        session.start(images[:, :2], cameras[:, :2])
        session.observe(images[:, 2], cameras[:, 2])
    img_a, codes_a = single.render(cameras[:, 3], return_tokens=True)
    img_b, codes_b = sharded.render(cameras[:, 3], return_tokens=True)
    np.testing.assert_array_equal(codes_a, codes_b)
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_allclose(single.localize(images[:, 3]),
                               sharded.localize(images[:, 3]), atol=1e-5)


def test_context_beyond_trained_length(setup):
    """max_frames may exceed the trained context (sequence_size - 1 = 4):
    nothing architectural pins the frame count (wpe is per-token within a
    frame), so a session can keep observing; rendering over 6 cached frames
    must produce finite, mask-consistent outputs."""
    cmodel, cvars, tmodel, tvars, images, cameras = setup
    assert tmodel.config.sequence_size - 1 == 4
    session = ServingSession(tmodel, tvars, cmodel, cvars, batch_size=2,
                             max_frames=8)
    session.start(images[:, :4], cameras[:, :4])
    for t in (0, 1):  # re-observe frames: context grows to 6 > 4
        session.observe(images[:, t], cameras[:, t])
    assert session.context_frames == 6
    logits = session.render_logits(cameras[:, 3:4])
    assert np.isfinite(logits).all()
    rendered = session.render(cameras[:, 3])
    assert rendered.shape == (2, 32, 32, 3)

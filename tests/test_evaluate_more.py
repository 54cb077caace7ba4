"""Tests for multictx-allimg and generate-gqn-images evaluators."""
import json
import os

import numpy as np
import pytest

import jax

from viewformer_tpu.config import MIGTConfig, VQGANConfig
from viewformer_tpu.data import generate_dataset_from_loader
from viewformer_tpu.data.loaders import build
from viewformer_tpu.utils.schedules import Schedule


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    from viewformer_tpu.train.checkpoint import CheckpointManager
    from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                               init_codebook_state)
    from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                                  init_transformer_state)

    root = tmp_path_factory.mktemp('more')
    for split, n in (('train', 3), ('test', 2)):
        loader = build('colors', split=split, num_sequences=n, sequence_size=5,
                       image_size=32)
        generate_dataset_from_loader(loader, split, str(root / 'ds' / 'colors'),
                                     max_sequences_per_shard=2, progress=False)

    cconfig = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
                          z_channels=32, embed_dim=8, n_embed=16, image_size=32,
                          perceptual_weight=0.0)
    coptimizer = create_codebook_optimizer(cconfig)
    _, cstate = init_codebook_state(cconfig, jax.random.PRNGKey(0), coptimizer)
    mgr = CheckpointManager(str(root / 'codebook'), cconfig)
    mgr.save(0, cstate)
    mgr.close()

    tconfig = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=1, dropout=0.0,
                         sequence_size=5, token_image_size=16, total_steps=10,
                         n_loss_skip=1, localization_weight=Schedule.from_str('1'))
    # image 32 / stride 2 -> token grid 16x16
    toptimizer, _ = create_transformer_optimizer(tconfig)
    _, tstate = init_transformer_state(tconfig, jax.random.PRNGKey(1), toptimizer)
    tmgr = CheckpointManager(str(root / 'transformer'), tconfig)
    tmgr.save(0, tstate)
    tmgr.close()
    return str(root)


@pytest.mark.slow
def test_multictx_allimg(setup, tmp_path):
    from viewformer_tpu.evaluate.multictx_allimg import \
        evaluate_transformer_multictx_allimg

    loader = build('dataset', path=os.path.join(setup, 'ds'), split='test')
    job = str(tmp_path / 'allimg')
    result = evaluate_transformer_multictx_allimg(
        loader, os.path.join(setup, 'transformer'), os.path.join(setup, 'codebook'),
        job, context_views=[0, 2], num_eval_sequences=1, progress=False)
    assert 'ctx01' in result and 'ctx02' in result
    assert np.isfinite(result['ctx02']['psnr'])
    # image tree written: gen-00..02, gt, ctx
    seq_dir = os.path.join(job, 'gen_images', '000000')
    assert os.path.exists(os.path.join(seq_dir, 'gt', '000.png'))
    assert os.path.exists(os.path.join(seq_dir, 'gen-02', '004.png'))
    assert os.path.exists(os.path.join(seq_dir, 'ctx'))


@pytest.mark.slow
def test_multictx_allimg_keep_last_frame(setup, tmp_path):
    from viewformer_tpu.evaluate.multictx_allimg import \
        evaluate_transformer_multictx_allimg

    loader = build('dataset', path=os.path.join(setup, 'ds'), split='test')
    result = evaluate_transformer_multictx_allimg(
        loader, os.path.join(setup, 'transformer'), os.path.join(setup, 'codebook'),
        str(tmp_path / 'chain'), context_views=[0], keep_last_frame=True,
        num_eval_sequences=1, progress=False)
    assert np.isfinite(result['ctx01']['psnr'])


def test_pad_batch_for_jit_unit():
    from viewformer_tpu.evaluate.transformer import pad_batch_for_jit

    key = object()  # unique key so the module-level size cache stays clean
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    (out,), b = pad_batch_for_jit(key, [a])
    assert b == 3 and out.shape == (3, 4)  # first (full) batch: no padding
    (out,), b = pad_batch_for_jit(key, [a[:1]])
    assert b == 1 and out.shape == (3, 4)  # tail padded up to compiled size
    np.testing.assert_array_equal(out[1], a[0])
    np.testing.assert_array_equal(out[2], a[0])


@pytest.mark.slow
def test_tail_batch_padding_matches_full_batch(setup):
    """A tail batch smaller than the compiled batch is padded (not recompiled)
    and its predictions are identical to the same sample in a full batch."""
    from viewformer_tpu.evaluate.transformer import generate_batch_predictions
    from viewformer_tpu.models import load_model

    tm, tv = load_model(os.path.join(setup, 'transformer'))
    cm, cv = load_model(os.path.join(setup, 'codebook'))
    loader = build('dataset', path=os.path.join(setup, 'ds'), split='test')
    frames = np.stack([np.asarray(loader[i]['frames'])[:5] for i in range(2)])
    cameras = np.stack([np.asarray(loader[i]['cameras'])[:5]
                        for i in range(2)]).astype(np.float32)

    full = generate_batch_predictions(tm, tv, cm, cv, frames, cameras)
    tail = generate_batch_predictions(tm, tv, cm, cv, frames[1:], cameras[1:])
    assert tail['generated_images'].shape[0] == 1
    np.testing.assert_array_equal(tail['generated_images'][0],
                                  full['generated_images'][1])
    if full['generated_cameras'] is not None:
        np.testing.assert_allclose(tail['generated_cameras'][0],
                                   full['generated_cameras'][1], atol=1e-5)


@pytest.mark.slow
def test_generate_gqn_images(setup, tmp_path):
    from viewformer_tpu.evaluate.generate_images import generate_gqn_images

    job = str(tmp_path / 'gqn')
    generate_gqn_images(os.path.join(setup, 'ds'), job,
                        os.path.join(setup, 'transformer'),
                        os.path.join(setup, 'codebook'),
                        num_eval_sequences=2, progress=False)
    assert os.path.exists(os.path.join(job, 'gen0.png'))
    assert os.path.exists(os.path.join(job, 'gt1.png'))
    assert os.path.exists(os.path.join(job, 'c0_2.png'))


def test_fused_predict_matches_one_shot_reference():
    """The evaluator's incremental prefill+branch predict must equal the
    reference one-shot form (two full transformer passes) end to end:
    generated codes/images AND localized cameras."""
    import jax.numpy as jnp

    from viewformer_tpu.evaluate.transformer import (
        from_relative_cameras, make_generate_batch_predictions,
        normalize_cameras, to_relative_cameras)
    from viewformer_tpu.models.migt import MIGT
    from viewformer_tpu.models.vqgan import VQGAN

    cconfig = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                          attn_resolutions=[], z_channels=32, embed_dim=8,
                          n_embed=16, image_size=32, perceptual_weight=0.0)
    tconfig = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=2,
                         dropout=0.0, sequence_size=4, token_image_size=16,
                         total_steps=10, n_loss_skip=1,
                         localization_weight=Schedule.from_str('1'))
    cmodel, tmodel = VQGAN(cconfig), MIGT(tconfig)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    cvars = cmodel.init({'params': k1, 'quantizer': k2},
                        jnp.zeros((1, 32, 32, 3), jnp.float32), training=False)
    tvars = tmodel.init(k3, jnp.zeros((1, 4, 7), jnp.float32),
                        jnp.zeros((1, 4, 16, 16), jnp.int32), compute_losses=True)

    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 4, 32, 32, 3).astype(np.float32) * 2 - 1)
    cameras = rng.randn(2, 4, 7).astype(np.float32)
    cameras[..., 3:] /= np.linalg.norm(cameras[..., 3:], axis=-1, keepdims=True)
    cameras = jnp.asarray(cameras)

    predict = make_generate_batch_predictions(tmodel, tvars, cmodel, cvars)
    out = jax.device_get(predict(images, cameras))

    # reference one-shot form (the pre-incremental evaluator implementation)
    cv = {'params': cvars['params'], 'quantizer': cvars['quantizer']}
    rel, transform = to_relative_cameras(cameras)
    rel = normalize_cameras(rel)
    _q, _l, codes = cmodel.apply(cv, images.reshape((8, 32, 32, 3)),
                                 training=False, method=VQGAN.encode)
    codes = codes.reshape(2, 4, 16, 16).astype(jnp.int32)
    masked = jnp.concatenate(
        [codes[:, :-1], jnp.full_like(codes[:, :1], tmodel.mask_token)], 1)
    ref = tmodel.apply({'params': tvars['params']}, rel, masked,
                       compute_losses=False)
    ref_codes = np.asarray(jnp.argmax(ref['logits'], -1))[:, -1]
    dec = cmodel.apply(cv, jnp.asarray(ref_codes), method=VQGAN.decode_code)
    ref_images = np.asarray(
        ((jnp.clip(dec, -1, 1) / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8))
    loc = tmodel.apply({'params': tvars['params']}, rel[:, :-1], codes,
                       compute_losses=False)
    ref_cams = tmodel.apply({'params': tvars['params']},
                            loc['pose_prediction'][:, -1:],
                            method=MIGT.reduce_cameras)
    ref_cams = np.asarray(
        from_relative_cameras(ref_cams, transform))[:, -1]

    np.testing.assert_array_equal(out['generated_images'], ref_images)
    np.testing.assert_allclose(out['generated_cameras'], ref_cams, atol=2e-4)


def test_generate_batch_predictions_mesh_equals_single():
    """Mesh-sharded evaluation (SPMD over the data axis) must produce
    byte-identical predictions to the single-device path."""
    import jax.numpy as jnp

    from viewformer_tpu.evaluate.transformer import (JitCallCache,
                                                     generate_batch_predictions)
    from viewformer_tpu.models.migt import MIGT
    from viewformer_tpu.models.vqgan import VQGAN
    from viewformer_tpu.parallel import mesh as mesh_lib

    cconfig = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                          attn_resolutions=[], z_channels=32, embed_dim=8,
                          n_embed=16, image_size=32, perceptual_weight=0.0)
    tconfig = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=1,
                         dropout=0.0, sequence_size=4, token_image_size=16,
                         total_steps=10, n_loss_skip=1,
                         localization_weight=Schedule.from_str('1'))
    cmodel, tmodel = VQGAN(cconfig), MIGT(tconfig)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    cvars = cmodel.init({'params': k1, 'quantizer': k2},
                        np.zeros((1, 32, 32, 3), np.float32), training=False)
    tvars = tmodel.init(k3, jnp.zeros((1, 4, 7), jnp.float32),
                        jnp.zeros((1, 4, 16, 16), jnp.int32), compute_losses=True)

    rng = np.random.RandomState(4)
    frames = rng.randint(0, 256, (4, 4, 32, 32, 3)).astype(np.uint8)
    cameras = rng.randn(4, 4, 7).astype(np.float32)
    cameras[..., 3:] /= np.linalg.norm(cameras[..., 3:], axis=-1, keepdims=True)

    single = generate_batch_predictions(tmodel, tvars, cmodel, cvars,
                                        frames, cameras, _cache=JitCallCache())

    mesh = mesh_lib.create_mesh_for_batch(4)
    assert mesh.shape['data'] > 1
    tvars_r = mesh_lib.replicate(mesh, tvars)
    cvars_r = mesh_lib.replicate(mesh, cvars)
    sharded = generate_batch_predictions(tmodel, tvars_r, cmodel, cvars_r,
                                         frames, cameras, _cache=JitCallCache(),
                                         mesh=mesh)

    np.testing.assert_array_equal(single['generated_images'],
                                  sharded['generated_images'])
    np.testing.assert_allclose(single['generated_cameras'],
                               sharded['generated_cameras'], atol=1e-5)


def test_run_with_batchsize_pads_tail_to_one_specialization():
    """Every dispatch must see the full micro-batch shape (variable tails
    would recompile the full-size program on TPU); outputs unpadded."""
    from viewformer_tpu.evaluate.multictx_allimg import run_with_batchsize

    seen = []

    def fn(a, b):
        seen.append(a.shape[0])
        return a * 2, b + 1

    a = np.arange(10, dtype=np.float32)
    b = np.arange(10, dtype=np.float32) * 10
    out_a, out_b = run_with_batchsize(fn, 4, a, b)
    assert seen == [4, 4, 4]  # tail of 2 padded up
    np.testing.assert_array_equal(out_a, a * 2)
    np.testing.assert_array_equal(out_b, b + 1)

    seen.clear()
    single = run_with_batchsize(lambda x: x + 1, 4, np.ones((3, 2)))
    assert single.shape == (3, 2)

"""evaluate transformer-multictx: all context sizes in ONE forward pass.

Parity target: /root/reference/viewformer/evaluate/evaluate_transformer_multictx.py
— exploits the branch streams: the generation stream is fed the query pose at
every position, so position t's prediction uses exactly t context frames; the
localization stream is fed the query tokens at every position symmetrically.
A strong correctness check of the branching attention masks.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize
from .evaluator import MultiContextEvaluator, print_metrics
from .transformer import (JitCallCache, from_relative_cameras,
                          normalize_cameras, to_relative_cameras)


def make_generate_batch_predictions(transformer_model, transformer_vars,
                                    codebook_model, codebook_vars):
    import functools

    codebook_variables = {'params': codebook_vars['params'],
                          'quantizer': codebook_vars['quantizer']}
    transformer_variables = {'params': transformer_vars['params']}
    use_localization = not transformer_model.config.localization_weight.is_zero()
    relative = transformer_model.config.augment_poses == 'relative'

    # variables are jit arguments, not closure captures (compile-time blowup)
    @jax.jit
    def predict(transformer_variables, codebook_variables, images, cameras):
        from ..ops.image import normalize_images
        images = normalize_images(images)  # uint8 wire -> f32 on device
        B, S = images.shape[:2]
        ground_truth_cameras = cameras[:, -1]
        transform = None
        if relative:
            cameras, transform = to_relative_cameras(cameras)
        cameras = normalize_cameras(cameras)

        flat = images.reshape((B * S,) + images.shape[2:])
        _q, _l, codes = codebook_model.apply(
            codebook_variables, flat, training=False, method=type(codebook_model).encode)
        grid = codes.shape[-2:]
        codes = codes.reshape(B, S, *grid).astype(jnp.int32)

        # remove prediction info from the context stream
        input_ids = jnp.concatenate(
            [codes[:, :-1], jnp.full_like(codes[:, :1], transformer_model.mask_token)], 1)
        context_cameras = jnp.concatenate(
            [cameras[:, :-1], jnp.zeros_like(cameras[:, :1])], 1)
        # query pose/tokens tiled over every sequence position
        query_cameras = jnp.tile(cameras[:, -1:], (1, S, 1))
        query_tokens = jnp.tile(codes[:, -1:], (1, S, 1, 1))

        out = transformer_model.apply(
            transformer_variables, context_cameras, input_ids,
            localization_tokens=query_tokens if use_localization else None,
            output_poses=query_cameras, compute_losses=False)

        generated_codes = jnp.argmax(out['logits'], -1)  # [B, S, h, w]
        generated_images = codebook_model.apply(
            codebook_variables, generated_codes.reshape(B * S, *grid),
            method=type(codebook_model).decode_code)
        generated_images = jnp.clip(generated_images, -1, 1)
        generated_images = ((generated_images / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)
        generated_images = generated_images.reshape((B, S) + generated_images.shape[1:])

        generated_cameras = None
        if use_localization:
            generated_cameras = transformer_model.apply(
                transformer_variables, out['pose_prediction'],
                method=type(transformer_model).reduce_cameras)
            if relative:
                generated_cameras = from_relative_cameras(generated_cameras, transform)
        return dict(generated_images=generated_images,
                    generated_cameras=generated_cameras,
                    ground_truth_cameras=ground_truth_cameras)

    return functools.partial(predict, transformer_variables, codebook_variables)


_CACHE = JitCallCache()


def generate_batch_predictions(transformer_model, transformer_vars, codebook_model,
                               codebook_vars, images, cameras, _cache=None,
                               mesh=None):
    cache = _cache if _cache is not None else _CACHE
    key, predict = cache.get_or_build(
        (transformer_vars, codebook_vars), (images.shape[1:],),
        lambda: make_generate_batch_predictions(
            transformer_model, transformer_vars, codebook_model, codebook_vars))
    images = np.asarray(images)
    fimages = resize(images.reshape((-1,) + images.shape[2:]),
                     codebook_model.config.image_size)
    # ship uint8; the jitted predict normalizes on device (4x less upload).
    # Float callers keep the historical host normalize (ensure_wire_images).
    from ..ops.image import ensure_wire_images
    fimages = ensure_wire_images(fimages.reshape(images.shape[:2] + fimages.shape[1:]))
    (fimages, cameras), b = cache.pad_batch(
        key, [fimages, np.asarray(cameras, np.float32)])
    if mesh is not None and fimages.shape[0] % mesh.shape['data'] == 0:
        from ..parallel import mesh as mesh_lib
        fimages, cameras = mesh_lib.shard_batch(mesh, (fimages, cameras))
        with mesh:
            out = jax.device_get(predict(fimages, cameras))
    else:  # indivisible first-batch edge case: plain single-device dispatch
        out = jax.device_get(predict(jnp.asarray(fimages), jnp.asarray(cameras)))
    return dict(
        ground_truth_images=images[:, -1],
        generated_images=np.asarray(out['generated_images'])[:b],
        ground_truth_cameras=np.asarray(out['ground_truth_cameras'])[:b],
        generated_cameras=(np.asarray(out['generated_cameras'])[:b]
                           if out['generated_cameras'] is not None else None))


def build_store_predictions(job_dir, limit=100):
    """Per-context-size prediction dumps (ref multictx.py:98-122)."""
    from PIL import Image
    os.makedirs(job_dir, exist_ok=True)
    counter = {'i': 0}

    def store(ground_truth_cameras, generated_cameras, ground_truth_images,
              generated_images, postfix='', ctx=None):
        for bi in range(len(ground_truth_images)):
            i = counter['i']
            if limit != -1 and i >= limit:
                return
            Image.fromarray(np.asarray(ground_truth_images[bi])).save(
                os.path.join(job_dir, f'{i:08d}-gt{postfix}.png'))
            np.save(os.path.join(job_dir, f'{i:08d}-gt{postfix}.cam.npy'),
                    np.asarray(ground_truth_cameras[bi]))
            for ctx_size in range(len(generated_images[bi])):
                Image.fromarray(np.asarray(generated_images[bi][ctx_size])).save(
                    os.path.join(job_dir, f'{i:08d}-gen@{ctx_size:02d}{postfix}.png'))
                if generated_cameras is not None:
                    np.save(os.path.join(job_dir,
                                         f'{i:08d}-gen@{ctx_size:02d}{postfix}.cam.npy'),
                            np.asarray(generated_cameras[bi][ctx_size]))
            if ctx is not None:
                ctx_dir = os.path.join(job_dir, f'{i:08d}-ctx{postfix}')
                os.makedirs(ctx_dir, exist_ok=True)
                for j, ctx_img in enumerate(np.asarray(ctx[bi])):
                    Image.fromarray(ctx_img).save(os.path.join(ctx_dir, f'{j:02d}.png'))
            counter['i'] += 1
    return store


def evaluate_transformer_multictx(loader, transformer_checkpoint, codebook_checkpoint,
                                  job_dir, batch_size=1, num_eval_sequences=None,
                                  pose_multiplier=None, sequence_size=None,
                                  num_store_images=100, store_ctx=False,
                                  image_size=None, progress=True):
    """CLI entry: viewformer-cli evaluate transformer-multictx."""
    from ..models import load_model
    from .transformer import _batched_loader_iterator

    overrides = {}
    if pose_multiplier is not None:
        overrides['pose_multiplier'] = pose_multiplier
    transformer_model, transformer_vars = load_model(transformer_checkpoint, **overrides)
    codebook_model, codebook_vars = load_model(codebook_checkpoint)
    if sequence_size is None:
        sequence_size = transformer_model.config.sequence_size
    if callable(loader) and not hasattr(loader, '__getitem__'):
        loader = loader(codebook_model.config.image_size)

    # shard eval batches over all local chips (SPMD, batch-parallel program)
    mesh = None
    if len(jax.devices()) > 1 and batch_size > 1:
        from ..parallel import mesh as mesh_lib
        mesh = mesh_lib.create_mesh_for_batch(batch_size)
        transformer_vars = mesh_lib.replicate(mesh, transformer_vars)
        codebook_vars = mesh_lib.replicate(mesh, codebook_vars)

    store = build_store_predictions(job_dir, num_store_images)
    evaluator = MultiContextEvaluator(sequence_size, image_size=image_size)
    iterator = _batched_loader_iterator(loader, sequence_size, batch_size, num_eval_sequences)
    if progress:
        from tqdm import tqdm
        iterator = tqdm(iterator, desc='evaluating')
    for frames, cameras in iterator:
        prediction = generate_batch_predictions(transformer_model, transformer_vars,
                                                codebook_model, codebook_vars,
                                                frames, cameras, mesh=mesh)
        evaluator.update_state(**prediction)
        if store_ctx:
            prediction['ctx'] = frames[:, :-1]
        store(**prediction)
        if progress:
            iterator.set_postfix(evaluator.get_progress_bar_info())
    result = evaluator.result()
    os.makedirs(job_dir, exist_ok=True)
    with open(os.path.join(job_dir, 'results.json'), 'w') as f:
        json.dump(result, f)
    print('Results:')
    print_metrics(result)
    return result

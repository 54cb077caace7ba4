"""evaluate codebook: reconstruction metrics over single frames.

Parity target: /root/reference/viewformer/evaluate/evaluate_codebook.py —
encode -> decode_code reconstruction, image metrics only.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize
from .evaluator import Evaluator
from .transformer import JitCallCache, build_store_predictions

_CACHE = JitCallCache()


def make_reconstruct(codebook_model, codebook_vars):
    import functools

    variables = {'params': codebook_vars['params'], 'quantizer': codebook_vars['quantizer']}

    # variables are jit arguments, not closure captures (compile-time blowup)
    @jax.jit
    def reconstruct(variables, images):
        from ..ops.image import normalize_images
        images = normalize_images(images)  # uint8 wire -> f32 on device
        _quant, _loss, codes = codebook_model.apply(
            variables, images, training=False, method=type(codebook_model).encode)
        dec = codebook_model.apply(variables, codes, method=type(codebook_model).decode_code)
        dec = jnp.clip(dec, -1, 1)
        return ((dec / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)

    return functools.partial(reconstruct, variables)


def generate_batch_predictions(codebook_model, codebook_vars, images, _cache=None,
                               mesh=None):
    cache = _cache if _cache is not None else _CACHE
    key, reconstruct = cache.get_or_build(
        (codebook_vars,), (images.shape[1:],),
        lambda: make_reconstruct(codebook_model, codebook_vars))
    images = np.asarray(images)
    fimages = resize(images, codebook_model.config.image_size)
    # ship uint8; the jitted reconstruct normalizes on device. Float
    # callers keep the historical host normalize (ensure_wire_images).
    from ..ops.image import ensure_wire_images
    (x,), b = cache.pad_batch(key, [ensure_wire_images(fimages)])
    if mesh is not None and x.shape[0] % mesh.shape['data'] == 0:
        from ..parallel import mesh as mesh_lib
        with mesh:
            generated = np.asarray(jax.device_get(
                reconstruct(mesh_lib.shard_batch(mesh, x))))[:b]
    else:  # indivisible first-batch edge case: plain single-device dispatch
        generated = np.asarray(jax.device_get(reconstruct(jnp.asarray(x))))[:b]
    return dict(ground_truth_images=fimages, generated_images=generated,
                ground_truth_cameras=None, generated_cameras=None)


def evaluate_codebook(loader, codebook_checkpoint, job_dir, batch_size=64,
                      num_eval_images=None, num_store_images=100, image_size=None,
                      progress=True):
    """CLI entry: viewformer-cli evaluate codebook."""
    from ..models import load_model

    codebook_model, codebook_vars = load_model(codebook_checkpoint)
    if callable(loader) and not hasattr(loader, '__getitem__'):
        loader = loader(codebook_model.config.image_size)

    # shard eval batches over all local chips (SPMD, batch-parallel program)
    mesh = None
    if len(jax.devices()) > 1 and batch_size > 1:
        from ..parallel import mesh as mesh_lib
        mesh = mesh_lib.create_mesh_for_batch(batch_size)
        codebook_vars = mesh_lib.replicate(mesh, codebook_vars)

    evaluator = Evaluator(image_size=image_size)
    store = build_store_predictions(job_dir, num_store_images)

    def frame_batches():
        buffer = []
        count = 0
        for idx in range(len(loader)):
            for frame in np.asarray(loader[idx]['frames']):
                if num_eval_images is not None and count >= num_eval_images:
                    if buffer:
                        yield np.stack(buffer)
                    return
                buffer.append(frame)
                count += 1
                if len(buffer) == batch_size:
                    yield np.stack(buffer)
                    buffer = []
        if buffer:
            yield np.stack(buffer)

    iterator = frame_batches()
    if progress:
        from tqdm import tqdm
        iterator = tqdm(iterator, desc='evaluating codebook')
    for frames in iterator:
        prediction = generate_batch_predictions(codebook_model, codebook_vars, frames,
                                                mesh=mesh)
        evaluator.update_with_image(prediction['ground_truth_images'],
                                    prediction['generated_images'])
        store(ground_truth_cameras=np.zeros((len(frames), 7), np.float32),
              generated_cameras=None,
              ground_truth_images=prediction['ground_truth_images'],
              generated_images=prediction['generated_images'])
    result = {k: v for k, v in evaluator.result().items() if not k.startswith('loc-')}
    os.makedirs(job_dir, exist_ok=True)
    with open(os.path.join(job_dir, 'results.json'), 'w') as f:
        json.dump(result, f, indent=4)
    print('Results:')
    for m, val in result.items():
        print(f'    {m}: ' + ('n/a' if val is None else f'{val:.6f}'))
    return result

"""evaluate transformer-multictx-allimg: every frame as query, fixed context.

Parity target: /root/reference/viewformer/evaluate/evaluate_transformer_multictx_allimg.py
— each sequence frame becomes a query against a fixed sampled context;
optional keep_last_frame chains generated frames into the context (the
sequential-generation mode); micro-batched transformer/decoder helpers; full
gen/gt/ctx image tree dumps.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize
from .evaluator import MultiContextEvaluator, print_metrics
from .transformer import (from_relative_cameras, normalize_cameras,
                          to_relative_cameras)


def make_transformer_predict(transformer_model, transformer_vars):
    import functools

    variables = {'params': transformer_vars['params']}
    use_localization = not transformer_model.config.localization_weight.is_zero()
    relative = transformer_model.config.augment_poses == 'relative'

    # variables are jit arguments, not closure captures (compile-time blowup)
    @jax.jit
    def predict(variables, cameras, codes):
        transform = None
        if relative:
            cameras, transform = to_relative_cameras(cameras)
        cameras = normalize_cameras(cameras)
        S = codes.shape[1]
        input_ids = jnp.concatenate(
            [codes[:, :-1], jnp.full_like(codes[:, :1], transformer_model.mask_token)], 1)
        context_cameras = jnp.concatenate(
            [cameras[:, :-1], jnp.zeros_like(cameras[:, :1])], 1)
        query_cameras = jnp.tile(cameras[:, -1:], (1, S, 1))
        query_tokens = jnp.tile(codes[:, -1:], (1, S, 1, 1))
        out = transformer_model.apply(
            variables, context_cameras, input_ids,
            localization_tokens=query_tokens if use_localization else None,
            output_poses=query_cameras, compute_losses=False)
        generated_codes = jnp.argmax(out['logits'], -1)
        generated_cameras = None
        if use_localization:
            generated_cameras = transformer_model.apply(
                variables, out['pose_prediction'],
                method=type(transformer_model).reduce_cameras)
            if relative:
                generated_cameras = from_relative_cameras(generated_cameras, transform)
        return generated_cameras, generated_codes

    return functools.partial(predict, variables)


def run_with_batchsize(fn, batch_size, *args, **kwargs):
    """Micro-batch a function over leading-dim chunks (ref allimg.py:51-62).

    Tail chunks are padded to `batch_size` (repeating the last sample) so
    every dispatch hits ONE jit specialization — per-sequence frame counts
    vary, and each distinct tail shape would otherwise recompile the
    full-size program (minutes on TPU)."""
    total = len(args[0])
    outs = []
    for i in range(0, total, batch_size):
        chunk = [x[i:i + batch_size] for x in args]
        n = len(chunk[0])
        if n < batch_size:
            chunk = [np.concatenate(
                [x, np.repeat(np.asarray(x)[-1:], batch_size - n, axis=0)], 0)
                for x in chunk]
        out = fn(*chunk, **kwargs)
        if not isinstance(out, tuple):
            out = np.asarray(out)[:n]
        else:
            out = tuple(np.asarray(o)[:n] if o is not None else None for o in out)
        outs.append(out)
    if not isinstance(outs[0], tuple):
        return np.concatenate([np.asarray(o) for o in outs], 0)
    return tuple(
        np.concatenate([np.asarray(o[j]) for o in outs], 0) if outs[0][j] is not None else None
        for j in range(len(outs[0])))


def evaluate_transformer_multictx_allimg(loader, transformer_checkpoint,
                                         codebook_checkpoint, job_dir,
                                         context_views=None, pose_multiplier=None,
                                         keep_last_frame=False, image_size=None,
                                         num_eval_sequences=None, progress=True):
    """CLI entry: viewformer-cli evaluate transformer-multictx-allimg."""
    from PIL import Image
    from tqdm import tqdm

    from ..models import load_model

    overrides = {}
    if pose_multiplier is not None:
        overrides['pose_multiplier'] = pose_multiplier
    transformer_model, transformer_vars = load_model(transformer_checkpoint, **overrides)
    codebook_model, codebook_vars = load_model(codebook_checkpoint)
    if callable(loader) and not hasattr(loader, '__getitem__'):
        loader = loader(codebook_model.config.image_size)

    cvars = {'params': codebook_vars['params'], 'quantizer': codebook_vars['quantizer']}

    def encode_images(frames):
        from ..ops.image import ensure_wire_images, normalize_images
        x = resize(frames.reshape((-1,) + frames.shape[2:]), codebook_model.config.image_size)
        x = normalize_images(jnp.asarray(ensure_wire_images(x)))
        _q, _l, codes = codebook_model.apply(cvars, x, training=False,
                                             method=type(codebook_model).encode)
        grid = codes.shape[-2:]
        return np.asarray(codes).reshape(frames.shape[:2] + tuple(grid)).astype(np.int32)

    def decode_code(generated_codes):
        B, S = generated_codes.shape[:2]
        grid = generated_codes.shape[2:]
        dec = codebook_model.apply(cvars, jnp.asarray(generated_codes.reshape((B * S,) + grid)),
                                   method=type(codebook_model).decode_code)
        dec = ((jnp.clip(dec, -1, 1) / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)
        dec = np.asarray(dec)
        return dec.reshape((B, S) + dec.shape[1:])

    predict = make_transformer_predict(transformer_model, transformer_vars)

    n_context_views = (len(context_views) if context_views is not None
                       else transformer_model.config.sequence_size - 1)
    evaluator = MultiContextEvaluator(n_context_views + 1, image_size=image_size)
    rng = np.random.default_rng(42)

    total = num_eval_sequences if num_eval_sequences is not None else len(loader)
    iterator = range(total)
    if progress:
        iterator = tqdm(iterator, desc='evaluating')
    for seq_idx in iterator:
        seq = loader[seq_idx]
        sequence_id = seq.get('sequence_id', f'{seq_idx:06d}')
        c_context_views = context_views
        if c_context_views is None:
            c_context_views = list(rng.choice(len(seq['frames']), (n_context_views,),
                                              replace=False))
        c_context_views = [int(x) for x in c_context_views]
        frames = np.asarray(seq['frames'])[None]
        cameras = np.asarray(seq['cameras'])[None].astype(np.float32)
        codes = encode_images(frames)
        n_frames = frames.shape[1]
        tcodes = np.concatenate(
            [np.stack([codes[:, j] for j in c_context_views + [i]], 1)
             for i in range(n_frames)], 0)
        tcameras = np.concatenate(
            [np.stack([cameras[:, j] for j in c_context_views + [i]], 1)
             for i in range(n_frames)], 0)

        disable_cameras = False
        if keep_last_frame:
            # chain generated frames: query i's context includes query i-1's
            # generated frame (ref allimg.py:146-171)
            generated_codes, generated_cameras = [], []
            last_frame = None
            for i in range(tcodes.shape[0]):
                lcodes, lcameras = tcodes[i:i + 1], tcameras[i:i + 1]
                if last_frame is not None:
                    last_codes, last_cameras = last_frame
                    lcodes = np.concatenate([last_codes, lcodes], 1)
                    lcameras = np.concatenate([last_cameras, lcameras], 1)
                lgcameras, lgcodes = predict(jnp.asarray(lcameras), jnp.asarray(lcodes))
                lgcodes = np.asarray(lgcodes)
                if last_frame is not None:
                    lgcodes = lgcodes[:, 1:]
                    if lgcameras is not None:
                        lgcameras = np.asarray(lgcameras)[:, 1:]
                generated_codes.append(lgcodes)
                if lgcameras is not None:
                    generated_cameras.append(np.asarray(lgcameras))
                else:
                    disable_cameras = True
                last_frame = (lgcodes[:, -1:], lcameras[:, -1:])
            generated_codes = np.concatenate(generated_codes, 0)
            generated_cameras = (np.concatenate(generated_cameras, 0)
                                 if not disable_cameras else None)
        else:
            generated_cameras, generated_codes = run_with_batchsize(
                lambda c, t: predict(jnp.asarray(c), jnp.asarray(t)), 128,
                tcameras, tcodes)
            disable_cameras = generated_cameras is None

        generated_images = run_with_batchsize(decode_code, 64, generated_codes)
        eval_frames = [x for x in range(len(generated_images)) if x not in c_context_views]
        evaluator.update_state(
            ground_truth_cameras=np.stack([cameras[0, x] for x in eval_frames], 0),
            ground_truth_images=np.stack([frames[0, x] for x in eval_frames], 0),
            generated_images=np.stack([generated_images[x] for x in eval_frames], 0),
            generated_cameras=(np.stack([generated_cameras[x] for x in eval_frames], 0)
                               if not disable_cameras else None))

        base = os.path.join(job_dir, 'gen_images', str(sequence_id))
        for i in range(1 + len(c_context_views)):
            os.makedirs(os.path.join(base, f'gen-{i:02d}'), exist_ok=True)
        os.makedirs(os.path.join(base, 'gt'), exist_ok=True)
        os.makedirs(os.path.join(base, 'ctx'), exist_ok=True)
        for i, c in enumerate(c_context_views):
            Image.fromarray(frames[0, c]).save(os.path.join(base, 'ctx', f'{i:02d}-{c:03d}.png'))
        for i in range(n_frames):
            Image.fromarray(frames[0, i]).save(os.path.join(base, 'gt', f'{i:03d}.png'))
        for i, per_ctx in enumerate(generated_images):
            for j, img in enumerate(per_ctx):
                Image.fromarray(img).save(os.path.join(base, f'gen-{j:02d}', f'{i:03d}.png'))
        if progress:
            iterator.set_postfix(evaluator.get_progress_bar_info())
        if seq_idx % 20 == 0:
            with open(os.path.join(job_dir, 'results.json'), 'w') as f:
                json.dump(evaluator.result(), f, indent=4)

    result = evaluator.result()
    os.makedirs(job_dir, exist_ok=True)
    with open(os.path.join(job_dir, 'results.json'), 'w') as f:
        json.dump(result, f, indent=4)
    print('Results:')
    print_metrics(result)
    return result

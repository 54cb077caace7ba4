"""evaluate 7scenes: camera localization + view synthesis on 7-Scenes.

Parity target: /root/reference/viewformer/evaluate/evaluate_sevenscenes.py —
per-scene train-image SceneLookup DB, context = top-N retrieved images from a
match-map file + random fill to 19, three procedures:
  standard          — retrieval context, single predict
  generated_images  — augment the context with model-generated nearby views
  pose_refinement   — re-retrieve context by predicted-pose distance
"""
import json
import os
import random
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from ..data.loaders.sevenscenes import ALL_SCENES, SevenScenesLoader
from ..utils import geometry as np_geometry
from .evaluator import Evaluator
from .transformer import (build_store_predictions, from_relative_cameras,
                          generate_batch_predictions, normalize_cameras,
                          to_relative_cameras)


def generate_other_viewpoints(camera, rng):
    """Random nearby viewpoints: <=1m offset, <=0.3rad rotation
    (ref evaluate_sevenscenes.py:20-33)."""
    max_offset, max_rad_offset = 1.0, 0.3
    shape3 = camera[..., :3].shape
    pos_offset = rng.uniform(-1, 1, shape3).astype(np.float32)
    pos_offset /= np.linalg.norm(pos_offset, axis=-1, keepdims=True) + 1e-12
    axis = rng.uniform(-1, 1, shape3).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12
    pos_offset *= rng.uniform(0, max_offset, camera[..., :1].shape).astype(np.float32)
    angle = rng.uniform(0, max_rad_offset, camera[..., :1].shape).astype(np.float32)
    quaternion_rot = np.concatenate((np.cos(angle / 2), np.sin(angle / 2) * axis), -1)
    xyz, quaternion = camera[..., :3], camera[..., 3:]
    new_quat = np_geometry.quaternion_normalize(
        np_geometry.quaternion_multiply(quaternion_rot, quaternion))
    return np.concatenate((pos_offset + xyz, new_quat), -1).astype(np.float32)


def compute_camera_distances(db_cameras, camera):
    """Mixed position+orientation distance (coefficient 0.3, ref :36-45)."""
    pos = np.linalg.norm(db_cameras[..., :3] - camera[..., :3], axis=-1)
    x1 = np_geometry.quaternion_normalize(db_cameras[..., 3:])
    x2 = np_geometry.quaternion_normalize(camera[..., 3:])
    diff = np_geometry.quaternion_multiply(x1, np.broadcast_to(
        np_geometry.quaternion_conjugate(x2), x1.shape))
    quat = 2 * np.arcsin(np.clip(np.linalg.norm(diff[..., 1:], axis=-1), 0, 1))
    return pos * 0.3 + quat


class SceneLookup:
    """All train frames of a scene with camera index (ref :48-68)."""

    def __init__(self, path, scene, image_size=None):
        loader = SevenScenesLoader(path=path, split='train', scenes=[scene],
                                   _load_file_paths=True)
        if image_size is not None:
            from ..data.loaders._wrappers import ChangedImageSizeLoader
            loader = ChangedImageSizeLoader(loader, image_size)
        cameras, self.files, self.image_loaders = [], [], []
        for idx in range(len(loader)):
            batch = loader[idx]
            cameras.append(np.asarray(batch['cameras']))
            self.files.extend(x + '.color.png' for x in batch['frames_files'])
            frames = batch['frames']
            for i in range(len(batch['cameras'])):
                self.image_loaders.append((frames, i))
        self.cameras = np.concatenate(cameras, 0)
        self._lookup = {x: i for i, x in enumerate(self.files)}

    def __getitem__(self, name):
        idx = self._lookup[name]
        frames, i = self.image_loaders[idx]
        return self.cameras[idx], np.asarray(frames[i])

    def __len__(self):
        return len(self.files)


def load_image_match_map(path):
    top_map = defaultdict(list)
    with open(path) as f:
        for line in f:
            fr, to = line.strip('\n\r').split()
            top_map[fr].append(to)
    return top_map


def _encode_codes(codebook_model, codebook_vars, images):
    from ..ops.image import ensure_wire_images, normalize_images, resize
    images = np.asarray(images)
    fimages = resize(images.reshape((-1,) + images.shape[2:]), codebook_model.config.image_size)
    x = normalize_images(jnp.asarray(ensure_wire_images(fimages)))
    variables = {'params': codebook_vars['params'], 'quantizer': codebook_vars['quantizer']}
    _q, _l, codes = codebook_model.apply(variables, x, training=False,
                                         method=type(codebook_model).encode)
    grid = codes.shape[-2:]
    return np.asarray(codes).reshape(images.shape[:2] + tuple(grid)).astype(np.int32)


def generate_batch_predictions_using_generated_images(
        transformer_model, transformer_vars, codebook_model, codebook_vars,
        images, cameras, num_gen_ctx=5, seed=0):
    """Procedure 'generated_images' (ref :80-154): localize, render nearby
    synthetic views, splice them into the context, re-generate + re-localize."""
    rng = np.random.RandomState(seed)
    cameras = np.asarray(cameras, np.float32)
    ground_truth_cameras = cameras[:, -1]
    relative = transformer_model.config.augment_poses == 'relative'
    transform = None
    if relative:
        cam_j, transform = to_relative_cameras(jnp.asarray(cameras))
        cameras = np.asarray(cam_j)
    cameras = np.asarray(normalize_cameras(jnp.asarray(cameras)))

    codes = _encode_codes(codebook_model, codebook_vars, images)
    tvars = {'params': transformer_vars['params']}

    def localize(codes, ctx_cameras):
        out = transformer_model.apply(tvars, jnp.asarray(ctx_cameras), jnp.asarray(codes),
                                      compute_losses=False)
        return np.asarray(transformer_model.apply(
            tvars, out['pose_prediction'][:, -1:],
            method=type(transformer_model).reduce_cameras))

    generated_cameras = localize(codes, cameras[:, :-1])

    # nearby viewpoints around the estimate
    new_cameras = generate_other_viewpoints(
        np.tile(generated_cameras[:, -1:], (num_gen_ctx, 1, 1)), rng)
    new_cameras = np.asarray(normalize_cameras(jnp.asarray(new_cameras)))

    masked = np.concatenate([codes[:, :-1],
                             np.full_like(codes[:, :1], transformer_model.mask_token)], 1)
    out = transformer_model.apply(
        tvars,
        jnp.asarray(np.concatenate((np.tile(cameras[:, :-1], (num_gen_ctx, 1, 1)),
                                    new_cameras), 1)),
        jnp.asarray(np.tile(masked, (num_gen_ctx, 1, 1, 1))), compute_losses=False)
    new_codes = np.asarray(jnp.argmax(out['logits'], -1))[:, -1].astype(np.int32)

    codes = np.concatenate((codes[:, :-num_gen_ctx], new_codes[None]), 1)
    cameras = np.concatenate((cameras[:, :-num_gen_ctx],
                              new_cameras.reshape(1, num_gen_ctx, -1)), 1)

    # final generation + localization with the augmented context
    masked = np.concatenate([codes[:, :-1],
                             np.full_like(codes[:, :1], transformer_model.mask_token)], 1)
    out = transformer_model.apply(tvars, jnp.asarray(cameras), jnp.asarray(masked),
                                  compute_losses=False)
    generated_codes = jnp.argmax(out['logits'], -1)[:, -1]
    cvars = {'params': codebook_vars['params'], 'quantizer': codebook_vars['quantizer']}
    generated_images = codebook_model.apply(cvars, generated_codes,
                                            method=type(codebook_model).decode_code)
    generated_images = np.asarray(
        ((jnp.clip(generated_images, -1, 1) / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8))

    generated_cameras = localize(codes, cameras[:, :-1])
    if relative:
        generated_cameras = np.asarray(from_relative_cameras(
            jnp.asarray(generated_cameras), transform))
    return dict(ground_truth_images=np.asarray(images)[:, -1],
                generated_images=generated_images,
                ground_truth_cameras=ground_truth_cameras,
                generated_cameras=generated_cameras[:, -1])


def generate_batch_predictions_using_pose_refinement(
        scene_lookup, transformer_model, transformer_vars, codebook_model,
        codebook_vars, images, cameras, num_gen_ctx=9, seed=0, num_context_views=19):
    """Procedure 'pose_refinement' (ref :157-197): localize, retrieve the
    nearest train views by predicted pose, re-run the standard procedure."""
    rng = random.Random(seed)
    cameras = np.asarray(cameras, np.float32)
    gt_cameras, gt_frames = cameras[:, -1], np.asarray(images)[:, -1]
    relative = transformer_model.config.augment_poses == 'relative'
    transform = None
    rel_cameras = cameras
    if relative:
        cam_j, transform = to_relative_cameras(jnp.asarray(cameras))
        rel_cameras = np.asarray(cam_j)
    rel_cameras = np.asarray(normalize_cameras(jnp.asarray(rel_cameras)))

    codes = _encode_codes(codebook_model, codebook_vars, images)
    tvars = {'params': transformer_vars['params']}
    out = transformer_model.apply(tvars, jnp.asarray(rel_cameras[:, :-1]),
                                  jnp.asarray(codes), compute_losses=False)
    generated_cameras = np.asarray(transformer_model.apply(
        tvars, out['pose_prediction'][:, -1:], method=type(transformer_model).reduce_cameras))
    if relative:
        generated_cameras = np.asarray(from_relative_cameras(
            jnp.asarray(generated_cameras), transform))

    distances = compute_camera_distances(scene_lookup.cameras, generated_cameras[:, 0, :])
    top_files = np.argsort(distances)[:num_gen_ctx]
    files = [scene_lookup.files[x] for x in top_files]
    files += rng.sample(scene_lookup.files, num_context_views - len(files))
    ctx_cameras, ctx_frames = tuple(np.stack(y, 0) for y in
                                    zip(*(scene_lookup[x] for x in files)))
    new_cameras = np.concatenate((ctx_cameras, gt_cameras), 0)[None]
    new_frames = np.concatenate((ctx_frames, gt_frames), 0)[None]
    return generate_batch_predictions(transformer_model, transformer_vars,
                                      codebook_model, codebook_vars,
                                      new_frames, new_cameras)


def evaluate_sevenscenes(path, transformer_checkpoint, codebook_checkpoint, job_dir,
                         batch_size=1, image_match_map=None, scenes=None,
                         sequence_size=None, num_eval_sequences=None,
                         num_store_images=100, top_n_matched_images=0, num_gen_ctx=0,
                         generation_procedure='standard', pose_multiplier=None,
                         num_context_views=19, image_size=128, progress=True):
    """CLI entry: viewformer-cli evaluate 7scenes (ref :200-282).

    sequence_size is accepted-and-unused exactly like the reference's
    vestigial flag (ref evaluate_sevenscenes.py:208 declares it, never reads
    it); context length is num_context_views + 1."""
    from tqdm import tqdm

    from ..models import load_model

    if scenes is None:
        scenes = ALL_SCENES
    if top_n_matched_images > 0:
        assert image_match_map is not None

    codebook_model, codebook_vars = load_model(codebook_checkpoint)
    all_results = {}
    model = model_vars = None
    loaded_checkpoint = None
    for scene in scenes:
        top_match_map = None
        if image_match_map is not None:
            top_match_map = load_image_match_map(image_match_map.format(scene=scene))
        scene_lookup = SceneLookup(path, scene, image_size)
        checkpoint = transformer_checkpoint.format(scene=scene)
        if model is None or checkpoint != loaded_checkpoint:
            overrides = {}
            if pose_multiplier is not None:
                overrides['pose_multiplier'] = pose_multiplier
            model, model_vars = load_model(checkpoint, **overrides)
            loaded_checkpoint = checkpoint

        rng = random.Random(42)

        def build_batch(batch):
            gt_frames = np.asarray(batch['frames'])
            gt_cameras = np.asarray(batch['cameras'])
            ctx = []
            if top_match_map is not None:
                ctx = top_match_map[batch['frames_files'][0] + '.color.png'][:top_n_matched_images]
            ctx = list(ctx) + rng.sample(scene_lookup.files, num_context_views - len(ctx))
            ctx_cameras, ctx_frames = tuple(np.stack(y, 0) for y in
                                            zip(*(scene_lookup[x] for x in ctx)))
            cameras = np.concatenate((ctx_cameras, gt_cameras), 0)[None]
            frames = np.concatenate((ctx_frames, gt_frames), 0)[None]
            return cameras.astype(np.float32), frames

        store = build_store_predictions(os.path.join(job_dir, scene), num_store_images)
        evaluator = Evaluator(image_size=image_size)
        test_loader = SevenScenesLoader(path=path, split='test', scenes=[scene],
                                        _load_file_paths=True)
        from ..data.loaders._wrappers import ChangedImageSizeLoader, FixedSequenceSizeLoader
        test_loader = ChangedImageSizeLoader(FixedSequenceSizeLoader(test_loader, 1), image_size)
        indices = list(range(len(test_loader)))
        if num_eval_sequences is not None and num_eval_sequences > 0:
            indices = random.Random(42).sample(indices, min(len(indices), num_eval_sequences))
        else:
            random.Random(42).shuffle(indices)
        iterator = tqdm(indices, desc=f'evaluating {scene}') if progress else indices
        if generation_procedure == 'standard':
            # the standard procedure is per-query independent, so queries
            # batch together (each with its own retrieved+sampled context) —
            # the reference and the special procedures below run one query
            # per forward; --batch-size makes the TPU batch-efficient
            buf_cameras, buf_frames = [], []

            def flush():
                if not buf_cameras:
                    return
                prediction = generate_batch_predictions(
                    model, model_vars, codebook_model, codebook_vars,
                    np.concatenate(buf_frames, 0), np.concatenate(buf_cameras, 0))
                evaluator.update_state(**prediction)
                store(**prediction)
                buf_cameras.clear()
                buf_frames.clear()

            for index in iterator:
                cameras, frames = build_batch(test_loader[index])
                buf_cameras.append(cameras)
                buf_frames.append(frames)
                if len(buf_cameras) == batch_size:
                    flush()
                    if progress:
                        iterator.set_postfix(evaluator.get_progress_bar_info())
            flush()
            result = evaluator.result()
            all_results[scene] = result
            print(f'Results on {scene}:')
            for m, val in result.items():
                print(f'    {m}: ' + ('n/a' if val is None else f'{val:.6f}'))
            os.makedirs(os.path.join(job_dir, scene), exist_ok=True)
            with open(os.path.join(job_dir, scene, 'results.json'), 'w') as f:
                json.dump(result, f)
            continue
        for index in iterator:
            item = test_loader[index]
            # frames_files survives only on the raw loader; re-fetch names
            cameras, frames = build_batch(item)
            if generation_procedure == 'generated_images':
                prediction = generate_batch_predictions_using_generated_images(
                    model, model_vars, codebook_model, codebook_vars, frames, cameras,
                    num_gen_ctx=num_gen_ctx)
            elif generation_procedure == 'pose_refinement':
                prediction = generate_batch_predictions_using_pose_refinement(
                    scene_lookup, model, model_vars, codebook_model, codebook_vars,
                    frames, cameras, num_gen_ctx=num_gen_ctx,
                    num_context_views=num_context_views)
            else:
                raise ValueError(generation_procedure)
            evaluator.update_state(**prediction)
            store(**prediction)
            if progress:
                iterator.set_postfix(evaluator.get_progress_bar_info())
        result = evaluator.result()
        all_results[scene] = result
        print(f'Results on {scene}:')
        for m, val in result.items():
            print(f'    {m}: ' + ('n/a' if val is None else f'{val:.6f}'))
        os.makedirs(os.path.join(job_dir, scene), exist_ok=True)
        with open(os.path.join(job_dir, scene, 'results.json'), 'w') as f:
            json.dump(result, f)
    os.makedirs(job_dir, exist_ok=True)
    with open(os.path.join(job_dir, 'results.json'), 'w') as f:
        json.dump(all_results, f)
    return all_results

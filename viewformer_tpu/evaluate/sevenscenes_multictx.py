"""evaluate 7scenes-multictx: 7-Scenes x multi-context-size grid.

Parity target: /root/reference/viewformer/evaluate/evaluate_sevenscenes_multictx.py.
"""
import json
import os
import random

import numpy as np

from ..data.loaders._wrappers import ChangedImageSizeLoader, FixedSequenceSizeLoader
from ..data.loaders.sevenscenes import ALL_SCENES, SevenScenesLoader
from .evaluator import MultiContextEvaluator, print_metrics
from .multictx import build_store_predictions, generate_batch_predictions
from .sevenscenes import SceneLookup


def evaluate_sevenscenes_multictx(path, transformer_checkpoint, codebook_checkpoint,
                                  job_dir, batch_size=1, scenes=None,
                                  num_eval_sequences=100, store_ctx=True,
                                  num_store_images=100, num_context_views=19,
                                  image_size=128, progress=True):
    from tqdm import tqdm

    from ..models import load_model

    if scenes is None:
        scenes = ALL_SCENES
    codebook_model, codebook_vars = load_model(codebook_checkpoint)
    all_results = {}
    model = model_vars = None
    loaded = None
    for scene in scenes:
        scene_lookup = SceneLookup(path, scene, image_size)
        checkpoint = transformer_checkpoint.format(scene=scene)
        if model is None or checkpoint != loaded:
            model, model_vars = load_model(checkpoint)
            loaded = checkpoint
        rng = random.Random(42)

        def build_batch(batch):
            ctx = rng.sample(scene_lookup.files, num_context_views)
            ctx_cameras, ctx_frames = tuple(np.stack(y, 0) for y in
                                            zip(*(scene_lookup[x] for x in ctx)))
            cameras = np.concatenate((ctx_cameras, np.asarray(batch['cameras'])), 0)[None]
            frames = np.concatenate((ctx_frames, np.asarray(batch['frames'])), 0)[None]
            return cameras.astype(np.float32), frames

        store = build_store_predictions(os.path.join(job_dir, scene), num_store_images)
        evaluator = MultiContextEvaluator(num_context_views + 1,
                                          image_size=image_size)
        test_loader = ChangedImageSizeLoader(FixedSequenceSizeLoader(
            SevenScenesLoader(path=path, split='test', scenes=[scene],
                              _load_file_paths=True), 1), image_size)
        indices = random.Random(42).sample(
            list(range(len(test_loader))), min(len(test_loader), num_eval_sequences))
        iterator = tqdm(indices, desc=f'evaluating {scene}') if progress else indices
        # queries are independent, so --batch-size stacks them into one
        # forward (context sampling stays in per-index rng order)
        buf_cameras, buf_frames = [], []

        def flush():
            if not buf_cameras:
                return
            frames = np.concatenate(buf_frames, 0)
            prediction = generate_batch_predictions(
                model, model_vars, codebook_model, codebook_vars,
                frames, np.concatenate(buf_cameras, 0))
            evaluator.update_state(**prediction)
            if store_ctx:
                prediction['ctx'] = frames[:, :-1]
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
        print_metrics(result)
        os.makedirs(os.path.join(job_dir, scene), exist_ok=True)
        with open(os.path.join(job_dir, scene, 'results.json'), 'w') as f:
            json.dump(result, f)
    os.makedirs(job_dir, exist_ok=True)
    with open(os.path.join(job_dir, 'results.json'), 'w') as f:
        json.dump(all_results, f)
    return all_results

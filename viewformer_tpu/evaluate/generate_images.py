"""generate-gqn-images: small demo — 3-view context -> query render dumps.

Parity target: /root/reference/viewformer/evaluate/generate_images.py.
"""
import os

import numpy as np

from .transformer import generate_batch_predictions


def generate_gqn_images(dataset_path, job_dir, transformer_checkpoint,
                        codebook_checkpoint, num_eval_sequences=5, progress=True):
    from PIL import Image
    from tqdm import tqdm

    from ..data.loaders import build
    from ..models import load_model

    transformer_model, transformer_vars = load_model(transformer_checkpoint)
    codebook_model, codebook_vars = load_model(codebook_checkpoint)
    loader = build('dataset', path=dataset_path, split='test',
                   image_size=codebook_model.config.image_size)

    os.makedirs(job_dir, exist_ok=True)
    iterator = range(min(num_eval_sequences, len(loader)))
    if progress:
        iterator = tqdm(iterator, desc='generating')
    for i in iterator:
        item = loader[i]
        frames = np.asarray(item['frames'])
        cameras = np.asarray(item['cameras'], np.float32)
        # 3 context views + the last frame as query
        frames = np.concatenate((frames[:3], frames[-1:]), 0)[None]
        cameras = np.concatenate((cameras[:3], cameras[-1:]), 0)[None]
        prediction = generate_batch_predictions(transformer_model, transformer_vars,
                                                codebook_model, codebook_vars,
                                                frames, cameras)
        Image.fromarray(prediction['generated_images'][0]).save(
            os.path.join(job_dir, f'gen{i}.png'))
        Image.fromarray(prediction['ground_truth_images'][0]).save(
            os.path.join(job_dir, f'gt{i}.png'))
        for j, img in enumerate(frames[0, :-1]):
            Image.fromarray(img).save(os.path.join(job_dir, f'c{i}_{j}.png'))

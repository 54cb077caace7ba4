"""evaluate co3dv2-challenge: build an official CO3Dv2 few-view submission.

Parity target: /root/reference/viewformer/evaluate/evaluate_co3dv2_challenge.py
— iterates the official eval_batches map, predicts each target view, resizes
bilinearly to the GT depth resolution, splits RGBA into image+mask, and adds
results to a CO3DSubmission. Requires the co3d package (CO3DSubmission);
annotation parsing reuses our direct jgz reader.
"""
import gzip
import json
import os

import numpy as np

from ..data.loaders.co3dv2 import CO3Dv2Loader, _Frame
from ..ops.image import resize as _resize
from .transformer import generate_batch_predictions


def evaluate_co3dv2_challenge(dataset_root, transformer_checkpoint, codebook_checkpoint,
                              output='co3d_submission', split='dev', categories=None,
                              progress=True):
    from tqdm import tqdm

    from ..models import load_model

    try:
        from co3d.challenge.co3d_submission import (CO3DSequenceSet, CO3DSubmission,
                                                    CO3DTask)
    except ImportError as e:
        raise ImportError(
            'The co3d package is required for the CO3Dv2 challenge submission '
            '(pip install the facebookresearch/co3d repo).') from e

    transformer_model, transformer_vars = load_model(transformer_checkpoint)
    codebook_model, codebook_vars = load_model(codebook_checkpoint)

    task = CO3DTask.FEW_VIEW
    sequence_set = getattr(CO3DSequenceSet, split.upper())
    submission = CO3DSubmission(task=task, sequence_set=sequence_set,
                                output_folder=output, dataset_root=dataset_root)
    eval_batches_map = submission.get_eval_batches_map()

    loader = CO3Dv2Loader.__new__(CO3Dv2Loader)
    loader.path = dataset_root
    loader.image_size = codebook_model.config.image_size

    def load_raw_image(image_path):
        from PIL import Image
        with Image.open(os.path.join(dataset_root, image_path)) as img:
            return np.asarray(img)

    def make_batch(data):
        images = [loader._load_image(x.image_path) for x in data]
        masks = [loader._load_image(x.mask_path) for x in data]
        frames = np.stack([loader._process_rgb_image(img, m)
                           for img, m in zip(images, masks)], 0)
        cameras = np.stack([loader.world_to_camera_matrix_to_cameras(x.R, x.T)
                            for x in data], 0)
        depths = [load_raw_image(x.depth_path) for x in data]
        return dict(cameras=cameras, frames=frames, depths=depths)

    def predict_new_view(batch):
        images = batch['frames']
        cameras = batch['cameras'].astype(np.float32)
        # CO3D eval batches put the target first; our predict expects it last
        images = np.concatenate((images[1:], images[:1]), 0)[None]
        cameras = np.concatenate((cameras[1:], cameras[:1]), 0)[None]
        preds = generate_batch_predictions(transformer_model, transformer_vars,
                                           codebook_model, codebook_vars,
                                           images, cameras)
        return preds['generated_images'].astype(np.float32) / 255.0

    num_eval_batches = sum(map(len, eval_batches_map.values()))
    bar = tqdm(total=num_eval_batches) if progress else None
    for (category, subset_name), eval_batches in eval_batches_map.items():
        if categories is not None and category not in categories:
            continue
        with gzip.open(os.path.join(dataset_root, category, 'frame_annotations.jgz'),
                       'rt') as f:
            annotations = json.load(f)
        frame_map = {}
        for raw in annotations:
            frame = _Frame(raw)
            frame_map[(frame.sequence_name, frame.frame_number)] = frame

        for eval_batch in eval_batches:
            sequence_name, frame_number = eval_batch[0][:2]
            batch = make_batch([frame_map[(x, y)] for x, y, _ in eval_batch])
            depth = np.asarray(batch['depths'][-1])[None]
            is1, is2 = depth.shape[1:3] if depth.ndim > 2 else depth.shape[1:]
            images = predict_new_view(batch)
            # bilinear-resize RGBA prediction to GT depth resolution
            resized = _resize_rgba(images[-1], (int(is1), int(is2)))
            image, mask = resized[..., :3], resized[..., 3:]
            mask = (mask > 0.5).astype(image.dtype)
            submission.add_result(category=category, subset_name=subset_name,
                                  sequence_name=sequence_name, frame_number=frame_number,
                                  image=np.moveaxis(image, -1, 0),
                                  mask=np.moveaxis(mask, -1, 0),
                                  depth=depth)
            if bar is not None:
                bar.update()
    return submission


def _resize_rgba(image, hw):
    """Bilinear align_corners=False resize of a float [H,W,4] image to hw."""
    try:
        import torch
        th = torch.from_numpy(np.ascontiguousarray(image)).permute(2, 0, 1)[None]
        th = torch.nn.functional.interpolate(th, hw, mode='bilinear', align_corners=False)
        return th.clamp_(0, 1)[0].permute(1, 2, 0).numpy()
    except ImportError:
        if hw[0] == hw[1]:
            return np.clip(_resize(image.astype(np.float32), hw[0], 'bilinear'), 0, 1)
        raise

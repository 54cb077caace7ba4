"""visualize codebook: original-vs-reconstruction browser / grid dump.

Parity target: /root/reference/viewformer/commands/visualize_codebook.py
(interactive matplotlib viewer). Adds a headless `--output grid.png` mode for
remote TPU hosts without a display.
"""
import numpy as np


def _reconstruct_batch(codebook_checkpoint, frames):
    from ..evaluate.codebook import generate_batch_predictions
    from ..models import load_model
    model, variables = load_model(codebook_checkpoint)
    return generate_batch_predictions(model, variables, frames), model


def make_grid(images, columns=8):
    """uint8 [N, H, W, C] -> single grid image."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    rows = (n + columns - 1) // columns
    grid = np.zeros((rows * h, columns * w, c), np.uint8)
    for i, img in enumerate(images):
        r, col = divmod(i, columns)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    return grid


def visualize_codebook(loader, codebook_checkpoint, output=None, num_images=16):
    from ..models import load_model
    model, variables = load_model(codebook_checkpoint)
    if callable(loader) and not hasattr(loader, '__getitem__'):
        loader = loader(model.config.image_size)

    frames = []
    for idx in range(len(loader)):
        frames.extend(np.asarray(loader[idx]['frames']))
        if len(frames) >= num_images:
            break
    frames = np.stack(frames[:num_images], 0)

    from ..evaluate.codebook import generate_batch_predictions
    prediction = generate_batch_predictions(model, variables, frames)
    pairs = np.stack([prediction['ground_truth_images'],
                      prediction['generated_images']], 1)
    grid = make_grid(pairs.reshape((-1,) + pairs.shape[2:]), columns=8)

    if output is not None:
        from PIL import Image
        Image.fromarray(grid).save(output)
        print(f'Wrote reconstruction grid to {output}')
        return output

    import os
    if os.environ.get('DISPLAY'):
        # interactive original-vs-reconstruction browser
        from ..utils.visualization import InteractiveViewer, render_reconstruction_pair

        def reconstruct(frames):
            pred = generate_batch_predictions(model, variables, frames)
            return pred['generated_images']
        return InteractiveViewer(loader, render_reconstruction_pair(reconstruct),
                                 title='codebook').show()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.figure(figsize=(12, 12))
    plt.imshow(grid)
    plt.axis('off')
    plt.title('original (left) vs reconstruction (right)')
    plt.show()
    return grid

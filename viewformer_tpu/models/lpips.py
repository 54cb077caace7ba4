"""LPIPS perceptual metric in JAX (VGG16 backbone).

Parity target: the `lpips` pypi package used by the reference
(/root/reference/viewformer/models/vqgan_th.py:337 for the training loss,
/root/reference/viewformer/models/utils.py:264-307 for the ONNX-exported TF
metric). This port runs the VGG16 feature trunk in jax, normalizes feature
activations channel-wise, and applies the learned linear calibration weights.

Weights are imported (once) from torchvision's VGG16 + the lpips package's
linear heads when available on disk; with zero network egress the import
falls back gracefully: `load_lpips` returns None and callers treat the
perceptual term/metric as unavailable.
"""
import functools
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

# Search locations for converted weights (a single .npz with vgg conv kernels
# and lin head weights).
_WEIGHT_PATHS = [
    os.path.expanduser('~/.cache/viewformer_tpu/lpips_vgg.npz'),
    os.path.join(os.path.dirname(__file__), '..', '..', 'weights', 'lpips_vgg.npz'),
]

# VGG16 feature config (torchvision): conv channels per block before pooling.
_VGG_SLICES = [(3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3), (512, 512, 3)]
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


def _lpips_forward(params, img0, img1):
    """img0/img1: [N, H, W, 3] in [-1, 1]. Returns [N]."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x0 = (img0 - shift) / scale
    x1 = (img1 - shift) / scale

    total = 0.0
    conv_idx = 0
    for block_idx, (_, _, n_convs) in enumerate(_VGG_SLICES):
        for _ in range(n_convs):
            w, b = params[f'conv{conv_idx}_w'], params[f'conv{conv_idx}_b']
            x0 = jax.nn.relu(_conv(x0, w, b))
            x1 = jax.nn.relu(_conv(x1, w, b))
            conv_idx += 1
        # feature comparison taken after each block's last relu (pre-pool)
        f0, f1 = _normalize_tensor(x0), _normalize_tensor(x1)
        diff = (f0 - f1) ** 2
        lin_w = params[f'lin{block_idx}_w']  # [C]
        # spatial average of the 1x1-conv calibrated difference
        total = total + jnp.mean(jnp.sum(diff * lin_w, axis=-1), axis=(-2, -1))
        if block_idx < len(_VGG_SLICES) - 1:
            x0, x1 = _maxpool(x0), _maxpool(x1)
    return total


class LPIPS:
    def __init__(self, params):
        self._params = params
        # params are a CALL argument, never jit-bound: partial-bound arrays
        # get baked into the HLO as constants (~59MB of VGG weights),
        # bloating the executable and compile time (see CLAUDE.md)
        self._fn = jax.jit(_lpips_forward)

    def __call__(self, img0, img1):
        """Images [N, H, W, 3] (or [..., H, W, 3]) in [-1, 1] -> LPIPS [...]"""
        img0 = jnp.asarray(img0, jnp.float32)
        img1 = jnp.asarray(img1, jnp.float32)
        batch_shape = img0.shape[:-3]
        out = self._fn(self._params,
                       img0.reshape((-1,) + img0.shape[-3:]),
                       img1.reshape((-1,) + img1.shape[-3:]))
        return out.reshape(batch_shape)


def convert_lpips_weights_from_torch(out_path=None, net='vgg'):
    """Import torchvision VGG16 + lpips linear heads into a portable npz.

    Requires the `lpips` and `torchvision` packages with their cached weights
    present on disk (no download is attempted here)."""
    import torch
    import lpips as lpips_pkg

    model = lpips_pkg.LPIPS(net=net)
    params = {}
    conv_idx = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 + model.net.slice4 + model.net.slice5:  # noqa
        if isinstance(layer, torch.nn.Conv2d):
            # OIHW -> HWIO
            params[f'conv{conv_idx}_w'] = layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            params[f'conv{conv_idx}_b'] = layer.bias.detach().numpy()
            conv_idx += 1
    for i, lin in enumerate(model.lins):
        params[f'lin{i}_w'] = lin.model[-1].weight.detach().numpy().reshape(-1)
    out_path = out_path or _WEIGHT_PATHS[0]
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **params)
    return out_path


@functools.lru_cache(maxsize=2)
def load_lpips(net='vgg'):
    """Load the jax LPIPS model, or None when weights are unavailable.

    Unavailability is LOUD (one stderr warning per process): the reference
    always trains the codebook with the LPIPS(VGG) perceptual term
    (ref vqgan_th.py:400-414) and always reports the lpips eval metric
    (ref utils/metrics.py:130-142), so running without it diverges from
    reference behavior and must never happen silently."""
    if net != 'vgg':
        return None
    for path in _WEIGHT_PATHS:
        if os.path.exists(path):
            data = np.load(path)
            params = {k: jnp.asarray(data[k]) for k in data.files}
            return LPIPS(params)
    try:
        path = convert_lpips_weights_from_torch()
        data = np.load(path)
        params = {k: jnp.asarray(data[k]) for k in data.files}
        return LPIPS(params)
    except Exception as exc:  # lru_cache => warning fires once per process
        print(
            f'WARNING: LPIPS({net}) calibration weights are unavailable '
            f'(conversion failed: {exc!r}; searched {_WEIGHT_PATHS}). '
            'The perceptual loss term and the lpips metric will be reported '
            'as NaN/null — training dynamics and results.json DIVERGE from '
            'the reference until weights are provided (run '
            'models.lpips.convert_lpips_weights_from_torch on a machine with '
            'cached torchvision/lpips weights and copy the npz).',
            file=sys.stderr)
        return None

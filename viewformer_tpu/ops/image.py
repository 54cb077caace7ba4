"""Image resize + codecs with exact reference-preprocessing semantics.

The reference pins dataset preprocessing to torch's interpolate
(/root/reference/viewformer/data/_common.py:19-60: nearest when upsampling,
bilinear align_corners=False when downsampling, computed on float in [0,1],
clamped, then truncated back to uint8) and notes results are only
reproducible with identical resizing. This module re-derives those kernels in
numpy (host path) and jax (device path) without a torch dependency;
tests/test_image_ops.py checks bit-exactness against torch.
"""
import io
import os

import numpy as np


def normalize_images(images):
    """uint8 [0, 255] or f32 [-1, 1] -> f32 [-1, 1]; the dtype branch
    resolves at jit-trace time. Accepting uint8 lets callers ship 1 byte/px
    over the host->device link and run the (x/255)*2-1 normalize on device —
    measured on the v5e tunnel, the f32 upload of big image batches costs
    more than the model compute it feeds (see train/codebook)."""
    import jax.numpy as jnp
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return images


def ensure_wire_images(images):
    """Host-side boundary guard for the uint8-wire paths: uint8 passes
    through untouched (the paired jit normalizes on device via
    `normalize_images`); FLOAT inputs get the historical unconditional
    host normalize (callers that hand float frames always meant [0, 255] —
    the pre-uint8-wire code normalized every dtype, so this keeps those
    callers working instead of silently feeding unscaled floats through the
    pass-through branch of normalize_images)."""
    images = np.asarray(images)
    if images.dtype == np.uint8:
        return images
    return images.astype(np.float32) / 255.0 * 2.0 - 1.0


def _nearest_indices(out_size, in_size):
    # torch 'nearest': src = floor(dst * in/out)
    return np.minimum((np.arange(out_size) * (in_size / out_size)).astype(np.int64), in_size - 1)


def _bilinear_weights(out_size, in_size):
    # torch 'bilinear', align_corners=False: src = (dst + 0.5) * in/out - 0.5
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def _resize_nearest(images, size):
    rows = _nearest_indices(size, images.shape[-3])
    cols = _nearest_indices(size, images.shape[-2])
    return images[..., rows[:, None], cols[None, :], :]


def _resize_bilinear(images, size):
    r_lo, r_hi, r_w = _bilinear_weights(size, images.shape[-3])
    c_lo, c_hi, c_w = _bilinear_weights(size, images.shape[-2])
    r_w = r_w[:, None, None]
    c_w = c_w[None, :, None]
    top = images[..., r_lo, :, :]
    bot = images[..., r_hi, :, :]
    tl, tr = top[..., c_lo, :], top[..., c_hi, :]
    bl, br = bot[..., c_lo, :], bot[..., c_hi, :]
    t = tl * (1 - c_w) + tr * c_w
    b = bl * (1 - c_w) + br * c_w
    return t * (1 - r_w) + b * r_w


def resize(images, image_size, method=None):
    """Resize [..., H, W, C] images to (image_size, image_size).

    uint8 inputs reproduce the reference preprocessing exactly: /255 float,
    interpolate, clamp to [0,1], *255, truncate to uint8. Float inputs are
    resized and returned as float32. method: None (auto: nearest if
    upsampling else bilinear), 'nearest' or 'bilinear'.

    Uses torch's interpolate kernel when importable — the reference pinned
    dataset preprocessing to it bit-for-bit, and the pure-numpy fallback below
    agrees only to ±1/255 (uint8 truncation at float ULP boundaries)."""
    images = np.asarray(images)
    if images.shape[-2] == image_size and images.shape[-3] == image_size:
        return images
    if method is not None:
        assert method in ('nearest', 'bilinear')
    else:
        method = 'nearest' if image_size > images.shape[-2] else 'bilinear'

    torch_out = _resize_torch(images, image_size, method)
    if torch_out is not None:
        return torch_out

    was_uint8 = images.dtype == np.uint8
    x = images.astype(np.float32)
    if was_uint8:
        x = x / 255.0
    if method == 'nearest':
        out = _resize_nearest(x, image_size)
    else:
        out = _resize_bilinear(x, image_size)
    if was_uint8:
        out = np.clip(out, 0.0, 1.0)
        out = (out * 255.0).astype(np.uint8)  # truncation, matching .to(uint8)
    return out


def _resize_torch(images, image_size, method):
    """Bit-exact reference resize via torch (ref data/_common.py:19-60);
    returns None when torch is unavailable."""
    try:
        import torch
    except ImportError:
        return None
    batch_shape = images.shape[:-3]
    th = torch.from_numpy(np.ascontiguousarray(images.reshape((-1,) + images.shape[-3:])))
    th = th.permute(0, 3, 1, 2)
    was_uint8 = th.dtype == torch.uint8
    if was_uint8:
        th = th.to(torch.float32) / 255.0
    th = th.to(torch.float32)
    if method == 'nearest':
        th = torch.nn.functional.interpolate(th, (image_size, image_size), mode='nearest')
    else:
        th = torch.nn.functional.interpolate(th, (image_size, image_size), mode='bilinear',
                                             align_corners=False)
    if was_uint8:
        th = th.clamp_(0, 1)
        th = (th * 255.0).to(torch.uint8)
    out = th.permute(0, 2, 3, 1).numpy()
    return out.reshape(batch_shape + out.shape[1:])


def resize_jax(images, image_size, method=None):
    """Device-side twin of `resize` for float images inside jit (same
    half-pixel bilinear / floor nearest index math via gathers)."""
    import jax.numpy as jnp

    if images.shape[-2] == image_size and images.shape[-3] == image_size:
        return images
    if method is None:
        method = 'nearest' if image_size > images.shape[-2] else 'bilinear'
    if method == 'nearest':
        rows = jnp.asarray(_nearest_indices(image_size, images.shape[-3]))
        cols = jnp.asarray(_nearest_indices(image_size, images.shape[-2]))
        return images[..., rows[:, None], cols[None, :], :]
    r_lo, r_hi, r_w = _bilinear_weights(image_size, images.shape[-3])
    c_lo, c_hi, c_w = _bilinear_weights(image_size, images.shape[-2])
    r_w = jnp.asarray(r_w)[:, None, None]
    c_w = jnp.asarray(c_w)[None, :, None]
    top = images[..., jnp.asarray(r_lo), :, :]
    bot = images[..., jnp.asarray(r_hi), :, :]
    tl, tr = top[..., jnp.asarray(c_lo), :], top[..., jnp.asarray(c_hi), :]
    bl, br = bot[..., jnp.asarray(c_lo), :], bot[..., jnp.asarray(c_hi), :]
    t = tl * (1 - c_w) + tr * c_w
    b = bl * (1 - c_w) + br * c_w
    return t * (1 - r_w) + b * r_w


# ---------------------------------------------------------------------------
# Codecs (host-side; PIL backend)
# ---------------------------------------------------------------------------

def encode_image(image):
    """uint8 [H, W, 3|4] -> JPEG (RGB) or PNG (RGBA) bytes, matching the
    reference shard format (ref tfrecord_dataset.py:315-323)."""
    from PIL import Image

    image = np.asarray(image)
    if image.shape[-1] == 4:
        pil = Image.fromarray(image, 'RGBA')
        fmt = 'PNG'
    else:
        pil = Image.fromarray(image, 'RGB')
        fmt = 'JPEG'
    buf = io.BytesIO()
    save_kwargs = {'quality': 95} if fmt == 'JPEG' else {}
    pil.save(buf, fmt, **save_kwargs)
    return buf.getvalue()


def decode_image(data):
    """JPEG/PNG bytes -> uint8 [H, W, C].

    JPEG takes the native libjpeg path (native/vfimage.cc) when available —
    the ctypes call releases the GIL so the pipeline's thread pool scales
    across cores; PIL remains the fallback and the PNG path. Disable with
    VIEWFORMER_NATIVE_JPEG=0 (decoded pixels are verified identical to PIL
    on this image corpus by tests/test_image_ops.py, but the escape hatch
    stays)."""
    if (len(data) >= 2 and data[:2] == b'\xff\xd8'
            and os.environ.get('VIEWFORMER_NATIVE_JPEG', '1') != '0'):
        from ..data.native import decode_jpeg
        decoded = decode_jpeg(data)
        if decoded is not None:
            return decoded
    from PIL import Image

    with Image.open(io.BytesIO(data)) as pil:
        if pil.mode not in ('RGB', 'RGBA'):
            pil = pil.convert('RGB')
        return np.asarray(pil)

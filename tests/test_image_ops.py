import numpy as np
import pytest

from viewformer_tpu.ops.image import decode_image, encode_image, resize, resize_jax


def _torch_reference_resize(images, image_size, method=None):
    """The reference's pinned resize (ref data/_common.py:19-60) via torch."""
    import torch

    th = torch.from_numpy(np.asarray(images)).permute(0, 3, 1, 2)
    if th.shape[-2] == image_size:
        return images
    if th.dtype == torch.uint8:
        th = th.to(torch.float32) / 255.
    if method is None:
        method = 'nearest' if image_size > th.shape[-2] else 'bilinear'
    if method == 'nearest':
        th = torch.nn.functional.interpolate(th, (image_size, image_size), mode='nearest')
    else:
        th = torch.nn.functional.interpolate(th, (image_size, image_size), mode='bilinear',
                                             align_corners=False)
    th = th.clamp_(0, 1)
    th = (th * 255.).to(torch.uint8)
    return th.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize('in_size,out_size', [(64, 128), (128, 64), (100, 128), (128, 100), (37, 128)])
def test_resize_uint8_matches_torch(in_size, out_size):
    rng = np.random.RandomState(in_size * 1000 + out_size)
    images = rng.randint(0, 256, (2, in_size, in_size, 3), np.uint8)
    ours = resize(images, out_size)
    torch_ref = _torch_reference_resize(images, out_size)
    np.testing.assert_array_equal(ours, torch_ref)


@pytest.mark.parametrize('in_size,out_size', [(64, 128), (128, 64), (128, 100)])
def test_numpy_fallback_resize_within_1(in_size, out_size, monkeypatch):
    """The torch-free numpy path agrees with torch to ±1 uint8 ULP."""
    import viewformer_tpu.ops.image as image_mod
    monkeypatch.setattr(image_mod, '_resize_torch', lambda *a: None)
    rng = np.random.RandomState(in_size + out_size)
    images = rng.randint(0, 256, (2, in_size, in_size, 3), np.uint8)
    ours = image_mod.resize(images, out_size)
    torch_ref = _torch_reference_resize(images, out_size)
    assert np.abs(ours.astype(int) - torch_ref.astype(int)).max() <= 1


def test_resize_noop():
    images = np.random.RandomState(0).randint(0, 256, (1, 32, 32, 3), np.uint8)
    assert resize(images, 32) is images


def test_resize_explicit_method_matches_torch():
    rng = np.random.RandomState(7)
    images = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    for method in ('nearest', 'bilinear'):
        ours = resize(images, 32, method)
        torch_ref = _torch_reference_resize(images, 32, method)
        np.testing.assert_array_equal(ours, torch_ref)


def test_resize_jax_matches_numpy():
    rng = np.random.RandomState(3)
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    for out in (32, 128):
        ours_np = resize(images, out)
        ours_jax = np.asarray(resize_jax(images, out))
        np.testing.assert_allclose(ours_jax, ours_np, atol=1e-5)


def test_jpeg_roundtrip_rgb():
    rng = np.random.RandomState(0)
    # smooth image so JPEG loss is small
    x = np.linspace(0, 255, 64).astype(np.uint8)
    image = np.broadcast_to(x[None, :, None], (64, 64, 3)).copy()
    data = encode_image(image)
    assert data[:2] == b'\xff\xd8'  # JPEG magic
    decoded = decode_image(data)
    assert decoded.shape == (64, 64, 3)
    assert np.abs(decoded.astype(int) - image.astype(int)).mean() < 3


def test_png_roundtrip_rgba():
    rng = np.random.RandomState(1)
    image = rng.randint(0, 256, (32, 32, 4), np.uint8)
    data = encode_image(image)
    assert data[:8] == b'\x89PNG\r\n\x1a\n'
    decoded = decode_image(data)
    np.testing.assert_array_equal(decoded, image)  # PNG is lossless


def test_ensure_wire_images_boundary():
    """uint8 passes through untouched (the jit normalizes on device); float
    inputs get the historical unconditional [0,255] -> [-1,1] normalize."""
    import numpy as np
    from viewformer_tpu.ops.image import ensure_wire_images, normalize_images
    u8 = (np.arange(12, dtype=np.uint8) * 20).reshape(1, 2, 2, 3)
    out = ensure_wire_images(u8)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, u8)
    f = u8.astype(np.float64)  # a float-frames caller (old API tolerance)
    out = ensure_wire_images(f)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, u8.astype(np.float32) / 255.0 * 2.0 - 1.0)

    # the device-side pair: uint8 -> normalized f32; f32 passthrough
    import jax.numpy as jnp
    dev = normalize_images(jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(dev),
                               u8.astype(np.float32) / 255.0 * 2.0 - 1.0,
                               rtol=1e-6, atol=1e-6)
    passthrough = normalize_images(jnp.asarray(out))
    np.testing.assert_array_equal(np.asarray(passthrough), out)

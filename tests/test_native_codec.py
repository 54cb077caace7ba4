"""Native C++ codec (native/vfcodec.cc) parity with the python paths."""
import numpy as np
import pytest

from viewformer_tpu.data import native, tfrecord


@pytest.fixture(scope='module')
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip('native codec unavailable (no compiler)')
    return lib


def test_crc32c_matches_reference(lib):
    google_crc32c = pytest.importorskip('google_crc32c')
    for data in (b'', b'a', b'hello world', bytes(range(256)) * 33):
        assert native.crc32c(data) == google_crc32c.value(data)


def test_masked_crc_matches_python(lib):
    data = b'some record payload'
    assert native.masked_crc(data) == tfrecord._masked_crc(data)


def test_index_records_matches_framing(lib, tmp_path):
    path = str(tmp_path / 'x.tfrecord')
    sizes = [1, 100, 7, 4096]
    with tfrecord.RecordWriter(path) as w:
        for size in sizes:
            w.write(b'z' * size)
    with open(path, 'rb') as f:
        spans = native.index_records(f.read())
    assert len(spans) == len(sizes)
    expected_offset = 0
    for (offset, length), size in zip(spans, sizes):
        assert offset == expected_offset
        assert length == 8 + 4 + size + 4
        expected_offset += length


def test_index_records_detects_truncation(lib, tmp_path):
    path = str(tmp_path / 'x.tfrecord')
    with tfrecord.RecordWriter(path) as w:
        w.write(b'z' * 100)
    with open(path, 'rb') as f:
        blob = f.read()
    with pytest.raises(IOError):
        native.index_records(blob[:-10])


def test_decode_varints_parity(lib):
    values = np.array([0, 1, 127, 128, 16383, 16384, 2 ** 40, -1, -2 ** 40], np.int64)
    payload = bytearray()
    for v in values.tolist():
        tfrecord._write_varint(payload, v & 0xFFFFFFFFFFFFFFFF)
    decoded = native.decode_varints(bytes(payload))
    np.testing.assert_array_equal(decoded, values)


def test_example_int64_decode_uses_native(lib):
    codes = np.random.RandomState(0).randint(0, 1024, 1280).astype(np.int64)
    payload = tfrecord.encode_example({'codes': ('int64', codes)})
    out = tfrecord.decode_example(payload)
    np.testing.assert_array_equal(out['codes'], codes)


@pytest.fixture(scope='module')
def image_lib():
    lib = native.get_image_lib()
    if lib is None:
        pytest.skip('native JPEG decode unavailable (no compiler / libjpeg)')
    return lib


def test_native_jpeg_decode_matches_pil(image_lib):
    import io

    from PIL import Image

    rng = np.random.RandomState(0)
    for shape, quality in (((128, 128, 3), 90), ((64, 96, 3), 75),
                           ((31, 17, 3), 95)):
        img = (rng.rand(*shape) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, 'JPEG', quality=quality)
        data = buf.getvalue()
        decoded = native.decode_jpeg(data)
        with Image.open(io.BytesIO(data)) as pil:
            expected = np.asarray(pil.convert('RGB'))
        assert decoded is not None and decoded.shape == expected.shape
        np.testing.assert_array_equal(decoded, expected)


def test_native_jpeg_decode_grayscale_to_rgb(image_lib):
    import io

    from PIL import Image

    img = np.linspace(0, 255, 32 * 32).reshape(32, 32).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, mode='L').save(buf, 'JPEG', quality=90)
    decoded = native.decode_jpeg(buf.getvalue())
    assert decoded is not None and decoded.shape == (32, 32, 3)
    # grayscale promoted to RGB: all channels equal
    np.testing.assert_array_equal(decoded[..., 0], decoded[..., 1])


def test_native_jpeg_decode_rejects_garbage(image_lib):
    assert native.decode_jpeg(b'\xff\xd8 definitely not a jpeg') is None


def test_decode_image_routes_jpeg_through_native(image_lib, monkeypatch):
    """decode_image must produce identical pixels with and without the
    native path (PIL fallback)."""
    import io

    from PIL import Image

    from viewformer_tpu.ops.image import decode_image

    img = (np.random.RandomState(1).rand(48, 48, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, 'JPEG', quality=92)
    data = buf.getvalue()
    native_out = decode_image(data)
    monkeypatch.setenv('VIEWFORMER_NATIVE_JPEG', '0')
    pil_out = decode_image(data)
    np.testing.assert_array_equal(native_out, pil_out)

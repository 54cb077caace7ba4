"""ctypes loader for the native codec (native/vfcodec.cc).

Compiles the shared library on first use (g++, cached beside the source) and
exposes numpy-typed wrappers. All callers treat the native path as an
accelerator with the pure-python implementation as fallback — `get_lib()`
returns None when no compiler is available.
"""
import ctypes
import functools
import os
import subprocess
import sys

import numpy as np

_SOURCE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'vfcodec.cc')
_LIB = os.path.join(os.path.dirname(_SOURCE), 'build', 'libvfcodec.so')


def _build():
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    flags = ['-O3', '-shared', '-fPIC']
    if os.uname().machine in ('x86_64', 'amd64'):
        flags.append('-msse4.2')
    cmd = ['g++'] + flags + ['-o', _LIB, _SOURCE]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


@functools.lru_cache(maxsize=1)
def get_lib():
    """Load (building if needed) the native library, or None."""
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SOURCE)):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception as e:  # no compiler / unsupported platform
        print(f'viewformer_tpu: native codec unavailable ({e}); '
              'using pure-python fallback', file=sys.stderr)
        return None
    lib.vf_crc32c.restype = ctypes.c_uint32
    lib.vf_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.vf_masked_crc.restype = ctypes.c_uint32
    lib.vf_masked_crc.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.vf_index_records.restype = ctypes.c_int64
    lib.vf_index_records.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    lib.vf_decode_varints.restype = ctypes.c_int64
    lib.vf_decode_varints.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.vf_verify_record.restype = ctypes.c_int32
    lib.vf_verify_record.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    return lib


def crc32c(data):
    lib = get_lib()
    if lib is None:
        return None
    return lib.vf_crc32c(bytes(data), len(data))


def masked_crc(data):
    lib = get_lib()
    if lib is None:
        return None
    return lib.vf_masked_crc(bytes(data), len(data))


def index_records(buffer):
    """Walk TFRecord framing of a whole shard buffer -> [(offset, length)],
    or None when native is unavailable. Raises IOError on corrupt framing."""
    lib = get_lib()
    if lib is None:
        return None
    max_records = max(len(buffer) // 12, 1)
    offsets = np.zeros(max_records, np.int64)
    lengths = np.zeros(max_records, np.int64)
    count = lib.vf_index_records(
        bytes(buffer), len(buffer),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_records)
    if count < 0:
        raise IOError('Corrupt TFRecord framing')
    return list(zip(offsets[:count].tolist(), lengths[:count].tolist()))


_IMAGE_SOURCE = os.path.join(os.path.dirname(_SOURCE), 'vfimage.cc')
_IMAGE_LIB = os.path.join(os.path.dirname(_LIB), 'libvfimage.so')


def _build_image():
    os.makedirs(os.path.dirname(_IMAGE_LIB), exist_ok=True)
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-o', _IMAGE_LIB, _IMAGE_SOURCE,
           '-ljpeg']
    subprocess.run(cmd, check=True, capture_output=True)
    return _IMAGE_LIB


@functools.lru_cache(maxsize=1)
def get_image_lib():
    """Load (building if needed) the JPEG decode library, or None (no
    compiler / no libjpeg)."""
    try:
        if (not os.path.exists(_IMAGE_LIB)
                or os.path.getmtime(_IMAGE_LIB) < os.path.getmtime(_IMAGE_SOURCE)):
            _build_image()
        lib = ctypes.CDLL(_IMAGE_LIB)
    except Exception as e:
        print(f'viewformer_tpu: native JPEG decode unavailable ({e}); '
              'using PIL', file=sys.stderr)
        return None
    lib.vf_jpeg_info.restype = ctypes.c_int64
    lib.vf_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.vf_jpeg_decode.restype = ctypes.c_int64
    lib.vf_jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t]
    return lib


def decode_jpeg(data):
    """JPEG bytes -> uint8 [H, W, 3] via libjpeg (the ctypes call releases
    the GIL, so thread pools scale across cores), or None when the native
    library is unavailable or the stream is unsupported (e.g. CMYK) — the
    caller falls back to PIL."""
    lib = get_image_lib()
    if lib is None:
        return None
    data = bytes(data)
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    c = ctypes.c_int64()
    if lib.vf_jpeg_info(data, len(data), ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.vf_jpeg_decode(data, len(data),
                          out.ctypes.data_as(ctypes.c_void_p), out.nbytes) != 0:
        return None
    return out


def decode_varints(buffer):
    """Packed int64 varint list -> np.int64 array, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    max_out = max(len(buffer), 1)
    out = np.zeros(max_out, np.int64)
    count = lib.vf_decode_varints(
        bytes(buffer), len(buffer),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_out)
    if count < 0:
        raise IOError('Corrupt varint buffer')
    return out[:count].copy()

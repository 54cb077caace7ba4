import numpy as np
import pytest

from viewformer_tpu.data import tfrecord


def test_record_roundtrip(tmp_path):
    path = tmp_path / 'test.tfrecord'
    payloads = [b'hello', b'world' * 100, b'']
    with tfrecord.RecordWriter(str(path)) as w:
        for p in payloads:
            w.write(p)
    read = list(tfrecord.read_records(str(path), verify_crc=True))
    assert read == payloads


def test_example_roundtrip():
    features = {
        'cameras': ('float', np.arange(14, dtype=np.float32) / 7),
        'codes': ('int64', np.array([0, 1, 1023, 2 ** 40], np.int64)),
        'frames': ('bytes', [b'\x01\x02', b'jpegdata']),
    }
    payload = tfrecord.encode_example(features)
    decoded = tfrecord.decode_example(payload)
    np.testing.assert_array_equal(decoded['cameras'], features['cameras'][1])
    np.testing.assert_array_equal(decoded['codes'], features['codes'][1])
    assert decoded['frames'] == features['frames'][1]


def test_example_negative_int64():
    payload = tfrecord.encode_example({'x': ('int64', np.array([-5, 3], np.int64))})
    decoded = tfrecord.decode_example(payload)
    np.testing.assert_array_equal(decoded['x'], [-5, 3])


def test_shard_index(tmp_path):
    path = tmp_path / 'shard.tfrecord'
    with tfrecord.RecordWriter(str(path)) as w:
        w.write(b'a' * 10)
        w.write(b'b' * 20)
    tfrecord.build_shard_index(str(path), str(tmp_path / 'shard.index'))
    spans = tfrecord.read_shard_index(str(tmp_path / 'shard.index'))
    assert spans == [(0, 8 + 4 + 10 + 4), (26, 8 + 4 + 20 + 4)]
    # spans let us re-read records without walking
    with open(path, 'rb') as f:
        f.seek(spans[1][0])
        chunk = f.read(spans[1][1])
    assert chunk[12:-4] == b'b' * 20


@pytest.mark.tf_oracle
def test_tf_oracle_reads_our_records(tmp_path):
    """TensorFlow must parse our shards exactly (byte-level format compat)."""
    tf = pytest.importorskip('tensorflow')
    path = str(tmp_path / 'oracle.tfrecord')
    cameras = np.random.RandomState(0).randn(3 * 7).astype(np.float32)
    codes = np.random.RandomState(1).randint(0, 1024, 3 * 64).astype(np.int64)
    payload = tfrecord.encode_example({
        'cameras': ('float', cameras),
        'codes': ('int64', codes),
        'frames': ('bytes', [b'abc', b'defg']),
    })
    with tfrecord.RecordWriter(path) as w:
        w.write(payload)

    ds = tf.data.TFRecordDataset([path])
    raw = next(iter(ds))
    parsed = tf.io.parse_single_example(raw, {
        'cameras': tf.io.RaggedFeature(tf.float32),
        'codes': tf.io.RaggedFeature(tf.int64),
        'frames': tf.io.RaggedFeature(tf.string),
    })
    np.testing.assert_array_equal(parsed['cameras'].numpy(), cameras)
    np.testing.assert_array_equal(parsed['codes'].numpy(), codes)
    assert [x for x in parsed['frames'].numpy()] == [b'abc', b'defg']


@pytest.mark.tf_oracle
def test_we_read_tf_written_records(tmp_path):
    tf = pytest.importorskip('tensorflow')
    path = str(tmp_path / 'tfwritten.tfrecord')
    cameras = np.random.RandomState(2).randn(14).astype(np.float32)
    example = tf.train.Example(features=tf.train.Features(feature={
        'cameras': tf.train.Feature(float_list=tf.train.FloatList(value=cameras)),
        'codes': tf.train.Feature(int64_list=tf.train.Int64List(value=[1, 2, 3])),
        'frames': tf.train.Feature(bytes_list=tf.train.BytesList(value=[b'xy'])),
    }))
    with tf.io.TFRecordWriter(path) as w:
        w.write(example.SerializeToString())

    records = list(tfrecord.read_records(path, verify_crc=True))
    assert len(records) == 1
    decoded = tfrecord.decode_example(records[0])
    np.testing.assert_allclose(decoded['cameras'], cameras, rtol=1e-6)
    np.testing.assert_array_equal(decoded['codes'], [1, 2, 3])
    assert decoded['frames'] == [b'xy']

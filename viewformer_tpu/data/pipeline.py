"""Host-side training input pipelines feeding the TPU mesh.

Parity targets: /root/reference/viewformer/data/tfrecord_dataset.py:88-197
(tf.data `load_image_dataset` / `load_token_dataset`). TPU-native redesign:
instead of tf.data graphs + strategy input contexts, these are plain numpy
iterator pipelines with
  - per-host shard assignment (process_index-modulo, like the reference's
    input_pipeline_id sharding; ref tfrecord_dataset.py:111,169),
  - thread-pool JPEG decode (the reference leaned on 8-worker DataLoaders),
  - local shuffle buffers (size 1000, like the reference),
  - a background prefetch thread producing ready numpy batches, which the
    train loop transfers with a single device_put per step.
"""
import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .dataset import fix_legacy_gqn_cameras, get_dataset_info
from .tfrecord import decode_example, read_records
from ..ops.image import decode_image


def _decode_uint8(data):
    """Module-level JPEG decode for multiprocessing picklability."""
    return decode_image(data)


def _host_info():
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def _shard_paths(path, split):
    info = get_dataset_info(path)
    name, size = info['name'], info[f'{split}_size']
    return info, [os.path.join(path, f'{name}-{split}-{i:06d}-of-{size:06d}.tfrecord')
                  for i in range(1, size + 1)]


def _select_host_shards(paths, host_id, num_hosts):
    """Rank-modulo shard assignment; duplicates shards when there are fewer
    shards than hosts (ref tfrecord_dataset_th.py:63-73 semantics)."""
    if num_hosts <= 1:
        return list(paths)
    if len(paths) < num_hosts:
        return [paths[host_id % len(paths)]]
    return [p for i, p in enumerate(paths) if i % num_hosts == host_id]


def _interleave(factories, cycle_length):
    """Round-robin (block_length=1) interleave over lazily-opened streams.

    Mirrors tf.data interleave semantics the reference relies on for
    cross-shard mixing (ref tfrecord_dataset.py:113-115,150-152): up to
    `cycle_length` streams are open at once, one item is drawn from each in
    turn, and an exhausted slot is refilled from the next factory.
    `factories` is any iterable of zero-arg callables returning iterables —
    it may itself be lazy (used for environment-level interleave where
    environments stream out of the shard interleave)."""
    factories = iter(factories)
    active = []

    def refill():
        while len(active) < cycle_length:
            try:
                factory = next(factories)
            except StopIteration:
                return
            active.append(iter(factory()))

    refill()
    idx = 0
    while active:
        if idx >= len(active):
            idx = 0
        try:
            item = next(active[idx])
        except StopIteration:
            active.pop(idx)
            refill()
            continue
        yield item
        idx += 1


# Shard-level interleave width (the reference uses AUTOTUNE; a fixed small
# fan-in keeps seeded determinism) and environment-level width (ref
# tfrecord_dataset.py:175 cycle_length=8).
INTERLEAVE_SHARDS = 4
INTERLEAVE_ENVIRONMENTS = 8


def _local_shuffle(iterator, buffer_size, rng):
    buffer = []
    for item in iterator:
        buffer.append(item)
        if len(buffer) >= buffer_size:
            idx = rng.randrange(len(buffer))
            buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
            yield buffer.pop()
    rng.shuffle(buffer)
    yield from buffer


class Prefetcher:
    """Background-thread prefetch with a bounded queue (double buffering of
    host batches while the device step runs).

    With track_state=True the wrapped iterator yields (state, batch) pairs;
    `.state` then holds the resume cursor of the batch most recently handed
    to the CONSUMER (not merely produced into the prefetch buffer — batches
    sitting undelivered in the queue are regenerated on resume), suitable to
    pass back as the loader's `start_state`."""

    _DONE = object()

    def __init__(self, iterator_factory, buffer_size=2, track_state=False):
        self._factory = iterator_factory
        self._queue = queue.Queue(maxsize=buffer_size)
        self._thread = None
        self._stop = threading.Event()
        self._track_state = track_state
        self.state = None

    def _run(self):
        try:
            for item in self._factory():
                if self._stop.is_set():
                    return
                self._queue.put(item)
        finally:
            self._queue.put(self._DONE)

    def __iter__(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        while True:
            item = self._queue.get()
            if item is self._DONE:
                return
            if self._track_state:
                self.state, item = item
            yield item

    def close(self):
        """Stop the producer even if the consumer broke out early: the
        producer may be blocked in queue.put (bounded queue, consumer gone),
        so drain until it observes the stop flag and exits — otherwise every
        abandoned iterator leaks a blocked thread plus its decode pool."""
        self._stop.set()
        while self._thread is not None and self._thread.is_alive():
            try:
                self._queue.get(timeout=0.1)
            except queue.Empty:
                pass


def _resumable_epochs(epoch_iterator, repeat, start_state):
    """Wrap per-epoch iterators into an (state, batch) stream with a
    deterministic (epoch, batch) resume cursor. Resuming replays the current
    epoch's seeded stream and drops the first `batch` batches — exact
    continuation of the uninterrupted order (the per-epoch rngs derive from
    (seed, epoch) only), at a fast-forward cost of at most one epoch of
    input processing."""
    start_epoch = int(start_state['epoch']) if start_state else 0
    start_batch = int(start_state['batch']) if start_state else 0

    def iterator():
        epoch, skip = start_epoch, start_batch
        while True:
            for i, batch in enumerate(epoch_iterator(epoch)):
                if i < skip:
                    continue
                yield {'epoch': epoch, 'batch': i + 1}, batch
            skip = 0
            epoch += 1
            if repeat is None or (repeat > 0 and epoch >= repeat):
                return

    return iterator


def load_image_dataset(path, batch_size, image_size, split='train', repeat=None,
                       shuffle=True, seed=0, num_decode_threads=8,
                       num_decode_processes=0, num_channels=None,
                       start_state=None, output_dtype='float32',
                       buffer_size=2):
    """Flat per-frame image batches for codebook training.

    Yields float32 [batch, H, W, C] in [-1, 1]. `repeat=None` -> one epoch;
    repeat=-1 -> infinite; otherwise that many epochs.

    output_dtype='uint8' yields raw [0, 255] uint8 instead — 4x less
    host->device wire traffic AND no host-side float math; the train/eval
    steps normalize ON DEVICE ((x/255)*2-1 == x/127.5-1 exactly, see
    train/codebook._normalize_batch). Measured on the v5e tunnel: the f32
    upload of a 40x44-batch superbatch cost 7.5s vs 4.4s device compute —
    the sustained-throughput bottleneck.

    buffer_size: Prefetcher depth in batches; scanned multi-step trainers
    drain steps_per_call batches per dispatch, so a deeper buffer lets the
    producer run ahead through the whole device window.

    num_decode_processes > 0 decodes JPEGs in a fork-based process pool
    (bypasses the GIL entirely — for feeding multi-chip meshes); otherwise a
    thread pool is used (PIL releases the GIL for most of the decode).

    start_state: {'epoch', 'batch'} cursor from a previous run's
    `Prefetcher.state` — resumes the EXACT deterministic data order
    mid-epoch (the reference's BackupAndRestore only restarted whole
    epochs). Each host tracks its own cursor over its own shard subset, but
    lockstep consumers advance identically, so one host's cursor restores
    every host."""
    info, paths = _shard_paths(path, split)
    assert info['frame_size'] == image_size, \
        f'Dataset has a different image size: {info["frame_size"]} != {image_size}'
    host_id, num_hosts = _host_info()
    paths = _select_host_shards(paths, host_id, num_hosts)
    channels = num_channels or info.get('num_image_channels', 3)

    def epoch_iterator(epoch):
        rng = random.Random((seed * 2654435761 + epoch) & 0xFFFFFFFF)
        epoch_paths = list(paths)
        if shuffle:
            rng.shuffle(epoch_paths)

        def shard_stream(shard):
            return lambda: (decode_example(payload)['frames']
                            for payload in read_records(shard))

        def raw_frames():
            # cross-shard record interleave (ref tfrecord_dataset.py:113-115)
            for frame_list in _interleave(map(shard_stream, epoch_paths),
                                          INTERLEAVE_SHARDS):
                yield from frame_list

        frames = raw_frames()
        if shuffle:
            frames = _local_shuffle(frames, 1000, rng)

        if num_decode_processes > 0:
            import multiprocessing
            pool = multiprocessing.get_context('fork').Pool(num_decode_processes)
            mapper = lambda: pool.imap(_decode_uint8, frames, chunksize=8)  # noqa: E731
            closer = pool.terminate
        else:
            pool = ThreadPoolExecutor(num_decode_threads)
            mapper = lambda: pool.map(_decode_uint8, frames, chunksize=4)  # noqa: E731
            closer = lambda: pool.shutdown(wait=False)  # noqa: E731
        try:
            batch = []
            for img in mapper():
                if img.shape[-1] != channels:
                    continue
                batch.append(img)
                if len(batch) == batch_size:
                    if output_dtype == 'uint8':
                        yield np.stack(batch, 0)
                    else:
                        stacked = np.stack(batch, 0).astype(np.float32) / 255.0
                        yield stacked * 2.0 - 1.0
                    batch = []
        finally:
            closer()

    return Prefetcher(_resumable_epochs(epoch_iterator, repeat, start_state),
                      buffer_size=buffer_size, track_state=True)


def load_token_dataset(path, batch_size, sequence_size, token_image_size,
                       split='train', repeat=None, max_samples_per_environment=-1,
                       transform=None, shuffle=True, seed=0, start_state=None,
                       buffer_size=2):
    """(poses [B,S,7], tokens [B,S,h,w]) batches for transformer training.

    buffer_size: Prefetcher depth in batches (scanned multi-step trainers
    drain steps_per_call batches per dispatch — see load_image_dataset).

    Supports comma-separated multi-dataset mixing and the val/test split
    fallback (ref tfrecord_dataset.py:134-197). Frames are shuffled within
    each environment and re-chunked into `sequence_size` pieces with
    drop_remainder; `transform(cameras, tokens, split)` applies pose
    augmentation per sample. start_state: mid-epoch resume cursor (see
    load_image_dataset)."""
    all_paths = []
    poses_num_dim = None
    for dpath in path.split(','):
        info = get_dataset_info(dpath)
        dims = 5 if 'cameras-gqn' in info.get('features', []) else 7
        if poses_num_dim is None:
            poses_num_dim = dims
        else:
            assert dims == poses_num_dim, 'Cannot mix gqn and non-gqn datasets'
        if split == 'train':
            actual_split = 'train'
        else:
            actual_split = 'val' if 'val' in info.get('splits', []) else 'test'
        _, paths = _shard_paths(dpath, actual_split)
        all_paths.extend(paths)

    host_id, num_hosts = _host_info()
    all_paths = _select_host_shards(all_paths, host_id, num_hosts)

    # feed the pipeline's seeded rng to transforms that accept one, so pose
    # augmentation stays deterministic across mid-epoch resume (process_batch
    # 'simple'/'advanced' would otherwise draw from global np.random)
    transform_accepts_rng = False
    if transform is not None:
        import inspect
        try:
            transform_accepts_rng = 'rng' in inspect.signature(transform).parameters
        except (TypeError, ValueError):
            pass

    def epoch_iterator(epoch):
        rng = random.Random((seed * 2654435761 + epoch) & 0xFFFFFFFF)
        np_rng = np.random.RandomState((seed * 97 + epoch) & 0x7FFFFFFF)
        epoch_paths = list(all_paths)
        if shuffle:
            rng.shuffle(epoch_paths)

        def environment_samples(example):
            poses = np.asarray(example['cameras'], np.float32).reshape(-1, poses_num_dim)
            if poses_num_dim == 5:
                poses = fix_legacy_gqn_cameras(poses)
            tokens = np.asarray(example['codes'], np.int64).reshape(
                -1, token_image_size, token_image_size)
            n = len(poses)
            if shuffle:
                perm = np_rng.permutation(n)
                poses, tokens = poses[perm], tokens[perm]
            count = 0
            for i in range(n // sequence_size):
                if 0 <= max_samples_per_environment <= count:
                    break
                sl = slice(i * sequence_size, (i + 1) * sequence_size)
                sample = (poses[sl], tokens[sl])
                if transform is not None:
                    sample = (transform(*sample, split=split, rng=np_rng)
                              if transform_accepts_rng
                              else transform(*sample, split=split))
                yield sample
                count += 1

        def shard_stream(shard):
            return lambda: (decode_example(payload)
                            for payload in read_records(shard))

        def samples():
            # two-level interleave like the reference: records round-robin
            # across shards (ref tfrecord_dataset.py:150-152), then sequence
            # chunks round-robin across 8 open environments (ref :175)
            environments = _interleave(map(shard_stream, epoch_paths),
                                       INTERLEAVE_SHARDS)
            env_factories = (
                (lambda example=example: environment_samples(example))
                for example in environments)
            yield from _interleave(env_factories, INTERLEAVE_ENVIRONMENTS)

        stream = samples()
        if shuffle:
            stream = _local_shuffle(stream, 1000, rng)

        batch = []
        for sample in stream:
            batch.append(sample)
            if len(batch) == batch_size:
                yield (np.stack([b[0] for b in batch], 0),
                       np.stack([b[1] for b in batch], 0))
                batch = []

    return Prefetcher(_resumable_epochs(epoch_iterator, repeat, start_state),
                      buffer_size=buffer_size, track_state=True)

"""Offline shard shuffler: permutes sequences across shards byte-wise.

Parity target: /root/reference/viewformer/data/tfrecord_shuffle.py — records
are moved between shards by seeking with `.index` sidecars, never decoded.
This version fixes two latent reference quirks: the per-shard `.index` output
contains only 'offset length' lines (the reference interleaved global-index
lines into it), and offsets reset per output shard.
"""
import json
import os
import shutil
from functools import reduce
from random import Random

from . import tfrecord


def _load_global_index(path, name, split):
    entries = []
    with open(os.path.join(path, f'{name}-{split}.index')) as f:
        for line in f:
            line = line.strip()
            if line:
                shard, seq_len = line.split()
                entries.append((int(shard.lstrip('0') or '0'), int(seq_len)))
    return entries


def _shuffle_split(path, output_path, dataset_info, split, seed, progress=True):
    name = dataset_info['name']
    size = dataset_info[f'{split}_size']

    shard_indices = {}

    def get_shard_index(idx):
        if idx not in shard_indices:
            base = os.path.join(path, f'{name}-{split}-{idx:06d}-of-{size:06d}')
            if not os.path.exists(f'{base}.index'):
                tfrecord.build_shard_index(f'{base}.tfrecord', f'{base}.index')
            shard_indices[idx] = tfrecord.read_shard_index(f'{base}.index')
        return shard_indices[idx]

    # (source_shard, local_id, seq_len) per sequence, in global order
    entries = []
    local_counters = {}
    for shard_id, seq_len in _load_global_index(path, name, split):
        local_id = local_counters.get(shard_id, 0)
        local_counters[shard_id] = local_id + 1
        entries.append((shard_id, local_id, seq_len))

    rng = Random(seed)
    rng.shuffle(entries)

    # Re-pack into output shards with the original shard limits
    max_images = dataset_info.get(f'{split}_max_images_per_shard')
    max_seqs = dataset_info.get(f'{split}_max_sequences_per_shard')
    assignments = []  # output shard id (1-based) per entry
    cur_shard, cur_imgs, cur_seqs = 1, 0, 0
    for _, _, seq_len in entries:
        assignments.append(cur_shard)
        cur_imgs += seq_len
        cur_seqs += 1
        if ((max_seqs is not None and cur_seqs >= max_seqs)
                or (max_images is not None and cur_imgs >= max_images)):
            cur_shard += 1
            cur_imgs, cur_seqs = 0, 0
    num_out_shards = assignments[-1] if assignments else 0

    iterator = zip(assignments, entries)
    if progress:
        from tqdm import tqdm
        iterator = tqdm(list(iterator), desc=f'shuffling {split}')

    out_f = out_index_f = None
    global_index_f = open(os.path.join(output_path, f'{name}-{split}.index'), 'w')
    current_out_shard = None
    offset = 0
    try:
        for out_shard, (src_shard, local_id, seq_len) in iterator:
            if out_shard != current_out_shard:
                if out_f is not None:
                    out_f.close()
                    out_index_f.close()
                base = os.path.join(output_path, f'{name}-{split}-{out_shard:06d}-of-{size:06d}')
                out_f = open(f'{base}.tfrecord', 'wb')
                out_index_f = open(f'{base}.index', 'w')
                current_out_shard = out_shard
                offset = 0
            start, record_len = get_shard_index(src_shard)[local_id]
            with open(os.path.join(path, f'{name}-{split}-{src_shard:06d}-of-{size:06d}.tfrecord'), 'rb') as src:
                src.seek(start)
                record = src.read(record_len)
            out_f.write(record)
            out_index_f.write(f'{offset} {record_len}\n')
            global_index_f.write(f'{out_shard:06d} {seq_len}\n')
            offset += record_len
    finally:
        if out_f is not None:
            out_f.close()
            out_index_f.close()
        global_index_f.close()

    if num_out_shards != size:
        dataset_info[f'{split}_size'] = num_out_shards
        with open(os.path.join(output_path, 'info.json'), 'w') as f:
            json.dump(dataset_info, f, sort_keys=True)


def shuffle_dataset(path, output_path, seed=42, progress=True):
    if os.path.exists(output_path):
        raise RuntimeError(f'Output path {output_path} already exists')
    os.makedirs(output_path, exist_ok=True)
    shutil.copy(os.path.join(path, 'info.json'), os.path.join(output_path, 'info.json'))
    with open(os.path.join(path, 'info.json')) as f:
        dataset_info = json.load(f)
    for split in dataset_info['splits']:
        local_seed = seed ^ (reduce(lambda a, x: a * ord(x), split, 1) % 31)
        _shuffle_split(path, output_path, dataset_info, split, local_seed, progress=progress)

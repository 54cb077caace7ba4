"""Data layer (L2/L3): TFRecord storage, loaders, input pipelines."""
from .dataset import (build_index, expand_path, fix_legacy_gqn_cameras,
                      generate_dataset_from_loader, get_dataset_info,
                      get_dataset_url, read_dataset, read_shards,
                      transform_dataset, write_dataset_info, write_shard)
from .shuffle import shuffle_dataset

__all__ = [
    'build_index', 'expand_path', 'fix_legacy_gqn_cameras',
    'generate_dataset_from_loader', 'get_dataset_info', 'get_dataset_url',
    'read_dataset', 'read_shards', 'transform_dataset', 'write_dataset_info',
    'write_shard', 'shuffle_dataset',
]

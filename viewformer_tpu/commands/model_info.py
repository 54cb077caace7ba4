"""model info: parameter-count tree for a checkpoint.

Parity target: /root/reference/viewformer/commands/model_info.py.
"""
import numpy as np


def _count_tree(tree, prefix=''):
    rows = []
    total = 0
    if isinstance(tree, dict):
        for key in sorted(tree):
            sub_rows, sub_total = _count_tree(tree[key], f'{prefix}/{key}' if prefix else key)
            rows.extend(sub_rows)
            total += sub_total
    else:
        size = int(np.prod(np.asarray(tree).shape)) if hasattr(tree, 'shape') else 1
        rows.append((prefix, tuple(getattr(tree, 'shape', ())), size))
        total += size
    return rows, total


def model_info(checkpoint):
    from ..models import load_model
    model, variables = load_model(checkpoint)
    print(f'model: {model.config.model} ({type(model).__name__})')
    grand_total = 0
    for collection, tree in variables.items():
        rows, total = _count_tree(tree)
        grand_total += total
        print(f'\n[{collection}] {total:,} parameters')
        for name, shape, size in rows:
            print(f'  {name:<60} {str(shape):<22} {size:>12,}')
    print(f'\ntotal: {grand_total:,} parameters')
    return grand_total

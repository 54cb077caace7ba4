"""Cross-cutting utilities (L7): split-index DSL, batch helpers, checkpoint pull.

Parity targets: /root/reference/viewformer/utils/_common.py.
"""
import os
import shutil
import tarfile
from functools import partial


class SplitIndices:
    """Index-set DSL: "1:10:2,15" denotes {1,3,5,7,9,15}.

    Used for `--shards i/N`-style multi-process dataset generation
    (ref utils/_common.py:12-101)."""

    def __init__(self, indices):
        if isinstance(indices, range):
            self._indices = f'{indices.start}:{indices.stop}:{indices.step}'
        elif isinstance(indices, (list, tuple)):
            self._indices = ','.join(str(x) for x in indices)
        elif isinstance(indices, SplitIndices):
            self._indices = indices._indices
        elif isinstance(indices, int):
            self._indices = str(indices)
        else:
            self._indices = str(indices)

    @classmethod
    def from_str(cls, str_val):
        return SplitIndices(str_val)

    def __repr__(self):
        return self._indices

    def __str__(self):
        return self._indices

    def restrict(self, b):
        vals = []
        if not isinstance(b, SplitIndices):
            b = SplitIndices(b)
        limit = b.left_limit()
        for x in self._indices.split(','):
            xx = [int(a) if a else None for a in x.split(':')]
            if len(xx) == 1:
                if xx[0] in b:
                    vals.append(xx[0])
            elif len(xx) == 2:
                xx.append(None)
            if len(xx) == 3:
                cur = xx[0] if xx[0] is not None else 0
                while (xx[1] is None or cur < xx[1]) and cur < limit:
                    if cur in b:
                        vals.append(cur)
                    cur += 1 if xx[2] is None else xx[2]
        return SplitIndices(','.join(map(str, vals)))

    def __contains__(self, val):
        for x in self._indices.split(','):
            xx = [int(a) if a else None for a in x.split(':')]
            if len(xx) == 1:
                if val == xx[0]:
                    return True
                continue
            step = 1 if len(xx) == 2 else xx[-1]
            start, stop = xx[:2]
            if start is None:
                start = 0
            if (val - start) % step == 0 and (stop is None or val < stop) and val >= start:
                return True
        return False

    def left_limit(self):
        max_v = -float('inf')
        for x in self._indices.split(','):
            xx = [int(a) if a else None for a in x.split(':')]
            if len(xx) == 1:
                max_v = max(max_v, xx[0] + 1)
                continue
            if xx[1] is None:
                return float('inf')
            return xx[1]
        return max_v

    def __iter__(self):
        if self._indices == '':
            return
        for x in self._indices.split(','):
            xx = [int(a) if a else None for a in x.split(':')]
            if len(xx) == 1:
                yield xx[0]
                continue
            if len(xx) == 2:
                xx.append(None)
            cur = xx[0] if xx[0] is not None else 0
            while xx[1] is None or cur < xx[1]:
                yield cur
                cur += 1 if xx[2] is None else xx[2]


def batch_slice(x, ind):
    if isinstance(x, tuple):
        return tuple(map(partial(batch_slice, ind=ind), x))
    elif isinstance(x, dict):
        return x.__class__([(k, batch_slice(v, ind)) for k, v in x.items()])
    return x[ind]


def batch_len(x):
    if isinstance(x, tuple):
        return batch_len(x[0])
    elif isinstance(x, dict):
        return batch_len(next(iter(x.values())))
    return len(x)


def dict_replace(d, key, value):
    d = dict(**d)
    d[key] = value
    return d


def single(iterator):
    value = None
    for x in iterator:
        if value is not None:
            raise RuntimeError('Iterable contains more than one item')
        value = (x,)
    if value is None:
        raise StopIteration('Iterable contains no items')
    return value[0]


def unique(iterable):
    outputted = set()
    for x in iterable:
        if x not in outputted:
            outputted.add(x)
            yield x


_CHECKPOINT_URL = 'https://data.ciirc.cvut.cz/public/projects/2022ViewFormer/checkpoints'


def pull_checkpoint(checkpoint, override=False, local_source=None):
    """Install a released checkpoint into ~/.cache/viewformer
    (ref utils/_common.py:149-180).

    local_source: a path to an already-obtained `<checkpoint>.tar.gz` (or a
    directory containing the extracted checkpoint) to install from instead
    of the network — the air-gapped path of PARITY_RUNBOOK.md (checkpoints
    carried onto the host by any side channel feed the same cache layout the
    loaders resolve)."""
    local_path = os.path.expanduser(f'~/.cache/viewformer/{checkpoint}')
    if os.path.exists(local_path):
        if override:
            shutil.rmtree(local_path)
        else:
            return local_path

    if local_source is not None:
        if os.path.isdir(local_source):
            shutil.copytree(local_source, local_path)
            return local_path
        # extract to a temp dir then rename: atomic install (a truncated
        # archive never leaves a half-extracted dir that would be returned
        # as cached forever), with the 'data' filter blocking path-traversal
        # members (../, absolute paths, device nodes)
        tmp_path = local_path + '.tmp-extract'
        shutil.rmtree(tmp_path, ignore_errors=True)
        os.makedirs(tmp_path, exist_ok=True)
        try:
            with tarfile.open(local_source, mode='r:*') as tfile:
                tfile.extractall(tmp_path, filter='data')
            os.replace(tmp_path, local_path)
        except Exception:
            shutil.rmtree(tmp_path, ignore_errors=True)
            raise
        return local_path

    import requests
    from tqdm import tqdm

    # NOTE: local_path is NOT pre-created — a failed download (404,
    # truncated stream) must leave no cache entry, or subsequent calls
    # would return the empty dir as a valid checkpoint without --override.
    path = f'{_CHECKPOINT_URL}/{checkpoint}.tar.gz'

    response = requests.get(path, stream=True)
    if response.status_code != 200:
        raise Exception(f'Model {checkpoint} not found')
    total = int(response.headers.get('content-length', 0))
    tmp_path = local_path + '.tmp-extract'
    shutil.rmtree(tmp_path, ignore_errors=True)
    os.makedirs(tmp_path, exist_ok=True)
    try:
        with tqdm(total=total, unit='iB', unit_scale=True) as progress_bar, \
                tarfile.open(fileobj=response.raw, mode='r') as tfile:
            for member in tfile:
                tfile.extract(member, tmp_path, filter='data')
                progress_bar.update(member.size)
        os.replace(tmp_path, local_path)
    except Exception:
        shutil.rmtree(tmp_path, ignore_errors=True)
        raise
    return local_path

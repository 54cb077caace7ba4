"""Two-process jax.distributed test of the multi-host data-parallel path.

Validates what single-process tests cannot: jax.distributed.initialize, a
global mesh spanning processes, per-host batch feeding via
make_array_from_process_local_data, and a cross-process psum (the transformer
train step's gradient reduction pattern)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
coordinator, process_id = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coordinator, num_processes=2,
                           process_id=process_id)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.environ['REPO'])
from viewformer_tpu.parallel import mesh as mesh_lib

assert jax.process_count() == 2, jax.process_count()
mesh = mesh_lib.create_mesh()
assert mesh.devices.size == jax.device_count()

# per-host local batch -> global sharded array
local = np.full((4, 8), float(process_id), np.float32)
batch = mesh_lib.shard_batch(mesh, local)
assert batch.shape == (8, 8), batch.shape

@jax.jit
def global_sum(x):
    return jnp.sum(x)

total = float(global_sum(batch))
# process 0 contributes 0s, process 1 contributes 4*8 ones
assert total == 32.0, total
print(f'proc {process_id} OK', flush=True)
'''


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    coordinator = f'127.0.0.1:{port}'
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER)
    env = dict(os.environ)
    env['REPO'] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop('XLA_FLAGS', None)  # one device per process
    procs = [subprocess.Popen([sys.executable, str(script), coordinator, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f'process {i} failed:\n{out}'
        assert f'proc {i} OK' in out


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]

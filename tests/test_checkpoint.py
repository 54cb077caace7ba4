"""CheckpointManager: async donation-safe saves + topology-neutral restores."""
import numpy as np

import jax
import jax.numpy as jnp

from viewformer_tpu.parallel import mesh as mesh_lib
from viewformer_tpu.train.checkpoint import CheckpointManager, restore_checkpoint


def test_save_is_donation_safe(tmp_path):
    """save() must snapshot on device and return without blocking on D2H;
    deleting the source buffers right after (what the trainers' donated
    next step effectively does) must not corrupt the checkpoint."""
    state = {'w': jnp.arange(8.0), 'step': jnp.asarray(3)}
    expected = {k: np.asarray(v) for k, v in state.items()}
    mgr = CheckpointManager(str(tmp_path / 'job'))
    mgr.save(0, state)
    for leaf in jax.tree.leaves(state):
        leaf.delete()  # simulate donation invalidating the live buffers
    mgr.wait()
    restored, step = mgr.restore_last()
    mgr.close()
    assert step == 0
    np.testing.assert_array_equal(restored['w'], expected['w'])
    np.testing.assert_array_equal(restored['step'], expected['step'])


def test_restore_without_target_is_topology_neutral(tmp_path):
    """A checkpoint saved from arrays living on a 4-device mesh must restore
    (without a target tree) as plain host numpy, usable on ANY mesh — the
    end-to-end pipeline trains the codebook on one sub-mesh and evaluates on
    another (regression: async saves record the saving mesh's shardings)."""
    devices = jax.devices()[:4]
    mesh = mesh_lib.create_mesh(data_parallelism=4, devices=devices)
    state = mesh_lib.replicate(mesh, {'w': jnp.ones((4, 2)),
                                      'b': jnp.zeros((2,))})
    mgr = CheckpointManager(str(tmp_path / 'job'))
    mgr.save(0, state, val_loss=1.0)
    mgr.close()

    restored, _ = restore_checkpoint(str(tmp_path / 'job'), None, prefer='best')
    assert all(isinstance(leaf, np.ndarray)
               for leaf in jax.tree.leaves(restored))
    # must be placeable on a different (2-device) mesh without device clashes
    other = mesh_lib.create_mesh(data_parallelism=2, devices=jax.devices()[4:6])
    w = mesh_lib.replicate(other, jax.tree.map(jnp.asarray, restored))['w']
    out = jax.jit(lambda a: a * 2)(w)
    np.testing.assert_array_equal(np.asarray(out), np.full((4, 2), 2.0))


def test_aux_state_roundtrip(tmp_path):
    """The data-iterator cursor rides next to the rolling last checkpoint."""
    mgr = CheckpointManager(str(tmp_path / 'job'))
    assert mgr.load_aux() is None
    state = {'w': jnp.zeros(2)}
    mgr.save(0, state)                                # no aux: nothing written
    assert mgr.load_aux() is None
    mgr.save(5, state, aux={'data_iterator': {'epoch': 1, 'batch': 7}})
    mgr.close()
    aux = CheckpointManager(str(tmp_path / 'job')).load_aux()
    assert aux == {'step': 5, 'data_iterator': {'epoch': 1, 'batch': 7}}


def test_aux_ahead_of_commit_is_not_preferred(tmp_path):
    """A crash can leave an aux file NEWER than the newest committed
    checkpoint (its save never committed). load_aux must resolve the newest
    aux at-or-below the committed step — a newer cursor would fast-forward
    the data iterator past data the restored state never trained on."""
    job = str(tmp_path / 'job')
    mgr = CheckpointManager(job)
    state = {'w': jnp.zeros(2)}
    mgr.save(10, state, aux={'data_iterator': {'epoch': 0, 'batch': 10}})
    mgr.close()
    # simulate the killed-mid-save leftover: aux written, commit never landed
    import json
    import os
    with open(os.path.join(job, 'aux-20.json'), 'w') as f:
        json.dump({'step': 20, 'data_iterator': {'epoch': 0, 'batch': 20}}, f)
    aux = CheckpointManager(job).load_aux()
    assert aux['step'] == 10, aux
    # ...but when NO at-or-below cursor exists, the newer one is still
    # better than none (documented fallback)
    os.unlink(os.path.join(job, 'aux-10.json'))
    aux = CheckpointManager(job).load_aux()
    assert aux['step'] == 20, aux


def test_aux_cursor_survives_commit_lag(tmp_path, monkeypatch):
    """With background-fetch saves the commit can lag many saves behind the
    train loop (slow-D2H hosts). The aux cursor of the newest COMMITTED
    checkpoint must survive GC until a newer commit supersedes it, and
    queued-but-unstarted saves coalesce (regression: recency-based aux GC
    orphaned the resume cursor and exact resume silently degraded to
    epoch-start resume)."""
    import os
    import threading

    from viewformer_tpu.train import checkpoint as ckpt_mod

    gate = threading.Event()
    orig = ckpt_mod.CheckpointManager._fetch_and_save

    def slow_fetch(self, step):
        gate.wait(timeout=60)
        return orig(self, step)

    monkeypatch.setattr(ckpt_mod.CheckpointManager, '_fetch_and_save',
                        slow_fetch)
    job = str(tmp_path / 'job')
    mgr = CheckpointManager(job)
    state = {'w': jnp.arange(4.0)}
    for s in (10, 20, 30):
        mgr.save(s, state, aux={'data_iterator': {'epoch': 0, 'batch': s}})
    # nothing committed yet -> every aux file must survive (any of them may
    # belong to the checkpoint that eventually commits)
    aux_files = {f for f in os.listdir(job) if f.startswith('aux-')}
    assert aux_files == {'aux-10.json', 'aux-20.json', 'aux-30.json'}
    # the save of 20 was queued behind the in-flight 10 and must have been
    # coalesced away by the save of 30
    assert mgr.saves_coalesced == 1
    # ...and its device-side snapshot must be freed IMMEDIATELY on coalesce
    # (payloads live outside the executor queue precisely so a cancelled
    # save can't pin ~1GB of HBM until the worker drains it): only the
    # in-flight 10 and the queued 30 may hold snapshots
    assert set(mgr._payloads) <= {10, 30}

    gate.set()
    mgr.wait()
    assert mgr._payloads == {}  # every snapshot released after the joins
    committed = sorted(int(d) for d in os.listdir(os.path.join(job, 'last'))
                       if d.isdigit())
    assert committed == [30]  # max_to_keep=1; 10 committed first, then 30
    aux = mgr.load_aux()
    assert aux == {'step': 30, 'data_iterator': {'epoch': 0, 'batch': 30}}
    # a later save GCs the now-stale cursors below the committed step
    mgr.save(40, state, aux={'data_iterator': {'epoch': 1, 'batch': 40}})
    mgr.wait()
    aux_files = {f for f in os.listdir(job) if f.startswith('aux-')}
    assert 'aux-10.json' not in aux_files and 'aux-20.json' not in aux_files
    mgr.close()
    assert CheckpointManager(job).load_aux()['step'] == 40

def test_host_snapshot_mode(tmp_path):
    """snapshot='host' (the HBM-heavy remat-policy fallback) must fetch the
    state synchronously inside save() — donation-safe with ZERO device-side
    copies held — and still commit bit-exactly through the background
    worker. Regression target: 'attn' policy + mid-epoch device snapshots
    RESOURCE_EXHAUSTED at full size (2026-08-19)."""
    state = {'w': jnp.arange(8.0) * 3, 'step': jnp.asarray(7)}
    expected = {k: np.asarray(v) for k, v in state.items()}
    mgr = CheckpointManager(str(tmp_path / 'job'), snapshot='host')
    mgr.save(0, state, val_loss=0.5)
    # zero extra HBM: every queued payload must already be host numpy
    for snap, _ in mgr._payloads.values():
        assert all(isinstance(leaf, np.ndarray)
                   for leaf in jax.tree.leaves(snap))
    for leaf in jax.tree.leaves(state):
        leaf.delete()  # donation after save() must not corrupt the commit
    mgr.wait()
    restored, step = mgr.restore_last()
    mgr.close()
    assert step == 0
    np.testing.assert_array_equal(restored['w'], expected['w'])
    np.testing.assert_array_equal(restored['step'], expected['step'])

    import pytest
    with pytest.raises(ValueError):
        CheckpointManager(str(tmp_path / 'job2'), snapshot='hbm')

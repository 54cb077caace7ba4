"""Checkpoint save/restore with best-val + rolling-last semantics, via orbax.

Parity target: /root/reference/viewformer/train/utils.py:46-94 (keeps the
best-val-loss checkpoint plus a rolling last checkpoint, writes config.json
beside the weights, multi-worker safe) and the BackupAndRestore resume flow
(train_transformer.py:118). Orbax gives atomic async-capable saves; the step
counter lives in the train state so LR/localization-weight schedules resume
exactly (ref finetune_transformer.py:78-87 semantics)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ..config import save_config


class CheckpointManager:
    """Two orbax managers: `last/` (rolling, every save) and `best/`
    (min-val-loss)."""

    def __init__(self, job_dir, config=None, snapshot='device'):
        """snapshot: where save() snapshots the train state before the
        background commit.
          'device' (default) — jnp.copy on device; save() returns without
            any D2H transfer and the background worker fetches while the
            train loop keeps stepping. Costs up to 2 co-resident state
            copies of HBM (rolling-last coalescing bound).
          'host' — synchronous D2H fetch inside save(); zero extra HBM but
            the train loop stalls for the transfer (~50s for the full-size
            transformer state through the axon tunnel). Required with
            HBM-heavy remat policies ('attn' et al.), whose saved
            activations plus a device snapshot RESOURCE_EXHAUSTED at full
            size (measured 2026-08-19; see train/transformer.py
            warn_policy_snapshot_hbm). Single-process only — multi-process
            saves always snapshot on device (orbax fetches distributed
            arrays itself; per-process host fetches of non-addressable
            arrays are impossible)."""
        if snapshot not in ('device', 'host'):
            raise ValueError(f'snapshot must be device|host, got {snapshot!r}')
        self._snapshot_mode = snapshot
        self.job_dir = os.path.abspath(job_dir)
        os.makedirs(self.job_dir, exist_ok=True)
        if config is not None and jax.process_index() == 0:
            save_config(config, self.job_dir)
        self._last = ocp.CheckpointManager(
            os.path.join(self.job_dir, 'last'),
            options=ocp.CheckpointManagerOptions(max_to_keep=1))
        self._best = ocp.CheckpointManager(
            os.path.join(self.job_dir, 'best'),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                best_fn=lambda metrics: metrics['val_loss'],
                best_mode='min'))
        # Single background worker for the device->host fetch: orbax's
        # "async" save still performs the D2H transfer SYNCHRONOUSLY in
        # save() and only backgrounds the file I/O. On hosts where D2H is
        # slow (measured: ~50s per full-size transformer save through the
        # axon tunnel at ~18MB/s — the soak's epoch-boundary stall), that
        # would block the train loop; fetching a device-side snapshot from
        # this thread overlaps the transfer with training (the same
        # fetch-compute overlap bench.py uses). One worker => saves stay
        # ordered.
        import concurrent.futures
        import threading
        self._fetch_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix='ckpt-fetch')
        self._pending = []      # [(future, step)] — never contains cancelled
        self._payloads = {}     # step -> (device snapshot, val_loss)
        self.saves_coalesced = 0
        # orbax CheckpointManagers are not documented thread-safe; the
        # background worker calls _last/_best.save() while the main thread
        # may query/restore. All manager access goes through this lock, and
        # the main thread's aux GC reads the CACHED committed step (updated
        # by the worker after each commit) instead of calling latest_step()
        # concurrently with a save.
        self._mgr_lock = threading.Lock()
        self._committed_step = self._last.latest_step()
        # Background fetch+save is single-process only: with multiple
        # processes, per-process coalescing decisions would diverge (cancel
        # success depends on local worker timing) and orbax's cross-process
        # save barrier would hang on the process that skipped a step; numpy
        # fetching is also impossible for non-fully-addressable arrays.
        # Multi-process saves run synchronously on the device snapshot —
        # orbax handles distributed arrays natively.
        self._background = jax.process_count() == 1

    def save(self, step, state, val_loss=None, aux=None):
        """aux: small JSON-serializable side state tied to the rolling last
        checkpoint (e.g. the data-iterator resume cursor) — written
        atomically PER STEP (aux-<step>.json) and resolved against
        latest_step() on load, so a crash between this write and the async
        orbax commit can never leave the cursor ahead of the newest
        checkpoint (load_aux would resolve the previous step's aux)."""
        if aux is not None and jax.process_index() == 0:
            import json
            name = f'aux-{int(step)}.json'
            tmp = os.path.join(self.job_dir, name + '.tmp')
            with open(tmp, 'w') as f:
                json.dump({'step': int(step), **aux}, f)
            os.replace(tmp, os.path.join(self.job_dir, name))
            # GC aux files strictly BELOW the newest COMMITTED checkpoint
            # step (never the newest aux). With background fetches the
            # commit can lag many saves behind, and the committed
            # checkpoint's aux must survive until a newer commit supersedes
            # it — deleting by recency alone orphaned the resume cursor
            # (observed: exact-resume degraded to epoch-start resume).
            import re
            committed = (self._committed_step if self._background
                         else self._last.latest_step())
            steps = sorted(
                int(m.group(1)) for m in
                (re.fullmatch(r'aux-(\d+)\.json', f)
                 for f in os.listdir(self.job_dir)) if m)
            for s in steps[:-1]:
                if committed is not None and s < committed:
                    os.unlink(os.path.join(self.job_dir, f'aux-{s}.json'))
        if hasattr(state, '_asdict'):  # NamedTuple train states stored as dicts
            state = state._asdict()
        # Donation-safe truly-async save: snapshot on DEVICE (cheap copy
        # dispatch — the trainers donate state buffers into the next step,
        # so handing anything the live arrays would read invalidated
        # memory), then a background thread performs the D2H fetch and the
        # orbax save while the train loop keeps stepping. orbax's own async
        # path is NOT enough: its save() call still fetches synchronously
        # and only backgrounds the file writes.
        if self._snapshot_mode == 'host' and self._background:
            # Synchronous D2H inside save(): donation-safe (the fetch
            # completes before the caller donates the live buffers into the
            # next step) and holds ZERO extra HBM — the mode for HBM-heavy
            # remat policies. The background worker then only does file I/O
            # (its np.asarray pass is a no-op on numpy).
            snapshot = jax.tree.map(np.asarray, state)
        else:
            snapshot = jax.tree.map(
                lambda a: jnp.copy(a) if isinstance(a, jax.Array)
                else np.asarray(a), state)
        val_loss = None if val_loss is None else float(val_loss)
        if not self._background:
            # multi-process: synchronous, every process participates in the
            # same orbax save (see __init__). The snapshot keeps it
            # donation-safe; orbax fetches distributed arrays itself.
            self._last.save(int(step), args=ocp.args.StandardSave(snapshot))
            if val_loss is not None:
                self._best.save(int(step), args=ocp.args.StandardSave(snapshot),
                                metrics={'val_loss': val_loss})
            return
        # Coalesce: cancel queued-but-unstarted saves (the rolling `last`
        # checkpoint only needs the newest; on hosts where the background
        # fetch is slower than the save cadence, queuing every save would
        # hold one full device-side snapshot EACH — ~1GB of HBM per pending
        # full-size save — and stretch the commit lag unboundedly). The
        # running fetch is never cancelled, so at most two snapshots are
        # alive: payloads live in self._payloads (NOT in the executor work
        # item, whose queue entry would pin a cancelled save's snapshot
        # until the worker drains it) and are dropped here the moment the
        # future is cancelled. Skipped epochs simply don't become
        # checkpoints.
        kept = []
        for f, s in self._pending:
            if f.cancel():
                self.saves_coalesced += 1
                self._payloads.pop(s, None)  # free the HBM snapshot NOW
            else:
                kept.append((f, s))
        self._pending = kept
        step = int(step)
        self._payloads[step] = (snapshot, val_loss)
        self._pending.append(
            (self._fetch_pool.submit(self._fetch_and_save, step), step))
        # surface any failure from earlier background saves; drop completed
        # futures from tracking FIRST so a raise never orphans the rest.
        # All completed futures are inspected — the first exception is
        # raised and any others are logged rather than silently dropped.
        done = [f for f, _ in self._pending if f.done()]
        self._pending = [(f, s) for f, s in self._pending if not f.done()]
        excs = [e for e in (f.exception() for f in done) if e is not None]
        if excs:
            for extra in excs[1:]:
                import logging
                logging.getLogger(__name__).error(
                    'additional background checkpoint save failure: %r', extra)
            raise excs[0]

    def _fetch_and_save(self, step):
        payload = self._payloads.pop(step, None)
        if payload is None:  # coalesced between submit and run
            return
        snapshot, val_loss = payload
        host = jax.tree.map(
            lambda a: np.asarray(a) if isinstance(a, jax.Array) else a,
            snapshot)
        del snapshot, payload  # free the device-side copy once fetched
        with self._mgr_lock:
            self._last.save(step, args=ocp.args.StandardSave(host))
            if val_loss is not None:
                self._best.save(step, args=ocp.args.StandardSave(host),
                                metrics={'val_loss': val_loss})
        self._committed_step = step  # atomic assignment; read by aux GC

    def wait(self):
        """Join all background saves, then orbax finalization. Exceptions
        from failed saves are collected (not raised mid-join) so the orbax
        wait_until_finished/shutdown path always runs; the first failure is
        raised at the end and the rest logged."""
        pending, self._pending = self._pending, []
        excs = []
        for f, _ in pending:
            exc = f.exception()  # joins; _pending never holds cancelled
            if exc is not None:
                excs.append(exc)
        try:
            with self._mgr_lock:
                self._last.wait_until_finished()
                self._best.wait_until_finished()
        finally:
            if excs:
                for extra in excs[1:]:
                    import logging
                    logging.getLogger(__name__).error(
                        'additional background checkpoint save failure: %r',
                        extra)
                raise excs[0]

    def latest_step(self):
        with self._mgr_lock:
            return self._last.latest_step()

    def load_aux(self):
        """The aux dict consistent with the newest COMMITTED checkpoint:
        resolves aux-<latest_step()>.json first (see save), then falls back
        to the newest aux file present, then the legacy last_aux.json."""
        import json
        import re
        step = self.latest_step()
        candidates = []
        if step is not None:
            candidates.append(os.path.join(self.job_dir, f'aux-{step}.json'))
        steps = sorted(
            int(m.group(1)) for m in
            (re.fullmatch(r'aux-(\d+)\.json', f)
             for f in os.listdir(self.job_dir)) if m)
        # Fallback order matters: an aux file NEWER than the committed
        # checkpoint (e.g. some saves pass aux=None) would hand back a data
        # cursor AHEAD of the restored state — the exact desync the per-step
        # scheme exists to prevent. Prefer the newest aux at or below the
        # committed step; only if none exists consider newer ones (better
        # a slightly-ahead cursor than none at all when resuming).
        if step is not None:
            at_or_below = [s for s in steps if s <= step]
            above = [s for s in steps if s > step]
            ordered = list(reversed(at_or_below)) + list(reversed(above))
        else:
            ordered = list(reversed(steps))
        candidates += [os.path.join(self.job_dir, f'aux-{s}.json')
                       for s in ordered]
        candidates.append(os.path.join(self.job_dir, 'last_aux.json'))
        for path in candidates:
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)
        return None

    @staticmethod
    def _restore_args(abstract_state):
        if abstract_state is None:
            return ocp.args.StandardRestore()
        if hasattr(abstract_state, '_asdict'):
            abstract_state = abstract_state._asdict()
        return ocp.args.StandardRestore(abstract_state)

    @staticmethod
    def _neutralize(state, abstract_state):
        """Without a target tree orbax resurrects arrays pinned to the mesh
        they were SAVED on (saves snapshot live device arrays for the async
        path) — convert to host numpy so callers can place them on any
        topology, matching the shardings-free behavior of numpy saves."""
        if abstract_state is not None or state is None:
            return state
        return jax.tree.map(
            lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, state)

    def restore_last(self, abstract_state=None):
        """Returns (state_dict, step); state_dict keys match the NamedTuple
        fields passed to save."""
        with self._mgr_lock:
            step = self._last.latest_step()
            if step is None:
                return None, None
            state = self._last.restore(
                step, args=self._restore_args(abstract_state))
        return self._neutralize(state, abstract_state), step

    def restore_best(self, abstract_state=None):
        with self._mgr_lock:
            step = self._best.best_step()
            if step is None:
                return None, None
            state = self._best.restore(
                step, args=self._restore_args(abstract_state))
        return self._neutralize(state, abstract_state), step

    def close(self):
        try:
            self.wait()
        finally:
            # always release worker thread + orbax resources, even when a
            # background save failed (wait() re-raises its exception)
            self._fetch_pool.shutdown(wait=True)
            with self._mgr_lock:
                self._last.close()
                self._best.close()


def restore_checkpoint(job_dir, abstract_state=None, prefer='best'):
    """Load a checkpoint from a job dir written by CheckpointManager."""
    mgr = CheckpointManager(job_dir)
    try:
        if prefer == 'best':
            state, step = mgr.restore_best(abstract_state)
            if state is not None:
                return state, step
        return mgr.restore_last(abstract_state)
    finally:
        mgr.close()

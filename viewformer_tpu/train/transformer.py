"""Stage-2 transformer training + finetuning: pjit step over the mesh.

Parity targets: /root/reference/viewformer/train/train_transformer.py (pose
augmentation transforms, strategy setup, fit loop + callbacks),
finetune_transformer.py (checkpoint-resumed optimizer + LR offset) and
models/utils.py:310-565 (WarmUp(2000)+CosineDecay AdamWeightDecay with
LayerNorm/bias exclusion).

TPU-native redesign:
  - one jitted, donated train step: loss -> grad -> clip -> adamw update;
    gradient all-reduce is implicit in XLA with the batch sharded on 'data';
  - the step counter lives in the train state and drives BOTH the LR schedule
    and the localization-weight schedule, so resume/finetune is exact by
    construction (the reference needed UseOptimizerIterationAsTrainStep and a
    WarmUp.offset variable for this);
  - bf16 compute / f32 params instead of fp16 + LossScaleOptimizer (no loss
    scaling needed on TPU).
"""
import functools
import math
import os
import sys
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MIGTConfig
from ..models.migt import MIGT
from ..parallel import mesh as mesh_lib
from ..utils import geometry as np_geometry


class TransformerTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


# Widest full-size scanned dispatch this backend survives: --steps-per-call 40
# at 12L/768d B=40 killed the TPU worker before the first step
# (tools/backend_crash_history.jsonl, 2026-08-18 tpu_worker_crashed), while
# the spc=20 variant completed the same hour (TRANSFORMER40_r04.json).
MAX_SAFE_STEPS_PER_CALL_FULLSIZE = 20


def clamp_steps_per_call(steps_per_call, config, force=False):
    """Chunk scan windows known to crash the TPU worker at full model size.

    Returns the steps_per_call to actually use. Full-size-class transformers
    (d_model >= 512) are clamped to MAX_SAFE_STEPS_PER_CALL_FULLSIZE with a
    warning; pass force=True (CLI --force-wide-scan) to keep the requested
    width anyway. Tiny/debug configs are never clamped. Semantics are
    unchanged by chunking — the trainer still runs one optimizer step per
    batch, just across more scanned dispatches."""
    limit = MAX_SAFE_STEPS_PER_CALL_FULLSIZE
    if steps_per_call <= limit or config.d_model < 512:
        return steps_per_call
    if force:
        print(f'WARNING: --steps-per-call {steps_per_call} at full model size '
              f'is a known TPU-worker-crash trigger '
              f'(tools/backend_crash_history.jsonl 2026-08-18); proceeding '
              f'because --force-wide-scan was given.', file=sys.stderr)
        return steps_per_call
    print(f'WARNING: clamping --steps-per-call {steps_per_call} -> {limit}: '
          f'wider full-size scanned dispatches crashed the TPU worker '
          f'(tools/backend_crash_history.jsonl 2026-08-18 tpu_worker_crashed). '
          f'Pass --force-wide-scan to keep {steps_per_call}.', file=sys.stderr)
    return limit


def warn_policy_snapshot_hbm(remat_policy, checkpoint_every, config):
    """Detect activation-saving remat policies + mid-epoch snapshot saves.

    Measured 2026-08-19: the full-size B=40 recipe under 'attn' fits HBM
    bare, but mid-epoch async saves keep up to 2 device snapshots of the
    train state co-resident (checkpoint.py rolling-last bound) and the
    combination RESOURCE_EXHAUSTEDs at runtime around the first post-save
    window. Epoch-cadence saves (checkpoint_every=0) fit — that is how
    TRANSFORMER40_r05_attn.json was measured. Returns True if the
    combination is HBM-unsafe; the trainer then falls back to host-side
    checkpoint snapshots (CheckpointManager snapshot='host': zero extra HBM,
    but each save stalls the loop for the synchronous D2H — ~50s full-size
    through the tunnel), which it warns about here."""
    if not (remat_policy in ('attn', 'attn_mlp', 'dots') and checkpoint_every
            and config.d_model >= 512):
        return False
    print(f'WARNING: --remat-policy {remat_policy} saves per-layer '
          f'activations; combined with mid-epoch --checkpoint-every '
          f'DEVICE checkpoint snapshots this exceeded HBM at full size '
          f'(measured 2026-08-19, runtime RESOURCE_EXHAUSTED). Falling back '
          f'to HOST snapshots: saves hold no extra HBM but block the train '
          f'loop for the D2H fetch (~50s full-size). For fully-async saves '
          f'use --checkpoint-every 0 (epoch-boundary saves only) or '
          f'--remat-policy full.', file=sys.stderr)
    return True


# ---------------------------------------------------------------------------
# Pose augmentation (host-side, numpy) — ref train_transformer.py:31-64
# ---------------------------------------------------------------------------

def process_batch(cameras, tokens, augment, split, rng=None):
    """Per-sample pose augmentation. cameras [S, 7], tokens [S, h, w]."""
    g = np_geometry
    xyz, quaternion = cameras[..., :3], cameras[..., 3:]
    if augment == 'relative':
        rotation_inverse = g.quaternion_conjugate(quaternion[..., :1, :])
        xyz = xyz - xyz[..., :1, :]
        xyz = g.quaternion_rotate(xyz, np.broadcast_to(rotation_inverse, xyz.shape[:-1] + (4,)))
        quaternion = g.quaternion_multiply(rotation_inverse, quaternion)
    elif augment == 'no' or split != 'train':
        pass
    elif augment == 'simple':
        rng = rng or np.random
        xyz = xyz + rng.normal(size=(1, 3)).astype(xyz.dtype)
        rotation = g.quaternion_multiply(
            g.make_quaternion_y(rng.uniform(0, 2 * math.pi, (1,)).astype(xyz.dtype)),
            g.quaternion_multiply(
                g.make_quaternion_x(rng.uniform(0, math.pi / 8, (1,)).astype(xyz.dtype)),
                g.make_quaternion_y(rng.uniform(0, 2 * math.pi, (1,)).astype(xyz.dtype))))
        xyz = g.quaternion_rotate(xyz, np.broadcast_to(rotation, xyz.shape[:-1] + (4,)))
        quaternion = g.quaternion_multiply(quaternion, rotation)
    elif augment == 'advanced':
        rng = rng or np.random
        xyz = xyz + rng.normal(size=(1, 3)).astype(xyz.dtype)
        rotation = g.make_quaternion_y(rng.uniform(0, 2 * math.pi, (1,)).astype(xyz.dtype))
        xyz = g.quaternion_rotate(xyz, np.broadcast_to(rotation, xyz.shape[:-1] + (4,)))
        quaternion = g.quaternion_multiply(quaternion, rotation)
    else:
        raise ValueError(f'Augment {augment} is not supported')
    quaternion = g.quaternion_remove_sign(g.quaternion_normalize(quaternion))
    return np.concatenate([xyz, quaternion], -1).astype(np.float32), tokens


# ---------------------------------------------------------------------------
# Optimizer — warmup(2000) -> cosine decay; decoupled weight decay excluding
# LayerNorm scales/biases and all biases (ref models/utils.py:417-426)
# ---------------------------------------------------------------------------

def warmup_cosine_schedule(init_lr, total_steps, warmup_steps=2000):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = init_lr * step / warmup_steps
        decay_steps = max(total_steps - warmup_steps, 1)
        frac = jnp.minimum((step - warmup_steps) / decay_steps, 1.0)
        cosine = init_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_steps, warmup, cosine)
    return schedule


def _weight_decay_mask(params):
    """True = decay. Excludes LayerNorm params and biases."""
    def decide(path, _leaf):
        names = [p.key for p in path if hasattr(p, 'key')]
        joined = '/'.join(names)
        if 'ln_' in joined or 'LayerNorm' in joined or 'layer_norm' in joined:
            return False
        if names and names[-1] in ('bias', 'scale'):
            return False
        return True
    return jax.tree_util.tree_map_with_path(decide, params)


def clip_per_tensor_norm(max_norm):
    """Per-tensor L2 clipping — the reference applies tf.clip_by_norm to each
    gradient independently (ref migt.py:486-487), not a global norm."""
    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        return jax.tree.map(clip, updates), state
    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def create_transformer_optimizer(config, total_steps=None, warmup_steps=2000):
    total_steps = total_steps or config.total_steps
    lr = warmup_cosine_schedule(config.learning_rate, total_steps, warmup_steps)
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=config.weight_decay, mask=_weight_decay_mask)
    if config.gradient_clip_val and config.gradient_clip_val > 0:
        tx = optax.chain(clip_per_tensor_norm(config.gradient_clip_val), tx)
    return tx, lr


def resolve_remat_policy(name):
    """Map a CLI-friendly policy name to a jax.checkpoint policy.

    None/'full' = classic remat (save nothing per block, recompute all);
    'attn' = save only the attention kernels' raw outputs (checkpoint_name
    anchors in models/migt.py) — backward never re-runs the fused forward
    attention kernel, at ~75MB/stream/layer. Measured at the full-size B=40
    recipe: +9.5% step throughput over full remat
    (TRANSFORMER40_r05_attn.json, 0.428 vs 0.391 updates/s) — but only with
    epoch-cadence checkpointing; mid-epoch async-save device snapshots plus
    the saved activations exceed HBM (runtime RESOURCE_EXHAUSTED, warned in
    train_transformer);
    'attn_mlp' = 'attn' plus the pre-gelu c_fc outputs (the widest matmul;
    ~4x the memory of 'attn' — verify HBM fit before long runs);
    'dots' = dots_with_no_batch_dims_saveable — saves EVERY non-batch dot
    output; at the full-size B=40 recipe this is ~25GB > HBM and the
    backend compile OOMs (measured 2026-08-19, tools/train_step_ablation),
    so it only suits smaller configs. All policies keep the per-block remat
    STRUCTURE, which the axon backend requires to compile the full-size
    backward graph at all (tools/repro_rng_backward_crash.py), and leave
    gradients bitwise-identical (pinned in test_train_transformer).
    """
    if name is None or name == 'full':
        return None
    if name == 'attn':
        return jax.checkpoint_policies.save_only_these_names('attn_out')
    if name == 'attn_mlp':
        return jax.checkpoint_policies.save_only_these_names(
            'attn_out', 'mlp_fc')
    if name == 'dots':
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == 'nothing':
        return jax.checkpoint_policies.nothing_saveable
    raise ValueError(
        f'unknown remat policy {name!r} (full|attn|attn_mlp|dots|nothing)')


def init_transformer_state(config, rng, optimizer, dtype=jnp.float32,
                           dropout_impl='rng', remat=True, sp_axis=None,
                           remat_policy=None):
    # remat default True: halves activation memory AND is required on some
    # backends whose compiler rejects the unrolled grad-with-dropout graph.
    # sp_axis: context parallelism — shard the residual streams' frame axis
    # over this mesh axis (models/migt._sp_constrain).
    model = MIGT(config, dtype=dtype, dropout_impl=dropout_impl, remat=remat,
                 sp_axis=sp_axis, remat_policy=resolve_remat_policy(remat_policy))
    poses = jnp.zeros((1, config.sequence_size, 7), jnp.float32)
    tokens = jnp.zeros((1, config.sequence_size, config.token_image_size,
                        config.token_image_size), jnp.int32)
    # init on CPU (see init_codebook_state note)
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        variables = model.init(rng, poses, tokens, compute_losses=True)
    variables = jax.device_put(variables, jax.local_devices()[0])
    params = variables['params']
    opt_state = optimizer.init(params)
    return model, TransformerTrainState(params, opt_state, jnp.zeros((), jnp.int32))


def _accuracy(labels, logits, n_loss_skip):
    pred = jnp.argmax(logits, -1)
    pred = pred[:, n_loss_skip:]
    labels = labels[:, n_loss_skip:]
    return jnp.mean((pred == labels).astype(jnp.float32))


def make_transformer_train_step(model, config, optimizer, donate=True):
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, rng):
        poses, tokens = batch
        dropout_rng, pose_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out = model.apply({'params': params}, poses, tokens,
                              compute_losses=True, deterministic=False,
                              step=state.step,
                              rngs={'dropout': dropout_rng, 'pose_noise': pose_rng})
            return jnp.mean(out['loss']), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {'loss': loss, 'ce_loss': jnp.mean(out['ce_loss']),
                   'acc': _accuracy(tokens.reshape(tokens.shape[0], tokens.shape[1], -1),
                                    out['logits'].reshape(tokens.shape[0], tokens.shape[1], -1,
                                                          config.n_embeddings),
                                    config.n_loss_skip)}
        for key in ('pose_loss', 'pose_pos_loss', 'pose_ori_loss', 'localization_weight'):
            if key in out:
                metrics[key] = jnp.mean(out[key])
        new_state = TransformerTrainState(new_params, new_opt_state, state.step + 1)
        return new_state, metrics

    return train_step


def make_transformer_multi_step(model, config, optimizer, donate=True):
    """Scan k train steps in one jitted call over stacked batches
    (poses [k,B,S,7], tokens [k,B,S,h,w]) — amortizes dispatch and avoids the
    axon tunnel's state-threading round trip (see CLAUDE.md)."""
    def one_step(carry, batch):
        state, rng = carry
        poses, tokens = batch
        dropout_rng, pose_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out = model.apply({'params': params}, poses, tokens,
                              compute_losses=True, deterministic=False,
                              step=state.step,
                              rngs={'dropout': dropout_rng, 'pose_noise': pose_rng})
            return jnp.mean(out['loss']), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {'loss': loss, 'ce_loss': jnp.mean(out['ce_loss']),
                   'acc': _accuracy(tokens.reshape(tokens.shape[0], tokens.shape[1], -1),
                                    out['logits'].reshape(tokens.shape[0], tokens.shape[1], -1,
                                                          config.n_embeddings),
                                    config.n_loss_skip)}
        for key in ('pose_loss', 'pose_pos_loss', 'pose_ori_loss', 'localization_weight'):
            if key in out:
                metrics[key] = jnp.mean(out[key])
        new_state = TransformerTrainState(new_params, new_opt_state, state.step + 1)
        return (new_state, rng), metrics

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state, batches, rng):
        (new_state, _), metrics = jax.lax.scan(one_step, (state, rng), batches)
        return new_state, jax.tree.map(lambda x: x[-1], metrics)

    return multi_step


def make_transformer_eval_step(model, config):
    @jax.jit
    def eval_step(state, batch):
        poses, tokens = batch
        out = model.apply({'params': state.params}, poses, tokens,
                          compute_losses=True, deterministic=True, step=state.step)
        metrics = {'loss': jnp.mean(out['loss']), 'ce_loss': jnp.mean(out['ce_loss']),
                   'acc': _accuracy(tokens.reshape(tokens.shape[0], tokens.shape[1], -1),
                                    out['logits'].reshape(tokens.shape[0], tokens.shape[1], -1,
                                                          config.n_embeddings),
                                    config.n_loss_skip)}
        for key in ('pose_loss', 'pose_pos_loss', 'pose_ori_loss'):
            if key in out:
                metrics[key] = jnp.mean(out[key])
        return metrics, out['logits']

    return eval_step


def train_transformer(config: MIGTConfig, dataset_path, job_dir, *,
                      codebook_path=None, total_steps=None, epochs=100,
                      batch_size=None, resume=True, finetune_from=None,
                      seed=42, use_bf16=True, wandb=False, log_every=50,
                      max_samples_per_environment=-1, mesh=None, progress=True,
                      profile_batch=50, steps_per_call=1, dropout_impl='rng',
                      remat=True, remat_policy=None, seq_parallelism=1,
                      checkpoint_every=None, force_wide_scan=False):
    """Full training loop (CLI `train transformer` / `train finetune-transformer`).

    finetune_from: a job dir whose best/last checkpoint seeds the params while
    the optimizer restarts fresh — the step counter carries over so schedules
    continue, matching ref finetune_transformer.py:78-87.

    checkpoint_every: additional mid-epoch rolling-last saves every N steps
    (epoch boundaries always save). Saves are async with rolling-last
    coalescing — see train_codebook's docstring and README 'Checkpointing'
    for the commit-lag contract and the cadence guidance formula.

    seq_parallelism > 1 enables context parallelism: the mesh gains a 'seq'
    axis of that size and the model shards its residual streams' frame axis
    over it (activation memory scales down ~seq-fold; a scaling extension
    beyond the reference, which is data-parallel only)."""
    from ..data.pipeline import load_token_dataset
    from .checkpoint import CheckpointManager, restore_checkpoint
    from .logging import MetricLogger

    total_steps = total_steps or config.total_steps
    batch_size = batch_size or config.batch_size
    steps_per_call = clamp_steps_per_call(steps_per_call, config,
                                          force=force_wide_scan)
    hbm_unsafe = warn_policy_snapshot_hbm(remat_policy, checkpoint_every,
                                          config)
    if mesh is None:
        mesh = mesh_lib.create_mesh_for_batch(batch_size,
                                              seq_parallelism=seq_parallelism)
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    sp_axis = 'seq' if seq_parallelism > 1 else None

    optimizer, lr_schedule = create_transformer_optimizer(config, total_steps)
    model, state = init_transformer_state(config, jax.random.PRNGKey(seed), optimizer,
                                          dtype, dropout_impl=dropout_impl, remat=remat,
                                          sp_axis=sp_axis, remat_policy=remat_policy)

    ckpt = CheckpointManager(job_dir, config,
                             snapshot='host' if hbm_unsafe else 'device')
    start_step = 0
    if finetune_from is not None:
        abstract = jax.tree.map(np.asarray, jax.device_get(state))
        restored, step = restore_checkpoint(finetune_from, abstract, prefer='last')
        if restored is None:
            raise FileNotFoundError(f'No checkpoint found at {finetune_from}')
        state = TransformerTrainState(**jax.tree.map(jnp.asarray, restored))
        start_step = int(step)
    data_state = None
    if finetune_from is None and resume:
        restored, step = ckpt.restore_last(jax.tree.map(np.asarray, jax.device_get(state)))
        if restored is not None:
            state = TransformerTrainState(**jax.tree.map(jnp.asarray, restored))
            start_step = int(step)
            # mid-epoch data-order resume: use the iterator cursor only if it
            # belongs to the checkpoint we actually restored
            aux = ckpt.load_aux()
            if aux is not None and aux.get('step') == start_step:
                data_state = aux.get('data_iterator')

    state = mesh_lib.replicate(mesh, state)
    if steps_per_call > 1:
        multi_step = make_transformer_multi_step(model, config, optimizer)

        def train_step(state, batches, rng):  # batches: list of k host batches
            stacked = (np.stack([b[0] for b in batches], 0),
                       np.stack([b[1] for b in batches], 0))
            return multi_step(state, mesh_lib.shard_batch(mesh, stacked, batch_dim=1), rng)
    else:
        train_step = make_transformer_train_step(model, config, optimizer)
    eval_step = make_transformer_eval_step(model, config)
    logger = MetricLogger(job_dir, hparams=config.asdict(), use_wandb=wandb)

    # optional codebook for validation PSNR + image grids (the reference
    # attaches the codebook model for test_step PSNR, ref migt.py:507-530)
    decode_val = None
    if codebook_path is not None:
        from ..models import load_model as _load_model
        codebook_model, codebook_vars = _load_model(codebook_path)
        cvars = {'params': codebook_vars['params'],
                 'quantizer': codebook_vars['quantizer']}

        @jax.jit
        def decode_val(cvars, logits, tokens):
            generated = jnp.argmax(logits[:, -1], -1)
            gen_images = codebook_model.apply(cvars, generated,
                                              method=type(codebook_model).decode_code)
            gt_images = codebook_model.apply(cvars, tokens[:, -1],
                                             method=type(codebook_model).decode_code)
            gen = jnp.clip(gen_images.astype(jnp.float32) / 2 + 0.5, 0, 1)
            gt = jnp.clip(gt_images.astype(jnp.float32) / 2 + 0.5, 0, 1)
            mse = jnp.mean((gen - gt) ** 2, axis=(-3, -2, -1))
            psnr = jnp.mean(-10.0 * jnp.log10(jnp.maximum(mse, 1e-10)))
            return psnr, (gen * 255).astype(jnp.uint8)

    transform = functools.partial(process_batch, augment=config.augment_poses)
    train_data = load_token_dataset(
        dataset_path, batch_size, config.sequence_size, config.token_image_size,
        split='train', repeat=-1, seed=seed, transform=transform,
        max_samples_per_environment=max_samples_per_environment,
        start_state=data_state, buffer_size=max(2, steps_per_call))
    train_iter = iter(train_data)

    rng = jax.random.PRNGKey(seed + 1)
    steps_per_epoch = max(1, total_steps // epochs)
    validation_steps = max(1, min(steps_per_epoch // 10, 100))
    step = start_step
    last_save = start_step  # newest save DISPATCHED (commit may lag; async)
    last_log = start_step
    # Deferred logging (scanned path): fetch window k's metrics only after
    # dispatching window k+1 so host batch assembly + upload overlap device
    # compute (see train/codebook.py for the measured motivation)
    pending = None  # (step, device metrics) of the newest dispatched window

    def flush_pending():
        nonlocal pending, last_log
        if pending is None:
            return
        pstep, pmetrics = pending
        pending = None
        if pstep - last_log >= log_every or pstep == total_steps:
            last_log = pstep
            m = jax.device_get(pmetrics)
            logger.log(pstep, m)
            if progress:
                print(f'step {pstep}/{total_steps} '
                      + ' '.join(f'{k}={float(v):.4f}' for k, v in m.items()))

    with mesh:
        while step < total_steps:
            epoch_end = min(step + steps_per_epoch, total_steps)
            while step < epoch_end:
                if steps_per_call > 1:
                    k = min(steps_per_call, epoch_end - step)
                    batches = [next(train_iter) for _ in range(k)]
                    if k < steps_per_call:
                        batches += [batches[-1]] * (steps_per_call - k)
                        step -= steps_per_call - k
                    state, metrics = train_step(state, batches, rng)
                    step += steps_per_call
                    flush_pending()  # previous window: fetch overlaps this one
                    pending = (step, metrics)
                else:
                    batch = mesh_lib.shard_batch(mesh, next(train_iter))
                    if profile_batch and step == profile_batch - 1:
                        jax.profiler.start_trace(os.path.join(job_dir, 'profile'))
                    state, metrics = train_step(state, batch, rng)
                    step += 1
                    if profile_batch and step == profile_batch + 1:
                        jax.tree.map(lambda x: x.block_until_ready(), metrics)
                        jax.profiler.stop_trace()
                    if step - last_log >= log_every or step == total_steps:
                        # interval (not modulo) cadence: scanned multi-step
                        # calls and odd epoch lengths leave step off the
                        # modulo grid
                        last_log = step
                        m = jax.device_get(metrics)
                        logger.log(step, m)
                        if progress:
                            print(f'step {step}/{total_steps} '
                                  + ' '.join(f'{k}={float(v):.4f}'
                                             for k, v in m.items()))
                if (checkpoint_every and step < total_steps
                        and step - last_save >= checkpoint_every):
                    ckpt.save(step, state,
                              aux=({'data_iterator': train_data.state}
                                   if train_data.state is not None else None))
                    last_save = step
            flush_pending()
            # validation — dispatch ALL eval (+ decode) steps, then fetch, so
            # each fetch overlaps the next batch's compute instead of a
            # blocking round trip per batch
            val_data = load_token_dataset(
                dataset_path, batch_size, config.sequence_size, config.token_image_size,
                split='test', repeat=1, seed=seed, shuffle=False,
                transform=functools.partial(process_batch, augment=config.augment_poses))
            val_iter = iter(val_data)
            val_metrics = {}
            val_outs = []
            for batch in val_iter:
                if len(val_outs) >= validation_steps:
                    break
                batch = mesh_lib.shard_batch(mesh, batch)
                metrics, logits = eval_step(state, batch)
                decoded = (decode_val(cvars, logits, batch[1])
                           if decode_val is not None else None)
                val_outs.append((metrics, decoded))
            for i, (metrics, decoded) in enumerate(val_outs):
                for k, v in jax.device_get(metrics).items():
                    val_metrics.setdefault(k, []).append(float(v))
                if decoded is not None:
                    psnr, gen_images = decoded
                    val_metrics.setdefault('psnr', []).append(float(psnr))
                    if i == 0:
                        logger.log_images(step, np.asarray(jax.device_get(gen_images)),
                                          tag='generated')
            val_data.close()  # early break leaves the producer blocked otherwise
            val_metrics = {k: float(np.mean(v)) for k, v in val_metrics.items()}
            if val_metrics:
                logger.log(step, val_metrics, prefix='val')
            ckpt.save(step, state, val_loss=val_metrics.get('loss'),
                      aux=({'data_iterator': train_data.state}
                           if train_data.state is not None else None))
            last_save = step
    train_data.close()
    ckpt.close()
    logger.close()
    return state

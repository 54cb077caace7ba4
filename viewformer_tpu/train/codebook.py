"""Stage-1 codebook (VQ-GAN) training: one pjit-ed train step on the mesh.

Parity targets: /root/reference/viewformer/models/vqgan_th.py:400-445 (loss =
mean(L1 + perceptual_weight*LPIPS) + codebook_weight*e_latent_loss;
Adam(lr, betas=(0.5, 0.9))) and train/train_codebook_th.py (Lightning loop:
limit_train_batches = 1 + total_steps//epochs, val each epoch, grad clip,
grad accumulation). TPU-native redesign: instead of Lightning DDP process
spawning, a single jitted step runs SPMD over the mesh — batch sharded on
'data', params replicated, gradient all-reduce inserted by XLA, and the EMA
quantizer statistics reduced implicitly (see ops/quantizer.py).
"""
import functools
import os
import sys
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import VQGANConfig
from ..models.vqgan import VQGAN
from ..parallel import mesh as mesh_lib


class CodebookTrainState(NamedTuple):
    params: Any
    quantizer: Any
    opt_state: Any
    step: jax.Array


def create_codebook_optimizer(config, accumulate_grad_batches=1):
    tx = optax.adam(config.learning_rate, b1=0.5, b2=0.9)
    if config.gradient_clip_val and config.gradient_clip_val > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.gradient_clip_val), tx)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, accumulate_grad_batches)
    return tx


def create_codebook_model(config, dtype=jnp.float32, remat=False):
    return VQGAN(config, dtype=dtype, remat=remat)


def init_codebook_state(config, rng, optimizer, dtype=jnp.float32, remat=False):
    model = create_codebook_model(config, dtype, remat=remat)
    dummy = jnp.zeros((1, config.image_size, config.image_size, config.in_channels), jnp.float32)
    params_rng, quantizer_rng = jax.random.split(rng)
    # init on CPU: initializing on the accelerator compiles the whole forward
    # just to draw random numbers (minutes at full size through the tunnel)
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        variables = model.init({'params': params_rng, 'quantizer': quantizer_rng},
                               dummy, training=False)
    variables = jax.device_put(variables, jax.local_devices()[0])
    params = variables['params']
    quantizer = variables['quantizer']
    opt_state = optimizer.init(params)
    return model, CodebookTrainState(params, quantizer, opt_state, jnp.zeros((), jnp.int32))


def _normalize_batch(batch):
    """Image batches arrive as f32 in [-1, 1] (historical) or as raw uint8
    (wire-efficient; same values as the f32 pipeline path to ~1 ulp — XLA
    folds /255*2 into one multiply). See ops.image.normalize_images."""
    from ..ops.image import normalize_images
    return normalize_images(batch)


def codebook_loss_fn(model, config, lpips_params, params, quantizer, batch):
    """Returns (loss, (aux_metrics, new_quantizer))."""
    batch = _normalize_batch(batch)
    variables = {'params': params, 'quantizer': quantizer}
    (dec, e_latent_loss, _quant, codes), mutated = model.apply(
        variables, batch, training=True, mutable=['quantizer'])
    dec = dec.astype(jnp.float32)
    x = batch.astype(jnp.float32)
    rec_l1 = jnp.mean(jnp.abs(x - dec))
    metrics = {}
    loss = rec_l1
    if lpips_params is not None and config.perceptual_weight > 0:
        from ..models.lpips import _lpips_forward
        p_loss = jnp.mean(_lpips_forward(lpips_params, x[..., :3], dec[..., :3]))
        loss = loss + config.perceptual_weight * p_loss
        metrics['p_loss'] = p_loss
    elif config.perceptual_weight > 0:
        # weights unavailable: the term is DROPPED (reference always trains
        # with it, ref vqgan_th.py:400-414) — report NaN, never a fake 0
        metrics['p_loss'] = jnp.full((), jnp.nan)
    else:
        metrics['p_loss'] = jnp.zeros(())
    loss = loss + config.codebook_weight * e_latent_loss
    # codebook utilization: perplexity of the batch's code distribution
    counts = jnp.bincount(codes.reshape(-1), length=config.n_embed)
    probs = counts / jnp.maximum(jnp.sum(counts), 1)
    perplexity = jnp.exp(-jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0)))
    metrics.update(rec_loss=rec_l1, quant_loss=e_latent_loss, total_loss=loss,
                   perplexity=perplexity)
    return loss, (metrics, mutated['quantizer'])


def make_codebook_train_step(model, config, optimizer, lpips_params=None, donate=True):
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch):
        grad_fn = jax.value_and_grad(
            functools.partial(codebook_loss_fn, model, config, lpips_params),
            has_aux=True)
        (loss, (metrics, new_quantizer)), grads = grad_fn(state.params, state.quantizer, batch)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = CodebookTrainState(new_params, new_quantizer, new_opt_state, state.step + 1)
        return new_state, metrics

    return train_step


def make_codebook_multi_step(model, config, optimizer, lpips_params=None, donate=True):
    """Scan k train steps inside ONE jitted call over stacked batches
    [k, B, H, W, C]. Amortizes per-step dispatch (and, under the axon dev
    tunnel, avoids the pathological state round-trip on threading — see
    CLAUDE.md); on real hardware it hides dispatch latency the same way."""
    def one_step(carry, batch):
        state = carry
        grad_fn = jax.value_and_grad(
            functools.partial(codebook_loss_fn, model, config, lpips_params),
            has_aux=True)
        (loss, (metrics, new_quantizer)), grads = grad_fn(state.params, state.quantizer, batch)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = CodebookTrainState(new_params, new_quantizer, new_opt_state,
                                       state.step + 1)
        return new_state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state, batches):
        new_state, metrics = jax.lax.scan(one_step, state, batches)
        return new_state, jax.tree.map(lambda x: x[-1], metrics)

    return multi_step


def make_codebook_eval_step(model, config, lpips_params=None):
    @jax.jit
    def eval_step(state, batch):
        batch = _normalize_batch(batch)
        variables = {'params': state.params, 'quantizer': state.quantizer}
        dec, e_latent_loss, _quant, codes = model.apply(variables, batch, training=False)
        dec = dec.astype(jnp.float32)
        x = batch.astype(jnp.float32)
        rec_l1 = jnp.mean(jnp.abs(x - dec))
        metrics = {'rec_loss': rec_l1, 'quant_loss': e_latent_loss}
        loss = rec_l1 + config.codebook_weight * e_latent_loss
        if lpips_params is not None and config.perceptual_weight > 0:
            from ..models.lpips import _lpips_forward
            p_loss = jnp.mean(_lpips_forward(lpips_params, x[..., :3], dec[..., :3]))
            loss = loss + config.perceptual_weight * p_loss
            metrics['p_loss'] = p_loss
        metrics['total_loss'] = loss
        # PSNR of reconstructions in [0,1]
        mse = jnp.mean((jnp.clip(x, -1, 1) / 2 - jnp.clip(dec, -1, 1) / 2) ** 2)
        metrics['psnr'] = -10.0 * jnp.log10(mse)
        return metrics, dec

    return eval_step


def train_codebook(config: VQGANConfig, dataset_path, job_dir, *,
                   total_steps=None, epochs=100, batch_size=None,
                   accumulate_grad_batches=1, resume=True, seed=42,
                   use_bf16=True, wandb=False, log_every=50,
                   num_val_batches=8, mesh=None, progress=True,
                   profile_batch=50, remat=True, steps_per_call=1,
                   checkpoint_every=None):
    """Full training loop (CLI entry `train codebook`).

    checkpoint_every: additional mid-epoch rolling-last saves every N steps
    (epoch boundaries always save). Saves are async (device snapshot +
    background D2H) with ROLLING-LAST COALESCING: when the host's D2H is
    slower than the cadence, queued-but-unstarted saves are dropped in
    favor of the newest — at most 2 device-side snapshots are ever alive,
    and the committed checkpoint lags the train loop by at most
    (state_bytes / D2H_bandwidth) seconds of work. Pick
    checkpoint_every >= state_bytes / D2H_bw / step_time to keep every
    cadence point committed; any smaller value is safe but coalesces
    (see README 'Checkpointing' for the measured numbers)."""
    from ..data.pipeline import load_image_dataset
    from ..models.lpips import load_lpips
    from .checkpoint import CheckpointManager
    from .logging import MetricLogger

    total_steps = total_steps or config.total_steps
    batch_size = batch_size or config.batch_size
    if mesh is None:
        mesh = mesh_lib.create_mesh_for_batch(batch_size)

    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    optimizer = create_codebook_optimizer(config, accumulate_grad_batches)
    model, state = init_codebook_state(config, jax.random.PRNGKey(seed), optimizer,
                                       dtype, remat=remat)

    lpips = load_lpips('vgg') if config.perceptual_weight > 0 else None
    lpips_params = lpips._params if lpips is not None else None
    if config.perceptual_weight > 0 and lpips_params is None:
        print(f'WARNING: training with perceptual_weight={config.perceptual_weight} '
              'but WITHOUT the LPIPS term (weights unavailable) — loss function '
              'diverges from the reference; p_loss is logged as NaN.',
              file=sys.stderr)

    ckpt = CheckpointManager(job_dir, config)
    start_step = 0
    data_state = None
    if resume:
        restored, step = ckpt.restore_last(jax.tree.map(np.asarray, jax.device_get(state)))
        if restored is not None:
            state = CodebookTrainState(**jax.tree.map(jnp.asarray, restored))
            start_step = int(step)
            # mid-epoch data-order resume: use the iterator cursor only if it
            # belongs to the checkpoint we actually restored
            aux = ckpt.load_aux()
            if aux is not None and aux.get('step') == start_step:
                data_state = aux.get('data_iterator')

    state = mesh_lib.replicate(mesh, state)
    if steps_per_call > 1:
        multi_step = make_codebook_multi_step(model, config, optimizer, lpips_params)

        def train_step(state, batch):  # batch: list of k host batches
            stacked = np.stack(batch, 0)
            return multi_step(state, mesh_lib.shard_batch(mesh, stacked, batch_dim=1))
    else:
        train_step = make_codebook_train_step(model, config, optimizer, lpips_params)
    eval_step = make_codebook_eval_step(model, config, lpips_params)

    logger = MetricLogger(job_dir, hparams=config.asdict(), use_wandb=wandb)
    steps_per_epoch = max(1, 1 + total_steps // epochs)

    # uint8 over the wire (4x less upload, normalize on device) + a prefetch
    # buffer deep enough for a whole scanned window
    train_data = load_image_dataset(dataset_path, batch_size, config.image_size,
                                    split='train', repeat=-1, seed=seed,
                                    start_state=data_state,
                                    output_dtype='uint8',
                                    buffer_size=max(2, steps_per_call))
    train_iter = iter(train_data)
    step = start_step
    last_save = start_step  # newest save DISPATCHED (commit may lag; async)
    last_log = start_step
    # Deferred logging (scanned path): fetching a window's metrics blocks
    # until that window completes, so fetch window k's metrics only AFTER
    # dispatching window k+1 — the host-side batch assembly + upload then
    # overlaps device compute instead of serializing with it (measured:
    # the serialized loop held the 352-recipe at 300 img/s vs its own 401
    # img/s device ceiling, CODEBOOK352_r04.json).
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
                    if k < steps_per_call:
                        # tail smaller than the scan length: pad by repeating
                        batches = [next(train_iter) for _ in range(k)]
                        batches += [batches[-1]] * (steps_per_call - k)
                        step -= steps_per_call - k  # padded repeats still count
                    else:
                        batches = [next(train_iter) for _ in range(steps_per_call)]
                    state, metrics = train_step(state, batches)
                    step += steps_per_call
                    flush_pending()  # previous window: fetch overlaps this one
                    pending = (step, metrics)
                else:
                    batch = mesh_lib.shard_batch(mesh, next(train_iter))
                    # profiler trace window around step `profile_batch`
                    # (ref TensorBoard profile_batch=50 hook)
                    if profile_batch and step == profile_batch - 1:
                        jax.profiler.start_trace(os.path.join(job_dir, 'profile'))
                    state, metrics = train_step(state, batch)
                    step += 1
                    if profile_batch and step == profile_batch + 1:
                        jax.tree.map(lambda x: x.block_until_ready(), metrics)
                        jax.profiler.stop_trace()
                    if step - last_log >= log_every or step == total_steps:
                        # interval (not modulo) cadence: the reference-faithful
                        # 1+N//epochs epoch length (ref train_codebook_th.py
                        # limit_train_batches) drifts step off the modulo grid,
                        # which starved train logs after epoch 1 with scan calls
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
            # validation at epoch end — dispatch ALL eval steps first, fetch
            # after: each fetch then overlaps the next batch's compute
            # instead of a blocking round trip per batch
            val_metrics = {}
            val_data = load_image_dataset(dataset_path, batch_size, config.image_size,
                                          split='test', repeat=1, shuffle=False,
                                          seed=seed, output_dtype='uint8')
            val_iter = iter(val_data)
            val_outs = []
            for batch in val_iter:
                if len(val_outs) >= num_val_batches:
                    break
                val_outs.append(eval_step(state, mesh_lib.shard_batch(mesh, batch)))
            for count, (metrics, dec) in enumerate(val_outs):
                metrics = jax.device_get(metrics)
                for k, v in metrics.items():
                    val_metrics.setdefault(k, []).append(float(v))
                if count == 0:
                    # per-epoch reconstruction grid (ref CustomLoggingCallback)
                    recon = np.clip(np.asarray(jax.device_get(dec)) / 2 + 0.5, 0, 1)
                    logger.log_images(step, (recon * 255).astype(np.uint8),
                                      tag='reconstructed')
            val_data.close()  # early break leaves the producer blocked otherwise
            val_metrics = {k: float(np.mean(v)) for k, v in val_metrics.items()}
            if val_metrics:
                logger.log(step, val_metrics, prefix='val')
            ckpt.save(step, state, val_loss=val_metrics.get('total_loss'),
                      aux=({'data_iterator': train_data.state}
                           if train_data.state is not None else None))
            last_save = step
    train_data.close()
    ckpt.close()
    logger.close()
    return state

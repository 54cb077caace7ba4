"""viewformer-cli: the command surface, mirroring the reference CLI.

Parity target: /root/reference/viewformer/cli.py — command groups
  dataset generate|shuffle|visualize
  train codebook|transformer|finetune-transformer
  generate-codes, evaluate <...>, visualize codebook, model info,
  download-model

Loader selection mirrors the reference's aparse ConditionalType: `--loader
NAME` plus `--loader-<param> value` flags forwarded to that loader's
constructor (e.g. `--loader colors --loader-num-sequences 100`).
Run as `python -m viewformer_tpu ...` or via the `viewformer-cli` script.
"""
import click


def _parse_value(value):
    if value is None or not isinstance(value, str):
        return value
    lowered = value.lower()
    if lowered in ('true', 'false'):
        return lowered == 'true'
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            continue
    return value


class LoaderCommand(click.Command):
    """Accepts dynamic --loader-<param> options."""

    def parse_args(self, ctx, args):
        loader_kwargs = {}
        remaining = []
        i = 0
        while i < len(args):
            arg = args[i]
            if arg.startswith('--loader-'):
                key = arg[len('--loader-'):].replace('-', '_')
                if '=' in key:
                    key, value = key.split('=', 1)
                else:
                    i += 1
                    value = args[i]
                loader_kwargs[key] = _parse_value(value)
            else:
                remaining.append(arg)
            i += 1
        ctx.params['loader_kwargs'] = loader_kwargs
        super().parse_args(ctx, remaining)
        ctx.params['loader_kwargs'] = loader_kwargs
        return ctx.args


def _build_loader(name, loader_kwargs, split=None, image_size=None, **extra):
    from .data.loaders import get_loader
    kwargs = dict(loader_kwargs)
    if split is not None and 'split' not in kwargs:
        kwargs['split'] = split
    kwargs.update(extra)
    if image_size is not None:
        kwargs['image_size'] = image_size
    return get_loader(name)(**kwargs)


@click.group()
@click.option('--platform', default=None,
              help='jax platform override (cpu|tpu|axon). Needed because the '
                   'axon plugin ignores the JAX_PLATFORMS env var.')
@click.option('--coordinator', default=None,
              help='multi-host: coordinator address host:port '
                   '(jax.distributed.initialize)')
@click.option('--num-processes', type=int, default=None, help='multi-host: world size')
@click.option('--process-id', type=int, default=None, help='multi-host: this process rank')
def main(platform, coordinator, num_processes, process_id):
    """viewformer-tpu command line interface."""
    import os

    import jax
    if platform:
        jax.config.update('jax_platforms', platform)
    # persistent XLA compile cache: full-size train-step compiles are slow
    # (minutes); reruns and resumes hit the cache
    cache_dir = os.path.expanduser('~/.cache/viewformer_tpu/xla_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    if num_processes and num_processes > 1:
        from .parallel import initialize_distributed
        initialize_distributed(coordinator, num_processes, process_id)


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------

@main.group()
def dataset():
    """Dataset generation and management."""


@dataset.command('generate', cls=LoaderCommand)
@click.option('--loader', 'loader_name', required=True)
@click.option('--output', required=True)
@click.option('--split', 'splits', multiple=True, default=('train', 'test'))
@click.option('--max-images-per-shard', type=int, default=None)
@click.option('--max-sequences-per-shard', type=int, default=None)
@click.option('--image-size', type=int, default=None)
@click.option('--shuffle/--no-shuffle', default=False)
@click.option('--shards', default=None, help='SplitIndices subset, e.g. "1:5"')
@click.option('--allow-incompatible-config', is_flag=True)
def dataset_generate(loader_name, output, splits, max_images_per_shard,
                     max_sequences_per_shard, image_size, shuffle, shards,
                     allow_incompatible_config, loader_kwargs=None):
    """Generate TFRecord shards from a raw dataset loader."""
    from .data import generate_dataset_from_loader
    from .utils import SplitIndices
    for split in splits:
        loader = _build_loader(loader_name, loader_kwargs or {}, split=split,
                               image_size=image_size,
                               **({'shuffle': True} if shuffle else {}))
        generate_dataset_from_loader(
            loader, split, output,
            max_images_per_shard=max_images_per_shard,
            max_sequences_per_shard=max_sequences_per_shard,
            shards=SplitIndices(shards) if shards else None,
            allow_incompatible_config=allow_incompatible_config)


@dataset.command('shuffle')
@click.option('--dataset', 'dataset_path', required=True)
@click.option('--output', required=True)
@click.option('--seed', type=int, default=42)
def dataset_shuffle(dataset_path, output, seed):
    """Byte-level shard re-shuffle using .index sidecars."""
    from .data import shuffle_dataset
    shuffle_dataset(dataset_path, output, seed=seed)


@dataset.command('visualize', cls=LoaderCommand)
@click.option('--loader', 'loader_name', required=True)
@click.option('--image-size', type=int, default=None)
@click.option('--output', default=None,
              help='write a preview png here instead of an interactive viewer')
@click.option('--max-sequences', type=int, default=4)
def dataset_visualize(loader_name, image_size, output, max_sequences,
                      loader_kwargs=None):
    """Interactive matplotlib browser for sequences + poses (headless with
    --output)."""
    from .commands.visualize import visualize_dataset
    loader = _build_loader(loader_name, loader_kwargs or {}, split='train',
                           image_size=image_size)
    visualize_dataset(loader, output=output, max_sequences=max_sequences)


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------

@main.group()
def train():
    """Model training."""


def _config_from_options(config_cls, options):
    import dataclasses
    kwargs = {}
    for field in dataclasses.fields(config_cls):
        if field.name in options and options[field.name] is not None:
            kwargs[field.name] = options[field.name]
    return config_cls.from_dict(kwargs)


@train.command('codebook')
@click.option('--dataset', 'dataset_path', required=True)
@click.option('--job-dir', required=True)
@click.option('--total-steps', type=int, default=None)
@click.option('--epochs', type=int, default=100)
@click.option('--batch-size', type=int, default=None)
@click.option('--learning-rate', type=float, default=None)
@click.option('--n-embed', type=int, default=None)
@click.option('--embed-dim', type=int, default=None)
@click.option('--image-size', type=int, default=None)
@click.option('--ch', type=int, default=None)
@click.option('--num-res-blocks', type=int, default=None)
@click.option('--gradient-clip-val', type=float, default=None)
@click.option('--accumulate-grad-batches', type=int, default=1)
@click.option('--perceptual-weight', type=float, default=None)
@click.option('--steps-per-call', type=int, default=1,
              help='scan k train steps inside one jitted call')
@click.option('--log-every', type=int, default=50)
@click.option('--checkpoint-every', type=int, default=None,
              help='extra mid-epoch rolling-last saves every N steps (epoch '
                   'boundaries always save). Saves are ASYNC with '
                   'rolling-last coalescing: queued-but-unstarted saves are '
                   'dropped for the newest, <=2 device snapshots ever live, '
                   'and the committed checkpoint lags the loop by at most '
                   'state_bytes/D2H_bandwidth of wall time — so max '
                   'work-at-risk ~= N + lag/step_time steps. Pick N >= '
                   'state_bytes/D2H_bw/step_time to commit every cadence '
                   'point (see README Checkpointing for measured numbers).')
@click.option('--fp32', is_flag=True, help='disable bf16 compute')
@click.option('--wandb', is_flag=True)
@click.option('--seed', type=int, default=42,
              help='init + data-order seed (two-seed gate runs)')
@click.option('--resume/--no-resume', default=True)
def train_codebook_cmd(dataset_path, job_dir, total_steps, epochs, batch_size,
                       accumulate_grad_batches, steps_per_call, log_every,
                       checkpoint_every, fp32, wandb, seed, resume,
                       **config_options):
    """Train the VQ-GAN codebook (stage 1)."""
    from .config import VQGANConfig
    from .train.codebook import train_codebook
    config = _config_from_options(VQGANConfig, config_options)
    if total_steps:
        config.total_steps = total_steps
    if batch_size:
        config.batch_size = batch_size
    train_codebook(config, dataset_path, job_dir, total_steps=config.total_steps,
                   epochs=epochs, batch_size=config.batch_size,
                   accumulate_grad_batches=accumulate_grad_batches,
                   steps_per_call=steps_per_call, log_every=log_every,
                   checkpoint_every=checkpoint_every, seed=seed,
                   resume=resume, use_bf16=not fp32, wandb=wandb)


@train.command('transformer')
@click.option('--dataset', 'dataset_path', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--total-steps', type=int, default=None)
@click.option('--epochs', type=int, default=100)
@click.option('--batch-size', type=int, default=None)
@click.option('--learning-rate', type=float, default=None)
@click.option('--d-model', type=int, default=None)
@click.option('--n-layer', type=int, default=None)
@click.option('--n-head', type=int, default=None)
@click.option('--sequence-size', type=int, default=None)
@click.option('--token-image-size', type=int, default=None)
@click.option('--n-loss-skip', type=int, default=None)
@click.option('--augment-poses', default=None)
@click.option('--localization-weight', default=None)
@click.option('--pose-multiplier', type=float, default=None)
@click.option('--random-pose-multiplier', type=float, default=None)
@click.option('--label-smoothing', type=float, default=None)
@click.option('--weight-decay', type=float, default=None)
@click.option('--gradient-clip-val', type=float, default=None)
@click.option('--dropout', type=float, default=None)
@click.option('--max-samples-per-environment', type=int, default=-1)
@click.option('--steps-per-call', type=int, default=1,
              help='scan k train steps inside one jitted call')
@click.option('--seq-parallelism', type=int, default=1,
              help='context parallelism: shard the residual streams\' frame '
                   'axis over this many devices (mesh gains a seq axis)')
@click.option('--checkpoint-every', type=int, default=None,
              help='extra mid-epoch rolling-last saves every N steps; async '
                   'with rolling-last coalescing — see `train codebook '
                   '--help` and README Checkpointing for the commit-lag '
                   'contract and the cadence guidance formula')
@click.option('--remat-policy',
              type=click.Choice(['full', 'attn', 'attn_mlp', 'dots',
                                 'nothing']),
              default='full',
              help='per-block remat policy: full = recompute the block in '
                   'backward (lowest memory); attn = also save the fused '
                   'attention kernels\' outputs so backward never re-runs '
                   'them — measured +9.5% step throughput at the full-size '
                   'recipe, but pair it with --checkpoint-every 0 (the '
                   'saved activations + mid-epoch snapshot copies exceed '
                   'HBM at full size); attn_mlp = attn plus the pre-gelu '
                   'MLP hidden (~4x attn memory, OOMs at full size); dots '
                   '= save ALL matmul outputs (OOMs the full-size B=40 '
                   'recipe — smaller configs only). Gradients are identical '
                   'under every policy.')
@click.option('--fp32', is_flag=True)
@click.option('--wandb', is_flag=True)
@click.option('--seed', type=int, default=42,
              help='init + data-order seed (two-seed gate runs)')
@click.option('--force-wide-scan', is_flag=True,
              help='bypass the full-size scan-window clamp (steps-per-call '
                   '> 20 at full size is a known TPU-worker-crash trigger, '
                   'tools/backend_crash_history.jsonl 2026-08-18)')
@click.option('--resume/--no-resume', default=True)
def train_transformer_cmd(dataset_path, codebook_model, job_dir, total_steps, epochs,
                          batch_size, max_samples_per_environment, steps_per_call,
                          seq_parallelism, checkpoint_every, remat_policy, fp32,
                          wandb, seed, force_wide_scan, resume, **config_options):
    """Train the MIGT transformer (stage 2)."""
    from .config import MIGTConfig, load_config
    from .train.transformer import train_transformer
    config = _config_from_options(MIGTConfig, config_options)
    codebook_config = load_config(codebook_model)
    config.n_embeddings = codebook_config.n_embed
    if total_steps:
        config.total_steps = total_steps
    if batch_size:
        config.batch_size = batch_size
    train_transformer(config, dataset_path, job_dir, codebook_path=codebook_model,
                      total_steps=config.total_steps, epochs=epochs,
                      batch_size=config.batch_size, resume=resume, seed=seed,
                      use_bf16=not fp32, wandb=wandb, steps_per_call=steps_per_call,
                      max_samples_per_environment=max_samples_per_environment,
                      seq_parallelism=seq_parallelism,
                      checkpoint_every=checkpoint_every,
                      remat_policy=None if remat_policy == 'full' else remat_policy,
                      force_wide_scan=force_wide_scan)


@train.command('finetune-transformer')
@click.option('--dataset', 'dataset_path', required=True)
@click.option('--checkpoint', required=True, help='job dir of the base transformer')
@click.option('--job-dir', required=True)
@click.option('--total-steps', type=int, default=None)
@click.option('--epochs', type=int, default=100)
@click.option('--batch-size', type=int, default=None)
@click.option('--learning-rate', type=float, default=None)
@click.option('--pose-multiplier', type=float, default=None)
@click.option('--localization-weight', default=None)
@click.option('--sequence-size', type=int, default=None)
@click.option('--n-loss-skip', type=int, default=None)
@click.option('--codebook-model', default=None,
              help='optional codebook job dir for validation PSNR/image grids')
@click.option('--steps-per-call', type=int, default=1,
              help='scan k train steps inside one jitted call')
@click.option('--checkpoint-every', type=int, default=None,
              help='extra mid-epoch rolling-last saves every N steps')
@click.option('--fp32', is_flag=True)
@click.option('--wandb', is_flag=True)
def finetune_transformer_cmd(dataset_path, checkpoint, job_dir, total_steps, epochs,
                             batch_size, codebook_model, steps_per_call,
                             checkpoint_every, fp32, wandb, **overrides):
    """Finetune an existing transformer (optimizer schedules continue from
    the restored step, ref finetune_transformer.py:78-87)."""
    from .config import load_config
    from .train.transformer import train_transformer
    config = load_config(checkpoint)
    for key, value in overrides.items():
        if value is not None:
            if key == 'localization_weight':
                from .utils.schedules import Schedule
                value = Schedule.from_str(value)
            setattr(config, key, value)
    if total_steps:
        config.total_steps = total_steps
    if batch_size:
        config.batch_size = batch_size
    train_transformer(config, dataset_path, job_dir, finetune_from=checkpoint,
                      total_steps=config.total_steps, epochs=epochs,
                      batch_size=config.batch_size, use_bf16=not fp32, wandb=wandb,
                      codebook_path=codebook_model, steps_per_call=steps_per_call,
                      checkpoint_every=checkpoint_every)


# ---------------------------------------------------------------------------
# generate-codes / evaluate / model / visualize / download
# ---------------------------------------------------------------------------

@main.command('generate-codes')
@click.option('--dataset', required=True)
@click.option('--output', required=True)
@click.option('--model', required=True)
@click.option('--batch-size', type=int, default=None)
@click.option('--shards', default=None)
@click.option('--split', 'splits', multiple=True, default=None)
def generate_codes_cmd(dataset, output, model, batch_size, shards, splits):
    """Encode an image dataset into codebook tokens."""
    from .commands.generate_codes import generate_codes
    from .utils import SplitIndices
    generate_codes(dataset, output, model,
                   shards=SplitIndices(shards) if shards else None,
                   batch_size=batch_size, splits=list(splits) or None)


@main.group()
def evaluate():
    """Evaluation commands."""


def _loader_options(fn):
    fn = click.option('--loader', 'loader_name', default='dataset')(fn)
    return fn


@evaluate.command('transformer', cls=LoaderCommand)
@_loader_options
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--batch-size', type=int, default=1)
@click.option('--num-eval-sequences', type=int, default=None)
@click.option('--pose-multiplier', type=float, default=None)
@click.option('--sequence-size', type=int, default=None)
@click.option('--num-store-images', type=int, default=100)
@click.option('--store-ctx', is_flag=True)
@click.option('--image-size', type=int, default=None)
def evaluate_transformer_cmd(loader_name, transformer_model, codebook_model, job_dir,
                             batch_size, num_eval_sequences, pose_multiplier,
                             sequence_size, num_store_images, store_ctx, image_size,
                             loader_kwargs=None):
    """Single-context novel view synthesis evaluation."""
    from .evaluate.transformer import evaluate_transformer
    loader = lambda im_size: _build_loader(loader_name, loader_kwargs or {},  # noqa: E731
                                           split='test', image_size=im_size)
    evaluate_transformer(loader, transformer_model, codebook_model, job_dir,
                         batch_size=batch_size, num_eval_sequences=num_eval_sequences,
                         pose_multiplier=pose_multiplier, sequence_size=sequence_size,
                         num_store_images=num_store_images, store_ctx=store_ctx,
                         image_size=image_size)


@evaluate.command('transformer-multictx', cls=LoaderCommand)
@_loader_options
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--batch-size', type=int, default=1)
@click.option('--num-eval-sequences', type=int, default=None)
@click.option('--pose-multiplier', type=float, default=None)
@click.option('--sequence-size', type=int, default=None)
@click.option('--num-store-images', type=int, default=100)
@click.option('--store-ctx', is_flag=True)
@click.option('--image-size', type=int, default=None)
def evaluate_multictx_cmd(loader_name, transformer_model, codebook_model, job_dir,
                          batch_size, num_eval_sequences, pose_multiplier,
                          sequence_size, num_store_images, store_ctx, image_size,
                          loader_kwargs=None):
    """All-context-sizes-at-once evaluation."""
    from .evaluate.multictx import evaluate_transformer_multictx
    loader = lambda im_size: _build_loader(loader_name, loader_kwargs or {},  # noqa: E731
                                           split='test', image_size=im_size)
    evaluate_transformer_multictx(loader, transformer_model, codebook_model, job_dir,
                                  batch_size=batch_size,
                                  num_eval_sequences=num_eval_sequences,
                                  pose_multiplier=pose_multiplier,
                                  sequence_size=sequence_size,
                                  num_store_images=num_store_images,
                                  store_ctx=store_ctx, image_size=image_size)


@evaluate.command('codebook', cls=LoaderCommand)
@_loader_options
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--batch-size', type=int, default=64)
@click.option('--num-eval-images', type=int, default=None)
@click.option('--num-store-images', type=int, default=100)
@click.option('--image-size', type=int, default=None)
def evaluate_codebook_cmd(loader_name, codebook_model, job_dir, batch_size,
                          num_eval_images, num_store_images, image_size,
                          loader_kwargs=None):
    """Codebook reconstruction evaluation."""
    from .evaluate.codebook import evaluate_codebook
    loader = lambda im_size: _build_loader(loader_name, loader_kwargs or {},  # noqa: E731
                                           split='test', image_size=im_size)
    evaluate_codebook(loader, codebook_model, job_dir, batch_size=batch_size,
                      num_eval_images=num_eval_images,
                      num_store_images=num_store_images, image_size=image_size)


@evaluate.command('transformer-multictx-allimg', cls=LoaderCommand)
@_loader_options
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--context-views', default=None, help='comma-separated frame indices')
@click.option('--pose-multiplier', type=float, default=None)
@click.option('--keep-last-frame', is_flag=True)
@click.option('--image-size', type=int, default=None)
@click.option('--num-eval-sequences', type=int, default=None)
def evaluate_multictx_allimg_cmd(loader_name, transformer_model, codebook_model, job_dir,
                                 context_views, pose_multiplier, keep_last_frame,
                                 image_size, num_eval_sequences, loader_kwargs=None):
    """Evaluate every frame of every sequence as query with fixed context."""
    from .evaluate.multictx_allimg import evaluate_transformer_multictx_allimg
    loader = lambda im_size: _build_loader(loader_name, loader_kwargs or {},  # noqa: E731
                                           split='test', image_size=im_size)
    ctx = [int(x) for x in context_views.split(',')] if context_views else None
    evaluate_transformer_multictx_allimg(loader, transformer_model, codebook_model,
                                         job_dir, context_views=ctx,
                                         pose_multiplier=pose_multiplier,
                                         keep_last_frame=keep_last_frame,
                                         image_size=image_size,
                                         num_eval_sequences=num_eval_sequences)


@evaluate.command('7scenes')
@click.option('--path', required=True)
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--batch-size', type=int, default=1)
@click.option('--image-match-map', default=None)
@click.option('--scenes', default=None, help='comma-separated scene names')
@click.option('--sequence-size', type=int, default=None)
@click.option('--num-eval-sequences', type=int, default=None)
@click.option('--num-store-images', type=int, default=100)
@click.option('--top-n-matched-images', type=int, default=0)
@click.option('--num-gen-ctx', type=int, default=0)
@click.option('--generation-procedure', default='standard',
              type=click.Choice(['standard', 'generated_images', 'pose_refinement']))
@click.option('--pose-multiplier', type=float, default=None)
@click.option('--num-context-views', type=int, default=19)
@click.option('--image-size', type=int, default=128)
def evaluate_sevenscenes_cmd(path, transformer_model, codebook_model, job_dir,
                             batch_size, image_match_map, scenes, sequence_size,
                             num_eval_sequences, num_store_images, top_n_matched_images,
                             num_gen_ctx, generation_procedure, pose_multiplier,
                             num_context_views, image_size):
    """7-Scenes localization + view synthesis evaluation."""
    from .evaluate.sevenscenes import evaluate_sevenscenes
    evaluate_sevenscenes(path, transformer_model, codebook_model, job_dir,
                         batch_size=batch_size, image_match_map=image_match_map,
                         scenes=scenes.split(',') if scenes else None,
                         sequence_size=sequence_size,
                         num_eval_sequences=num_eval_sequences,
                         num_store_images=num_store_images,
                         top_n_matched_images=top_n_matched_images,
                         num_gen_ctx=num_gen_ctx,
                         generation_procedure=generation_procedure,
                         pose_multiplier=pose_multiplier,
                         num_context_views=num_context_views, image_size=image_size)


@evaluate.command('7scenes-baseline')
@click.option('--path', required=True)
@click.option('--job-dir', required=True)
@click.option('--image-match-map', default=None)
@click.option('--scenes', default=None)
@click.option('--num-eval-sequences', type=int, default=1000)
@click.option('--top-n-matched-images', type=int, default=0)
@click.option('--baseline', default='position_oracle',
              type=click.Choice(['orientation_oracle', 'position_oracle', 'mean']))
def evaluate_sevenscenes_baseline_cmd(path, job_dir, image_match_map, scenes,
                                      num_eval_sequences, top_n_matched_images, baseline):
    """Non-learned 7-Scenes localization baselines."""
    from .evaluate.sevenscenes_baseline import evaluate_sevenscenes_baseline
    evaluate_sevenscenes_baseline(path, job_dir, image_match_map=image_match_map,
                                  scenes=scenes.split(',') if scenes else None,
                                  num_eval_sequences=num_eval_sequences,
                                  top_n_matched_images=top_n_matched_images,
                                  baseline=baseline)


@evaluate.command('7scenes-multictx')
@click.option('--path', required=True)
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--batch-size', type=int, default=1)
@click.option('--scenes', default=None)
@click.option('--num-eval-sequences', type=int, default=100)
@click.option('--store-ctx/--no-store-ctx', default=True)
@click.option('--num-store-images', type=int, default=100)
@click.option('--num-context-views', type=int, default=19)
@click.option('--image-size', type=int, default=128)
def evaluate_sevenscenes_multictx_cmd(path, transformer_model, codebook_model, job_dir,
                                      batch_size, scenes, num_eval_sequences,
                                      store_ctx, num_store_images,
                                      num_context_views, image_size):
    """7-Scenes x multi-context-size grid evaluation."""
    from .evaluate.sevenscenes_multictx import evaluate_sevenscenes_multictx
    evaluate_sevenscenes_multictx(path, transformer_model, codebook_model, job_dir,
                                  batch_size=batch_size,
                                  scenes=scenes.split(',') if scenes else None,
                                  num_eval_sequences=num_eval_sequences,
                                  store_ctx=store_ctx,
                                  num_store_images=num_store_images,
                                  num_context_views=num_context_views,
                                  image_size=image_size)


@evaluate.command('co3d')
@click.option('--path', required=True)
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--categories', default=None)
@click.option('--single-sequence-evaluation', is_flag=True)
def evaluate_co3d_cmd(path, transformer_model, codebook_model, job_dir, categories,
                      single_sequence_evaluation):
    """CO3D evaluation wrapping the official eval harness."""
    from .evaluate.co3d import evaluate_co3d
    evaluate_co3d(path, transformer_model, codebook_model, job_dir,
                  categories=categories.split(',') if categories else None,
                  single_sequence_evaluation=single_sequence_evaluation)


@evaluate.command('co3dv2-challenge')
@click.option('--path', required=True)
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--job-dir', required=True)
@click.option('--categories', default=None)
def evaluate_co3dv2_challenge_cmd(path, transformer_model, codebook_model, job_dir,
                                  categories):
    """CO3Dv2 few-view challenge submission builder."""
    from .evaluate.co3dv2_challenge import evaluate_co3dv2_challenge
    evaluate_co3dv2_challenge(path, transformer_model, codebook_model, job_dir,
                              categories=categories.split(',') if categories else None)


@evaluate.command('generate-gqn-images')
@click.option('--dataset-path', required=True)
@click.option('--job-dir', required=True)
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
def generate_gqn_images_cmd(dataset_path, job_dir, transformer_model, codebook_model):
    """Demo: 3-view context -> query render dumps."""
    from .evaluate.generate_images import generate_gqn_images
    generate_gqn_images(dataset_path, job_dir, transformer_model, codebook_model)


@main.group()
def model():
    """Model utilities."""


@model.command('info')
@click.option('--model', 'checkpoint', required=True)
def model_info_cmd(checkpoint):
    """Parameter-count tree for a checkpoint."""
    from .commands.model_info import model_info
    model_info(checkpoint)


@main.group()
def visualize():
    """Visualization commands."""


@visualize.command('codebook', cls=LoaderCommand)
@_loader_options
@click.option('--codebook-model', required=True)
@click.option('--output', default=None, help='write a reconstruction grid png here '
                                             'instead of an interactive viewer')
@click.option('--num-images', type=int, default=16)
def visualize_codebook_cmd(loader_name, codebook_model, output, num_images,
                           loader_kwargs=None):
    from .commands.visualize_codebook import visualize_codebook
    loader = lambda im_size: _build_loader(loader_name, loader_kwargs or {},  # noqa: E731
                                           split='test', image_size=im_size)
    visualize_codebook(loader, codebook_model, output=output, num_images=num_images)


@main.command('serve')
@click.option('--transformer-model', required=True)
@click.option('--codebook-model', required=True)
@click.option('--max-frames', type=int, default=None,
              help='context capacity (default: model sequence_size - 1)')
@click.option('--pose-multiplier', type=float, default=None)
@click.option('--fp32', is_flag=True, help='disable bf16 serving weights')
def serve_cmd(transformer_model, codebook_model, max_frames, pose_multiplier, fp32):
    """KV-cache serving session: JSON requests on stdin, responses on stdout.

    Prefill a context once ({"op": "start", ...}), then render novel views on
    demand ({"op": "render", ...}) at O(1 frame) cost per view — see
    viewformer_tpu/commands/serve.py for the protocol.
    """
    from .commands.serve import serve_loop
    serve_loop(transformer_model, codebook_model, max_frames=max_frames,
               use_bfloat16=not fp32, pose_multiplier=pose_multiplier)


@main.command('download-model')
@click.argument('checkpoint')
@click.option('--from-file', default=None, type=click.Path(exists=True),
              help='install from a local <checkpoint>.tar.gz or extracted '
                   'directory instead of the network (air-gapped hosts; see '
                   'PARITY_RUNBOOK.md)')
@click.option('--override', is_flag=True, help='replace a cached copy')
def download_model_cmd(checkpoint, from_file, override):
    """Install a released checkpoint into ~/.cache/viewformer."""
    from .utils import pull_checkpoint
    path = pull_checkpoint(checkpoint, override=override,
                           local_source=from_file)
    print(f'Installed at {path}')


if __name__ == '__main__':
    main()

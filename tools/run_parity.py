#!/usr/bin/env python
"""One-command released-checkpoint parity runner (PARITY_RUNBOOK.md as code).

The remaining parity gaps are all environment-blocked (network for released
checkpoints + LPIPS weights; see VERDICT "What's missing"). This runner
burns zero time the day the environment unblocks: point it at a directory
containing ANY of

    sm7-codebook-th.tar.gz     (or an extracted sm7-codebook-th/ dir)
    sm7-transformer-tf.tar.gz  (or dir)
    lpips_vgg.npz              (converted LPIPS/VGG weights)
    dataset/                   (a generated sm7 IMAGE dataset for evaluate)

and it will: probe the network (and pull anything missing if it is back),
install the artifacts into the cache layout `load_model` resolves, run the
STRICT importers (any unmatched checkpoint key raises — ref
utils/convert.py:52-70 semantics), record deterministic forward
fingerprints, wire LPIPS up, and — when both checkpoints plus a dataset are
present — run the real `evaluate codebook` / `evaluate transformer`
pipelines and capture their results.json metrics. Everything lands in one
machine-readable report (default PARITY_r04.json at the repo root).

Usage:
    python tools/run_parity.py [--artifacts DIR] [--dataset PATH]
        [--num-eval-sequences N] [--skip-network] [--output FILE]
        [--platform cpu|axon]

Parity targets: ref utils/tensorflow.py:20-63 (load + convert on the fly),
README.md:46-65 (released checkpoint names), evaluate_transformer.py
metrics. Compare the recorded metrics against the paper tables
(arXiv:2203.10157 Tab. 2/4) and the published prediction dumps.
"""
import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHECKPOINTS = ('sm7-codebook-th', 'sm7-transformer-tf')
LPIPS_CACHE = os.path.expanduser('~/.cache/viewformer_tpu/lpips_vgg.npz')


def probe_network(timeout=10):
    """True when the released-checkpoint host resolves and answers."""
    try:
        import requests

        from viewformer_tpu.utils import _CHECKPOINT_URL
        response = requests.head(_CHECKPOINT_URL, timeout=timeout,
                                 allow_redirects=True)
        return bool(response.status_code)
    except Exception:
        return False


def install_checkpoint(name, artifacts_dir, network_ok):
    """Ensure ~/.cache/viewformer/<name> exists. Returns (path|None, how)."""
    from viewformer_tpu.utils import pull_checkpoint

    cached = os.path.expanduser(f'~/.cache/viewformer/{name}')
    if os.path.isdir(cached):
        return cached, 'cached'
    if artifacts_dir:
        for candidate, kind in ((os.path.join(artifacts_dir, name), 'dir'),
                                (os.path.join(artifacts_dir, f'{name}.tar.gz'),
                                 'tarball')):
            if os.path.exists(candidate):
                return pull_checkpoint(name, local_source=candidate), kind
    if network_ok:
        try:
            return pull_checkpoint(name), 'network'
        except Exception as exc:
            return None, f'network-failed: {exc}'
    return None, 'missing'


def install_lpips(artifacts_dir, network_ok):
    """Ensure the LPIPS npz is loadable. Returns (ok, how)."""
    from viewformer_tpu.models.lpips import _WEIGHT_PATHS
    for path in _WEIGHT_PATHS:
        if os.path.exists(path):
            return True, 'cached'
    if artifacts_dir:
        candidate = os.path.join(artifacts_dir, 'lpips_vgg.npz')
        if os.path.exists(candidate):
            os.makedirs(os.path.dirname(LPIPS_CACHE), exist_ok=True)
            shutil.copyfile(candidate, LPIPS_CACHE)
            return True, 'artifacts'
    if network_ok:
        try:  # needs the torch `lpips` package + torchvision weights
            from viewformer_tpu.models.lpips import \
                convert_lpips_weights_from_torch
            convert_lpips_weights_from_torch()
            return True, 'converted'
        except Exception as exc:
            return False, f'convert-failed: {exc}'
    return False, 'missing'


def forward_fingerprint(model, variables, kind):
    """Deterministic forward statistics for cross-stack comparison: run the
    imported model on a fixed seeded input and record output moments. The
    same recipe run through the reference stack on the same checkpoint must
    match to ~1e-4 (the importer oracle tolerance)."""
    import jax.numpy as jnp
    import numpy as np

    if kind == 'codebook':
        x = jnp.asarray(np.random.RandomState(0).rand(2, model.config.image_size,
                                                      model.config.image_size,
                                                      model.config.in_channels)
                        .astype(np.float32) * 2 - 1)
        _q, _loss, codes = model.apply(
            {'params': variables['params'], 'quantizer': variables['quantizer']},
            x, training=False, method=type(model).encode)
        decoded = model.apply(
            {'params': variables['params'], 'quantizer': variables['quantizer']},
            codes, method=type(model).decode_code)
        return {'codes_first16': np.asarray(codes).reshape(-1)[:16].tolist(),
                'decoded_mean': float(jnp.mean(decoded)),
                'decoded_std': float(jnp.std(decoded))}
    rs = np.random.RandomState(0)
    S = model.config.sequence_size
    poses = rs.randn(1, S, 7).astype(np.float32)
    poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
    tokens = rs.randint(0, model.config.n_embeddings, (1, S, 8, 8))
    out = model.apply({'params': variables['params']}, jnp.asarray(poses),
                      jnp.asarray(tokens), compute_losses=False)
    logits = np.asarray(out['logits'], np.float32)
    return {'logits_mean': float(logits.mean()),
            'logits_std': float(logits.std()),
            'argmax_first16': logits.reshape(-1, logits.shape[-1])
                                    .argmax(-1)[:16].tolist()}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    parser.add_argument('--artifacts', default=None,
                        help='directory with side-channel artifacts')
    parser.add_argument('--dataset', default=None,
                        help='generated sm7 IMAGE dataset path for evaluate')
    parser.add_argument('--num-eval-sequences', type=int, default=100)
    parser.add_argument('--skip-network', action='store_true')
    parser.add_argument('--output', default=os.path.join(REPO, 'PARITY_r04.json'))
    parser.add_argument('--platform', default=None, choices=('cpu', 'axon'),
                        help="force a jax platform (the axon plugin ignores "
                             "env JAX_PLATFORMS; 'cpu' is set via jax.config)")
    args = parser.parse_args(argv)

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    report = {'argv': sys.argv[1:], 'checkpoints': {}, 'lpips': {},
              'evaluate': {}}
    network_ok = (not args.skip_network) and probe_network()
    report['network'] = network_ok
    print(f'network: {"UP" if network_ok else "down/skipped"}')

    from viewformer_tpu.models import load_model

    installed = {}
    for name in CHECKPOINTS:
        path, how = install_checkpoint(name, args.artifacts, network_ok)
        entry = {'source': how, 'installed': path is not None}
        if path is not None:
            kind = 'codebook' if 'codebook' in name else 'transformer'
            try:
                # strict import: any unmatched key raises inside the importer
                model, variables = load_model(path)
                n_params = sum(x.size for x in jax.tree.leaves(variables))
                entry.update(import_ok=True, n_params=int(n_params),
                             fingerprint=forward_fingerprint(model, variables,
                                                             kind))
                installed[kind] = path
                print(f'{name}: imported OK ({n_params:,} params)')
            except Exception as exc:
                entry.update(import_ok=False, error=repr(exc))
                print(f'{name}: IMPORT FAILED: {exc!r}')
        else:
            print(f'{name}: {how}')
        report['checkpoints'][name] = entry

    lpips_ok, how = install_lpips(args.artifacts, network_ok)
    report['lpips'] = {'available': lpips_ok, 'source': how}
    if lpips_ok:
        try:
            import jax.numpy as jnp
            import numpy as np

            from viewformer_tpu.models.lpips import load_lpips
            fn = load_lpips()
            a = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 2 - 1,
                            jnp.float32)
            b = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3) * 2 - 1,
                            jnp.float32)
            report['lpips']['fixed_pair_value'] = float(np.asarray(fn(a, b))[0])
            print(f"lpips: loaded, fixed-pair value "
                  f"{report['lpips']['fixed_pair_value']:.6f}")
        except Exception as exc:
            report['lpips'].update(available=False, error=repr(exc))
            print(f'lpips: load failed: {exc!r}')
    else:
        print(f'lpips: {how}')

    if args.dataset and 'codebook' in installed:
        from viewformer_tpu.data.loaders import build
        from viewformer_tpu.evaluate.codebook import evaluate_codebook
        loader = build('dataset', path=args.dataset, split='test')
        job = os.path.join('/tmp', 'parity-codebook')
        report['evaluate']['codebook'] = evaluate_codebook(
            loader, installed['codebook'], job,
            num_eval_images=args.num_eval_sequences)
    if args.dataset and len(installed) == 2:
        from viewformer_tpu.data.loaders import build
        from viewformer_tpu.evaluate.transformer import evaluate_transformer
        loader = build('dataset', path=args.dataset, split='test')
        job = os.path.join('/tmp', 'parity-transformer')
        report['evaluate']['transformer'] = evaluate_transformer(
            loader, installed['transformer'], installed['codebook'], job,
            num_eval_sequences=args.num_eval_sequences)

    report['complete'] = (all(e.get('import_ok') for e in
                              report['checkpoints'].values())
                          and report['lpips'].get('available', False)
                          and 'transformer' in report['evaluate'])
    with open(args.output, 'w') as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.output} (complete={report['complete']})")
    return 0 if any(e.get('import_ok') for e in
                    report['checkpoints'].values()) or not installed else 1


if __name__ == '__main__':
    sys.exit(main())

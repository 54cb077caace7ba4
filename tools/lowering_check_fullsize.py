"""Full-size multi-device lowering check (no multi-chip hardware needed).

AOT-lowers and compiles the FULL-SIZE transformer train step (12L / 768d /
12H, seq 20, remat, dropout, reference batch 40) on virtual CPU meshes
(8 data, 1 model) and (4 data, 2 model), then asserts:

  1. the Megatron-style tp layouts from parallel/sharding.py actually bind
     'model'-sharded specs to the c_attn/c_fc/c_proj kernels at full size
     (no silent fall-back to replication via the divisibility guard,
     parallel/sharding.py migt_param_shardings);
  2. the compiled HLO contains the expected collectives: all-reduce for the
     dp gradient reduction, and additional subgroup collectives
     (all-gather / reduce-scatter / subgroup all-reduce) for dp x tp;
  3. optimizer-moment leaves inherit the tp layouts (so a resumed Adam state
     placed by shard_transformer_state stays sharded).

This closes the "multi-chip evidence is toy-scale only" gap without N real
chips: GSPMD layout propagation through the full-size graph (the (v,q,k)
c_attn concat split, remat x collectives interaction) either compiles and
carries the layouts, or this script fails.

Writes LOWERING_r03.json at the repo root. Run:
    python tools/lowering_check_fullsize.py
(self-re-execs into a CPU subprocess with 8 virtual devices).

--tpu-topology additionally compiles the SAME full-size step for a REAL
TPU v5e-8 target (jax.experimental.topologies, 'v5e:2x4' — the actual XLA
TPU compiler, no hardware needed) on dp8, dp4xtp2 and dp2xsp2xtp2 meshes,
asserting the fused Mosaic attention kernels survive partitioning (they
lower inside the shard_map wrap from ops/branching_attention._shard_plan;
without it, any >1-device TPU lowering raises "Mosaic kernels cannot be
automatically partitioned"). The CPU meshes above validate layouts/
collectives but take the DENSE attention path — only this mode proves the
production TPU kernel path is multi-chip-compilable. Writes
LOWERING_TPU_r03.json.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    entry = 'run_tpu_topology' if '--tpu-topology' in sys.argv[1:] else 'run'
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if not f.startswith('--xla_force_host_platform_device_count')]
    flags.append('--xla_force_host_platform_device_count=8')
    env['XLA_FLAGS'] = ' '.join(flags)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    child = ("import jax\n"
             "jax.config.update('jax_platforms', 'cpu')\n"
             f"import sys; sys.path.insert(0, {REPO + '/tools'!r})\n"
             "import lowering_check_fullsize as m\n"
             f"m.{entry}()\n")
    proc = subprocess.run([sys.executable, '-c', child], env=env)
    sys.exit(proc.returncode)


def _fullsize_abstract_state():
    """(config, model, optimizer, abstract state/batch/rng ShapeDtypeStructs)
    for the full-size reference train step — eval_shape only, nothing
    materializes."""
    import jax
    import jax.numpy as jnp

    from viewformer_tpu.config import MIGTConfig
    from viewformer_tpu.models.migt import MIGT
    from viewformer_tpu.train.transformer import (TransformerTrainState,
                                                  create_transformer_optimizer)

    config = MIGTConfig(n_layer=12, d_model=768, n_head=12, sequence_size=20,
                        token_image_size=8, total_steps=200_000, dropout=0.1,
                        gradient_clip_val=1.0)
    optimizer, _ = create_transformer_optimizer(config)
    model = MIGT(config, dtype=jnp.bfloat16, dropout_impl='rng', remat=True)

    def _init(rng):
        return model.init(rng, jnp.zeros((1, 20, 7), jnp.float32),
                          jnp.zeros((1, 20, 8, 8), jnp.int32),
                          compute_losses=True)

    variables_s = jax.eval_shape(_init, jax.random.PRNGKey(0))
    params_s = variables_s['params']
    opt_s = jax.eval_shape(optimizer.init, params_s)
    state_s = TransformerTrainState(params_s, opt_s,
                                    jax.ShapeDtypeStruct((), jnp.int32))
    poses_s = jax.ShapeDtypeStruct((40, 20, 7), jnp.float32)
    tokens_s = jax.ShapeDtypeStruct((40, 20, 8, 8), jnp.int32)
    rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return config, model, optimizer, state_s, (poses_s, tokens_s), rng_s


def run_tpu_topology():
    """Compile the full-size train step for a REAL v5e-8 target (see module
    docstring). Requires the Mosaic shard_map wrap to lower at all."""
    import time

    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from viewformer_tpu.models.migt import MIGT
    from viewformer_tpu.parallel import mesh as mesh_lib
    from viewformer_tpu.parallel.sharding import transformer_state_shardings
    from viewformer_tpu.train.transformer import make_transformer_train_step

    topo = topologies.get_topology_desc(platform='tpu', topology_name='v5e:2x4',
                                        chip_config_name='default')
    assert len(topo.devices) == 8
    config, model, optimizer, state_s, batch_s, rng_s = _fullsize_abstract_state()

    report = {'config': '12L/768d/12H seq20 B40 remat dropout0.1',
              'target': 'TPU v5e 2x4 (topology AOT, real XLA TPU compiler)',
              'meshes': {}}
    for dp, sp, tp in ((8, 1, 1), (4, 1, 2), (2, 2, 2)):
        name = f'dp{dp}xsp{sp}xtp{tp}'
        mesh = Mesh(np.asarray(topo.devices).reshape(dp, sp, tp),
                    ('data', 'seq', 'model'))
        sp_model = (MIGT(config, dtype=model.dtype, dropout_impl='rng',
                         remat=True, sp_axis='seq') if sp > 1 else model)
        shardings = transformer_state_shardings(state_s, mesh)

        def as_sds(leaf, s):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=s)

        state_in = jax.tree.map(as_sds, state_s, shardings)
        data_sh = mesh_lib.data_sharding(mesh)
        batch_in = jax.tree.map(lambda x: as_sds(x, data_sh), batch_s)
        rng_in = as_sds(rng_s, mesh_lib.replicated(mesh))
        train_step = make_transformer_train_step(sp_model, config, optimizer,
                                                 donate=False)
        t0 = time.time()
        with mesh:
            lowered = train_step.lower(state_in, batch_in, rng_in)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        text = compiled.as_text()
        counts = _count(text, 'all-reduce', 'all-gather', 'reduce-scatter',
                        'collective-permute', 'tpu_custom_call')
        report['meshes'][name] = {
            'lower_s': round(t1 - t0, 1), 'compile_s': round(t2 - t1, 1),
            'collectives_and_kernels': counts, 'hlo_bytes': len(text),
        }
        assert counts['all-reduce'] >= 1, counts      # dp grad reduction
        assert counts['tpu_custom_call'] >= 1, counts  # Mosaic kernels live
        print(f'{name}: {counts} compile={t2 - t1:.1f}s')

    # --- codebook train step (full reference size, dp8): no Mosaic kernels
    # (plain conv/attention), but pins that stage-1 training ALSO compiles
    # for the real multi-chip TPU target with the dp collectives in place ---
    import jax.numpy as jnp

    from viewformer_tpu.config import VQGANConfig
    from viewformer_tpu.train.codebook import (CodebookTrainState,
                                               create_codebook_optimizer,
                                               make_codebook_train_step)

    cconfig = VQGANConfig(perceptual_weight=0.0)
    coptimizer = create_codebook_optimizer(cconfig)
    from viewformer_tpu.train.codebook import create_codebook_model
    cmodel = create_codebook_model(cconfig, jnp.bfloat16, remat=True)

    def _cinit(rng):
        params_rng, quantizer_rng = jax.random.split(rng)
        dummy = jnp.zeros((1, cconfig.image_size, cconfig.image_size,
                           cconfig.in_channels), jnp.float32)
        return cmodel.init({'params': params_rng, 'quantizer': quantizer_rng},
                           dummy, training=False)

    cvars_s = jax.eval_shape(_cinit, jax.random.PRNGKey(0))
    copt_s = jax.eval_shape(coptimizer.init, cvars_s['params'])
    cstate_s = CodebookTrainState(cvars_s['params'], cvars_s['quantizer'],
                                  copt_s, jax.ShapeDtypeStruct((), jnp.int32))
    cmesh = Mesh(np.asarray(topo.devices).reshape(8, 1, 1),
                 ('data', 'seq', 'model'))
    crepl = mesh_lib.replicated(cmesh)
    cstate_in = jax.tree.map(
        lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=crepl),
        cstate_s)
    # uint8 wire batch, normalized on device (the production trainer path)
    cbatch_in = jax.ShapeDtypeStruct((352, 128, 128, 3), jnp.uint8,
                                     sharding=mesh_lib.data_sharding(cmesh))
    cstep = make_codebook_train_step(cmodel, cconfig, coptimizer, donate=False)
    t0 = time.time()
    with cmesh:
        clowered = cstep.lower(cstate_in, cbatch_in)
    t1 = time.time()
    ccompiled = clowered.compile()
    t2 = time.time()
    ctext = ccompiled.as_text()
    ccounts = _count(ctext, 'all-reduce', 'all-gather', 'reduce-scatter')
    report['codebook_dp8'] = {
        'config': 'full-size VQGAN ch=128 @128px bf16 remat, global batch 352 uint8',
        'lower_s': round(t1 - t0, 1), 'compile_s': round(t2 - t1, 1),
        'collectives': ccounts, 'hlo_bytes': len(ctext),
    }
    assert ccounts['all-reduce'] >= 1, ccounts  # dp grads + quantizer EMA stats
    print(f'codebook dp8: {ccounts} compile={t2 - t1:.1f}s')

    out = os.path.join(REPO, 'LOWERING_TPU_r03.json')
    report['ok'] = True
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print('wrote', out)


def _count(text, *names):
    return {n: text.count(n) for n in names}


def run():
    import jax

    from viewformer_tpu.parallel import mesh as mesh_lib
    from viewformer_tpu.parallel.sharding import transformer_state_shardings
    from viewformer_tpu.train.transformer import make_transformer_train_step

    assert len(jax.devices()) == 8, jax.devices()
    config, model, optimizer, state_s, (poses_s, tokens_s), rng_s = \
        _fullsize_abstract_state()

    report = {'config': '12L/768d/12H seq20 B40 remat dropout0.1', 'meshes': {}}
    for dp, tp in ((8, 1), (4, 2)):
        name = f'dp{dp}xtp{tp}'
        mesh = mesh_lib.create_mesh(data_parallelism=dp, model_parallelism=tp)
        shardings = transformer_state_shardings(state_s, mesh)

        # --- check 1: tp layouts bind at full size ---
        sharded_params = []
        flat = jax.tree_util.tree_flatten_with_path(shardings.params)[0]
        for path, s in flat:
            keys = '/'.join(str(getattr(p, 'key', '')) for p in path)
            if any(str(spec) != 'None' for spec in s.spec):
                sharded_params.append(keys)
        # per block: 4 sharded kernels (c_attn/c_proj/c_fc/mlp-c_proj) plus
        # the 2 column-parallel biases (c_attn, c_fc); row-parallel biases
        # replicate
        n_expected = config.n_layer * (4 + 2)
        if tp > 1:
            assert len(sharded_params) == n_expected, \
                (len(sharded_params), n_expected, sharded_params[:8])
            for layer in range(config.n_layer):
                for want in (f'h_{layer}/attn/c_attn/kernel',
                             f'h_{layer}/attn/c_proj/kernel',
                             f'h_{layer}/mlp/c_fc/kernel',
                             f'h_{layer}/mlp/c_proj/kernel'):
                    assert any(want in p for p in sharded_params), want
        else:
            # specs still NAME the 'model' axis on a dp-only mesh, but its
            # size is 1 — effectively replicated; nothing to assert
            pass

        # --- check 3: optimizer moments inherit layouts ---
        opt_sharded = [
            '/'.join(str(getattr(p, 'key', getattr(p, 'name', p))) for p in path)
            for path, s in
            jax.tree_util.tree_flatten_with_path(shardings.opt_state)[0]
            if any(str(spec) != 'None' for spec in s.spec)]
        if tp > 1:
            # mu + nu for every sharded param
            assert len(opt_sharded) == 2 * n_expected, \
                (len(opt_sharded), 2 * n_expected)

        # --- check 2: compile and inspect collectives ---
        def as_sds(leaf, s):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=s)

        state_in = jax.tree.map(as_sds, state_s, shardings)
        data_sh = mesh_lib.data_sharding(mesh)
        batch_in = (as_sds(poses_s, data_sh), as_sds(tokens_s, data_sh))
        rng_in = as_sds(rng_s, mesh_lib.replicated(mesh))

        train_step = make_transformer_train_step(model, config, optimizer,
                                                 donate=False)
        import time
        t0 = time.time()
        lowered = train_step.lower(state_in, batch_in, rng_in)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        text = compiled.as_text()
        counts = _count(text, 'all-reduce', 'all-gather', 'reduce-scatter',
                        'collective-permute', 'all-to-all')
        report['meshes'][name] = {
            'lower_s': round(t1 - t0, 1), 'compile_s': round(t2 - t1, 1),
            'sharded_params': len(sharded_params),
            'sharded_opt_leaves': len(opt_sharded),
            'collectives': counts,
            'hlo_bytes': len(text),
        }
        assert counts['all-reduce'] >= 1, counts  # dp grad reduction
        if tp > 1:
            assert sum(counts.values()) > 1, counts
        print(f'{name}: sharded_params={len(sharded_params)} '
              f'opt_leaves={len(opt_sharded)} collectives={counts} '
              f'compile={t2 - t1:.1f}s')

    # dp x tp must introduce model-axis communication beyond pure dp
    dp_only = sum(report['meshes']['dp8xtp1']['collectives'].values())
    dptp = sum(report['meshes']['dp4xtp2']['collectives'].values())
    assert dptp > dp_only, (dp_only, dptp)

    out = os.path.join(REPO, 'LOWERING_r03.json')
    report['ok'] = True
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print('wrote', out)


if __name__ == '__main__':
    main()

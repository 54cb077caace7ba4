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

--tpu-topology-inference compiles the sharded INFERENCE programs the same
way (evaluate-transformer fused predict, generate-codes encode,
ServingSession prefill + observe + render + localize — see
run_tpu_topology_inference). Writes LOWERING_TPU_r05.json.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    if '--tpu-topology-inference' in sys.argv[1:]:
        entry = 'run_tpu_topology_inference'
    elif '--tpu-topology' in sys.argv[1:]:
        entry = 'run_tpu_topology'
    else:
        entry = 'run'
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
    from viewformer_tpu.train.transformer import (make_transformer_train_step,
                                                  resolve_remat_policy)

    topo = topologies.get_topology_desc(platform='tpu', topology_name='v5e:2x4',
                                        chip_config_name='default')
    assert len(topo.devices) == 8
    config, model, optimizer, state_s, batch_s, rng_s = _fullsize_abstract_state()

    report = {'config': '12L/768d/12H seq20 B40 remat dropout0.1',
              'target': 'TPU v5e 2x4 (topology AOT, real XLA TPU compiler)',
              'meshes': {}}
    # last leg: the 'attn' remat policy (checkpoint_name anchors through the
    # Mosaic shard_map wrap) must also survive the real multi-chip compiler
    for dp, sp, tp, policy in ((8, 1, 1, None), (4, 1, 2, None),
                               (2, 2, 2, None), (8, 1, 1, 'attn')):
        name = f'dp{dp}xsp{sp}xtp{tp}' + (f'_{policy}' if policy else '')
        mesh = Mesh(np.asarray(topo.devices).reshape(dp, sp, tp),
                    ('data', 'seq', 'model'))
        if sp > 1 or policy:
            sp_model = MIGT(config, dtype=model.dtype, dropout_impl='rng',
                            remat=True, sp_axis='seq' if sp > 1 else None,
                            remat_policy=resolve_remat_policy(policy))
        else:
            sp_model = model
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

    out = os.path.join(REPO, 'LOWERING_TPU_TRAIN_r05.json')
    report['ok'] = True
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print('wrote', out)


def _count(text, *names):
    return {n: text.count(n) for n in names}


def run_tpu_topology_inference():
    """AOT-compile the SHARDED INFERENCE programs for a real v5e-8 target.

    The round-3 landmine (Mosaic kernels cannot be auto-partitioned; the
    fused attention must run inside an all-axes shard_map) was caught in the
    TRAIN step only — the sharded inference programs take the exact same
    fused path on >1-device TPU meshes but CPU tests can never see it
    (jax.lax.platform_dependent routes CPU to the dense branch). This
    compiles, with the real XLA TPU compiler against a v5e:2x4 topology, the
    ACTUAL jitted programs the production code builds (not re-derived
    copies):

      - evaluate-transformer fused predict (encode -> prefill -> generate ->
        decode -> localize; evaluate/transformer.py
        make_generate_batch_predictions) on dp8 AND dp4xtp2 — the dp x tp
        leg exercises the _shard_plan heads-over-'model' folding;
      - generate-codes encode (commands/generate_codes.py
        LatentCodeTransformer._encode) at the production batch 352, dp8;
      - ServingSession._start_fn (context prefill) and ._render_fn
        (query-branch generate + decode) from serve.py, dp8.

    Asserts tpu_custom_call survives partitioning wherever the program
    contains the fused prefill (predict, serve start). Writes
    LOWERING_TPU_r05.json. Full-size model configs throughout (VQ-GAN
    ch=128 @128px, MIGT 12L/768d/12H).
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from viewformer_tpu.config import MIGTConfig, VQGANConfig
    from viewformer_tpu.models import AutoModel

    topo = topologies.get_topology_desc(platform='tpu', topology_name='v5e:2x4',
                                        chip_config_name='default')
    assert len(topo.devices) == 8
    tconfig = MIGTConfig()   # full reference size: 12L/768d/12H, seq 20
    cconfig = VQGANConfig()  # ch=128 @128px
    tmodel = AutoModel.from_config(tconfig, dtype=jnp.bfloat16)
    cmodel = AutoModel.from_config(cconfig, dtype=jnp.bfloat16)
    S = tconfig.sequence_size
    B = 16  # eval/serve scene batch: 2 sequences per chip on v5e-8

    def _tinit(rng):
        return tmodel.init(rng, jnp.zeros((1, S, 7), jnp.float32),
                           jnp.zeros((1, S, 8, 8), jnp.int32),
                           compute_losses=False)

    def _cinit(rng):
        r1, r2 = jax.random.split(rng)
        return cmodel.init({'params': r1, 'quantizer': r2},
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           training=False)

    tvars_s = jax.eval_shape(_tinit, jax.random.PRNGKey(0))
    cvars_s = jax.eval_shape(_cinit, jax.random.PRNGKey(1))
    tvars_s = {'params': tvars_s['params']}
    cvars_s = {'params': cvars_s['params'], 'quantizer': cvars_s['quantizer']}

    def repl(tree, mesh):
        r = NamedSharding(mesh, P())
        return jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=r), tree)

    report = {'target': 'TPU v5e 2x4 (topology AOT, real XLA TPU compiler)',
              'config': 'VQGAN ch=128 @128px + MIGT 12L/768d/12H seq20, '
                        'eval/serve batch 16, generate-codes batch 352',
              'note': 'train-step legs live in LOWERING_TPU_r03.json',
              'legs': {}}

    def compile_leg(name, jitted, args, mesh, expect_mosaic):
        t0 = time.time()
        with mesh:
            lowered = jitted.lower(*args)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        text = compiled.as_text()
        counts = _count(text, 'all-reduce', 'all-gather', 'reduce-scatter',
                        'collective-permute', 'tpu_custom_call')
        report['legs'][name] = {
            'lower_s': round(t1 - t0, 1), 'compile_s': round(t2 - t1, 1),
            'collectives_and_kernels': counts, 'hlo_bytes': len(text),
        }
        if expect_mosaic:  # fused Mosaic attention survived partitioning
            assert counts['tpu_custom_call'] >= 1, (name, counts)
        print(f'{name}: {counts} compile={t2 - t1:.1f}s', flush=True)

    # --- evaluate transformer: the fused predict program, dp8 + dp4xtp2 ---
    from viewformer_tpu.evaluate.transformer import make_generate_batch_predictions
    for dp, tp in ((8, 1), (4, 2)):
        mesh = Mesh(np.asarray(topo.devices).reshape(dp, 1, tp),
                    ('data', 'seq', 'model'))
        data = NamedSharding(mesh, P('data'))
        bound = make_generate_batch_predictions(tmodel, tvars_s, cmodel, cvars_s)
        predict_jit, (tv_s, cv_s) = bound.func, bound.args
        images_in = jax.ShapeDtypeStruct((B, S, 128, 128, 3), jnp.uint8,
                                         sharding=data)
        cameras_in = jax.ShapeDtypeStruct((B, S, 7), jnp.float32, sharding=data)
        compile_leg(f'evaluate_predict_dp{dp}xtp{tp}', predict_jit,
                    (repl(tv_s, mesh), repl(cv_s, mesh), images_in, cameras_in),
                    mesh, expect_mosaic=True)

    mesh8 = Mesh(np.asarray(topo.devices).reshape(8, 1, 1),
                 ('data', 'seq', 'model'))
    data8 = NamedSharding(mesh8, P('data'))

    # --- generate-codes: the production encode program at batch 352 ---
    from viewformer_tpu.commands.generate_codes import LatentCodeTransformer
    lct = LatentCodeTransformer(cmodel, cvars_s, batch_size=352)
    img_in = jax.ShapeDtypeStruct((352, 128, 128, 3), jnp.uint8, sharding=data8)
    compile_leg('generate_codes_encode_dp8', lct._encode.func,
                (repl(lct.variables, mesh8), img_in), mesh8,
                expect_mosaic=False)  # conv towers + quantizer, no Mosaic

    # --- ServingSession: context prefill (_start) and render steps ---
    from viewformer_tpu.serve import ServingSession
    session = ServingSession(tmodel, tvars_s, cmodel, cvars_s, batch_size=B,
                             max_frames=S - 1)
    T = S - 1
    # serve's host wrapper normalizes images before dispatch, so _start takes
    # f32 [-1,1] frames (serve.py _prepare_images)
    simg_in = jax.ShapeDtypeStruct((B, T, 128, 128, 3), jnp.float32,
                                   sharding=data8)
    scam_in = jax.ShapeDtypeStruct((B, T, 7), jnp.float32, sharding=data8)
    tparams_s = session._tparams
    cvars_sess = session._cvars
    compile_leg('serve_start_prefill_dp8', session._start_fn,
                (repl(tparams_s, mesh8), repl(cvars_sess, mesh8),
                 simg_in, scam_in),
                mesh8, expect_mosaic=True)

    cache_s, transform_s = jax.eval_shape(
        session._start_fn, tparams_s, cvars_sess,
        jax.ShapeDtypeStruct((B, T, 128, 128, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, T, 7), jnp.float32))

    def cache_shard(l):
        # k/v are [n_layer, B, H, F, L, dh]; 'n' is a replicated scalar
        if l.ndim >= 2 and l.shape[1] == B:
            spec = P(None, 'data')
        elif l.ndim >= 1 and l.shape[0] == B:
            spec = P('data')
        else:
            spec = P()
        return jax.ShapeDtypeStruct(l.shape, l.dtype,
                                    sharding=NamedSharding(mesh8, spec))

    cache_in = jax.tree.map(cache_shard, cache_s)
    transform_in = jax.ShapeDtypeStruct(transform_s.shape, transform_s.dtype,
                                        sharding=data8)
    qcams_in = jax.ShapeDtypeStruct((B, 1, 7), jnp.float32, sharding=data8)
    compile_leg('serve_render_dp8', session._render_fn,
                (repl(tparams_s, mesh8), repl(cvars_sess, mesh8),
                 cache_in, transform_in, qcams_in),
                mesh8, expect_mosaic=False)  # single-frame branch is dense

    # --- ServingSession observe (extend_cache: encode one frame + one
    # context pass appending K/V) and localize (loc-branch pass + pose head)
    # — round-5 directive #4: the observe leg was absent from r04's AOT set
    # (and serve had never executed multi-device at all; the dryrun now runs
    # it, this proves the full-size programs compile for a real v5e-8) ---
    oimg_in = jax.ShapeDtypeStruct((B, 128, 128, 3), jnp.float32,
                                   sharding=data8)
    ocam_in = jax.ShapeDtypeStruct((B, 7), jnp.float32, sharding=data8)
    compile_leg('serve_observe_dp8', session._observe_fn,
                (repl(tparams_s, mesh8), repl(cvars_sess, mesh8),
                 cache_in, transform_in, oimg_in, ocam_in),
                mesh8, expect_mosaic=False)  # single-frame pass is dense
    compile_leg('serve_localize_dp8', session._localize_fn,
                (repl(tparams_s, mesh8), repl(cvars_sess, mesh8),
                 cache_in, transform_in, oimg_in),
                mesh8, expect_mosaic=False)

    out = os.path.join(REPO, 'LOWERING_TPU_r05.json')
    report['ok'] = True
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print('wrote', out)


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

"""MIGT — Masked Image Generation Transformer over branched token streams.

Parity target: /root/reference/viewformer/models/migt.py (TF/Keras). A
GPT-2-small-class transformer whose layers process up to three tied-weight
streams through branching block attention (ops/branching_attention.py):

  stream 0 (context):  wte(tokens) + wpe + pose_mlp(pose)         per frame
  stream 1 (generate): wte(mask_token) + wpe + pose_mlp(query)    per frame
  stream 2 (localize): wte(tokens) + wpe + wte(loc_token)         per frame

One forward pass supplies every training loss and, at eval, predictions for
ALL context sizes at once (the multictx trick). Inference is single-shot:
mask-token frame in, argmax over logits out — no autoregressive loop.

Functional/TPU redesign vs the reference:
  - losses take the global `step` as an argument (drives the
    localization_weight schedule) instead of reading a hidden train counter;
  - random pose-multiplier augmentation and dropout use explicit flax rngs;
  - stream assembly is static python (no tf.cond soup): the set of streams is
    decided by which inputs are present, each combination a separate jit
    specialization with fixed shapes.

Checkpoint-import quirks preserved on purpose:
  - c_attn output chunks are (v, q, k) in that order (ref migt.py:207-213);
  - attention has no 1/sqrt(d_head) scaling (ref branching_attention.py:7);
  - wpe is statically sized 256 regardless of token_image_size
    (ref migt.py:305-315);
  - mask_token = n_embeddings, localization_token = n_embeddings + 1.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import MIGTConfig
from ..ops.branching_attention import multi_end_block_attention
from ..utils import geometry_jax as geometry

LAYER_NORM_EPS = 1e-5
WPE_STATIC_SIZE = 256


def _maybe_dropout(module, x, rate, deterministic, impl):
    """Dropout with selectable noise implementation: 'rng' (jax.random,
    default) or 'hash' (ops/dropout.py — RNG-primitive-free; kept for
    compiler bisection and to mirror the fused kernels' in-kernel noise)."""
    if rate <= 0 or deterministic:
        return x
    key = module.make_rng('dropout')
    if impl == 'hash':
        from ..ops.dropout import hash_dropout
        return hash_dropout(key, x, rate)
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


class MLP(nn.Module):
    d_inner: int
    d_output: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    dropout_impl: str = 'rng'

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.d_inner, dtype=self.dtype,
                     kernel_init=nn.initializers.truncated_normal(0.02), name='c_fc')(x)
        # remat-policy anchor (train/transformer.resolve_remat_policy
        # 'attn_mlp'): saving the pre-gelu c_fc output skips the block's
        # widest matmul in backward recompute; gelu/c_proj replay from it.
        h = checkpoint_name(h, 'mlp_fc')
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_output, dtype=self.dtype,
                     kernel_init=nn.initializers.truncated_normal(0.02), name='c_proj')(h)
        h = _maybe_dropout(self, h, self.dropout, deterministic, self.dropout_impl)
        return h


class BranchingAttention(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    dropout_impl: str = 'rng'

    @nn.compact
    def __call__(self, streams, deterministic=True):
        d, h = self.d_model, self.n_head
        dh = d // h
        c_attn = nn.Dense(3 * d, dtype=self.dtype,
                          kernel_init=nn.initializers.truncated_normal(0.02), name='c_attn')
        c_proj = nn.Dense(d, dtype=self.dtype,
                          kernel_init=nn.initializers.truncated_normal(0.02), name='c_proj')

        def split_heads(x):  # [B, T, L, d] -> [B, H, T, L, dh]
            B, T, L, _ = x.shape
            return x.reshape(B, T, L, h, dh).transpose(0, 3, 1, 2, 4)

        vs, qs, ks = [], [], []
        for x in streams:
            v, q, k = jnp.split(c_attn(x), 3, axis=-1)  # reference chunk order
            vs.append(split_heads(v))
            qs.append(split_heads(q))
            ks.append(split_heads(k))

        dropout_rng = None
        if not deterministic and self.dropout > 0:
            dropout_rng = self.make_rng('dropout')
        outs = multi_end_block_attention(tuple(ks), tuple(vs), tuple(qs),
                                         dropout_rate=0.0 if deterministic else self.dropout,
                                         dropout_rng=dropout_rng,
                                         dropout_impl=self.dropout_impl)
        # remat-policy anchor ('attn'/'attn_mlp' in resolve_remat_policy):
        # saving the attention kernel's raw outputs means backward never
        # re-runs the fused forward kernel — its vjp only needs q/k/v, which
        # replay from one c_attn matmul of the (structurally saved) block
        # input. ~75MB/stream/layer at the full-size recipe, vs 'dots'
        # saving every matmul output (~25GB, exceeds HBM — measured OOM).
        outs = tuple(checkpoint_name(o, 'attn_out') for o in outs)

        def merge_heads(x):  # [B, H, T, L, dh] -> [B, T, L, d]
            B, H, T, L, _ = x.shape
            return x.transpose(0, 2, 3, 1, 4).reshape(B, T, L, d)

        outputs = []
        for out in outs:
            y = c_proj(merge_heads(out).astype(self.dtype))
            y = _maybe_dropout(self, y, self.dropout, deterministic, self.dropout_impl)
            outputs.append(y)
        return outputs


class Block(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    dropout_impl: str = 'rng'

    @nn.compact
    def __call__(self, streams, deterministic=True):
        ln_1 = nn.LayerNorm(epsilon=LAYER_NORM_EPS, dtype=self.dtype, name='ln_1')
        ln_2 = nn.LayerNorm(epsilon=LAYER_NORM_EPS, dtype=self.dtype, name='ln_2')
        attn = BranchingAttention(self.d_model, self.n_head, self.dropout,
                                  dtype=self.dtype, dropout_impl=self.dropout_impl,
                                  name='attn')
        mlp = MLP(4 * self.d_model, self.d_model, self.dropout,
                  dtype=self.dtype, dropout_impl=self.dropout_impl, name='mlp')
        normed = [ln_1(x) for x in streams]
        attended = attn(normed, deterministic=deterministic)
        streams = [x + a for x, a in zip(streams, attended)]
        streams = [x + mlp(ln_2(x), deterministic=deterministic) for x in streams]
        return streams


class QuaternionPoseRepresentation(nn.Module):
    """Pose head: d_model -> 7 (xyz + quaternion), float32 island
    (ref migt.py:132-179)."""
    d_model: int
    position_multiplier: float = 1.0

    def setup(self):
        self.pose_classifier = MLP(self.d_model * 2, 7, dtype=jnp.float32,
                                   name='pose_classifier')

    def get_model_input(self, poses, pose_multiplier=None):
        xyz, quaternion = poses[..., :3], poses[..., 3:]
        xyz = xyz * self.position_multiplier
        if pose_multiplier is not None:
            xyz = xyz * pose_multiplier.reshape((-1,) + (1,) * (xyz.ndim - 1))
        return jnp.concatenate([xyz, quaternion], axis=-1)

    def __call__(self, hidden, targets=None, skip_first=None, pose_multiplier=None):
        raw = self.pose_classifier(hidden.astype(jnp.float32))
        xyz, quaternion = raw[..., :3], raw[..., 3:]
        if pose_multiplier is not None:
            xyz = xyz / pose_multiplier.reshape((-1,) + (1,) * (xyz.ndim - 1))
        qn = geometry.quaternion_remove_sign(geometry.quaternion_normalize(quaternion))
        output = jnp.concatenate([xyz / self.position_multiplier, qn], -1)
        if targets is None:
            return output
        scale = jnp.asarray([self.position_multiplier] * 3 + [1.0] * 4, jnp.float32)
        targets = targets.astype(jnp.float32) * scale
        position_loss = jnp.mean((targets[..., :3] - xyz) ** 2, -1)
        orientation_loss = jnp.mean((targets[..., 3:] - quaternion) ** 2, -1)
        if skip_first:
            position_loss = position_loss[:, skip_first:]
            orientation_loss = orientation_loss[:, skip_first:]
        position_loss = jnp.mean(position_loss, axis=tuple(range(1, position_loss.ndim)))
        orientation_loss = jnp.mean(orientation_loss, axis=tuple(range(1, orientation_loss.ndim)))
        return output, position_loss, orientation_loss

    def reduce(self, poses, axis=-2):
        """Mean-combine per-token pose predictions (quaternion eigen-free
        normalize-mean, ref migt.py:123-129,150-154)."""
        xyz, quat = poses[..., :3], poses[..., 3:]
        xyz = jnp.mean(xyz, axis)
        quat = geometry.quaternion_remove_sign(geometry.quaternion_normalize(quat))
        quat = jnp.mean(quat, axis)
        quat = geometry.quaternion_remove_sign(geometry.quaternion_normalize(quat))
        return jnp.concatenate([xyz, quat], -1)


def cross_entropy_with_label_smoothing(labels, logits, label_smoothing=0.0):
    """Per-position CE in float32 (ref migt.py:99-104)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    n_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    if label_smoothing > 0:
        target = target * (1.0 - label_smoothing) + label_smoothing / n_classes
    return -jnp.sum(target * log_probs, axis=-1)


def _sp_constrain(streams, sp_axis):
    """Context parallelism: pin each residual stream [B, T, L, d] to
    P('data', sp_axis) — batch over the data axis, FRAMES over the sequence
    axis. GSPMD propagates the layout through the position-wise work (LN,
    MLP, embeddings, dropout stay fully sharded) and inserts the K/V
    all-gather over `sp_axis` inside attention, where frames attend across
    the shard boundary. Outside a mesh context (e.g. params init on CPU,
    single-device debug) the constraint is skipped — it is a pure layout
    annotation, so values are unaffected."""
    from ..parallel.mesh import current_mesh
    if sp_axis is None or current_mesh() is None:
        return streams
    from jax.sharding import PartitionSpec as P
    return [jax.lax.with_sharding_constraint(
        x, P('data', sp_axis, *([None] * (x.ndim - 2)))) for x in streams]


class MIGT(nn.Module):
    config: MIGTConfig
    dtype: Any = jnp.float32
    dropout_impl: str = 'rng'
    remat: bool = False
    # jax.checkpoint policy for the per-block remat (None = save nothing,
    # recompute the whole block in backward). Policies that save the matmul
    # outputs (e.g. jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    # keep the per-block remat STRUCTURE — which is what the axon backend
    # needs to compile the full-size backward graph at all (see
    # tools/repro_rng_backward_crash.py) — while skipping most of the
    # recompute FLOPs. Gradients are bitwise-identical either way; only
    # memory/time trade off.
    remat_policy: Any = None
    # context parallelism: mesh axis name to shard the residual streams'
    # frame dimension over (None = off; see _sp_constrain). A scaling
    # extension beyond the reference, like the 'model' axis in
    # parallel/sharding.py.
    sp_axis: Any = None

    @property
    def mask_token(self):
        return self.config.n_embeddings

    @property
    def localization_token(self):
        return self.config.n_embeddings + 1

    def setup(self):
        cfg = self.config
        self.wte = nn.Embed(cfg.n_embeddings + 2, cfg.d_model,
                            embedding_init=nn.initializers.truncated_normal(0.02),
                            param_dtype=jnp.float32, name='wte')
        self.wpe = self.param('wpe', nn.initializers.truncated_normal(0.02),
                              (WPE_STATIC_SIZE, cfg.d_model), jnp.float32)
        self.pose_embedding = MLP(cfg.d_model * 2, cfg.d_model, dtype=jnp.float32,
                                  name='pose_embedding')
        block_cls = (nn.remat(Block, static_argnums=(2,), policy=self.remat_policy)
                     if self.remat else Block)
        self.h = [block_cls(cfg.d_model, cfg.n_head, cfg.dropout, dtype=self.dtype,
                            dropout_impl=self.dropout_impl, name=f'h_{i}')
                  for i in range(cfg.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=LAYER_NORM_EPS, dtype=self.dtype, name='ln_f')
        self.pose_criterion = QuaternionPoseRepresentation(
            cfg.d_model, position_multiplier=cfg.pose_multiplier, name='pose_criterion')
        if cfg.use_dynamic_pose_loss:
            self.pos_ori_weights = self.param(
                'pos_ori_weights', lambda key: jnp.asarray([0.0, -3.0], jnp.float32))
        self.use_localization = not cfg.localization_weight.is_zero()

    def _position_embeds(self, L):
        return self.wpe[:L][None, None, :, :]

    def __call__(self, poses, input_ids, localization_tokens=None, output_poses=None,
                 *, compute_losses=False, deterministic=True, step=0):
        """poses [B,T,7] f32; input_ids [B,T,h,w] int; optional
        localization_tokens [B,T',h,w], output_poses [B,T,7].

        Returns a dict: logits [B,T,h,w,n_embeddings], loss terms, optional
        pose_prediction [B,T*,L,7], hidden_states."""
        cfg = self.config
        B, T_in = input_ids.shape[:2]
        grid = input_ids.shape[2:]
        L = int(grid[0]) * int(grid[1]) if len(grid) == 2 else int(grid[0])
        tokens = input_ids.reshape(B, T_in, L)

        # train-time random pose-scale augmentation (ref migt.py:351-353)
        if not deterministic and cfg.random_pose_multiplier != 1.0:
            u = jax.random.uniform(self.make_rng('pose_noise'), (B,), jnp.float32, -1.0, 1.0)
            random_pose_multiplier = jnp.asarray(cfg.random_pose_multiplier, jnp.float32) ** u
        else:
            random_pose_multiplier = jnp.ones((B,), jnp.float32)

        pose_embeds = self.pose_embedding(
            self.pose_criterion.get_model_input(poses.astype(jnp.float32),
                                                random_pose_multiplier))
        pose_embeds = pose_embeds[:, :, None, :]  # [B, T_p, 1, d]
        position_embeds = self._position_embeds(L)
        inputs_embeds = self.wte(tokens)

        localization_embeds = None
        output_pose_embeds = None
        if compute_losses:
            if localization_tokens is None and self.use_localization:
                localization_tokens = tokens
                localization_embeds = inputs_embeds
            if output_poses is None:
                output_poses = poses
                output_pose_embeds = pose_embeds
        if localization_tokens is not None and localization_embeds is None:
            localization_embeds = self.wte(
                localization_tokens.reshape(B, localization_tokens.shape[1], L))
        if output_poses is not None and output_pose_embeds is None:
            output_pose_embeds = self.pose_embedding(
                self.pose_criterion.get_model_input(output_poses.astype(jnp.float32),
                                                    random_pose_multiplier))[:, :, None, :]

        # eval-only: frames of stream 0 beyond the provided poses get the
        # localization-token embedding as their "pose" (ref migt.py:387-390)
        loc_seq_size = T_in - pose_embeds.shape[1]
        if self.use_localization and not compute_losses and loc_seq_size > 0:
            loc_embed = self.wte(jnp.asarray(self.localization_token))[None, None, None, :]
            loc_embed = jnp.broadcast_to(
                loc_embed, (B, loc_seq_size, 1, cfg.d_model))
            pose_embeds = jnp.concatenate([pose_embeds, loc_embed], 1)

        streams = [inputs_embeds + position_embeds + pose_embeds]
        gen_pointer, loc_pointer = 0, 0
        if output_pose_embeds is not None:
            mask_embed = self.wte(jnp.asarray(self.mask_token))[None, None, None, :]
            streams.append(mask_embed + position_embeds + output_pose_embeds)
            gen_pointer = len(streams) - 1
        if localization_embeds is not None:
            loc_embed = self.wte(jnp.asarray(self.localization_token))[None, None, None, :]
            streams.append(localization_embeds + position_embeds + loc_embed)
            loc_pointer = len(streams) - 1

        streams = [_maybe_dropout(self, x.astype(self.dtype), cfg.dropout,
                                  deterministic, self.dropout_impl)
                   for x in streams]
        streams = _sp_constrain(streams, self.sp_axis)
        for block in self.h:
            streams = block(streams, deterministic)
            streams = _sp_constrain(streams, self.sp_axis)
        streams = [self.ln_f(x) for x in streams]

        output = {'hidden_states': streams}
        # tied output embedding, truncated to real vocabulary (ref migt.py:417).
        # bf16 operands + f32 accumulation: full MXU rate, f32 logits for CE
        lm_logits = jnp.einsum('btld,vd->btlv', streams[gen_pointer],
                               self.wte.embedding[:cfg.n_embeddings].astype(self.dtype),
                               preferred_element_type=jnp.float32)
        lm_logits = lm_logits.astype(jnp.float32)

        loss = 0.0
        if compute_losses:
            ce = cross_entropy_with_label_smoothing(tokens, lm_logits, cfg.label_smoothing)
            ce = ce[:, cfg.n_loss_skip:]
            ce_loss = jnp.mean(ce, axis=(1, 2))
            output['ce_loss'] = ce_loss
            loss = loss + ce_loss * cfg.image_generation_weight

        if self.use_localization:
            poses_hidden = streams[loc_pointer]
            if compute_losses:
                gt = poses[:, :, None, :]
                poses_out, pos_loss, ori_loss = self.pose_criterion(
                    poses_hidden, gt, skip_first=cfg.n_loss_skip,
                    pose_multiplier=random_pose_multiplier)
                if cfg.use_dynamic_pose_loss:
                    losses = jnp.stack([jnp.mean(pos_loss), jnp.mean(ori_loss)], -1)
                    pose_loss = jnp.sum(self.pos_ori_weights +
                                        jnp.exp(-self.pos_ori_weights) * losses)
                    output['dynamic_loss_weight_pos'] = self.pos_ori_weights[0]
                    output['dynamic_loss_weight_ori'] = self.pos_ori_weights[1]
                else:
                    pose_loss = pos_loss + ori_loss
                localization_weight = cfg.localization_weight.with_total_steps(
                    cfg.total_steps)(jnp.asarray(step, jnp.float32))
                loss = loss + pose_loss * localization_weight
                output.update(pose_loss=pose_loss, pose_pos_loss=pos_loss,
                              pose_ori_loss=ori_loss,
                              localization_weight=localization_weight)
            else:
                poses_out = self.pose_criterion(
                    poses_hidden, pose_multiplier=random_pose_multiplier)
            output['pose_prediction'] = poses_out

        output['logits'] = lm_logits.reshape(input_ids.shape[:2] + grid + (cfg.n_embeddings,))
        output['loss'] = loss
        return output

    def reduce_cameras(self, cameras, axis=-2):
        return self.pose_criterion.reduce(cameras, axis=axis)

"""Optimizer: AdamW with Swin layer-wise LR decay and selective weight decay.

Capability parity with the reference:
  * SwinLayerDecayOptimizerConstructor (models/optimizer.py:35-104): per-
    parameter lr scale = layer_decay_rate^(num_layers - layer_id - 1), where
    layer_id is derived from the parameter's position in the network
    (patch_embed -> 0, block j of stage i -> 1 + j + sum(stage depths before
    i, each +1 for its patch-merging), downsample of stage i -> cumulative
    boundary, everything else (decoder, heads) -> num_layers - 1);
  * zero weight decay for 1-D params / biases / RPE-MLP /
    relative_position_bias_table / logit_scale (models/optimizer.py:64-74);
  * the polynomial warmup/decay LR schedule computed inline per step in the
    reference (train.py:195-200).

In optax this is a chain: scale_by_adam -> add_decayed_weights(mask) ->
per-parameter static scale tree -> scale_by_learning_rate(schedule), which
reproduces torch AdamW's decoupled update p -= lr*scale*(adam + wd*p).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

NO_DECAY_NAMES = ("relative_position_bias_table", "rpe_fc1", "rpe_fc2",
                  "logit_scale")


def poly_lr_schedule(max_lr: float, min_lr: float, steps_per_epoch: int,
                     epochs: int, power: float = 0.9):
    """Per-step LR: poly warmup for the first half of training then poly
    decay, floored at min_lr (formula of reference train.py:195-200).

    The reference increments global_step before computing the LR, so step
    numbers here are 1-based: pass the optax step count + 1.
    """
    half = epochs // 2
    denom = float(steps_per_epoch * half)

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        frac = step / denom
        warm = (max_lr - min_lr) * jnp.power(frac, power) + min_lr
        # jnp.power of a negative base is nan; clamp — for frac>=1 only the
        # decay branch is selected anyway.
        decay_frac = jnp.maximum(frac - 1.0, 0.0)
        decay = jnp.maximum(min_lr,
                            (min_lr - max_lr) * jnp.power(decay_frac, power)
                            + max_lr)
        return jnp.where(step < denom, warm, decay)

    return schedule


def swin_layer_id(path: Tuple[str, ...], layers_per_stage: Sequence[int],
                  num_layers: int) -> int:
    """Map a flax param path to its depth index (models/optimizer.py:14-32).

    `layers_per_stage` must already include the +1 patch-merging increment
    for every stage but the last.
    """
    parts = [str(p) for p in path]
    if any(p.startswith("patch_embed") for p in parts) or \
            "absolute_pos_embed" in parts:
        return 0
    for i, p in enumerate(parts):
        if p.startswith("layers_"):
            stage = int(p.split("_")[1])
            rest = parts[i + 1:]
            if rest and rest[0] == "blocks_scan":
                # scanned stage: one leaf covers ALL blocks (leading axis
                # = block index); the caller builds a per-block vector
                return ("scan", 1 + sum(layers_per_stage[:stage]))
            if rest and rest[0].startswith("blocks_"):
                block = int(rest[0].split("_")[1])
                return 1 + block + sum(layers_per_stage[:stage])
            if rest and rest[0] == "downsample":
                return sum(layers_per_stage[:stage + 1])
            break
    return num_layers - 1


def build_layer_scales(params, depths: Sequence[int], layer_decay_rate: float):
    """Pytree of static per-parameter LR scales."""
    layers_per_stage = [d + 1 for d in depths[:-1]] + [depths[-1]]
    num_layers = sum(layers_per_stage) + 2   # + patch embed, head
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def scale_of(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "idx", str(k)))
                     for k in path)
        lid = swin_layer_id(keys, layers_per_stage, num_layers)
        if isinstance(lid, tuple):          # scanned stage: leading axis
            base = lid[1]                   # = block index within the stage
            depth = leaf.shape[0]
            vec = jnp.asarray(
                [layer_decay_rate ** (num_layers - (base + j) - 1)
                 for j in range(depth)], jnp.float32)
            return vec.reshape((depth,) + (1,) * (leaf.ndim - 1))
        return layer_decay_rate ** (num_layers - lid - 1)

    scales = {jax.tree_util.keystr(p): scale_of(p, l) for p, l in flat}
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [scale_of(p, l) for p, l in flat]), scales


def weight_decay_mask(params):
    """True where weight decay applies (models/optimizer.py:64-74): skip 1-D
    params, biases, and the RPE/logit-scale parameters."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def decay(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        # scanned-stage leaves carry a leading (depth,) block axis that
        # does not count toward the parameter's own rank
        ndim = leaf.ndim - 1 if "blocks_scan" in keys else leaf.ndim
        if ndim <= 1:
            return False
        if any(nd in k for nd in NO_DECAY_NAMES for k in keys):
            return False
        return True

    return jax.tree_util.tree_unflatten(
        treedef, [decay(p, l) for p, l in flat])


def frozen_stage_scales(params, frozen_stages: int):
    """0/1 pytree: 0 for parameters frozen by `frozen_stages` (reference
    swin_transformer_v2.py:1201-1216 requires_grad=False semantics):
    fs>=0 freezes patch_embed, fs>=1 absolute_pos_embed, fs>=i+2 stage i.
    Applied AFTER add_decayed_weights so it zeroes both the Adam step and
    the weight decay of frozen params (the module's stop_gradient already
    zeroes their grads, but decay would otherwise still shrink them)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def scale(path):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        if frozen_stages >= 0 and any(k.startswith("patch_embed")
                                      for k in keys):
            return 0.0
        if frozen_stages >= 1 and "absolute_pos_embed" in keys:
            return 0.0
        for k in keys:
            if k.startswith("layers_"):
                stage = int(k.split("_")[1])
                if frozen_stages >= stage + 2:
                    return 0.0
        return 1.0

    return jax.tree_util.tree_unflatten(
        treedef, [scale(p) for p, _ in flat])


def _scale_by_tree(scales):
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


class FusedAdamWState(NamedTuple):
    """Optimizer state of the fused update: one step counter plus first /
    second moment pytrees mirroring the param tree (torch-group-like)."""
    count: jnp.ndarray
    m: jnp.ndarray
    v: jnp.ndarray


def _fused_adamw(params, schedule, *, weight_decay: float, b1: float,
                 b2: float, eps: float, scales_tree, frozen_tree):
    """Whole-model AdamW as ONE fused expression per parameter.

    Element-wise identical to the optax chain scale_by_adam ->
    add_decayed_weights(mask) -> scale-by-layer-decay -> [frozen zeroing] ->
    scale_by_learning_rate(schedule), but each leaf's whole update (moment
    updates, bias correction, weight decay, layer-decay lr scale) is a
    single expression that XLA fuses into one HBM-streaming kernel — the
    chain re-streamed every leaf ~5x (docs/PERF.md roadmap item 2).

    The per-leaf constants (weight-decay on/off, layer-decay scale, frozen
    0/1) are python scalars baked into each leaf's expression — NOT
    materialized n-element vectors. A first cut of this transform flattened
    the whole model into one vector with two n-element constant multiplier
    vectors; those were captured into the jitted step as 2.25 GB of
    executable constants at flagship size (jax "large amount of constants"
    warning) and re-sliced per leaf each step. Per-leaf fusion gets the
    same HBM traffic (read g/m/v/p, write m/v/u) without the captures.
    Scanned-stage leaves keep their tiny (depth, 1, ..) per-block scale
    vectors (a few floats each).
    """
    wd_tree = jax.tree.map(lambda m: weight_decay if m else 0.0,
                           weight_decay_mask(params))
    if scales_tree is None:
        comb_tree = jax.tree.map(lambda _: 1.0, params)
    else:
        comb_tree = scales_tree
    if frozen_tree is not None:
        # leaves are python floats or tiny (depth, 1, ..) jnp vectors
        comb_tree = jax.tree.map(lambda s, f: s * f, comb_tree, frozen_tree)

    def init_fn(ps):
        return FusedAdamWState(count=jnp.zeros((), jnp.int32),
                               m=jax.tree.map(jnp.zeros_like, ps),
                               v=jax.tree.map(jnp.zeros_like, ps))

    def update_fn(updates, state, ps=None):
        count_inc = optax.safe_int32_increment(state.count)
        t = count_inc.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(b1, t)
        bc2 = 1.0 - jnp.power(b2, t)
        lr = schedule(state.count)

        def leaf_m(g, m):
            return b1 * m + (1.0 - b1) * g

        def leaf_v(g, v):
            return b2 * v + (1.0 - b2) * (g * g)

        def leaf_u(m2, v2, p, wd, comb):
            adam = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            return (-lr) * comb * (adam + wd * p)

        m2 = jax.tree.map(leaf_m, updates, state.m)
        v2 = jax.tree.map(leaf_v, updates, state.v)
        u = jax.tree.map(leaf_u, m2, v2, ps, wd_tree, comb_tree)
        return u, FusedAdamWState(count=count_inc, m=m2, v=v2)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(params, *, backbone: str, depths: Sequence[int],
                    max_lr: float, min_lr: float, weight_decay: float,
                    layer_decay: float, steps_per_epoch: int, epochs: int,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    frozen_stages: int = -1, fused: bool = True):
    """AdamW + (for swin backbones) layer-decay scaling + poly LR schedule.

    Matches the construction at reference train.py:113-115. For non-swin
    backbones the reference's training loop applies a flat LR
    (train.py:203), so scales collapse to 1. `frozen_stages` zeroes the
    full update (Adam step + weight decay) for frozen swin subtrees.

    fused=True (default) computes each leaf's whole update as one fused
    expression (_fused_adamw; numerically identical — tests/test_optim.py
    pins fused vs unfused to fp32 tolerance). fused=False keeps the
    per-leaf optax chain (its optimizer state mirrors torch param-group
    structure 1:1).
    """
    schedule = poly_lr_schedule(max_lr, min_lr, steps_per_epoch, epochs)
    scales_tree = None
    frozen_tree = None
    if "swin" in backbone:
        scales_tree, _ = build_layer_scales(params, depths, layer_decay)
        if frozen_stages >= 0:
            frozen_tree = frozen_stage_scales(params, frozen_stages)
    if fused:
        return _fused_adamw(params, schedule, weight_decay=weight_decay,
                            b1=b1, b2=b2, eps=eps, scales_tree=scales_tree,
                            frozen_tree=frozen_tree), schedule
    chain = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
             optax.add_decayed_weights(weight_decay, weight_decay_mask(params))]
    if scales_tree is not None:
        chain.append(_scale_by_tree(scales_tree))
        if frozen_tree is not None:
            chain.append(_scale_by_tree(frozen_tree))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain), schedule

"""Optimizer assembly: AdamW + selective trainability + per-layer gating.

Replaces the reference's requires_grad surgery
(ref:train_denoiser.py:475-548, get_trainable_params :71-119) with an optax
mask. Because our FLUX blocks are *stacked* (L, ...) pytrees, per-layer
selection (`flux_train_layer_idx`) is a (L,) 0/1 gate multiplied into the
updates of stacked leaves — frozen layers get exactly zero update while the
scan stays a single fused graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpt_image_edit_tpu.training.config import TrainingConfig, ModelConfig

# image-branch components trained in stage 2 (ref:train_denoiser.py:78-94)
DUAL_IMG_BRANCH = (
    "attn/norm_q", "attn/norm_k", "attn/to_q", "attn/to_k", "attn/to_v",
    "attn/to_out", "norm1/linear",
)
DUAL_FULL_EXTRA = (
    "norm1_context/linear", "attn/norm_added_q", "attn/norm_added_k",
    "ff/", "ff_context/",
)
SINGLE_IMG_BRANCH = (
    "attn/norm_q", "attn/norm_k", "attn/to_q", "attn/to_k", "attn/to_v",
    "norm/linear",
)
SINGLE_FULL_EXTRA = ("proj_mlp", "proj_out")


def _leaf_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        for kp, _ in flat
    ]
    return paths, [leaf for _, leaf in flat], treedef


def trainable_mask(params, model_cfg: ModelConfig):
    """Boolean pytree: True = trainable. `params` is {'qwen': ..., 'flux': ...}."""
    paths, leaves, treedef = _leaf_paths(params)

    def is_trainable(path: str) -> bool:
        if path.startswith("qwen/projector"):
            return model_cfg.only_tune_mlp2 or model_cfg.with_tune_mlp2
        if model_cfg.only_tune_mlp2:
            return False
        if path.startswith("flux/dual_blocks/"):
            comps = DUAL_IMG_BRANCH + (
                () if model_cfg.only_tune_image_branch else DUAL_FULL_EXTRA
            )
            return any(c in path for c in comps)
        if path.startswith("flux/single_blocks/"):
            comps = SINGLE_IMG_BRANCH + (
                () if model_cfg.only_tune_image_branch else SINGLE_FULL_EXTRA
            )
            return any(c in path for c in comps)
        return False  # VLM, embedders, VAE: frozen

    mask = [is_trainable(p) for p in paths]
    return jax.tree_util.tree_unflatten(treedef, mask)


def layer_gates(model_cfg: ModelConfig, num_dual: int, num_single: int):
    """((num_dual,), (num_single,)) 0/1 fp32 gates from flux_train_layer_idx
    (ref yaml: indices 0..18 = dual, 19..56 = single)."""
    idx = model_cfg.flux_train_layer_idx
    if idx is None:
        return np.ones(num_dual, np.float32), np.ones(num_single, np.float32)
    dual = np.zeros(num_dual, np.float32)
    single = np.zeros(num_single, np.float32)
    for i in idx:
        if i < num_dual:
            dual[i] = 1.0
        else:
            single[i - num_dual] = 1.0
    return dual, single


def gate_stacked_updates(updates, dual_gate, single_gate):
    """Zero updates of frozen layers inside stacked (L, ...) leaves."""
    paths, leaves, treedef = _leaf_paths(updates)
    out = []
    for path, leaf in zip(paths, leaves):
        if leaf is None or not hasattr(leaf, "ndim"):
            out.append(leaf)
            continue
        if "flux/dual_blocks/" in path and leaf.ndim >= 1:
            g = jnp.asarray(dual_gate).reshape((-1,) + (1,) * (leaf.ndim - 1))
            out.append(leaf * g.astype(leaf.dtype))
        elif "flux/single_blocks/" in path and leaf.ndim >= 1:
            g = jnp.asarray(single_gate).reshape((-1,) + (1,) * (leaf.ndim - 1))
            out.append(leaf * g.astype(leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def decay_mask(params) -> "jax.tree_util.PyTreeDef":
    """True where weight decay applies: 2D+ 'kernel' leaves. Biases, norm
    scales and embeddings stay decay-free — the reference's UniVATrainer
    decay/no-decay grouping (ref:univa/training/trainer.py:4-35)."""
    paths, leaves, treedef = _leaf_paths(params)
    mask = [
        p.endswith("kernel") and hasattr(l, "ndim") and l.ndim >= 2
        for p, l in zip(paths, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, mask)


def lr_schedule(cfg: TrainingConfig):
    if cfg.lr_scheduler == "constant":
        base = optax.schedules.constant_schedule(cfg.learning_rate)
    elif cfg.lr_scheduler == "cosine":
        base = optax.schedules.cosine_decay_schedule(
            cfg.learning_rate, max(cfg.max_train_steps - cfg.lr_warmup_steps, 1)
        )
    elif cfg.lr_scheduler == "linear":
        base = optax.schedules.linear_schedule(
            cfg.learning_rate, 0.0, max(cfg.max_train_steps - cfg.lr_warmup_steps, 1)
        )
    else:
        raise ValueError(cfg.lr_scheduler)
    if cfg.lr_warmup_steps > 0:
        warm = optax.schedules.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)
        return optax.schedules.join_schedules([warm, base], [cfg.lr_warmup_steps])
    return base


def build_optimizer(params, train_cfg: TrainingConfig, model_cfg: ModelConfig,
                    num_dual: int, num_single: int):
    """Returns (tx, mask_tree).

    The returned tx operates on the *trainable subtree* produced by
    train_step.partition_params(params, mask) — frozen leaves are pruned
    (None), so optimizer state only exists for trainable params (the ZeRO
    'only shard what trains' effect falls out for free)."""
    mask = trainable_mask(params, model_cfg)
    dual_gate, single_gate = layer_gates(model_cfg, num_dual, num_single)

    if train_cfg.optimizer == "adamw":
        inner = optax.adamw(
            learning_rate=lr_schedule(train_cfg),
            b1=train_cfg.adam_beta1,
            b2=train_cfg.adam_beta2,
            eps=train_cfg.adam_epsilon,
            weight_decay=train_cfg.adam_weight_decay,
            # weight decay applies to matmul kernels only, never biases or
            # norm scales — the reference's UniVATrainer decay/no-decay param
            # grouping (ref:univa/training/trainer.py:4-35)
            mask=decay_mask,
        )
    elif train_cfg.optimizer == "adafactor":
        inner = optax.adafactor(learning_rate=lr_schedule(train_cfg))
    elif train_cfg.optimizer == "prodigy":
        from gpt_image_edit_tpu.training.prodigy import prodigy

        inner = prodigy(
            learning_rate=train_cfg.learning_rate,
            betas=(train_cfg.adam_beta1, train_cfg.adam_beta2),
            eps=train_cfg.adam_epsilon,
            weight_decay=train_cfg.adam_weight_decay,
        )
    else:
        raise ValueError(f"unknown optimizer {train_cfg.optimizer}")

    def _gate_transform():
        def init_fn(params_):
            return optax.EmptyState()

        def update_fn(updates, state, params_=None):
            return gate_stacked_updates(updates, dual_gate, single_gate), state

        return optax.GradientTransformation(init_fn, update_fn)

    chain = [optax.clip_by_global_norm(train_cfg.max_grad_norm), inner, _gate_transform()]
    tx = optax.chain(*chain)
    if train_cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, train_cfg.gradient_accumulation_steps)
    return tx, mask

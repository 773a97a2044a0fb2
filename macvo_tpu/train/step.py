"""FlowFormerCov training harness: train state, freeze policy, pjit step.

Behavioral parity with the reference trainer (Train/MatchingNet/
train_flowformer.py:47-127): AdamW + OneCycle LR (linear anneal), global-norm
grad clip 1.0, gamma-weighted sequence losses, and the freeze policy — mode
"flow" freezes the cov branch, mode "cov"/"finalcov" trains ONLY the cov
branch (train_flowformer.py:70-78).

TPU-first: instead of ``nn.DataParallel`` (SURVEY.md P4), the step is jitted
under a ``Mesh`` with the batch sharded over the ``data`` axis and parameters
replicated; XLA inserts the gradient ``psum`` over ICI. Scale-out = grow the
mesh; no code change.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.datasets.train import upcast_batch
from ..models.flowformer.network import FlowFormerConfig, FlowFormerCov
from .loss import sequence_loss

COV_BRANCH_MARKERS = ("cov_gru", "cov_head", "cov_mask")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 12.5e-5            # canonical_lr (FlowFormerCovKITTIthings.yaml:61)
    weight_decay: float = 1e-5     # adamw_decay
    clip: float = 1.0
    num_steps: int = 120_000
    warmup_frac: float = 0.05
    gamma: float = 0.85
    max_flow: float = 400.0
    training_mode: str = "cov"     # "flow" | "cov" | "finalcov"
    tail_weight: float = 0.0       # >0: up-weight top-decile-EPE pixels in the cov NLL


def _is_cov_param(path: tuple) -> bool:
    keys = [p.key for p in path if hasattr(p, "key")]
    return any(any(m in k for m in COV_BRANCH_MARKERS) for k in keys)


def trainable_mask(params: Any, training_mode: str) -> Any:
    """Freeze policy (reference: train_flowformer.py:70-78)."""
    if training_mode == "flow":
        pred = lambda path: not _is_cov_param(path)
    else:  # cov / finalcov: train only the cov branch
        pred = lambda path: _is_cov_param(path)
    return jax.tree_util.tree_map_with_path(lambda path, _: pred(path), params)


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    if cfg.num_steps >= 20:
        # Guard the warmup fraction so no schedule interval rounds to zero
        # length (optax's piecewise interpolation divides by interval length).
        pct_start = max(cfg.warmup_frac, 2.0 / cfg.num_steps)
        schedule = optax.linear_onecycle_schedule(
            transition_steps=cfg.num_steps,
            peak_value=cfg.lr,
            pct_start=pct_start,
        )
    else:  # tiny smoke runs: constant lr
        schedule = cfg.lr
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay, eps=1e-8),
    )
    mask = trainable_mask(params, cfg.training_mode)
    # multi_transform, NOT optax.masked: masked passes raw gradients through
    # for the unmasked leaves — frozen parameters must get zero updates.
    labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()}, labels
    )


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: s.tree_flatten(),
    lambda aux, children: TrainState(*children),
)


def create_train_state(
    model: FlowFormerCov, cfg: TrainConfig, rng: jax.Array, sample_shape=(1, 64, 64, 3)
) -> tuple[TrainState, optax.GradientTransformation]:
    probe = jnp.zeros(sample_shape, jnp.float32)
    params = model.init(rng, probe, probe)["params"]
    opt = make_optimizer(cfg, params)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32)), opt


def make_train_step(model: FlowFormerCov, opt: optax.GradientTransformation, cfg: TrainConfig):
    """Returns ``step(state, batch) -> (state, aux)``; batch = dict with
    img1, img2 (B,H,W,3), gt_flow (B,H,W,2), flow_mask (B,H,W,1) or None."""

    def loss_fn(params, batch):
        batch = upcast_batch(batch)   # uint8/f16 shipped batches -> f32 on device
        out = model.apply({"params": params}, batch["img1"], batch["img2"])
        # Head regresses log-sigma; clamp it so an untrained flow branch (huge
        # errors / tiny predicted variance) cannot overflow the NLL to inf.
        cov_var = jnp.exp(2.0 * jnp.clip(out["cov_predictions"], -8.0, 8.0))
        loss, metrics = sequence_loss(
            out["flow_predictions"], cov_var, batch["gt_flow"], batch.get("flow_mask"),
            gamma=cfg.gamma, max_flow=cfg.max_flow, training_mode=cfg.training_mode,
            tail_weight=cfg.tail_weight,
        )
        return loss, metrics

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        aux = {"loss": loss, **metrics}
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), aux

    return step


def shard_batch_spec() -> P:
    return P("data")


def make_sharded_train_step(
    model: FlowFormerCov, opt: optax.GradientTransformation, cfg: TrainConfig, mesh: Mesh
):
    """jit the train step over a mesh: batch sharded on 'data', state replicated.
    XLA inserts the cross-replica gradient psum (SURVEY.md P4 TPU-native)."""
    step = make_train_step(model, opt, cfg)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
    )

"""Training harness tests: freeze policy, loss behavior, sharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macvo_tpu.models.flowformer import FlowFormerConfig, FlowFormerCov
from macvo_tpu.train import (
    TrainConfig,
    cov_loss,
    create_train_state,
    flow_loss,
    make_train_step,
    sequence_loss,
    trainable_mask,
)


@pytest.fixture(scope="module")
def tiny_model():
    return FlowFormerCov(FlowFormerConfig(decoder_depth=1))


def test_loss_weighting():
    """gamma-weighting: later iterations dominate (reference loss.py:4-14)."""
    gt = jnp.zeros((1, 8, 8, 2))
    preds = jnp.stack([jnp.full((1, 8, 8, 2), 1.0), jnp.full((1, 8, 8, 2), 1.0)])
    mask = jnp.ones((1, 8, 8, 1), bool)
    loss = flow_loss(0.85, preds, gt, mask)
    assert float(loss) == pytest.approx(0.85 + 1.0, rel=1e-5)


def test_cov_loss_detaches_error():
    """Only the cov head should receive gradient: d(loss)/d(preds) == 0."""
    gt = jnp.zeros((1, 4, 4, 2))
    preds = jnp.full((2, 1, 4, 4, 2), 0.5)
    covs = jnp.full((2, 1, 4, 4, 2), 1.0)

    g_pred = jax.grad(lambda p: cov_loss(0.85, p, gt, covs)[0])(preds)
    g_cov = jax.grad(lambda c: cov_loss(0.85, preds, gt, c)[0])(covs)
    assert float(jnp.abs(g_pred).max()) == 0.0
    assert float(jnp.abs(g_cov).max()) > 0.0


def test_cov_loss_optimum():
    """NLL minimized when variance == squared error (calibration property)."""
    gt = jnp.zeros((1, 4, 4, 2))
    preds = jnp.full((1, 1, 4, 4, 2), 2.0)   # err^2 = 4
    losses = [
        float(cov_loss(1.0, preds, gt, jnp.full((1, 1, 4, 4, 2), v))[0])
        for v in (1.0, 4.0, 16.0)
    ]
    assert losses[1] < losses[0] and losses[1] < losses[2]


def test_freeze_policy(tiny_model):
    probe = jnp.zeros((1, 32, 32, 3))
    params = tiny_model.init(jax.random.PRNGKey(0), probe, probe)["params"]
    mask_cov = trainable_mask(params, "cov")
    mask_flow = trainable_mask(params, "flow")
    leaves_cov = jax.tree_util.tree_leaves(mask_cov)
    leaves_flow = jax.tree_util.tree_leaves(mask_flow)
    n_cov_trainable = sum(leaves_cov)
    assert 0 < n_cov_trainable < len(leaves_cov)
    # The two modes partition the parameters exactly.
    assert [a != b for a, b in zip(leaves_cov, leaves_flow)] == [True] * len(leaves_cov)


def test_train_step_only_updates_cov_branch(tiny_model):
    tcfg = TrainConfig(num_steps=10, training_mode="cov")
    state, opt = create_train_state(tiny_model, tcfg, jax.random.PRNGKey(0), (1, 32, 48, 3))
    step = jax.jit(make_train_step(tiny_model, opt, tcfg))
    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.random((2, 32, 48, 3)), jnp.float32),
        "img2": jnp.asarray(rng.random((2, 32, 48, 3)), jnp.float32),
        "gt_flow": jnp.asarray(rng.normal(0, 1, (2, 32, 48, 2)), jnp.float32),
        "flow_mask": jnp.ones((2, 32, 48, 1), bool),
    }
    new_state, aux = step(state, batch)
    assert np.isfinite(float(aux["loss"]))

    mask = trainable_mask(state.params, "cov")
    changed = jax.tree_util.tree_map(
        lambda old, new: bool(jnp.any(old != new)), state.params, new_state.params
    )
    for m, c in zip(jax.tree_util.tree_leaves(mask), jax.tree_util.tree_leaves(changed)):
        if not m:
            assert not c, "frozen (flow-branch) parameter changed in cov mode"
    assert any(
        c for m, c in zip(jax.tree_util.tree_leaves(mask), jax.tree_util.tree_leaves(changed)) if m
    ), "no cov-branch parameter changed"

    # Params stay finite over a few more steps (schedule + NLL guards).
    for _ in range(2):
        new_state, aux = step(new_state, batch)
    assert np.isfinite(float(aux["loss"]))

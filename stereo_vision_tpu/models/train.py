"""Sharded training utilities for the neural detectors.

The reference only runs pretrained nets (ultralytics/MediaPipe); training
infrastructure is part of the TPU-native framework surface: flax variable
trees sharded over the (data, space) mesh — batch on ``data`` (dp), wide
feature kernels on ``space`` (tp) — with one jitted optax step. XLA
inserts the psum/all-gather collectives from the shardings.

``__graft_entry__.dryrun_multichip`` drives exactly this path.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_vision_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def shard_variables(mesh: Mesh, variables: dict[str, Any], tp_min_features: int = 128):
    """Place a flax variable tree on the mesh: 2D kernels with a wide output
    dimension shard over ``space`` (tensor parallelism); everything else
    replicates. Returns (sharded variables, matching sharding tree)."""
    repl = NamedSharding(mesh, P())
    tp = NamedSharding(mesh, P(None, SPACE_AXIS))
    n_space = mesh.shape[SPACE_AXIS]

    def pick(path, leaf):
        if (
            leaf.ndim == 2
            and leaf.shape[-1] >= tp_min_features
            and leaf.shape[-1] % n_space == 0
        ):
            return tp
        return repl

    shardings = jtu.tree_map_with_path(pick, variables)
    placed = jax.tree.map(jax.device_put, variables, shardings)
    return placed, shardings


def make_train_step(
    mesh: Mesh,
    apply_fn: Callable[..., Any],
    loss_fn: Callable[[Any, Any], jnp.ndarray],
    tx,
):
    """Build a jitted dp+tp training step.

    Args:
      apply_fn: (variables, batch_inputs) -> model outputs.
      loss_fn: (outputs, batch_targets) -> scalar loss.
      tx: optax transform.

    Returns:
      (init_state, step) where ``init_state(variables)`` shards and wraps
      the tree, and ``step(state, inputs, targets)`` runs one update
      (inputs/targets sharded batch-over-``data``).
    """
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def init_state(variables: dict[str, Any]) -> TrainState:
        params, p_sh = shard_variables(mesh, variables["params"])
        bstats = jax.device_put(
            variables.get("batch_stats", {}),
            jtu.tree_map(lambda _: repl, variables.get("batch_stats", {})),
        )
        opt_state = jax.device_put(
            tx.init(params), jtu.tree_map(lambda _: repl, tx.init(params))
        )
        return TrainState(params, bstats, opt_state, jnp.zeros((), jnp.int32))

    @jax.jit
    def step(state: TrainState, inputs, targets):
        def objective(p):
            out = apply_fn({"params": p, "batch_stats": state.batch_stats}, inputs)
            return loss_fn(out, targets)

        loss, grads = jax.value_and_grad(objective)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda a, b: a + b, state.params, updates)
        return (
            TrainState(params, state.batch_stats, opt_state, state.step + 1),
            loss,
        )

    def run_step(state, inputs, targets):
        return step(
            state,
            jax.device_put(inputs, data_sh),
            jax.device_put(targets, data_sh),
        )

    return init_state, run_step


def put_batch(mesh: Mesh, batch: np.ndarray):
    """Shard a host batch over the ``data`` axis."""
    return jax.device_put(batch, NamedSharding(mesh, P(DATA_AXIS)))

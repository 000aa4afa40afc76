"""Multi-chip problem-batch sharding.

The reference is single-threaded (SURVEY §2.10); the TPU-native scaling axis
is pure data parallelism over a batch of planning problems: per-problem
planner state stays chip-local, shardings ride ICI, and the only collectives
are reductions of best-cost bounds (anytime planners) and benchmark metrics.

Everything in the planner stack is batch-parallel along the leading problem
axis, so sharding the inputs with a NamedSharding over a ('dp',) mesh lets
XLA partition the whole jitted program with no communication in the hot loop.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from vamp_mvt_tpu.planning import rrtc, simplify


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a problem-batched pytree with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def plan_batch_sharded(
    spec,
    mesh: Mesh,
    envs,
    starts,
    goals,
    masks,
    settings: rrtc.RRTCSettings,
):
    """Plan a problem batch sharded across the mesh (B divisible by mesh size)."""
    args = shard_batch(mesh, (envs, starts, goals, masks))
    fn = jax.jit(lambda e, s, g, m: rrtc.plan_batch(spec, e, s, g, m, settings))
    return fn(*args)


def simplify_batch_sharded(spec, mesh: Mesh, envs, paths, lengths, settings):
    args = shard_batch(mesh, (envs, paths, lengths))
    fn = jax.jit(lambda e, p, l: simplify.simplify_batch(spec, e, p, l, settings))
    return fn(*args)

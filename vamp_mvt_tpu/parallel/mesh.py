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


def plan_batch_mega_sharded(
    spec,
    mesh: Mesh,
    envs,
    starts,
    goals,
    masks,
    settings: rrtc.RRTCSettings,
):
    """Megakernel planning with the problem batch sharded over the mesh.

    Each device runs the per-problem Pallas megakernel over its shard; no
    cross-chip communication exists in the hot loop (per-problem planner
    state is chip-local by design, SURVEY §2.10/§5).
    """
    from jax import shard_map

    from vamp_mvt_tpu.planning import rrtc_mega

    axis = mesh.axis_names[0]
    spec_p = PartitionSpec(axis)

    def local(e, s, g, m):
        return rrtc_mega.plan_batch_mega(spec, e, s, g, m, settings)

    fn = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(spec_p, spec_p, spec_p, spec_p),
            out_specs=spec_p,
            check_vma=False,
        )
    )
    args = shard_batch(mesh, (envs, starts, goals, masks))
    return fn(*args)


def init_distributed(**kwargs) -> int:
    """Multi-host scaffold: initialize jax.distributed from the standard env
    (JAX_COORDINATOR_ADDRESS / num_processes / process_id, or TPU pod
    metadata) and return the global device count.

    The reference has no distributed backend (SURVEY §2.10); this is the
    TPU-native entry: after init, every host builds the same global mesh
    with make_mesh() and problem batches shard across all chips, with DCN
    crossed only by the initial shard placement and final gather.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or kwargs:
        jax.distributed.initialize(**kwargs)
    return len(jax.devices())


def aorrtc_restarts_sharded(
    spec,
    mesh: Mesh,
    env,
    start,
    goals,
    settings: rrtc.RRTCSettings,
    rounds: int = 4,
    base_offset: int = 0,
):
    """Anytime refinement with one PHS-informed restart per device and a
    device-side best-cost collective (the SURVEY §5 mandate; reference
    analog aorrtc.hh:476-484 updates `best_path_cost` after each search).

    Every round, each device runs an independent informed RRT-Connect
    restart (distinct deterministic sample offsets) against the globally
    best cost so far, then the costs are pmin-reduced ACROSS the mesh so
    the next round's informed sampler uses the global bound on every chip.
    Returns (best_path, best_length, best_cost, per_round_best_costs).
    """
    from jax import shard_map

    import jax.numpy as jnp

    from vamp_mvt_tpu.planning import simplify as simplify_mod
    from vamp_mvt_tpu.planning.phs import make_phs

    axis = mesh.axis_names[0]
    R = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    d = spec.dimension
    goals = jnp.asarray(goals, jnp.float32).reshape(-1, d)
    G = goals.shape[0]
    mask = jnp.ones(G, bool)
    start = jnp.asarray(start, jnp.float32)

    def local(offsets, phs):
        # offsets: (1,) shard of the per-device sample offsets; phs replicated
        res = rrtc.plan(spec, env, start, goals, mask, settings, offsets[0],
                        phs=phs)
        cost = jnp.where(res.solved, res.cost, jnp.inf)
        best = jax.lax.pmin(cost, axis)          # <- cross-chip collective
        return (
            cost[None], best[None], res.path[None], res.path_length[None],
        )

    fn = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(PartitionSpec(axis), PartitionSpec()),
            out_specs=(
                PartitionSpec(axis), PartitionSpec(axis),
                PartitionSpec(axis), PartitionSpec(axis),
            ),
            check_vma=False,
        )
    )

    # initial (uniform) solution for the first bound
    res0 = jax.jit(
        lambda: rrtc.plan(spec, env, start, goals, mask, settings, base_offset)
    )()
    best_cost = float(np.where(bool(res0.solved), float(res0.cost), np.inf))
    best_path = np.asarray(res0.path)
    best_len = int(res0.path_length)
    history = [best_cost]

    offset = base_offset + int(res0.sample_count)
    for r in range(rounds):
        if not np.isfinite(best_cost):
            diameter = float(np.linalg.norm(
                np.asarray(spec.limits_high) - np.asarray(spec.limits_low)
            ))
        else:
            diameter = best_cost
        offsets = jnp.asarray(
            offset + np.arange(R) * 100003, jnp.int32
        )
        phs = make_phs(np.asarray(start), np.asarray(goals[0]), diameter)
        costs, bests, paths, lens = fn(offsets, phs)
        costs = np.asarray(costs)
        k = int(np.argmin(costs))
        if np.isfinite(costs[k]) and costs[k] < best_cost:
            best_cost = float(costs[k])
            best_path = np.asarray(paths[k])
            best_len = int(np.asarray(lens[k]))
        # device-side pmin result must agree with the host reduction
        assert np.allclose(
            np.asarray(bests)[0], min(np.min(costs), np.inf)
        ) or not np.isfinite(np.min(costs))
        history.append(best_cost)
        offset += R * 100003

    return best_path, best_len, best_cost, history

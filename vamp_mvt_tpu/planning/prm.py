"""PRM / PRM* with batched device validation and host-side graph search.

Re-derivation of the reference's incremental PRM (src/impl/vamp/planning/
prm.hh:22-301): sample -> config validity -> k/r-nearest neighbors -> edge
validation -> union-find components -> A* once start and a goal share a
component.

TPU redesign: sampling and ALL collision checking run on device in waves —
one fused kernel validates a whole wave of configurations, one more validates
every candidate edge of the wave (the reference validates them one by one) —
while the union-find/A* graph bookkeeping stays on the host, which is where
branchy pointer-chasing belongs (SURVEY §7 hard part 5).  Within a wave,
neighbor candidates are the nodes existing before the wave (the reference
inserts samples one at a time; the wave form is the standard batch-PRM
relaxation with the same asymptotic properties).

Neighbor schedules mirror reference roadmap.hh: PRM* log-k + measure-based
radius (roadmap.hh:42-77).
"""

from __future__ import annotations

import dataclasses
import heapq
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.ops.fkcc import fkcc
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots.spec import RobotSpec
from vamp_mvt_tpu.sampling.halton import halton


def unit_ball_measure(dim: int) -> float:
    return math.sqrt(math.pi) ** dim / math.gamma(dim / 2.0 + 1.0)


@dataclasses.dataclass(frozen=True)
class PRMStarNeighborParams:
    """Reference roadmap.hh:42-77."""

    dim: int
    space_measure: float
    gamma_scale: float = 2.0

    def max_neighbors(self, num_states: int) -> int:
        c = math.e + math.e / self.dim
        return int(math.ceil(c * math.log(max(num_states, 2))))

    def neighbor_radius(self, num_states: int) -> float:
        inv_d = 1.0 / self.dim
        ratio = self.space_measure / unit_ball_measure(self.dim)
        c = 2.0 * (1.0 + inv_d) ** inv_d * ratio**inv_d
        n = max(num_states, 2)
        return self.gamma_scale * c * (math.log(n) / n) ** inv_d


@dataclasses.dataclass(frozen=True)
class ConstantNeighborParams:
    k: int = 2**31
    r: float = float("inf")

    def max_neighbors(self, num_states: int) -> int:
        return self.k

    def neighbor_radius(self, num_states: int) -> float:
        return self.r


@dataclasses.dataclass(frozen=True)
class PRMSettings:
    max_iterations: int = 100000
    max_samples: int = 4096
    wave: int = 64  # samples validated per fused device call
    neighbor_params: object = None


class Roadmap(NamedTuple):
    """Exported roadmap (reference plan.hh:181-188 / prm.hh build_roadmap)."""

    vertices: np.ndarray  # (N, d)
    edges: list           # list of (i, j) tuples


class PRMResult(NamedTuple):
    solved: bool
    path: np.ndarray       # (L, d)
    cost: float
    iterations: int
    size: int


class _UnionFind:
    def __init__(self):
        self.parent = []
        self.size = []

    def add(self):
        self.parent.append(len(self.parent))
        self.size.append(1)
        return len(self.parent) - 1

    def find(self, i):
        while self.parent[i] != i:
            self.parent[i] = self.parent[self.parent[i]]
            i = self.parent[i]
        return i

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]


def _astar(nodes, adj, start_idx, goal_idx):
    """Host A* (reference planning/utils.hh:76-142)."""
    n = len(nodes)
    g = np.full(n, np.inf)
    parent = np.full(n, -1, dtype=np.int64)
    goal = nodes[goal_idx]
    h = np.linalg.norm(nodes - goal, axis=1)
    g[start_idx] = 0.0
    pq = [(h[start_idx], start_idx)]
    closed = np.zeros(n, bool)
    while pq:
        f, u = heapq.heappop(pq)
        if closed[u]:
            continue
        closed[u] = True
        if u == goal_idx:
            path = [u]
            while parent[path[-1]] >= 0:
                path.append(int(parent[path[-1]]))
            return list(reversed(path)), float(g[u])
        for v, w in adj[u]:
            if g[u] + w < g[v]:
                g[v] = g[u] + w
                parent[v] = u
                heapq.heappush(pq, (g[v] + h[v], v))
    return None, float("inf")


def _make_device_fns(spec: RobotSpec, env: Environment, settings: PRMSettings):
    lows = jnp.asarray(spec.limits_low)
    spans = jnp.asarray(spec.limits_high - spec.limits_low)
    span = float(np.linalg.norm(spec.limits_high - spec.limits_low))
    num_long = validate_mod.n_points_bound(spec, span)

    @jax.jit
    def sample_valid(offset):
        unit = halton(offset + jnp.arange(settings.wave), spec.dimension)
        q = unit * spans + lows
        ok = fkcc(spec, env, q)
        return q, ok

    @jax.jit
    def validate_edges(starts, goals):
        return validate_mod.validate_motion_batch(spec, env, starts, goals, num_long)

    @jax.jit
    def validate_single(s, g):
        return validate_mod.validate_motion(spec, env, s, g, num_long)

    return sample_valid, validate_edges, validate_single


def solve(
    spec: RobotSpec,
    env: Environment,
    start: np.ndarray,
    goals: np.ndarray,
    settings: PRMSettings | None = None,
    sample_offset: int = 0,
) -> PRMResult:
    """PRM solve: grow until start and any goal share a component."""
    if settings is None:
        settings = PRMSettings(
            neighbor_params=PRMStarNeighborParams(spec.dimension, spec.space_measure())
        )
    np_params = settings.neighbor_params or PRMStarNeighborParams(
        spec.dimension, spec.space_measure()
    )
    sample_valid, validate_edges, validate_single = _make_device_fns(
        spec, env, settings
    )

    start = np.asarray(start, np.float32)
    goals = np.asarray(goals, np.float32).reshape(-1, spec.dimension)

    # straight-line check (prm.hh:57-70)
    for gi, g in enumerate(goals):
        if bool(validate_single(jnp.asarray(start), jnp.asarray(g))):
            cost = float(np.linalg.norm(g - start))
            return PRMResult(True, np.stack([start, g]), cost, 0, 2)

    nodes = [start] + [g for g in goals]
    uf = _UnionFind()
    for _ in nodes:
        uf.add()
    adj: list[list] = [[] for _ in nodes]
    goal_ids = list(range(1, 1 + len(goals)))

    offset = sample_offset + 1
    iters = 0
    while iters < settings.max_iterations and len(nodes) < settings.max_samples:
        q, ok = sample_valid(jnp.int32(offset))
        offset += settings.wave
        iters += settings.wave
        q = np.asarray(q)[np.asarray(ok)]
        if not len(q):
            continue

        base = np.stack(nodes)  # candidates: nodes existing before the wave
        k = np_params.max_neighbors(len(base))
        r = np_params.neighbor_radius(len(base))
        d = np.linalg.norm(base[None, :, :] - q[:, None, :], axis=-1)  # (W, N)
        k_eff = min(k, len(base))
        nn_idx = np.argsort(d, axis=1)[:, :k_eff]
        nn_d = np.take_along_axis(d, nn_idx, axis=1)
        in_r = nn_d <= r

        # one fused validation for every candidate edge of the wave
        starts_e = np.repeat(q, k_eff, axis=0)
        goals_e = base[nn_idx.reshape(-1)]
        mask = in_r.reshape(-1)
        goals_e = np.where(mask[:, None], goals_e, starts_e)  # mask to no-ops
        valid = np.asarray(
            validate_edges(jnp.asarray(starts_e), jnp.asarray(goals_e))
        ) & mask
        valid = valid.reshape(len(q), k_eff)

        for wi in range(len(q)):
            idx = len(nodes)
            nodes.append(q[wi])
            adj.append([])
            uf.add()
            for kk in range(k_eff):
                if valid[wi, kk]:
                    j = int(nn_idx[wi, kk])
                    w = float(nn_d[wi, kk])
                    adj[idx].append((j, w))
                    adj[j].append((idx, w))
                    uf.union(idx, j)

        for gid in goal_ids:
            if uf.find(0) == uf.find(gid):
                arr = np.stack(nodes)
                path_idx, cost = _astar(arr, adj, 0, gid)
                if path_idx is not None:
                    return PRMResult(
                        True, arr[path_idx], cost, iters, len(nodes)
                    )

    return PRMResult(False, np.stack([start]), float("inf"), iters, len(nodes))


def build_roadmap(
    spec: RobotSpec,
    env: Environment,
    start: np.ndarray,
    goal: np.ndarray,
    settings: PRMSettings | None = None,
    sample_offset: int = 0,
) -> Roadmap:
    """Full roadmap construction without early exit (prm.hh:198-299)."""
    if settings is None:
        settings = PRMSettings(
            max_samples=512,
            neighbor_params=PRMStarNeighborParams(spec.dimension, spec.space_measure()),
        )
    np_params = settings.neighbor_params or PRMStarNeighborParams(
        spec.dimension, spec.space_measure()
    )
    sample_valid, validate_edges, _ = _make_device_fns(spec, env, settings)

    nodes = [np.asarray(start, np.float32), np.asarray(goal, np.float32)]
    edges: list[tuple[int, int]] = []
    offset = sample_offset + 1
    iters = 0
    while iters < settings.max_iterations and len(nodes) < settings.max_samples:
        q, ok = sample_valid(jnp.int32(offset))
        offset += settings.wave
        iters += settings.wave
        q = np.asarray(q)[np.asarray(ok)]
        if not len(q):
            continue
        base = np.stack(nodes)
        k = np_params.max_neighbors(len(base))
        r = np_params.neighbor_radius(len(base))
        d = np.linalg.norm(base[None, :, :] - q[:, None, :], axis=-1)
        k_eff = min(k, len(base))
        nn_idx = np.argsort(d, axis=1)[:, :k_eff]
        nn_d = np.take_along_axis(d, nn_idx, axis=1)
        in_r = nn_d <= r
        starts_e = np.repeat(q, k_eff, axis=0)
        goals_e = base[nn_idx.reshape(-1)]
        mask = in_r.reshape(-1)
        goals_e = np.where(mask[:, None], goals_e, starts_e)
        valid = np.asarray(
            validate_edges(jnp.asarray(starts_e), jnp.asarray(goals_e))
        ) & mask
        valid = valid.reshape(len(q), k_eff)
        for wi in range(len(q)):
            idx = len(nodes)
            nodes.append(q[wi])
            for kk in range(k_eff):
                if valid[wi, kk]:
                    edges.append((idx, int(nn_idx[wi, kk])))

    return Roadmap(vertices=np.stack(nodes), edges=edges)

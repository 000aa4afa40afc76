"""MPNet neural planner harness (reference src/vamp/mpnet_planner.py).

The fork's neural planner: an Encoder MLP maps a (padded) pointcloud to a
28-d latent; a Planner MLP maps [latent, current, goal] to the next
configuration; bidirectional rollout with motion validation and perturbation
recovery, falling back to partial paths.

TPU-native form: both networks are plain JAX MLPs (jitted, run on the
accelerator — the counterpart of the reference's CPU/RKNN-NPU hardware
backends is simply the JAX device), with optional weight import from the
reference's PyTorch state_dict checkpoints.  Motion validation uses the fused
FK+CC kernel.  Architecture constants match the reference exactly
(mpnet_planner.py:21-61): pointcloud 11978x3 -> 512-256-128-28 encoder;
planner 1280-1024-896-768-512-384-256-256-128-64-32 with PReLU.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision.environment import Environment
from vamp_mvt_tpu.planning import validate as validate_mod
from vamp_mvt_tpu.robots.spec import RobotSpec

MAX_POINTCLOUD_SIZE = 11978
ENCODER_WIDTHS = (512, 256, 128, 28)
PLANNER_WIDTHS = (1280, 1024, 896, 768, 512, 384, 256, 256, 128, 64, 32)
LATENT = 28


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def init_mlp(key, sizes):
    """Kaiming-ish init; params = list of (W, b, alpha)."""
    params = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        W = jax.random.normal(sub, (a, b)) * np.sqrt(2.0 / a)
        params.append((W.astype(jnp.float32), jnp.zeros(b, jnp.float32),
                       jnp.float32(0.25)))
    return params


def mlp_apply(params, x, final_linear=True):
    for i, (W, b, alpha) in enumerate(params):
        x = x @ W + b
        last = i == len(params) - 1
        if not (last and final_linear):
            x = _prelu(x, alpha)
    return x


def load_torch_state_dict(path, sizes):
    """Import a reference PyTorch checkpoint into (W, b, alpha) params."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    weights = sorted(
        [k for k in sd if k.endswith(".weight") and sd[k].ndim == 2],
        key=lambda k: int("".join(filter(str.isdigit, k)) or 0),
    )
    params = []
    for i, wk in enumerate(weights):
        bk = wk.replace(".weight", ".bias")
        W = jnp.asarray(sd[wk].numpy().T)
        b = jnp.asarray(sd[bk].numpy())
        # find the PReLU alpha between layer i and i+1 if present
        alpha = jnp.float32(0.25)
        for k in sd:
            if "weight" in k and sd[k].ndim == 1 and f".{int(wk.split('.')[1]) + 1}." in k:
                alpha = jnp.asarray(sd[k].numpy()).reshape(())
                break
        params.append((W, b, alpha))
    return params


@dataclasses.dataclass
class MPNetPlanner:
    """Mirrors the reference MPNetPlanner orchestration (mpnet_planner.py:369-646)."""

    spec: RobotSpec
    env: Environment
    encoder_params: list | None = None
    planner_params: list | None = None
    goal_tolerance: float = 1.0
    max_step_size: float = 0.3
    seed: int = 0

    def __post_init__(self):
        d = self.spec.dimension
        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        if self.encoder_params is None:
            self.encoder_params = init_mlp(
                k1, (MAX_POINTCLOUD_SIZE * 3,) + ENCODER_WIDTHS
            )
        if self.planner_params is None:
            self.planner_params = init_mlp(
                k2, (LATENT + 2 * d,) + PLANNER_WIDTHS + (d,)
            )
        self.latent = None
        self._rng = np.random.default_rng(self.seed)
        span = float(np.linalg.norm(self.spec.limits_high - self.spec.limits_low))
        num = validate_mod.n_points_bound(self.spec, span)
        spec, env = self.spec, self.env
        self._validate = jax.jit(
            lambda a, b: validate_mod.validate_motion(spec, env, a, b, num)
        )
        self._encode = jax.jit(lambda p, x: mlp_apply(p, x))
        self._plan_step = jax.jit(lambda p, x: mlp_apply(p, x))

    # --- environment encoding (mpnet_planner.py:402-416, 586-609) ---------
    def encode_environment(self, pointcloud) -> bool:
        pc = np.asarray(pointcloud, np.float32).reshape(-1, 3)
        if len(pc) > MAX_POINTCLOUD_SIZE:
            idx = self._rng.choice(len(pc), MAX_POINTCLOUD_SIZE, replace=False)
            pc = pc[idx]
        elif len(pc) < MAX_POINTCLOUD_SIZE:
            pc = np.vstack(
                [pc, np.zeros((MAX_POINTCLOUD_SIZE - len(pc), 3), np.float32)]
            )
        self.latent = np.asarray(
            self._encode(self.encoder_params, jnp.asarray(pc.reshape(-1)))
        )
        return True

    def _predict_next(self, current, goal):
        x = jnp.asarray(
            np.concatenate([self.latent, current, goal]).astype(np.float32)
        )
        pred = np.asarray(self._plan_step(self.planner_params, x))
        step = pred - current
        n = np.linalg.norm(step)
        if n > self.max_step_size:
            pred = current + step * (self.max_step_size / n)
        return pred

    def _valid(self, a, b) -> bool:
        return bool(self._validate(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))

    def _single_attempt(self, start, goal, max_steps):
        current = np.array(start, np.float32)
        path = [current.copy()]
        for _ in range(max_steps):
            nxt = self._predict_next(current, goal)
            if self._valid(current, nxt):
                path.append(nxt.copy())
                current = nxt
                if np.linalg.norm(current - goal) < self.goal_tolerance:
                    return path
            else:
                noisy = np.clip(
                    nxt + self._rng.normal(0, 0.25, nxt.shape),
                    self.spec.limits_low, self.spec.limits_high,
                )
                if self._valid(current, noisy):
                    path.append(noisy.astype(np.float32))
                    current = noisy.astype(np.float32)
                else:
                    break
        return path if len(path) > 1 else None

    def _bidirectional_attempt(self, start, goal, max_steps):
        fwd = self._single_attempt(start, goal, max_steps // 2)
        if not fwd or len(fwd) < 2:
            return None
        bwd = self._single_attempt(goal, start, max_steps // 2)
        if not bwd or len(bwd) < 2:
            return fwd
        if self._valid(fwd[-1], bwd[-1]):
            # NOTE: the reference drops bwd[-1] here (mpnet_planner.py:516),
            # leaving the fwd[-1]->bwd[-2] segment unvalidated; we keep the
            # validated junction vertex so every merged segment is checked.
            return fwd + list(reversed(bwd))
        bridge = self._single_attempt(fwd[-1], bwd[-1], max_steps // 4)
        if bridge and len(bridge) > 1:
            return fwd + bridge[1:] + list(reversed(bwd[:-1]))
        return fwd if len(fwd) >= len(bwd) else bwd

    def plan(self, start, goal, max_iterations=50, max_planning_steps=50):
        """Returns a waypoint list or None (mpnet_planner.py:419-491)."""
        assert self.latent is not None, "call encode_environment() first"
        start = np.asarray(start, np.float32)
        goal = np.asarray(goal, np.float32)
        if self._valid(start, goal):
            return [start, goal]
        best, best_d = None, np.inf
        for _ in range(max_iterations):
            path = self._bidirectional_attempt(start, goal, max_planning_steps)
            if path and len(path) > 1:
                d = np.linalg.norm(path[-1] - goal)
                if d < self.goal_tolerance:
                    path.append(goal)
                    return path
                if d < best_d:
                    best, best_d = list(path), d
        return best


def plan_with_mpnet(
    robot_name, start, goal, env, pointcloud,
    encoder_path=None, planner_path=None, rrtc_fallback=True,
):
    """Convenience wrapper (mpnet_planner.py:648+): MPNet attempt with RRTC
    fallback when the neural rollout fails or yields an invalid path."""
    from vamp_mvt_tpu import api
    from vamp_mvt_tpu.robots import registry

    spec = registry.load(robot_name)
    enc = planner = None
    if encoder_path:
        enc = load_torch_state_dict(encoder_path, None)
    if planner_path:
        planner = load_torch_state_dict(planner_path, None)
    built = env.build() if hasattr(env, "build") else env
    mp = MPNetPlanner(spec, built, encoder_params=enc, planner_params=planner)
    mp.encode_environment(pointcloud)
    path = mp.plan(start, goal)
    if path is not None and np.linalg.norm(path[-1] - np.asarray(goal)) < 1e-6:
        return path, "mpnet"
    if rrtc_fallback:
        module = api.RobotModule(robot_name)
        res = module.rrtc(start, goal, env)
        if bool(res.solved):
            L = int(res.path_length)
            return [np.asarray(p) for p in np.asarray(res.path)[:L]], "rrtc_fallback"
    return path, "partial"

"""Prolate hyperspheroid informed sampling (reference planning/phs.hh).

The PHS transform maps unit-ball samples into the ellipsoid of configurations
whose start->x->goal path length is below the current best cost: rotation from
the Wahba problem (SVD, phs.hh:108-130), scaling diag(t/2, c/2, ...), offset
by the foci midpoint.  Direction sampling uses the reference's logit-normal
trick over the underlying (Halton) stream (phs.hh:173-190); the in-ball radius
exponent uses a counter-based uniform instead of the reference's mt19937 (a
documented stream divergence for a quantity that is random either way).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.planning.prm import unit_ball_measure


class PHS(NamedTuple):
    """Pytree: traced per-call (transverse diameter changes every improvement)."""

    center: jnp.ndarray   # (d,)
    tf: jnp.ndarray       # (d, d): rot @ diag(t/2, c/2...)
    min_td: jnp.ndarray   # () foci distance


def make_phs(start: np.ndarray, goal: np.ndarray, transverse_diameter: float) -> PHS:
    start = np.asarray(start, np.float64)
    goal = np.asarray(goal, np.float64)
    d = len(start)
    min_td = float(np.linalg.norm(goal - start))
    center = 0.5 * (start + goal)

    if min_td < 1e-6:
        rot = np.eye(d)
    else:
        axis = (goal - start) / min_td
        wahba = np.outer(axis, np.eye(d)[0])
        U, _, Vt = np.linalg.svd(wahba)
        middle = np.ones(d)
        middle[-1] = np.linalg.det(U) * np.linalg.det(Vt.T)
        rot = U @ np.diag(middle) @ Vt

    conj = math.sqrt(max(transverse_diameter**2 - min_td**2, 0.0))
    diag = np.full(d, 0.5 * conj)
    diag[0] = 0.5 * transverse_diameter
    tf = rot @ np.diag(diag)
    return PHS(
        center=jnp.asarray(center, jnp.float32),
        tf=jnp.asarray(tf, jnp.float32),
        min_td=jnp.float32(min_td),
    )


def phs_measure(dim: int, d_foci: float, d_transverse: float) -> float:
    """Lebesgue measure of the PHS (reference phs.hh:19-31)."""
    conj = math.sqrt(max(d_transverse**2 - d_foci**2, 0.0))
    m = d_transverse / 2.0
    for _ in range(1, dim):
        m *= conj / 2.0
    return m * unit_ball_measure(dim)


def phs_samples(phs: PHS, unit: jnp.ndarray, radius_u: jnp.ndarray) -> jnp.ndarray:
    """Map unit-cube samples (..., d) + radius uniforms (...) into the PHS.

    Mirrors ProlateHyperspheroidRNG::next (phs.hh:161-194): logit-normal
    direction from the unit-cube sample, radius u^(1/d), affine transform.
    Joint-limit clamping is the caller's job (it owns the limits).
    """
    d = unit.shape[-1]
    u = jnp.clip(unit, 1e-7, 1.0 - 1e-7)
    logit = jnp.log(u / (1.0 - u)) * np.sqrt(np.pi / 8.0)
    norm = jnp.sqrt(jnp.sum(logit * logit, axis=-1, keepdims=True))
    direction = logit / jnp.maximum(norm, 1e-12)
    r = radius_u[..., None] ** (1.0 / d)
    ball = direction * r
    return jnp.einsum("ij,...j->...i", phs.tf, ball) + phs.center

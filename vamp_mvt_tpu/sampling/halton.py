"""Deterministic Halton sampling, closed-form over the sample index.

The reference uses an incremental vectorized Halton generator with prime bases
(3, 5, 7, 11, ...) per dimension (src/impl/vamp/random/halton.hh:16-108); its
state (n, d) after k steps yields exactly the radical inverse of k.  On TPU we
compute the radical inverse directly from the sample index — stateless, so any
batch of indices can be sampled in parallel and "skip"/seeding
(bindings/robot_helper.hh:370-379) is just an index offset.

Exactness: digits are computed in int32 and the digit count per base is capped
so numerator and denominator stay below 2^24; the final single float division
n/denom is then correctly rounded, bit-identical to the reference's float
division of the same rational value.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

PRIMES = (3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)

# Reference resets and rotates bases after 1M samples (halton.hh:11-12); we
# simply guarantee exactness over the same 1M-sample horizon.
MAX_INDEX = 1_000_000


def _digit_counts(dim: int) -> list[int]:
    counts = []
    for b in PRIMES[:dim]:
        # Largest D with b^D < 2^24 (exact float32 integers); also enough to
        # cover MAX_INDEX (e.g. 3^15 = 14.3M > 1M).
        D = int(math.floor(24 * math.log(2) / math.log(b)))
        if b**D > 2**24:
            D -= 1
        counts.append(D)
    return counts


def halton(indices: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Radical-inverse samples in the unit cube.

    Args:
      indices: (...,) int32 sample indices, 1-based (index k gives the k-th
        sample the reference's `next()` would return after a reset).
      dim: dimensionality (uses the first `dim` prime bases).

    Returns:
      (..., dim) float32 samples in [0, 1).
    """
    indices = indices.astype(jnp.int32)
    counts = _digit_counts(dim)
    cols = []
    for j in range(dim):
        b = PRIMES[j]
        i = indices
        n = jnp.zeros_like(indices)
        for _ in range(counts[j]):
            n = n * b + i % b
            i = i // b
        denom = float(b ** counts[j])
        cols.append(n.astype(jnp.float32) * (1.0 / denom))
    return jnp.stack(cols, axis=-1)


def halton_numpy(index: int, dim: int) -> np.ndarray:
    """Host-side scalar reference implementation (for tests)."""
    out = []
    for j in range(dim):
        b = PRIMES[j]
        f, r, i = 1.0, 0.0, index
        while i > 0:
            f /= b
            r += f * (i % b)
            i //= b
        out.append(np.float32(r))
    return np.array(out, dtype=np.float32)

"""Halton sampler parity with the reference's incremental generator.

The reference's n/d incremental algorithm (src/impl/vamp/random/halton.hh:75-108)
yields the radical inverse of the 1-based sample index in prime bases
(3, 5, 7, ...).  We check the closed-form TPU implementation against a scalar
host implementation and against hand-computed values.
"""

import numpy as np
import jax.numpy as jnp

from vamp_mvt_tpu.sampling.halton import halton, halton_numpy


def test_first_samples():
    out = np.asarray(halton(jnp.arange(1, 6), dim=3))
    # base 3: 1/3, 2/3, 1/9, 4/9, 7/9 ; base 5: 1/5.. ; base 7: 1/7..
    np.testing.assert_allclose(
        out[:, 0], [1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9], atol=1e-7
    )
    np.testing.assert_allclose(
        out[:, 1], [1 / 5, 2 / 5, 3 / 5, 4 / 5, 1 / 25], atol=1e-7
    )
    np.testing.assert_allclose(
        out[:, 2], [1 / 7, 2 / 7, 3 / 7, 4 / 7, 5 / 7], atol=1e-7
    )


def test_matches_scalar_reference_deep():
    idx = np.array([1, 7, 100, 9999, 123456, 999999])
    out = np.asarray(halton(jnp.asarray(idx), dim=14))
    for k, i in enumerate(idx):
        np.testing.assert_allclose(out[k], halton_numpy(int(i), 14), atol=2e-7)


def test_batch_shape():
    out = halton(jnp.arange(1, 129).reshape(4, 32), dim=7)
    assert out.shape == (4, 32, 7)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 1).all()

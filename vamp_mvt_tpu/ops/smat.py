"""Trace-time-folding scalar matrix math for forward kinematics.

Entries of a rotation/translation are either Python floats (compile-time
constants) or traced JAX arrays of a common batch shape.  Products and sums
fold constants at trace time, so composing a chain of URDF origin rotations
with joint rotations emits a minimal elementwise program — the TPU-native
equivalent of the reference's generated SSA FK (reference
src/impl/vamp/robots/panda.hh:116-466), derived from data instead of codegen.

All emitted ops are (...,)-shaped elementwise adds/muls on the batch, which map
directly onto the TPU VPU with the batch in the lane dimension.
"""

from __future__ import annotations

import numpy as np

Scalar = object  # float | jax.Array

_EPS = 0.0  # exact zero test: URDF constants are exact 0.0 where they matter


def is_const(e) -> bool:
    return isinstance(e, (int, float))


def _mul(a, b):
    if is_const(a) and is_const(b):
        return float(a) * float(b)
    if is_const(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if a == -1.0:
            return -b
        return a * b
    if is_const(b):
        return _mul(b, a)
    return a * b


def _add(a, b):
    if is_const(a) and is_const(b):
        return float(a) + float(b)
    if is_const(a) and a == 0.0:
        return b
    if is_const(b) and b == 0.0:
        return a
    return a + b


def dot_terms(terms) -> Scalar:
    """Sum of products, folding constants and dropping zero terms."""
    out = 0.0
    for a, b in terms:
        out = _add(out, _mul(a, b))
    return out


def matmul(A, B):
    """(3,3) @ (3,3) with mixed const/traced entries."""
    return [
        [dot_terms((A[i][k], B[k][j]) for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def matvec(A, v):
    return [dot_terms((A[i][k], v[k]) for k in range(3)) for i in range(3)]


def vecadd(a, b):
    return [_add(a[i], b[i]) for i in range(3)]


def vecscale(v, s):
    return [_mul(s, v[i]) for i in range(3)]


def const_mat(m: np.ndarray):
    return [[float(m[i, j]) for j in range(3)] for i in range(3)]


def const_vec(v: np.ndarray):
    return [float(v[i]) for i in range(3)]


def identity():
    return [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def axis_rotation(axis: np.ndarray, c, s):
    """Rodrigues rotation about a constant unit axis with traced cos/sin.

    R = A + (I - A) c + K s, where A = axis axis^T, K = [axis]_x.
    Entries with zero coefficients fold to constants at trace time (e.g. the
    z-axis rotation emits only 4 traced entries).
    """
    a = np.asarray(axis, dtype=np.float64)
    A = np.outer(a, a)
    K = np.array(
        [[0.0, -a[2], a[1]], [a[2], 0.0, -a[0]], [-a[1], a[0], 0.0]]
    )
    I = np.eye(3)
    out = []
    for i in range(3):
        row = []
        for j in range(3):
            e = float(A[i, j])
            e = _add(e, _mul(float(I[i, j] - A[i, j]), c))
            e = _add(e, _mul(float(K[i, j]), s))
            row.append(e)
        out.append(row)
    return out

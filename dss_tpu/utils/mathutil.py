"""Numerically-safe math primitives.

Semantics follow the reference implementation's helpers
(/root/reference/DSS/utils/mathHelper.py:10-31) so that downstream EWA math is
numerically comparable: sign-preserving epsilon division with eps=1e-17 and
clamped sqrt with eps=1e-17.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DENOM_EPS = 1e-17
SQRT_EPS = 1e-17


def eps_denom(denom: jnp.ndarray, eps: float = DENOM_EPS) -> jnp.ndarray:
    """Sign-preserving epsilon guard for denominators.

    Zero maps to +eps (the reference treats sign(0) as +1 for this purpose,
    DSS/utils/mathHelper.py:10-14).
    """
    sign = jnp.sign(denom) + (denom == 0.0).astype(denom.dtype)
    return sign * jnp.maximum(jnp.abs(denom), eps)


def eps_sqrt(x: jnp.ndarray, eps: float = SQRT_EPS) -> jnp.ndarray:
    """sqrt-safe clamp (reference DSS/utils/mathHelper.py:16-21)."""
    return jnp.maximum(x, eps)


def safe_sqrt(x: jnp.ndarray, eps: float = SQRT_EPS) -> jnp.ndarray:
    return jnp.sqrt(eps_sqrt(x, eps))


def to_homogen(x: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last axis (reference DSS/utils/mathHelper.py:177-185)."""
    return jnp.concatenate([x, jnp.ones(x.shape[:-1] + (1,), x.dtype)], axis=-1)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (torch.nn.functional.normalize semantics:
    divide by max(norm, eps))."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def det2x2(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 2, 2)."""
    return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]


def inv2x2(m: jnp.ndarray, eps: float = DENOM_EPS) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2) with eps-guarded determinant."""
    det = eps_denom(det2x2(m), eps)
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    inv = jnp.stack(
        [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
    )
    return inv / det[..., None, None]


def psd_regularized_det2x2(m: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Determinant of m = A + lam·I where A is PSD in exact arithmetic.

    ad − bc cancels catastrophically when cond(m) approaches 1/eps of the
    arithmetic that produced the entries — for TPU bf16 matmul passes that is
    cond ≳ 1e2, and a sign-flipped det makes the EWA conic negative-definite
    (exp(+q/2) overflow → inf/inf NaN in the composite; the 1024² training
    NaNs of BENCHMARKS.md round 3).  For PSD A, det(A + λI) ≥ λ·tr(A) + λ²
    = λ·tr(m) − λ², and the trace is cancellation-free, so that bound is a
    numerically trustworthy floor.  It only binds when the smaller eigenvalue
    of A falls below ~λ, where the naive product is pure rounding noise.
    """
    return jnp.maximum(
        det2x2(m), lam * (m[..., 0, 0] + m[..., 1, 1]) - lam * lam
    )


def tangent_frame(normals: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Deterministic orthonormal tangent basis Sk (…, 2, 3) for unit normals.

    The reference builds a *random* tangent frame (DSS/core/rasterizer.py:337-341);
    because it is only ever consumed via Sk^T Sk = I - n n^T and |det(Sk A)|, the
    frame choice is mathematically irrelevant.  We use the branch-free Duff et al.
    construction, which is deterministic (stable renders under jit) and
    singularity-free.
    """
    n = normalize(normals, eps=eps)
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z + jnp.where(z >= 0, eps, -eps))
    b = x * y * a
    u0 = jnp.stack([1.0 + sign * x * x * a, sign * b, -sign * x], axis=-1)
    u1 = jnp.stack([b, sign + y * y * a, -y], axis=-1)
    return jnp.stack([u0, u1], axis=-2)


def symeig3x3(mats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric 3x3 eigendecomposition, ascending eigenvalues.

    Replaces the reference's torch-batch-svd/cuSOLVER path
    (DSS/utils/mathHelper.py:34-110) with XLA's batched eigh, which maps well to
    TPU for small matrices.

    Returns (eigvals (...,3) ascending, eigvecs (...,3,3) with columns as vectors).
    """
    w, v = jnp.linalg.eigh(mats)
    return w, v

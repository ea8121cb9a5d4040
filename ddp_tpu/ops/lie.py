"""Quaternion / SO(3) / SE(3)-adjacent primitives.

These replace the Lie-group machinery the reference delegates to Pinocchio
(pinocchio_model.ipp:222-321 — integrate/difference and their Jacobians for
revolute, spherical, free-flyer, planar joints).  Jacobians are never
hand-written here: the solver obtains them with jax.jacfwd through these ops.

Quaternion convention: (w, x, y, z), unit norm, Hamilton product.
All ops are shaped for vmap (no data-dependent control flow) and stay
numerically safe at the identity via Taylor-guarded small-angle branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_exp(v: jax.Array) -> jax.Array:
    """exp: R³ (rotation vector) → unit quaternion.  Taylor-safe at 0."""
    theta2 = jnp.sum(v * v, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS)
    half = 0.5 * theta
    # sin(θ/2)/θ with series fallback: 1/2 - θ²/48 + ...
    small = theta2 < 1e-8
    s = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, s * v], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """log: unit quaternion → rotation vector in (−π, π]."""
    w = q[..., :1]
    xyz = q[..., 1:]
    # force w >= 0 (shortest arc): q and −q are the same rotation
    sign = jnp.where(w < 0, -1.0, 1.0)
    w, xyz = w * sign, xyz * sign
    n2 = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    n = jnp.sqrt(n2 + _EPS)
    angle = 2.0 * jnp.arctan2(n, w)
    small = n2 < 1e-8
    # angle/sin(angle/2) ≈ 2/w · (1 − n²/(3w²)) near identity
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5) * (1.0 - n2 / 3.0), angle / n)
    return scale * xyz


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate a 3-vector by a unit quaternion (active rotation)."""
    u = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_to_mat(q: jax.Array) -> jax.Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def mat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix → unit quaternion (w ≥ 0), branch-free (Shepperd via
    four candidates + select, safe under jit/vmap)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    qw = jnp.stack([safe_sqrt(1 + tr), m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, safe_sqrt(1 + m00 - m11 - m22), m10 + m01, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m10 + m01, safe_sqrt(1 - m00 + m11 - m22), m21 + m12], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m21 + m12, safe_sqrt(1 - m00 - m11 + m22)], -1)
    # pick the numerically best candidate
    scores = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    # candidate k needs division by its diagonal sqrt term; normalize instead
    q = quat_normalize(q)
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q * sign


def so2_integrate(cs: jax.Array, dtheta: jax.Array) -> jax.Array:
    """Rotate a (cos, sin) pair by dtheta (unbounded-revolute / planar)."""
    c, s = cs[..., 0], cs[..., 1]
    dc, ds = jnp.cos(dtheta), jnp.sin(dtheta)
    return jnp.stack([c * dc - s * ds, s * dc + c * ds], axis=-1)


def so2_difference(cs0: jax.Array, cs1: jax.Array) -> jax.Array:
    """Angle of R0ᵀ R1 for (cos, sin) pairs; in (−π, π]."""
    c0, s0 = cs0[..., 0], cs0[..., 1]
    c1, s1 = cs1[..., 0], cs1[..., 1]
    return jnp.arctan2(s1 * c0 - c1 * s0, c1 * c0 + s1 * s0)


def hat(v: jax.Array) -> jax.Array:
    """3-vector → skew-symmetric matrix (v×)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )

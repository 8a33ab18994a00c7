"""Vector / quaternion math for the TPU-native nudge rebuild.

The reference engine (rasmusbarr/nudge, `nudge.cpp` — SIMD layer, SURVEY.md C2)
implements width-generic SIMD float math by hand; here the equivalent role is
played by XLA vectorization over batched `jnp` ops, so this module only supplies
the *semantics*: 3-vector helpers and quaternion algebra.

Conventions (SURVEY.md §8, reference `nudge.h` Transform.rotation [MED]):
  - quaternions are stored (x, y, z, w), Hamilton convention, unit length;
  - `quat_rotate(q, v)` rotates a body-frame vector into world frame;
  - all functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector dot product -> (...,) array."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector cross product (explicit form; avoids jnp.cross overhead)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Safe normalize; returns `a / max(|a|, eps)`."""
    n = jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-1, keepdims=True), eps * eps))
    return a / n


# ---------------------------------------------------------------------------
# Quaternions — (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 3].set(1.0)


def quat_mul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q ⊗ r, both (x,y,z,w)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rx, ry, rz, rw = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
            qw * rw - qx * rx - qy * ry - qz * rz,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return normalize(q, eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by unit quaternion q (body -> world).

    Uses the 2-cross formula: v + 2 w (u×v) + 2 u×(u×v), u = q.xyz.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = cross(u, v)
    return v + 2.0 * (w * uv + cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate by the conjugate (world -> body)."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> (..., 3, 3) rotation matrix (columns = body axes in world)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis: jnp.ndarray, angle) -> jnp.ndarray:
    axis = normalize(jnp.asarray(axis, jnp.float32))
    angle = jnp.asarray(angle, jnp.float32)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """One explicit step of dq/dt = ½ ω ⊗ q, then renormalize.

    Matches the reference integrator (`nudge.cpp` advance(), SURVEY.md §3.D):
    q <- normalize(q + ½·dt·(ω_quat ⊗ q)) with ω_quat = (ωx, ωy, ωz, 0).
    """
    wq = jnp.concatenate([omega, jnp.zeros_like(omega[..., :1])], axis=-1)
    dq = 0.5 * dt * quat_mul(wq, q)
    return quat_normalize(q + dq)


def orthonormal_basis(n: jnp.ndarray):
    """Deterministic tangent basis (t1, t2) for unit normal n.

    Branch-free Duff et al. construction; used for contact friction frames
    (reference: contact-frame setup inside setup_contact_constraints(),
    SURVEY.md C10).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t1 = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    t2 = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t1, t2

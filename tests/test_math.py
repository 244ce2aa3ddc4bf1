"""Unit tests for quaternion/spatial math vs MuJoCo's C implementations."""

import mujoco
import numpy as np
import jax.numpy as jnp

from brax_tracking_tpu import math as btm


def random_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_vs_mujoco():
    qa, qb = random_quats(32, 1), random_quats(32, 2)
    ours = np.asarray(btm.quat_mul(jnp.array(qa), jnp.array(qb)))
    for i in range(32):
        ref = np.zeros(4)
        mujoco.mju_mulQuat(ref, qa[i], qb[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-12)


def test_rotate_vs_mujoco():
    q = random_quats(32, 3)
    rng = np.random.RandomState(4)
    v = rng.randn(32, 3)
    ours = np.asarray(btm.rotate(jnp.array(v), jnp.array(q)))
    for i in range(32):
        ref = np.zeros(3)
        mujoco.mju_rotVecQuat(ref, v[i], q[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-12)


def test_quat_to_mat_vs_mujoco():
    q = random_quats(16, 5)
    ours = np.asarray(btm.quat_to_mat(jnp.array(q)))
    for i in range(16):
        ref = np.zeros(9)
        mujoco.mju_quat2Mat(ref, q[i])
        np.testing.assert_allclose(ours[i], ref.reshape(3, 3), atol=1e-12)


def test_mat_to_quat_roundtrip():
    q = random_quats(64, 6)
    m = btm.quat_to_mat(jnp.array(q))
    q2 = np.asarray(btm.mat_to_quat(m))
    # quat sign canonicalized to w >= 0
    qc = np.where(q[:, :1] < 0, -q, q)
    np.testing.assert_allclose(q2, qc, atol=1e-9)


def test_quat_integrate_vs_mujoco():
    q = random_quats(16, 7)
    rng = np.random.RandomState(8)
    w = rng.randn(16, 3) * 3.0
    dt = 0.002
    ours = np.asarray(btm.quat_integrate(jnp.array(q), jnp.array(w), dt))
    for i in range(16):
        ref = q[i].copy()
        mujoco.mju_quatIntegrate(ref, w[i], dt)
        np.testing.assert_allclose(ours[i], ref, atol=1e-10)


def test_quat_to_axis_angle_inverse():
    rng = np.random.RandomState(9)
    axis = rng.randn(32, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-3, 3, 32)
    q = btm.axis_angle_to_quat(jnp.array(axis), jnp.array(angle))
    aa = np.asarray(btm.quat_to_axis_angle(q))
    np.testing.assert_allclose(aa, axis * angle[:, None], atol=1e-7)


def test_quat_to_axis_angle_identity_pole():
    aa = np.asarray(btm.quat_to_axis_angle(jnp.array([1.0, 0.0, 0.0, 0.0])))
    np.testing.assert_allclose(aa, np.zeros(3))


def test_motion_cross_vs_closed_form():
    rng = np.random.RandomState(10)
    v, u = rng.randn(6), rng.randn(6)
    got = np.asarray(btm.motion_cross(jnp.array(v), jnp.array(u)))
    ang = np.cross(v[:3], u[:3])
    lin = np.cross(v[:3], u[3:]) + np.cross(v[3:], u[:3])
    np.testing.assert_allclose(got, np.concatenate([ang, lin]), atol=1e-12)
    # force-cross is the dual: <v x u, f> = -<u, v x* f>
    f = rng.randn(6)
    lhs = np.dot(np.asarray(btm.motion_cross(jnp.array(v), jnp.array(u))), f)
    rhs = -np.dot(u, np.asarray(btm.motion_cross_force(jnp.array(v), jnp.array(f))))
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_bounded_quat_dist_range():
    qa, qb = random_quats(64, 11), random_quats(64, 12)
    d = np.asarray(btm.bounded_quat_dist(jnp.array(qa), jnp.array(qb)))
    assert d.shape == (64, 1)
    assert (d >= 0).all() and (d <= np.pi / 2 + 1e-9).all()
    d0 = np.asarray(btm.bounded_quat_dist(jnp.array(qa), jnp.array(qa)))
    np.testing.assert_allclose(d0, 0.0, atol=1e-6)

import jax.numpy as jnp
import numpy as np

from cat_tpu.sim import maths


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        v = rng.normal(size=3)
        R = maths.quat_to_mat(jnp.asarray(q))
        out1 = maths.quat_rotate(jnp.asarray(q), jnp.asarray(v))
        out2 = R @ v
        np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_quat_mul_composition():
    rng = np.random.default_rng(1)
    a = rng.normal(size=4); a /= np.linalg.norm(a)
    b = rng.normal(size=4); b /= np.linalg.norm(b)
    v = rng.normal(size=3)
    lhs = maths.quat_rotate(maths.quat_mul(jnp.asarray(a), jnp.asarray(b)),
                            jnp.asarray(v))
    rhs = maths.quat_rotate(jnp.asarray(a),
                            maths.quat_rotate(jnp.asarray(b), jnp.asarray(v)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_quat_rotate_inv_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    v = rng.normal(size=3)
    out = maths.quat_rotate_inv(jnp.asarray(q),
                                maths.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, v, atol=1e-6)


def test_quat_integrate_constant_omega():
    # integrating omega = (0,0,pi) for 0.5s should yield yaw pi/2
    q = maths.quat_identity()
    omega = jnp.array([0.0, 0.0, np.pi])
    for _ in range(100):
        q = maths.quat_integrate(q, omega, 0.005)
    yaw = maths.quat_yaw(q)
    np.testing.assert_allclose(yaw, np.pi / 2, atol=1e-5)


def test_quat_from_euler_yaw_only():
    q = maths.quat_from_euler_zyx(jnp.array(0.0), jnp.array(0.0),
                                  jnp.array(1.0))
    np.testing.assert_allclose(maths.quat_yaw(q), 1.0, atol=1e-6)


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    u = jnp.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(maths.skew(v) @ u, jnp.cross(v, u), atol=1e-7)

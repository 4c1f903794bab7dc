"""Golden tests of the CaT transform math against hand-computed values
(SURVEY.md §4 layer 1: the polyak/normalize/clamp pipeline of
constraint_manager.py:39-76 is pure and easy to golden-test)."""

import jax.numpy as jnp
import numpy as np

from cat_tpu.envs.cat import ConstraintSet, ConstraintTerm, curriculum_max_p
from cat_tpu.envs.types import StepData


def _probe(n, nj=2):
    z = jnp.zeros
    return StepData(
        joint_pos=z((n, nj)), joint_vel=z((n, nj)), joint_acc=z((n, nj)),
        applied_torque=z((n, nj)), default_joint_pos=z((nj,)),
        base_pos=z((n, 3)), base_yaw=z((n,)), base_lin_vel_b=z((n, 3)), base_ang_vel_b=z((n, 3)),
        projected_gravity=z((n, 3)), command=z((n, 3)),
        action=z((n, nj)), prev_action=z((n, nj)),
        force_hist=z((n, 3, 1, 3)), touchdown=z((n, 1), dtype=bool),
        last_air_time=z((n, 1)), step_dt=0.02,
    )


def _term_from_field(name, field, max_p, curriculum=False):
    return ConstraintTerm(
        name, lambda d, **kw: getattr(d, field), {}, max_p, curriculum
    )


def test_transform_basic():
    """First step: running_max seeds to the batch max; prob = c/max * max_p."""
    term = _term_from_field("jv", "joint_vel", 0.25)
    cset = ConstraintSet([term], _probe(2))
    data = _probe(3)._replace(
        joint_vel=jnp.array([[2.0, -1.0], [4.0, 0.5], [-1.0, 0.0]])
    )
    p, rmax, term_probs, viol = cset.compute(
        data, cset.init_running_max(), cset.init_max_p(),
    )
    # column maxes: [4.0, 0.5] -> running max seeded to those
    np.testing.assert_allclose(np.array(rmax), [4.0, 0.5], atol=1e-6)
    # probs: clip(c/rmax,0,1)*0.25 where c>0 else 0
    # env0: [2/4, -] -> [0.125, 0]; env1: [1.0, 1.0]*0.25; env2: [0, 0]
    np.testing.assert_allclose(np.array(p), [0.125, 0.25, 0.0], atol=1e-6)
    np.testing.assert_allclose(
        np.array(term_probs[:, 0]), [0.125, 0.25, 0.0], atol=1e-6
    )
    np.testing.assert_allclose(np.array(viol[:, 0]), [True, True, False])


def test_transform_polyak():
    """Second step: rmax <- 0.95*rmax + 0.05*batch_max (clamped >= 1e-6)."""
    term = _term_from_field("jv", "joint_vel", 1.0)
    cset = ConstraintSet([term], _probe(2))
    rmax0 = jnp.array([4.0, 0.5])
    data = _probe(1)._replace(joint_vel=jnp.array([[2.0, -3.0]]))
    p, rmax, _, _ = cset.compute(
        data, rmax0, cset.init_max_p()
    )
    expected = [0.95 * 4.0 + 0.05 * 2.0, 0.95 * 0.5 + 0.05 * 1e-6]
    np.testing.assert_allclose(np.array(rmax), expected, rtol=1e-6)
    np.testing.assert_allclose(float(p[0]), 2.0 / expected[0], rtol=1e-5)


def test_max_over_terms():
    """cstr_prob is the max over every column of every term."""
    t1 = _term_from_field("a", "joint_vel", 0.2)
    t2 = _term_from_field("b", "applied_torque", 1.0)
    cset = ConstraintSet([t1, t2], _probe(2))
    data = _probe(2)._replace(
        joint_vel=jnp.array([[1.0, 0.0], [0.0, 0.0]]),
        applied_torque=jnp.array([[0.5, 0.0], [0.0, -1.0]]),
    )
    p, _, term_probs, _ = cset.compute(
        data, cset.init_running_max(), cset.init_max_p(),
    )
    # rmax per col: jv [1, 1e-6], tq [0.5, 1e-6]
    # env0: jv p=0.2 ; tq p=1.0 -> max 1.0 ; env1: nothing -> 0
    np.testing.assert_allclose(np.array(p), [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.array(term_probs[0]), [0.2, 1.0], atol=1e-6)


def test_curriculum_schedule():
    """max_p(t) = 1/(20 + progress*(1/p0 - 20)) (curriculums.py:28-34)."""
    terms = [
        ConstraintTerm("soft", lambda d: d.joint_vel, {}, 0.25, True),
        ConstraintTerm("hard", lambda d: d.joint_vel, {}, 1.0, False),
    ]
    num_steps = 24000
    # t=0: soft = 1/20 = 0.05; hard unchanged
    p0 = curriculum_max_p(terms, jnp.asarray(0), num_steps)
    np.testing.assert_allclose(np.array(p0), [0.05, 1.0], rtol=1e-6)
    # halfway: 1/(20 + 0.5*(4-20)) = 1/12
    ph = curriculum_max_p(terms, jnp.asarray(12000), num_steps)
    np.testing.assert_allclose(float(ph[0]), 1.0 / 12.0, rtol=1e-5)
    # end (and beyond): 1/4 = init max_p
    pe = curriculum_max_p(terms, jnp.asarray(999999), num_steps)
    np.testing.assert_allclose(np.array(pe), [0.25, 1.0], rtol=1e-6)

"""Golden-value tests for the 9-class action discretizer, derived by hand from
the formulas at reference imitation_dataset.py:317-339."""

import numpy as np
import jax.numpy as jnp

from carla_imitation_learning_tpu.data.actions import (
    continuous_to_discrete, discrete_to_continuous, steer_to_class, accel_to_class,
)


def test_steer_classes_golden():
    steer = np.array([-1.0, -0.051, -0.05, 0.0, 0.05, 0.051, 1.0])
    expected = np.array([0, 0, 1, 1, 1, 2, 2])
    np.testing.assert_array_equal(steer_to_class(steer), expected)


def test_accel_classes_golden():
    throttle = np.array([1.0, 0.5, 0.0, 0.0])
    brake = np.array([0.0, 0.0, 1.0, 0.0])
    expected = np.array([2.0, 1.0, 0.0, 0.0])  # last: fallback keeps brake value
    np.testing.assert_array_equal(accel_to_class(throttle, brake), expected)


def test_full_discretization_golden():
    # (steer, throttle, brake) -> class = acc*3 + steer_cls
    steer = np.array([0.0, 0.2, -0.2, 0.0, 0.1, -0.3])
    throttle = np.array([1.0, 1.0, 1.0, 0.5, 0.0, 0.5])
    brake = np.array([0.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    # acc:    2    2    2    1    0    1
    # steer:  1    2    0    1    2    0
    expected = np.array([7.0, 8.0, 6.0, 4.0, 2.0, 3.0])
    np.testing.assert_array_equal(continuous_to_discrete(steer, throttle, brake), expected)


def test_jax_matches_numpy():
    rng = np.random.default_rng(0)
    steer = rng.uniform(-1, 1, 100)
    throttle = rng.choice([0.0, 0.5, 1.0], 100)
    brake = rng.choice([0.0, 1.0], 100)
    a_np = continuous_to_discrete(steer, throttle, brake)
    a_jx = continuous_to_discrete(jnp.asarray(steer), jnp.asarray(throttle), jnp.asarray(brake))
    np.testing.assert_array_equal(a_np, np.asarray(a_jx))


def test_roundtrip_inverse():
    for action in range(9):
        steer, throttle, brake = discrete_to_continuous(np.array([action]))
        back = continuous_to_discrete(steer * 0.5, throttle, brake)  # steer dir scaled stays in class
        assert int(back[0]) == action


def test_input_not_mutated():
    """The reference mutates the steer column in place (defect §5.6)."""
    steer = np.array([0.5, -0.5])
    orig = steer.copy()
    continuous_to_discrete(steer, np.array([1.0, 1.0]), np.array([0.0, 0.0]))
    np.testing.assert_array_equal(steer, orig)

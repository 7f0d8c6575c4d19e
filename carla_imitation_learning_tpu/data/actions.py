"""Discrete driving-action label semantics.

The reference maps the autopilot's continuous controls to 9 discrete classes
(``continous_to_discreet``, reference src/dataset/imitation_dataset.py:317-339):

- steer class:  ``2`` if steer >  +0.05, ``0`` if steer < -0.05, else ``1``
- accel class:  from the (brake, throttle) pair — ``2`` for (0, 1.0) full
  throttle, ``1`` for (0, 0.5) half throttle, ``0`` for (1, 0) braking.
  Pairs outside this table keep the raw brake value (the reference seeds the
  accel vector with ``brake.copy()``); with CARLA's binary autopilot brake this
  means unknown throttles fall back to class 0/1 by brake state.
- class id = accel * 3 + steer  →  9 actions.

This module reimplements those semantics as pure vectorized functions (numpy
or jax arrays both work), without the reference's in-place mutation of the
input dataframe (defect noted at imitation_dataset.py:319-324), and adds the
inverse map needed for closed-loop control of the on-device simulator.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

STEER_THRESHOLD = 0.05

# Continuous control targets per class index, used by discrete_to_continuous.
# steer classes {0,1,2} → wheel direction {-1, 0, +1}; accel classes
# {0,1,2} → (throttle, brake) = {(0,1), (0.5,0), (1,0)} matching the forward map.
ACTION_STEER = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
ACTION_ACCEL = np.array([[0.0, 1.0], [0.5, 0.0], [1.0, 0.0]], dtype=np.float32)  # (throttle, brake)


def steer_to_class(steer, threshold: float = STEER_THRESHOLD):
    """steer ∈ [-1, 1] → class ∈ {0 left, 1 straight, 2 right}."""
    xp = jnp if isinstance(steer, jnp.ndarray) else np
    return xp.where(steer > threshold, 2, xp.where(steer < -threshold, 0, 1))


def accel_to_class(throttle, brake):
    """(throttle, brake) → class ∈ {0 brake, 1 half, 2 full}.

    Exact reference table (imitation_dataset.py:330-333), including the
    brake-seeded fallback for combinations outside the table.
    """
    xp = jnp if isinstance(throttle, jnp.ndarray) else np
    acc = brake * 1.0  # seed with brake, as the reference does (acc = brake.copy())
    acc = xp.where((brake == 0.0) & (throttle == 1.0), 2.0, acc)
    acc = xp.where((brake == 0.0) & (throttle == 0.5), 1.0, acc)
    acc = xp.where((brake == 1.0) & (throttle == 0.0), 0.0, acc)
    return acc


def continuous_to_discrete(steer, throttle, brake, threshold: float = STEER_THRESHOLD):
    """Continuous autopilot controls → 9-class action index (float, as in reference)."""
    s = steer_to_class(steer, threshold)
    a = accel_to_class(throttle, brake)
    return a * 3 + s


def control_to_discrete_label(steer, throttle, brake,
                              threshold: float = STEER_THRESHOLD):
    """Robust 9-class label for CONTINUOUS controls (int32).

    ``continuous_to_discrete`` replicates the reference table exactly,
    including its brake-seeded fallback for (throttle, brake) pairs outside
    the autopilot's {full, half, brake} triple — correct for the expert's
    discrete-ish controls, ill-defined for a continuous policy's arbitrary
    values. This variant covers the whole control square: steer classes use
    the same ±threshold; accel class is 0 when braking dominates
    (brake > throttle), 2 at high throttle (> 0.75), else 1. On the
    reference table's exact pairs the two maps agree.
    Used by the closed loop to log ``traj["action"]`` for
    ``control_space="continuous"`` policies.
    """
    xp = jnp if isinstance(steer, jnp.ndarray) else np
    s = steer_to_class(steer, threshold)
    a = xp.where(brake > throttle, 0, xp.where(throttle > 0.75, 2, 1))
    return (a * 3 + s).astype(xp.int32)


def discrete_to_continuous(action):
    """Inverse map: class index → (steer, throttle, brake) continuous controls.

    Used to drive the on-device simulator closed-loop from a discrete policy.
    steer direction is in {-1, 0, +1} — scale by the vehicle's max steering
    angle downstream (sim config ``max_steer``).
    """
    xp = jnp if isinstance(action, jnp.ndarray) else np
    action = action.astype(xp.int32)
    steer_cls = action % 3
    accel_cls = action // 3
    steer = xp.asarray(ACTION_STEER)[steer_cls]
    throttle = xp.asarray(ACTION_ACCEL)[accel_cls, 0]
    brake = xp.asarray(ACTION_ACCEL)[accel_cls, 1]
    return steer, throttle, brake

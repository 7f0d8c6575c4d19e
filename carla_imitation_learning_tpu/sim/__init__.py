"""On-device batched driving simulator.

This layer replaces the reference system's external CARLA C++/UnrealEngine
server (SURVEY.md L0: the reference only *consumes* CARLA's offline logs —
imitation_dataset.py:96-110). Everything here is pure, fixed-shape JAX:
`step(params, town, state, control) -> state` composes under vmap (env batch),
jit (whole rollouts via lax.scan) and sharding (env axis over the mesh).
"""

from carla_imitation_learning_tpu.sim.town import TownMap, make_town  # noqa: F401
from carla_imitation_learning_tpu.sim.world import (  # noqa: F401
    SimParams, WorldState, VehicleControl,
    reset_env, step_env, autopilot_control, sensor_vector,
    make_batched_env, navigation_command, ego_lane_change_plan,
)
from carla_imitation_learning_tpu.sim.dynamics import bicycle_step  # noqa: F401
from carla_imitation_learning_tpu.sim.pedestrians import (  # noqa: F401
    ped_positions, pedestrian_ahead, spawn_pedestrians, step_pedestrians,
)

"""Parallelism: device mesh, sharding rules, vmap'd HPO, multi-host init.

TPU-native replacement for the reference's parallel paths:
- PL ``gpus=`` single-node data parallel (reference utils.py:60-64, train.py:125)
  → batch sharded over a 'data' mesh axis; gradient psum rides ICI.
- ``nn.DataParallel`` (ray_trainer.py:36) → same, no replica scatter/gather.
- Ray Tune distributed HPO (ray_trainer.py:39-53) → vmap'd hyperparameter
  sweeps (one compiled program evaluating all trials) + a tune-like driver.
"""

from carla_imitation_learning_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_train_state,
)
from carla_imitation_learning_tpu.parallel.hpo import (  # noqa: F401
    Trial, pbt_run, tune_run, vmap_sweep,
)

"""Training callbacks (reference src/callbacks/*).

The Trainer calls hooks by name: on_fit_start(trainer, state),
on_epoch_end(trainer, state, epoch, metrics, loaders),
on_fit_end(trainer, state, history). Unused kwargs are absorbed by **kw.
"""

from carla_imitation_learning_tpu.callbacks.callbacks import (  # noqa: F401
    Callback,
    ExampleCallback,
    UnfreezeModelCallback,
    SaveCodeSnapshot,
    SaveMetricsHeatmap,
    SaveConfusionMatrix,
    SaveBestMetricScores,
    UploadCheckpointsToWandb,
)

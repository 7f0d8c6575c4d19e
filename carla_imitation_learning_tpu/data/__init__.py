"""Data layer: CARLA frame-log contract, action discretizer, input pipelines.

Reference: src/dataset/imitation_dataset.py, src/dataset/vae_dataset.py,
src/data/create_data.py, src/data/stat.py.
"""

from carla_imitation_learning_tpu.data.actions import (  # noqa: F401
    continuous_to_discrete,
    discrete_to_continuous,
    ACTION_STEER,
    ACTION_ACCEL,
)
from carla_imitation_learning_tpu.data.frame_log import (  # noqa: F401
    FrameLog,
    StateLog,
    load_state_csv,
    write_synthetic_log,
    make_synthetic_state,
    split_frames,
)
from carla_imitation_learning_tpu.data.pipeline import (  # noqa: F401
    FrameStore,
    DeviceDataset,
    sequential_train_val_test_iterator,
    sequential_aux_train_val_test_iterator,
    train_val_test_iterator,
    large_train_val_test_iterator,
)

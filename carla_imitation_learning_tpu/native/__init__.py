"""Python bindings for the native C++ framestore (ctypes; built with g++).

The native layer of the input pipeline: packed single-file frame stores with
mmap zero-copy loads and a multi-threaded window-batch prefetcher for
datasets that exceed HBM. Small datasets should stay on the pure on-device
path (data/pipeline.py); this is the streaming tier.
"""

from carla_imitation_learning_tpu.native.framestore import (  # noqa: F401
    NATIVE_AVAILABLE,
    NativeFrameStore,
    PrefetchReader,
    build_library,
    save_framestore,
)
from carla_imitation_learning_tpu.native.sharded import (  # noqa: F401
    DeviceShardStreamer,
    ShardedFrameStore,
    ShardedPrefetchReader,
    save_sharded_framestore,
)

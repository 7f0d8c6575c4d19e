"""Utilities: run gating, colored banners, device discovery, logging, profiling.

Reference: utils.py (skip_run:14, ColorPrint:46, get_num_gpus:60,
launch_tensorboard:67).
"""

from __future__ import annotations

import contextlib

from carla_imitation_learning_tpu.utils.logging import MetricLogger  # noqa: F401
from carla_imitation_learning_tpu.utils.profiling import (  # noqa: F401
    StepTimer, trace_profiler, launch_tensorboard,
)


class SkipWith(Exception):
    """Control-flow exception used by skip_run (reference utils.py:9-11)."""


class ColorPrint:
    """ANSI colored banners (reference utils.py:46-57)."""

    @staticmethod
    def print_skip(message: str) -> None:
        print(f"\033[93m{message}\033[0m")

    @staticmethod
    def print_run(message: str) -> None:
        print(f"\033[92m{message}\033[0m")

    @staticmethod
    def print_warn(message: str) -> None:
        print(f"\033[91m{message}\033[0m")


@contextlib.contextmanager
def skip_run(flag: str, name: str):
    """Block gating for script-style experiment files (reference utils.py:14-43).

    with skip_run('run'|'skip', 'experiment name') as check, check():
        ...
    """

    @contextlib.contextmanager
    def check():
        if flag == "skip":
            ColorPrint.print_skip(f"{name:>2} Skipping the block")
            raise SkipWith()
        ColorPrint.print_run(f"{name:>2} Running the block")
        yield

    try:
        yield check
    except SkipWith:
        pass


def get_num_devices() -> int:
    """Visible accelerator count (replaces reference get_num_gpus, utils.py:60-64)."""
    import jax

    return jax.device_count()

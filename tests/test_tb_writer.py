"""Torch-free TensorBoard event writer: files must load with TensorBoard's
own reader (proving byte compatibility), with correct tags/steps/values."""

import glob

import numpy as np
import pytest

from carla_imitation_learning_tpu.utils.tb_writer import (
    TBEventWriter, _crc32c, _masked_crc,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes -> 0x8A9136AA
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def test_events_load_in_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    w = TBEventWriter(tmp_path)
    w.add_scalar("losses/train_loss", 1.5, 0)
    w.add_scalar("losses/train_loss", 0.75, 1)
    w.add_scalar("acc", 0.25, 1)
    w.close()

    [path] = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    events = list(tb.EventFileLoader(path).Load())
    assert events[0].file_version == "brain.Event:2"

    def value_of(v):  # TB's loader migrates simple_value -> tensor proto
        return (v.tensor.float_val[0] if v.WhichOneof("value") == "tensor"
                else v.simple_value)

    scalars = [(e.step, v.tag, value_of(v))
               for e in events[1:] for v in e.summary.value]
    assert scalars[0][1] == "losses/train_loss"
    np.testing.assert_allclose([s[2] for s in scalars], [1.5, 0.75, 0.25])
    assert [s[0] for s in scalars] == [0, 1, 1]


def test_metric_logger_writes_native_events(tmp_path):
    from carla_imitation_learning_tpu.utils.logging import MetricLogger

    lg = MetricLogger(tmp_path, "run")
    lg.add_scalars("losses", {"train_loss": 0.5}, 0)
    lg.close()
    assert glob.glob(str(tmp_path / "run" / "events.out.tfevents.*"))
    # and the module never imports torch
    import carla_imitation_learning_tpu.utils.tb_writer as m
    import inspect
    assert "import torch" not in inspect.getsource(m)

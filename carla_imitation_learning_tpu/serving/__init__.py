"""Deployment/serving tier: StableHLO policy export + bucketed inference.

beyond-reference capability — the reference (HemuManju/carla-imitation-learning)
can only reuse a trained net by re-importing the torch class from source
(train.py:198-201); here a policy ships as one self-contained multi-platform
AOT artifact and serves through a shape-stable batching engine.
"""

from carla_imitation_learning_tpu.serving.engine import InferenceEngine
from carla_imitation_learning_tpu.serving.export import (
    LoadedPolicy,
    export_cil_policy,
    export_fn,
    export_policy,
    load_policy,
    policy_fn_from_servable,
)
from carla_imitation_learning_tpu.serving.quant import (
    make_quantized_policy,
    quantize_params,
    quantized_apply,
)
from carla_imitation_learning_tpu.serving.server import PolicyServer

__all__ = [
    "InferenceEngine",
    "LoadedPolicy",
    "PolicyServer",
    "export_cil_policy",
    "export_fn",
    "export_policy",
    "load_policy",
    "policy_fn_from_servable",
    "make_quantized_policy",
    "quantize_params",
    "quantized_apply",
]

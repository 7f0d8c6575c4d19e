"""Model zoo (flax.linen, NHWC, bfloat16 compute / float32 params).

Reference architectures: src/architectures/nets.py (ConvNet1:6, ConvNetRawSegment:42,
CNNAutoEncoder:81) plus the missing CNNAuxNet (imported at reference train.py:7,
interface inferred from imitation.py:11-24 and imitation_dataset.py:139-194)
and a command-conditioned CIL-style branched policy (BASELINE.json config #2).
"""

from carla_imitation_learning_tpu.models.cnn import (  # noqa: F401
    ContinuousPolicyCNN, DualStreamCNN, PolicyCNN, convert_params_to_s2d,
)
from carla_imitation_learning_tpu.models.vae import ConvVAE  # noqa: F401
from carla_imitation_learning_tpu.models.aux import AuxNet  # noqa: F401
from carla_imitation_learning_tpu.models.cil import BranchedCILPolicy  # noqa: F401
from carla_imitation_learning_tpu.models.world_model import LatentWorldModel  # noqa: F401
from carla_imitation_learning_tpu.models.rnn_policy import RecurrentPolicy  # noqa: F401
from carla_imitation_learning_tpu.models.vit import ViTPolicy  # noqa: F401

MODEL_REGISTRY = {
    "policy_cnn": PolicyCNN,
    "dual_stream_cnn": DualStreamCNN,
    "conv_vae": ConvVAE,
    "aux_net": AuxNet,
    "branched_cil": BranchedCILPolicy,
    "latent_world_model": LatentWorldModel,
    "recurrent_policy": RecurrentPolicy,
    "continuous_policy_cnn": ContinuousPolicyCNN,
    "vit_policy": ViTPolicy,
}

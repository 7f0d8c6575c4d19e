"""Training layer: losses, jit'd train/eval steps, optimizers, epoch loop.

Reference: src/models/imitation.py (Imitation:27, ImitationAux:94,
lossCriterion:11), src/models/vae.py (VAE:8), plus PL Trainer behavior wired
in train.py:125-129.
"""

from carla_imitation_learning_tpu.training.losses import (  # noqa: F401
    cross_entropy,
    accuracy,
    bc_loss_fn,
    vae_loss_fn,
    aux_loss_fn,
    cil_loss_fn,
    dual_stream_loss_fn,
    rnn_bc_loss_fn,
    continuous_bc_loss_fn,
)
from carla_imitation_learning_tpu.training.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    make_eval_step,
    make_fused_epoch,
    make_fused_eval,
)
from carla_imitation_learning_tpu.training.loop import Trainer, FitResult  # noqa: F401
from carla_imitation_learning_tpu.training.online_dagger import (  # noqa: F401
    make_online_dagger,
    sample_windows,
)
from carla_imitation_learning_tpu.training.rl import (  # noqa: F401
    ActorCriticCNN,
    PPOConfig,
    actor_policy_params_from,
    ppo_train,
    warm_start_from_policy,
)

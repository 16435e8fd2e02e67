from sivae_tpu.train.state import SIVAETrainState, create_train_state  # noqa: F401
from sivae_tpu.train.step import (  # noqa: F401
    make_soft_intro_train_step,
    make_soft_intro_eval_step,
    make_vae_train_step,
    make_vae_eval_step,
    make_cae_train_step,
)

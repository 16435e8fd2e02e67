from sivae_tpu.ops.losses import (  # noqa: F401
    calc_kl,
    calc_reconstruction_loss,
    kld_loss,
    mse_loss,
    normal_loss,
    soft_intro_encoder_loss,
    soft_intro_decoder_loss,
)

from sivae_tpu.models.resnet_vae import (  # noqa: F401
    SpatialEncoder,
    SpatialDecoder,
    SoftIntroVAE,
    make_spatial_soft_intro_vae,
)
from sivae_tpu.models.fc_vae import (  # noqa: F401
    FCEncoder,
    FCDecoder,
    make_fc_soft_intro_vae,
)
from sivae_tpu.models.registry import get_model_config, MODEL_REGISTRY  # noqa: F401

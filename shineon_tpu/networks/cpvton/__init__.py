from shineon_tpu.networks.cpvton.unet import UnetGenerator  # noqa: F401
from shineon_tpu.networks.cpvton.warp import (  # noqa: F401
    GMM,
    FeatureExtraction,
    FeatureRegression,
)

from shineon_tpu.networks.sams.attentive_multispade import AttentiveMultiSpade  # noqa: F401
from shineon_tpu.networks.sams.multispade import MultiSpade  # noqa: F401
from shineon_tpu.networks.sams.sams_generator import SamsGenerator  # noqa: F401
from shineon_tpu.networks.sams.spade import SPADE, AnySpadeResBlock  # noqa: F401

from shineon_tpu.networks.flownet.flownet2 import (  # noqa: F401
    FlowNet2,
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
)

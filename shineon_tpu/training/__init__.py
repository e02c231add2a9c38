from shineon_tpu.training.checkpointing import (  # noqa: F401
    CheckpointKeeper,
    load_checkpoint,
    load_hparams,
    save_checkpoint,
)
from shineon_tpu.training.loop import Trainer  # noqa: F401
from shineon_tpu.training.optimizers import keep_decay_schedule, make_optimizer  # noqa: F401
from shineon_tpu.training.state import (  # noqa: F401
    NetState,
    TrainState,
    net_state_from_variables,
    variables_of,
)

"""Train state pytrees.

A minimal explicit replacement for the Lightning module state: parameters,
mutable collections (batch-norm stats / spectral-norm u,v), optimizer state,
and the global step. GAN models carry one sub-state per optimized network
(the reference's 3-optimizer setup, models/sams_model.py:130-145).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class NetState:
    params: Any
    stats: Any  # batch_stats etc. (may be empty dict)
    opt_state: Any


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    nets: Dict[str, NetState]

    @classmethod
    def create(cls, nets: Dict[str, NetState]):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), nets=dict(nets))


def net_state_from_variables(
    variables: Dict, tx: optax.GradientTransformation
) -> NetState:
    params = variables.get("params", {})
    stats = {k: v for k, v in variables.items() if k != "params"}
    return NetState(params=params, stats=stats, opt_state=tx.init(params))


def variables_of(net: NetState) -> Dict:
    return {"params": net.params, **net.stats}

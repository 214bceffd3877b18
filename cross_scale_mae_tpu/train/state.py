"""Train state: one pytree carrying params, mutable model state, opt state.

The reference splits this across the DDP module, the optimizer object, and
the AMP GradScaler (``util/misc.py:299-355``); on TPU there is no loss
scaling (bf16 keeps fp32 range) so the scaler slot disappears — SURVEY.md §2
notes the API slot intentionally.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    model_state: Any           # BatchNorm stats, frozen trunks
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, model_state, tx):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            model_state=model_state,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_model_state=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            model_state=(
                self.model_state if new_model_state is None else new_model_state
            ),
            opt_state=new_opt_state,
        )


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)

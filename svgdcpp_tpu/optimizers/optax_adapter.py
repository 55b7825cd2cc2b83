"""Optax adapter.

SURVEY.md §7: the hand-rolled optimizers replicate the reference's exact
update formulas for trajectory parity; this adapter opens the door to the
whole optax catalog (schedules, chaining, clipping) behind the same
``init``/``step`` contract the driver uses.

Note the sign convention: SVGD maximizes log p along phi, so the adapter
feeds optax ``-phi`` (optax optimizers are written for gradient DESCENT and
negate their input) and applies the resulting update as the position
increment.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Optimizer


class OptaxOptimizer(Optimizer):
    """Wrap any ``optax.GradientTransformation`` as an SVGD optimizer.

    >>> import optax
    >>> opt = OptaxOptimizer(optax.adam(1e-1), dimension, num_particles)
    """

    needs_params = True  # drivers pass the current coords through

    def __init__(self, transformation, dimension: int, num_particles: int):
        # lr lives inside the transformation; base lr/stabilizer are unused.
        super().__init__(dimension, num_particles, lr=0.0)
        self._tx = transformation

    def init(self, dtype=jnp.float32):
        return self._tx.init(self._zeros(dtype))

    def step(self, state, grad, params=None):
        # optax computes DESCENT updates for the passed gradient; SVGD
        # ascends along phi, so pass -phi and add the returned update.
        # params (the current coords) supports params-dependent transforms
        # like adamw/lars/add_decayed_weights.
        updates, new_state = self._tx.update(-grad, state, params)
        return new_state, updates

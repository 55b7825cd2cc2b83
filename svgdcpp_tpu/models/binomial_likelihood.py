"""Binomial likelihood model.

The reference's module header ``include/Model:15`` includes
``SVGDCpp/Model/BinomialLikelihood.hpp``, which does not exist in the
snapshot — evidence of an intended binomial-likelihood model (SURVEY.md C14).
This is the working implementation of that intent.

The target is the binomial likelihood over success probabilities
``x in (0,1)^m``:

    f(x) = prod_i C(n_i, k_i) x_i^{k_i} (1 - x_i)^{n_i - k_i}

with ``n`` trials and ``k`` observed successes per coordinate. The
log-density is supplied in closed form (stable at the domain boundary is the
caller's job; pair with SVGD bounds, reference SVGD.hpp:396-399 analog).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..core.exceptions import DimensionMismatchError
from .model import Model


def binomial_log_density(x, params):
    """log f(x) = sum_i [log C(n_i,k_i) + k_i log x_i + (n_i-k_i) log(1-x_i)]."""
    trials, successes = params[0], params[1]
    log_binom = (
        gammaln(trials + 1.0) - gammaln(successes + 1.0) - gammaln(trials - successes + 1.0)
    )
    return jnp.sum(
        log_binom + successes * jnp.log(x) + (trials - successes) * jnp.log1p(-x)
    )


def binomial_density(x, params):
    return jnp.exp(binomial_log_density(x, params))


class BinomialLikelihood(Model):
    """Binomial likelihood over per-coordinate success probabilities."""

    def __init__(self, trials, successes):
        trials = jnp.reshape(jnp.asarray(trials, dtype=float), (-1,))
        successes = jnp.reshape(jnp.asarray(successes, dtype=float), (-1,))
        if trials.shape != successes.shape:
            raise DimensionMismatchError(
                "trials and successes must have the same shape."
            )
        # Value validation (host-side, ctor only): 0 <= k <= n, n >= 0.
        # Without it gammaln(n-k+1) = inf silently makes the log-density
        # -inf everywhere while the score stays finite and pushes particles
        # to the domain boundary — SVGD would "run" on a nonsensical model.
        import numpy as np

        t_np, s_np = np.asarray(trials), np.asarray(successes)
        if np.any(t_np < 0) or np.any(s_np < 0) or np.any(s_np > t_np):
            raise ValueError(
                "BinomialLikelihood requires 0 <= successes <= trials "
                "(elementwise) and trials >= 0."
            )
        super().__init__(
            dimension=int(trials.shape[0]),
            density_fn=binomial_density,
            log_density_fn=binomial_log_density,
            parameters=(trials, successes),
        )

"""Bayesian logistic regression targets.

BASELINE.md measurement configs 3-4: "Bayesian logistic regression, d~50,
1k particles" and "hierarchical model with custom composed kernel +
per-step bandwidth adaptation". The reference library has no built-in
likelihood models beyond the multivariate normal (its BinomialLikelihood
header is a dangling include, SURVEY.md C14); these models fill that role
the TPU-first way: the whole-dataset log-likelihood is one
(num_particles x N_data) matmul under vmap — pure MXU work.

Two targets:

  * :class:`BayesianLogisticRegression` — particles are weight vectors
    w in R^d; fixed Gaussian prior precision alpha:

        log p(w) = sum_i log sigmoid(y_i x_i . w) - alpha/2 ||w||^2

  * :class:`HierarchicalBayesianLogisticRegression` — the Liu & Wang (2016)
    hierarchical setup: particles are [w, log alpha] in R^{d+1} with a
    Gamma(a0, b0) prior on the precision alpha:

        log p(w, log a) = sum_i log sigmoid(y_i x_i . w)
                          + d/2 log a - a/2 ||w||^2          (w | a)
                          + a0 log a - b0 a                  (Gamma + Jacobian
                                                              of the log-a
                                                              parametrization)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.exceptions import DimensionMismatchError
from .model import Model


def _log_sigmoid(z):
    # stable log sigmoid: -softplus(-z)
    return -jnp.logaddexp(0.0, -z)


def blr_log_density(x, params):
    features, labels, alpha = params
    logits = features @ x  # (N_data,)
    loglik = jnp.sum(_log_sigmoid(labels * logits))
    return loglik - 0.5 * alpha * jnp.sum(x * x)


class BayesianLogisticRegression(Model):
    """Logistic-regression posterior over weights with Gaussian prior."""

    def __init__(self, features, labels, prior_precision: float = 0.01):
        features = jnp.asarray(features)
        labels = jnp.reshape(jnp.asarray(labels), (-1,)).astype(features.dtype)
        if features.shape[0] != labels.shape[0]:
            raise DimensionMismatchError(
                "features and labels must agree on the data axis."
            )
        super().__init__(
            dimension=int(features.shape[1]),
            density_fn=lambda x, p: jnp.exp(blr_log_density(x, p)),
            log_density_fn=blr_log_density,
            parameters=(features, labels, jnp.asarray(prior_precision, features.dtype)),
        )


def hier_blr_log_density(x, params):
    features, labels, a0, b0 = params
    d = features.shape[1]
    w = x[:d]
    log_alpha = x[d]
    alpha = jnp.exp(log_alpha)
    logits = features @ w
    loglik = jnp.sum(_log_sigmoid(labels * logits))
    log_prior_w = 0.5 * d * log_alpha - 0.5 * alpha * jnp.sum(w * w)
    # Gamma(a0, b0) density on alpha plus the log-parametrization Jacobian
    # (d alpha = alpha d log_alpha): (a0 - 1) log a + log a = a0 log a.
    log_prior_alpha = a0 * log_alpha - b0 * alpha
    return loglik + log_prior_w + log_prior_alpha


class HierarchicalBayesianLogisticRegression(Model):
    """Hierarchical BLR: particles are [w (d), log alpha] in R^{d+1}."""

    def __init__(self, features, labels, a0: float = 1.0, b0: float = 0.01):
        features = jnp.asarray(features)
        labels = jnp.reshape(jnp.asarray(labels), (-1,)).astype(features.dtype)
        if features.shape[0] != labels.shape[0]:
            raise DimensionMismatchError(
                "features and labels must agree on the data axis."
            )
        super().__init__(
            dimension=int(features.shape[1]) + 1,
            density_fn=lambda x, p: jnp.exp(hier_blr_log_density(x, p)),
            log_density_fn=hier_blr_log_density,
            parameters=(
                features,
                labels,
                jnp.asarray(a0, features.dtype),
                jnp.asarray(b0, features.dtype),
            ),
        )


def make_synthetic_classification(rng, n_data: int = 512, dim: int = 50,
                                  w_scale: float = 2.0):
    """Deterministic synthetic two-class data for examples/benchmarks."""
    true_w = w_scale * rng.standard_normal(dim) / (dim ** 0.5)
    features = rng.standard_normal((n_data, dim))
    logits = features @ true_w
    labels = jnp.where(
        jnp.asarray(rng.uniform(size=n_data)) < 1.0 / (1.0 + jnp.exp(-logits)),
        1.0,
        -1.0,
    )
    return jnp.asarray(features), labels, jnp.asarray(true_w)

from .model import Model, mixture
from .multivariate_normal import MultivariateNormal
from .binomial_likelihood import BinomialLikelihood

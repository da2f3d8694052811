"""Non-reparameterized copies of reparameterizable distributions
(ref ``pyro/distributions/testing/fakes.py``): force ELBOs onto the
score-function gradient path in tests."""

from ..continuous import Beta, Gamma, Normal
from ..multivariate import Dirichlet


class NonreparameterizedBeta(Beta):
    has_rsample = False


class NonreparameterizedDirichlet(Dirichlet):
    has_rsample = False


class NonreparameterizedGamma(Gamma):
    has_rsample = False


class NonreparameterizedNormal(Normal):
    has_rsample = False


__all__ = [
    "NonreparameterizedBeta",
    "NonreparameterizedDirichlet",
    "NonreparameterizedGamma",
    "NonreparameterizedNormal",
]

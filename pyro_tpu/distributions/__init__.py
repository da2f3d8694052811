"""TPU-native distribution library (capabilities of ``pyro.distributions``).

Catalog parity target: ``/root/reference/pyro/distributions/__init__.py``.
"""

from . import constraints, flows, transforms
from .conjugate import BetaBinomial, DirichletMultinomial, GammaPoisson
from .continuous import (
    AsymmetricLaplace,
    Beta,
    Cauchy,
    Chi2,
    Exponential,
    Gamma,
    Gumbel,
    HalfCauchy,
    HalfNormal,
    InverseGamma,
    Kumaraswamy,
    Laplace,
    LogNormal,
    Logistic,
    Normal,
    Pareto,
    SoftLaplace,
    StudentT,
    Uniform,
    VonMises,
    Weibull,
)
from .delta import Delta, ImproperUniform, Unit
from .discrete import (
    Bernoulli,
    Binomial,
    Categorical,
    Geometric,
    Multinomial,
    NegativeBinomial,
    OneHotCategorical,
    Poisson,
)
from .hmm import DiscreteHMM, GaussianHMM
from .distribution import (
    Distribution,
    ExpandedDistribution,
    Independent,
    MaskedDistribution,
    TransformedDistribution,
)
from .kl import kl_divergence, register_kl
from .multivariate import (
    Dirichlet,
    LKJCholesky,
    LowRankMultivariateNormal,
    MultivariateNormal,
    ProjectedNormal,
)
from .score_parts import ScoreParts
from .transforms import biject_to, transform_to
from .util import enable_validation, is_validation_enabled

__all__ = [
    "flows",
    "AsymmetricLaplace",
    "Bernoulli",
    "Beta",
    "BetaBinomial",
    "Binomial",
    "Categorical",
    "Cauchy",
    "Chi2",
    "Delta",
    "Dirichlet",
    "DirichletMultinomial",
    "DiscreteHMM",
    "Distribution",
    "ExpandedDistribution",
    "Exponential",
    "Gamma",
    "GammaPoisson",
    "GaussianHMM",
    "Geometric",
    "Gumbel",
    "HalfCauchy",
    "HalfNormal",
    "ImproperUniform",
    "Independent",
    "InverseGamma",
    "Kumaraswamy",
    "LKJCholesky",
    "Laplace",
    "LogNormal",
    "Logistic",
    "LowRankMultivariateNormal",
    "MaskedDistribution",
    "Multinomial",
    "MultivariateNormal",
    "NegativeBinomial",
    "Normal",
    "OneHotCategorical",
    "Pareto",
    "Poisson",
    "ProjectedNormal",
    "ScoreParts",
    "SoftLaplace",
    "StudentT",
    "TransformedDistribution",
    "Uniform",
    "Unit",
    "VonMises",
    "Weibull",
    "biject_to",
    "constraints",
    "enable_validation",
    "is_validation_enabled",
    "kl_divergence",
    "register_kl",
    "transform_to",
    "transforms",
]

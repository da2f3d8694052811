"""Gaussian processes (ref ``pyro/contrib/gp``)."""

from . import kernels, likelihoods, models
from .models import (
    GPLVM,
    GPRegression,
    SparseGPRegression,
    VariationalGP,
    VariationalSparseGP,
)
from .parameterized import Parameterized
from .util import conditional, train

__all__ = [
    "GPLVM",
    "GPRegression",
    "Parameterized",
    "SparseGPRegression",
    "VariationalGP",
    "VariationalSparseGP",
    "conditional",
    "kernels",
    "likelihoods",
    "models",
    "train",
]

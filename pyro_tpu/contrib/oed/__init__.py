"""Optimal experiment design (ref ``pyro/contrib/oed``)."""

from . import eig, glmm
from .eig import (
    donsker_varadhan_eig,
    laplace_eig,
    marginal_eig,
    nmc_eig,
    posterior_eig,
    vnmc_eig,
)
from .search import Search

__all__ = [
    "Search",
    "donsker_varadhan_eig",
    "eig",
    "glmm",
    "laplace_eig",
    "marginal_eig",
    "nmc_eig",
    "posterior_eig",
    "vnmc_eig",
]

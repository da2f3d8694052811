"""Optimal experiment design (ref ``pyro/contrib/oed``)."""

from . import eig
from .eig import laplace_eig, marginal_eig, nmc_eig, posterior_eig, vnmc_eig
from .search import Search

__all__ = [
    "Search",
    "eig",
    "laplace_eig",
    "marginal_eig",
    "nmc_eig",
    "posterior_eig",
    "vnmc_eig",
]

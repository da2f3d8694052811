"""Epidemiological modeling (ref ``pyro/contrib/epidemiology``).

Round-1 scope: the distribution helpers (``binomial_dist``,
``beta_binomial_dist``, ``infection_dist``) and a compact
``CompartmentalModel`` supporting SVI over moment-matched relaxed states
plus prediction; the reference's quantized-NUTS machinery is a later
round.
"""

from .compartmental import CompartmentalModel
from .distributions import beta_binomial_dist, binomial_dist, infection_dist
from .models import SimpleSEIRModel, SimpleSIRModel

__all__ = [
    "CompartmentalModel",
    "SimpleSEIRModel",
    "SimpleSIRModel",
    "beta_binomial_dist",
    "binomial_dist",
    "infection_dist",
]

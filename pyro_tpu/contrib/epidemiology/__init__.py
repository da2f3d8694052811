"""Epidemiological modeling (ref ``pyro/contrib/epidemiology``).

Round-1 scope: the distribution helpers (``binomial_dist``,
``beta_binomial_dist``, ``infection_dist``) and a compact
``CompartmentalModel`` supporting SVI over moment-matched relaxed states
plus prediction; the reference's quantized-NUTS machinery is a later
round.
"""

from ...distributions.coalescent import bio_phylo_to_times
from .compartmental import CompartmentalModel
from .distributions import (
    beta_binomial_dist,
    binomial_dist,
    infection_dist,
    negative_binomial_dist,
    poisson_dist,
    set_approx_log_prob_tol,
    set_approx_sample_thresh,
    set_relaxed_distributions,
)
from .models import (
    HeterogeneousRegionalSIRModel,
    HeterogeneousSIRModel,
    OverdispersedSEIRModel,
    OverdispersedSIRModel,
    RegionalSIRModel,
    SimpleSEIRDModel,
    SimpleSEIRModel,
    SimpleSIRModel,
    SparseSIRModel,
    SuperspreadingSEIRModel,
    SuperspreadingSIRModel,
    UnknownStartSIRModel,
)

__all__ = [
    "bio_phylo_to_times",
    "CompartmentalModel",
    "HeterogeneousRegionalSIRModel",
    "HeterogeneousSIRModel",
    "OverdispersedSEIRModel",
    "OverdispersedSIRModel",
    "RegionalSIRModel",
    "SimpleSEIRDModel",
    "SimpleSEIRModel",
    "SimpleSIRModel",
    "beta_binomial_dist",
    "binomial_dist",
    "infection_dist",
    "negative_binomial_dist",
    "poisson_dist",
    "set_approx_log_prob_tol",
    "set_approx_sample_thresh",
    "set_relaxed_distributions",
]

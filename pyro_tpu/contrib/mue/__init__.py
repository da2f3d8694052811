"""MuE: mutational-emission biosequence models (ref ``pyro/contrib/mue``)."""

from .dataloaders import BiosequenceDataset, alphabets, write
from .missingdatahmm import MissingDataDiscreteHMM
from .models import FactorMuE, ProfileHMM
from .statearrangers import Profile

__all__ = [
    "BiosequenceDataset",
    "FactorMuE",
    "MissingDataDiscreteHMM",
    "Profile",
    "ProfileHMM",
    "alphabets",
    "write",
]

"""Example dataset loaders (ref ``pyro/contrib/examples/``).

Loaders that require network downloads (MNIST, BART ridership, JSB
chorales, nextstrain, scANVI) are gated with informative errors in this
zero-egress environment; the synthesis logic (multi-MNIST composition)
works on any locally-provided digit arrays.
"""

from . import multi_mnist, polyphonic_data_loader, util

__all__ = ["multi_mnist", "polyphonic_data_loader", "util"]

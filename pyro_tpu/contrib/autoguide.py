"""Deprecated alias: ``pyro.contrib.autoguide`` moved to
``pyro.infer.autoguide`` (ref ``pyro/contrib/autoguide.py``)."""

import warnings

from ..infer.autoguide import *  # noqa: F401,F403

warnings.warn(
    "pyro_tpu.contrib.autoguide has moved to pyro_tpu.infer.autoguide. "
    "The contrib alias will stop working in a future release.",
    DeprecationWarning,
)

"""Backend-agnostic API shim (ref ``pyro/generic.py``: a deprecated
pass-through to the external ``pyroapi`` package).

``pyroapi`` dispatches a generic ``pyro.*`` namespace across backends
("pyro", "minipyro", "numpyro", ...).  It is not installed here; this
module exposes the same two names backed by pyro_tpu itself so
`from pyro_tpu.generic import pyro` works for single-backend code.
"""

import pyro_tpu as pyro  # noqa: F401


def pyro_backend(*args, **kwargs):
    raise ImportError(
        "pyro_backend requires the external 'pyroapi' package, which is "
        "not installed; pyro_tpu is the active backend."
    )

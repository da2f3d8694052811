"""Named-tensor (funsor) frontend, implemented natively on JAX.

Ref ``pyro/contrib/funsor/__init__.py``: in the reference this package is
an alternative effect-handler backend built on the external ``funsor``
library — named lazy tensors, ``to_funsor``/``to_data`` conversion, and
funsor-built ELBOs.  Here the same surface is provided without the
external dependency:

  * :mod:`~pyro_tpu.contrib.funsor.terms` — a native named-tensor term
    algebra (``Tensor``/``Variable``/``Number``, lazy ``Binary``/
    ``Reduce``, named alignment, reductions, substitution) on JAX arrays.
  * :mod:`~pyro_tpu.contrib.funsor.runtime` — the global
    :class:`DimStack` name<->dim allocator (ref ``handlers/runtime.py``).
  * :mod:`~pyro_tpu.contrib.funsor.primitives` — effectful
    :func:`to_funsor` / :func:`to_data`.
  * :mod:`~pyro_tpu.contrib.funsor.handlers` / :mod:`infer` — the
    backend namespace; enumeration, markov, and TVE ELBOs are pyro_tpu's
    native engines (they already run funsor's algorithms — trace-time dim
    allocation and tensor variable elimination — directly on XLA).

Registered as the ``"contrib.funsor"`` pyroapi backend, mirroring the
reference's ``pyroapi.register_backend`` call.
"""

from pyro_tpu import (  # noqa: F401
    clear_param_store,
    deterministic,
    enable_validation,
    factor,
    get_param_store,
    module,
    param,
    random_module,
    sample,
    set_rng_seed,
    subsample,
)
from pyro_tpu.contrib.pyroapi import register_backend as _register_backend

from . import handlers, infer, terms  # noqa: F401
from .handlers import condition, do, markov, named, vectorized_markov  # noqa: F401
from .handlers import plate as _plate
from .primitives import to_data, to_funsor  # noqa: F401
from .runtime import _DIM_STACK, DimRequest, DimStack, DimType  # noqa: F401
from .terms import (  # noqa: F401
    Bint,
    Funsor,
    Number,
    Real,
    Reals,
    Tensor,
    Variable,
    ops,
)


def plate(*args, **kwargs):
    # ref __init__.py:24-25: the backend's plate drops the dual-use fn arg
    return _plate(*args, **kwargs)


_register_backend(
    "contrib.funsor",
    {
        "distributions": "pyro_tpu.distributions",
        "handlers": "pyro_tpu.contrib.funsor.handlers",
        "infer": "pyro_tpu.contrib.funsor.infer",
        "ops": "jax.numpy",
        "optim": "pyro_tpu.optim",
        "pyro": "pyro_tpu.contrib.funsor",
    },
)

__all__ = [
    "Bint",
    "Funsor",
    "Number",
    "Real",
    "Reals",
    "Tensor",
    "Variable",
    "clear_param_store",
    "condition",
    "deterministic",
    "do",
    "enable_validation",
    "factor",
    "get_param_store",
    "markov",
    "module",
    "named",
    "ops",
    "param",
    "plate",
    "random_module",
    "sample",
    "set_rng_seed",
    "subsample",
    "to_data",
    "to_funsor",
    "vectorized_markov",
]

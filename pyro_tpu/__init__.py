"""pyro_tpu: a TPU-native probabilistic programming framework.

From-scratch JAX/XLA implementation with the capabilities of pyro-ppl/pyro
(reference mounted read-only; see SURVEY.md).  The effect-handler runtime is
trace-time pure — handlers compose under ``jit``/``vmap`` — with explicit
PRNG keys, functional parameter pytrees, ``lax.associative_scan`` sequence
models, and ``jax.sharding`` meshes for multi-chip inference.
"""

from . import distributions, infer, optim, poutine
from .params.param_store import clear_param_store, get_param_store
from .poutine.handlers import condition, do
from .poutine.runtime import set_rng_seed
from . import settings
from .logger import log
from .util import get_rng_state, set_rng_state
from .primitives import (
    barrier,
    deterministic,
    enable_validation,
    factor,
    module,
    param,
    plate,
    sample,
    subsample,
    validation_enabled,
)
from .poutine.plate_messenger import plate_stack
from .poutine.enum_messenger import markov
from .poutine.vectorized_markov import vectorized_markov
from .infer.inspect import render_model

__version__ = "0.1.0"

__all__ = [
    "barrier",
    "clear_param_store",
    "deterministic",
    "distributions",
    "enable_validation",
    "factor",
    "get_param_store",
    "infer",
    "markov",
    "vectorized_markov",
    "module",
    "optim",
    "param",
    "plate",
    "plate_stack",
    "render_model",
    "poutine",
    "sample",
    "get_rng_state",
    "get_rng_state",
    "condition",
    "do",
    "iarange",
    "irange",
    "log",
    "random_module",
    "set_rng_seed",
    "settings",
    "set_rng_state",
    "set_rng_state",
    "subsample",
    "validation_enabled",
]


# deprecated reference aliases
iarange = plate  # noqa: F405  (pre-0.3 name for vectorized plate)
irange = plate  # noqa: F405  (pre-0.3 name for sequential plate)


def random_module(name, nn_module, prior, *args, **kwargs):
    """Deprecated (ref ``primitives.py:random_module``): lift a module's
    parameters to random variables.  Use
    :func:`pyro_tpu.nn.random_flax_module` for flax modules."""
    raise NotImplementedError(
        "pyro.random_module is deprecated in the reference; use "
        "pyro_tpu.nn.random_flax_module(name, module, prior, ...) instead."
    )

"""Inference namespace for the funsor frontend.

Ref ``pyro/contrib/funsor/infer/__init__.py``: the funsor backend's ELBO
surface.  The reference re-implements Trace/TraceEnum/TraceTMC ELBOs by
building funsor contraction terms; pyro_tpu's native estimators compute
the identical objectives (tensor variable elimination incl. markov
chains, DiCE factors, TMC ancestor thinning) directly through
``ops/contract.py`` + ``infer/traceenum_elbo.py``, so the funsor names
alias them:

  * ``TraceMarkovEnum_ELBO`` — the reference's vectorized-markov-aware
    enum ELBO (``infer/traceenum_elbo.py:173-283``); our native
    ``TraceEnum_ELBO`` handles ``pyro.vectorized_markov`` sites directly
    (boundary-absorbed scan elimination, ``ops/markov_product.py``), so
    it *is* that estimator.
  * ``Jit*`` aliases — under JAX, jit is ``jax.jit`` around the loss;
    the classes are the same objects (ref semantics preserved: identical
    estimates, compiled execution).
"""

from pyro_tpu.infer import (  # noqa: F401
    ELBO,
    SVI,
    JitTrace_ELBO,
    JitTraceEnum_ELBO,
    Trace_ELBO,
    TraceEnum_ELBO,
    TraceTMC_ELBO,
    config_enumerate,
    infer_discrete,
)

# The native enum engine recognizes vectorized_markov sites without a
# dedicated class (ref TraceMarkovEnum_ELBO).
TraceMarkovEnum_ELBO = TraceEnum_ELBO
JitTraceMarkovEnum_ELBO = TraceEnum_ELBO
JitTraceTMC_ELBO = TraceTMC_ELBO

__all__ = [
    "ELBO",
    "SVI",
    "JitTraceEnum_ELBO",
    "JitTraceMarkovEnum_ELBO",
    "JitTraceTMC_ELBO",
    "JitTrace_ELBO",
    "TraceEnum_ELBO",
    "TraceMarkovEnum_ELBO",
    "TraceTMC_ELBO",
    "Trace_ELBO",
    "config_enumerate",
    "infer_discrete",
]

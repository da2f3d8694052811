"""Gate for the funsor-backed named-tensor backend.

Ref ``pyro/contrib/funsor``: an alternative effect-handler backend built
on the external ``funsor`` package (named tensors + lazy contraction).
``funsor`` is not available in this environment, and its role — static
named-dim allocation and tensor-variable-elimination contractions — is
served natively here by trace-time enum dim allocation
(``pyro_tpu.poutine.enum_messenger``) and the packed contraction engine
(``pyro_tpu.ops.contract``), which run the same TVE algorithm
(arXiv:1902.03210) directly on XLA.

Importing this module raises ImportError with that guidance.
"""

raise ImportError(
    "pyro_tpu.contrib.funsor requires the external 'funsor' package, which "
    "is not installed. pyro_tpu's core already provides the funsor "
    "backend's functionality natively: parallel enumeration with "
    "trace-time dim allocation (pyro_tpu.poutine.markov / enum) and "
    "tensor-variable-elimination contractions (pyro_tpu.ops.contract, "
    "TraceEnum_ELBO, infer_discrete)."
)

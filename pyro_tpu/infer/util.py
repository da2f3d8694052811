"""Inference utilities (ref ``pyro/infer/util.py``)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..distributions.util import is_identically_zero
from ..poutine.util import site_is_subsample


def is_validation_enabled() -> bool:
    from ..primitives import _VALIDATION_ENABLED

    return _VALIDATION_ENABLED


def torch_item(x):
    """Scalar extraction (named for API parity; works on jax arrays)."""
    return x if isinstance(x, (int, float)) else float(jax.device_get(x))


def zero_grads(params):
    """No-op under JAX's functional gradients; kept for API parity."""
    return params


class MultiFrameTensor(dict):
    """Accumulate log-prob tensors defined on different plate-frame sets and
    sum them down to a target frame set.

    Ref ``pyro/infer/util.py:122`` — used by TraceGraph_ELBO and the
    Rao-Blackwellized surrogate in Trace_ELBO: a downstream cost defined on
    frames F must be summed over dims not shared with the target site's
    frames before multiplying its score function.
    """

    def __init__(self, *items):
        super().__init__()
        self.add(*items)

    def add(self, *items) -> None:
        for cond_indep_stack, value in items:
            frames = frozenset(f for f in cond_indep_stack if f.dim is not None)
            if frames in self:
                self[frames] = self[frames] + value
            else:
                self[frames] = value

    def sum_to(self, target_frames):
        target_frames = frozenset(
            f for f in target_frames if f.dim is not None
        )
        total = None
        for frames, value in self.items():
            for f in frames - target_frames:
                if value.ndim >= -f.dim and value.shape[f.dim] != 1:
                    value = jnp.sum(value, axis=f.dim, keepdims=True)
            while value.ndim and value.shape[0] == 1:
                value = jnp.squeeze(value, axis=0)
            total = value if total is None else total + value
        return total


def get_plate_stacks(trace) -> Dict[str, List]:
    """Ref ``infer/util.py:get_plate_stacks``."""
    return {
        name: [f for f in node["cond_indep_stack"] if f.dim is not None]
        for name, node in trace.nodes.items()
        if node["type"] == "sample" and not site_is_subsample(node)
    }


def check_fully_reparametrized(guide_site) -> None:
    from ..distributions.util import is_identically_zero

    log_prob, score_function_term, entropy_term = guide_site["score_parts"]
    fully_rep = is_identically_zero(score_function_term)
    if not fully_rep:
        raise NotImplementedError(
            "All distributions in the guide must be fully reparameterized "
            f"here, but site '{guide_site['name']}' is not."
        )

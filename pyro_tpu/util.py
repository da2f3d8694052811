"""Validation and misc utilities (ref ``pyro/util.py``)."""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from .poutine.util import site_is_subsample


def set_rng_seed(rng_seed: int) -> None:
    """Ref ``pyro/util.py:37``."""
    from .poutine.runtime import set_rng_seed as _set

    _set(rng_seed)


def get_rng_state():
    """Snapshot the global seeding state (ref ``pyro/util.py:48``): the
    key of the innermost active ``seed`` handler plus numpy's state, so a
    training loop can be checkpointed and resumed deterministically."""
    import numpy as np

    from .poutine.runtime import _PYRO_STACK

    key = None
    for msngr in reversed(_PYRO_STACK):
        if type(msngr).__name__ == "SeedMessenger":
            key = msngr.rng_key
            break
    return {"seed_key": key, "numpy": np.random.get_state()}


def set_rng_state(state) -> None:
    """Restore state captured by :func:`get_rng_state` (ref ``util.py:55``)."""
    import numpy as np

    from .poutine.runtime import _PYRO_STACK

    np.random.set_state(state["numpy"])
    if state["seed_key"] is not None:
        for msngr in reversed(_PYRO_STACK):
            if type(msngr).__name__ == "SeedMessenger":
                msngr.rng_key = state["seed_key"]
                break


def warn_if_nan(value, msg: str = ""):
    """Eager NaN check (ref ``pyro/util.py:92``).  Works only outside jit;
    inside jit use ``jax.debug`` tooling or checkify."""
    if isinstance(value, jax.core.Tracer):
        return value
    if jnp.any(jnp.isnan(value)):
        warnings.warn(f"Encountered NaN{': ' + msg if msg else '.'}")
    return value


def warn_if_inf(value, msg: str = "", allow_posinf=False, allow_neginf=False):
    if isinstance(value, jax.core.Tracer):
        return value
    if not allow_posinf and jnp.any(value == jnp.inf):
        warnings.warn(f"Encountered +inf{': ' + msg if msg else '.'}")
    if not allow_neginf and jnp.any(value == -jnp.inf):
        warnings.warn(f"Encountered -inf{': ' + msg if msg else '.'}")
    return value


def check_model_guide_match(model_trace, guide_trace, max_plate_nesting=None):
    """Check shape/site agreement between model and guide.

    Ref ``pyro/util.py:314-462``: guide must not have extra non-auxiliary
    sites; shared sites must agree in shape; model-only sites are fine
    (they are sampled from the prior).
    """
    # 1. guide sites should appear in model (unless auxiliary)
    model_sites = {
        name
        for name, site in model_trace.nodes.items()
        if site["type"] == "sample" and not site_is_subsample(site)
    }
    guide_sites = {
        name
        for name, site in guide_trace.nodes.items()
        if site["type"] == "sample"
        and not site_is_subsample(site)
        and not site["infer"].get("is_auxiliary")
        and not site["infer"].get("_deterministic")
    }
    extra = guide_sites - model_sites
    if extra:
        warnings.warn(
            f"Found non-auxiliary vars in guide but not model: {extra}"
        )
    # 2. observed sites should not be in guide
    observed = {
        name
        for name, site in model_trace.nodes.items()
        if site["type"] == "sample" and site["is_observed"]
    }
    bad = observed & guide_sites
    if bad:
        warnings.warn(f"Found observed sites in guide: {bad}")
    # 2b. model-only latents must not request sequential enumeration —
    # only the guide is queue-expanded (ref ``pyro/util.py:371-380``)
    for name in model_sites - guide_sites - observed:
        site = model_trace.nodes[name]
        if (
            site["infer"].get("enumerate") == "sequential"
            and site["infer"].get("_enumerate_dim") is None
        ):
            raise NotImplementedError(
                f"At site {name!r}, model-side sequential enumeration "
                "is not implemented. Try parallel enumeration or "
                "guide-side enumeration."
            )
    # 3. shape agreement
    for name in model_sites & guide_sites:
        model_site = model_trace.nodes[name]
        guide_site = guide_trace.nodes[name]
        model_shape = model_site["fn"].shape()
        guide_shape = guide_site["fn"].shape()
        if model_shape != guide_shape:
            # allow broadcastable shapes
            from .distributions.util import broadcast_shape

            try:
                broadcast_shape(model_shape, guide_shape)
            except ValueError:
                raise ValueError(
                    f"Model and guide shapes disagree at site '{name}': "
                    f"{model_shape} vs {guide_shape}"
                )


def check_site_shape(site, max_plate_nesting: int) -> None:
    """Ref ``pyro/util.py:465``: a site's log_prob must fit inside the
    declared plate dims — every dim right of ``-max_plate_nesting`` must be
    either size 1 or declared by a plate; dims further left are reserved
    for enumeration."""
    from itertools import zip_longest

    if "log_prob" not in site:
        return
    actual_shape = list(site["log_prob"].shape)

    expected_shape: list = []
    for f in site["cond_indep_stack"]:
        if f.dim is not None:
            assert f.dim < 0
            if len(expected_shape) < -f.dim:
                expected_shape = [None] * (
                    -f.dim - len(expected_shape)
                ) + expected_shape
            if expected_shape[f.dim] is not None:
                raise ValueError(
                    f'at site "{site["name"]}" within plate("{f.name}", '
                    f"dim={f.dim}), dim collision\n"
                    "Try setting dim arg in other plates."
                )
            expected_shape[f.dim] = (
                f.subsample_size
                if f.subsample_size is not None
                else f.size
            )
    expected_shape = [-1 if e is None else e for e in expected_shape]

    if len(expected_shape) > max_plate_nesting:
        raise ValueError(
            f'at site "{site["name"]}", plate stack overflow\n'
            f"Try increasing max_plate_nesting to at least "
            f"{len(expected_shape)}"
        )

    # ignore dims left of max_plate_nesting (enumeration/particles)
    if max_plate_nesting < len(actual_shape):
        actual_shape = actual_shape[
            len(actual_shape) - max_plate_nesting :
        ]

    # model-enumerated sites keep COMPACT log_probs (size-1 plate axes
    # for constant-over-plate factors; the packed TVE engine is
    # ordinal-aware), so broadcastable size-1 is valid there
    compact_ok = site["infer"].get("_enumerate_dim") is not None
    for actual_size, expected_size in zip_longest(
        reversed(actual_shape), reversed(expected_shape), fillvalue=1
    ):
        if compact_ok and actual_size == 1:
            continue
        if expected_size != -1 and expected_size != actual_size:
            raise ValueError(
                f'at site "{site["name"]}", invalid log_prob shape\n'
                f"Expected {expected_shape}, actual {actual_shape}\n"
                "Try one of the following fixes:\n"
                "- enclose the batched tensor in a with pyro.plate(...) "
                "context\n"
                "- .to_event(...) the distribution being sampled\n"
                "- .permute() data dimensions"
            )

    enum_dim = site["infer"].get("_enumerate_dim")
    if enum_dim is not None:
        if (
            len(site["fn"].batch_shape) >= -enum_dim
            and site["fn"].batch_shape[enum_dim] != 1
        ):
            raise ValueError(
                f'Enumeration dim conflict at site "{site["name"]}"\n'
                "Try increasing pyro.markov history size"
            )


def timed():
    import time
    from contextlib import contextmanager

    @contextmanager
    def _timed():
        class Elapsed:
            elapsed = 0.0

        e = Elapsed()
        start = time.monotonic()
        try:
            yield e
        finally:
            e.elapsed = time.monotonic() - start

    return _timed()


def ignore_jit_warnings():
    from contextlib import nullcontext

    return nullcontext()


def optional(context, condition):
    from contextlib import nullcontext

    return context if condition else nullcontext()


def deep_getattr(obj, name: str):
    for part in name.split("."):
        obj = getattr(obj, part)
    return obj

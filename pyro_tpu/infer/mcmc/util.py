"""Model → potential-function machinery for MCMC.

Ref ``pyro/infer/mcmc/util.py:370`` (initialize_model, _PEMaker,
_find_valid_initial_params).  The potential function is a pure map from a
dict of *unconstrained* latents to -log joint density (with the change-of-
variables Jacobian), compiled once by the kernel's jit.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ... import poutine
from ...poutine.messenger import Messenger as _Messenger
from ...distributions import constraints
from ...distributions.transforms import biject_to
from ...poutine.util import prune_subsample_sites, site_is_subsample


class ModelInfo(NamedTuple):
    initial_params: Dict[str, jnp.ndarray]  # unconstrained
    potential_fn: Callable
    postprocess_fn: Callable  # unconstrained dict -> constrained dict (+deterministics)
    prototype_trace: object
    transforms: Dict[str, object]  # site -> biject_to(support)


def _latent_sites(trace):
    sites = {}
    for name, site in trace.nodes.items():
        if (
            site["type"] == "sample"
            and not site["is_observed"]
            and not site_is_subsample(site)
            and not site["infer"].get("_deterministic")
        ):
            sites[name] = site
    return sites


def get_potential_fn(
    model,
    model_args=(),
    model_kwargs=None,
    prototype_trace=None,
    rng_key=None,
    max_plate_nesting=None,
):
    model_kwargs = model_kwargs or {}
    if rng_key is None:
        rng_key = jax.random.key(0)
    if prototype_trace is None:
        prototype_trace = poutine.trace(
            poutine.seed(model, rng_key=rng_key)
        ).get_trace(*model_args, **model_kwargs)
        prototype_trace = prune_subsample_sites(prototype_trace)
    all_latents = _latent_sites(prototype_trace)
    if not all_latents:
        raise ValueError("model has no latent sample sites")
    # discrete latents with enumerate support are marginalized out of the
    # potential (ref mcmc/util.py:244 TraceEinsumEvaluator: HMC/NUTS runs
    # on the continuous sites of the ENUMERATED model); samples contain
    # only continuous sites — recover discrete posteriors with
    # infer_discrete, as in the reference
    enum_sites = []
    latents = {}
    for name, site in all_latents.items():
        if getattr(site["fn"], "is_discrete", False):
            if getattr(site["fn"], "has_enumerate_support", False):
                enum_sites.append(name)
            else:
                raise NotImplementedError(
                    f"site '{name}' is discrete with no enumerate "
                    "support; HMC/NUTS requires continuous or "
                    "enumerable latents"
                )
        else:
            latents[name] = site
    if enum_sites and not latents:
        raise ValueError(
            "all latent sites are discrete; use infer_discrete or "
            "discrete inference instead of HMC/NUTS"
        )
    if enum_sites and max_plate_nesting is None:
        # guess from the prototype trace's plate depth
        max_plate_nesting = max(
            (
                len(site["cond_indep_stack"])
                for site in prototype_trace.nodes.values()
                if site["type"] == "sample"
            ),
            default=0,
        )
    transforms = {
        name: biject_to(site["fn"].support) for name, site in latents.items()
    }

    def unconstrain(constrained: Dict) -> Dict:
        return {
            name: transforms[name].inv(value)
            for name, value in constrained.items()
        }

    def constrain(unconstrained: Dict) -> Dict:
        return {
            name: transforms[name](value)
            for name, value in unconstrained.items()
        }

    def _log_joint_plain(constrained: Dict) -> jnp.ndarray:
        cond_model = poutine.condition(model, data=constrained)
        trace = poutine.trace(cond_model).get_trace(
            *model_args, **model_kwargs
        )
        trace = prune_subsample_sites(trace)
        return trace.log_prob_sum(
            site_filter=lambda name, site: not site["infer"].get(
                "_deterministic"
            )
        )

    def _log_joint_enum(constrained: Dict) -> jnp.ndarray:
        """log Σ_discrete p(z_cont, z_disc, obs): trace the conditioned
        model under parallel enumeration and contract the enumerated dims
        with the TraceEnum machinery (empty guide ⇒ the DiCE expectation
        reduces to the marginal log density)."""
        from ...infer.enum import config_enumerate
        from ...infer.traceenum_elbo import _compute_dice_elbo
        from ...poutine.enum_messenger import EnumMessenger

        first_dim = -1 - int(max_plate_nesting)
        cond_model = poutine.condition(model, data=constrained)
        enum_model = EnumMessenger(first_available_dim=first_dim)(
            poutine.seed(
                config_enumerate(cond_model), rng_key=jax.random.key(0)
            )
        )
        model_trace = poutine.trace(enum_model).get_trace(
            *model_args, **model_kwargs
        )
        model_trace = prune_subsample_sites(model_trace)
        model_trace.compute_log_prob(
            site_filter=lambda name, site: not site["infer"].get(
                "_do_not_score"
            )
            and not site["infer"].get("_deterministic")
        )
        model_trace.pack_tensors()
        guide_trace = poutine.trace(lambda *a, **k: None).get_trace(
            *model_args, **model_kwargs
        )
        guide_trace.pack_tensors(model_trace.plate_to_symbol)
        return _compute_dice_elbo(model_trace, guide_trace)

    def potential_fn(z: Dict) -> jnp.ndarray:
        """-log p(constrained(z), obs) - log|det J(z)|."""
        constrained = constrain(z)
        log_joint = (
            _log_joint_enum(constrained)
            if enum_sites
            else _log_joint_plain(constrained)
        )
        for name, t in transforms.items():
            ladj = t.log_abs_det_jacobian(z[name], constrained[name])
            extra = (
                jnp.ndim(ladj)
                - (jnp.ndim(z[name]) - t.domain.event_dim)
            )
            # sum any remaining batch dims to a scalar
            log_joint = log_joint + jnp.sum(ladj)
        return -log_joint

    def postprocess_fn(z: Dict, return_deterministic: bool = True) -> Dict:
        constrained = constrain(z)
        if return_deterministic:
            det_sites = [
                name
                for name, site in prototype_trace.nodes.items()
                if site["type"] == "sample"
                and site["infer"].get("_deterministic")
            ]
            if det_sites:
                tr = poutine.trace(
                    poutine.condition(model, data=constrained)
                ).get_trace(*model_args, **model_kwargs)
                for name in det_sites:
                    constrained[name] = tr.nodes[name]["value"]
        return constrained

    return potential_fn, postprocess_fn, transforms, prototype_trace, unconstrain


def _find_valid_initial_params(
    potential_fn,
    prototype_unconstrained: Dict,
    rng_key,
    init_strategy: str = "uniform",
    prior_sampler: Optional[Callable] = None,
    radius: float = 2.0,
    max_tries: int = 100,
):
    """Retry init draws until potential and grad are finite
    (ref ``mcmc/util.py:325-368``).  Jittable: fixed-trial while_loop."""

    flat_proto, unravel = jax.flatten_util.ravel_pytree(
        prototype_unconstrained
    )
    n = flat_proto.shape[0]

    def draw(key):
        if init_strategy == "uniform":
            return jax.random.uniform(
                key, (n,), minval=-radius, maxval=radius
            )
        if init_strategy == "sample" and prior_sampler is not None:
            return jax.flatten_util.ravel_pytree(prior_sampler(key))[0]
        return jax.random.uniform(key, (n,), minval=-radius, maxval=radius)

    def is_valid(flat):
        z = unravel(flat)
        pe, grad = jax.value_and_grad(potential_fn)(z)
        gflat, _ = jax.flatten_util.ravel_pytree(grad)
        return jnp.isfinite(pe) & jnp.all(jnp.isfinite(gflat))

    def cond(state):
        i, key, flat, ok = state
        return (~ok) & (i < max_tries)

    def body(state):
        i, key, flat, ok = state
        key, sub = jax.random.split(key)
        flat_new = draw(sub)
        ok_new = is_valid(flat_new)
        return i + 1, key, flat_new, ok_new

    key, sub = jax.random.split(rng_key)
    flat0 = draw(sub)
    state = (jnp.zeros((), jnp.int32), key, flat0, is_valid(flat0))
    _, _, flat, ok = jax.lax.while_loop(cond, body, state)
    return unravel(flat), ok


class _InitValuesMessenger(_Messenger):
    """Set sample-site values without marking them observed."""

    def __init__(self, data):
        super().__init__()
        self.data = data

    def _pyro_sample(self, msg):
        name = msg["name"]
        if name in self.data and not msg["is_observed"]:
            msg["value"] = jnp.asarray(
                self.data[name], jnp.result_type(float)
            )
            msg["done"] = True


def initialize_model(
    model,
    model_args=(),
    model_kwargs=None,
    init_strategy: str = "uniform",
    init_params: Optional[Dict] = None,
    init_values: Optional[Dict] = None,
    rng_key=None,
    max_plate_nesting=None,
) -> ModelInfo:
    """Ref ``mcmc/util.py:370-505``.

    ``init_params`` are UNCONSTRAINED site values; ``init_values`` are
    CONSTRAINED site values (the reference's ``init_to_value`` strategy) —
    missing sites fall back to a prototype-trace draw.
    """
    model_kwargs = model_kwargs or {}
    if rng_key is None:
        rng_key = jax.random.key(0)
    k_proto, k_init = jax.random.split(rng_key)
    # inject known init values during the prototype trace so sites with
    # unsampleable priors (ImproperUniform) never need to draw; unlike
    # poutine.condition this keeps the sites latent
    proto_model = (
        _InitValuesMessenger(dict(init_values))(model)
        if init_values
        else model
    )
    (
        potential_fn,
        postprocess_fn,
        transforms,
        prototype_trace,
        unconstrain,
    ) = get_potential_fn(
        proto_model,
        model_args,
        model_kwargs,
        rng_key=k_proto,
        max_plate_nesting=max_plate_nesting,
    )

    # only sites the potential runs over (discrete enumerable latents are
    # marginalized out and carry no transform)
    latents = {
        name: site
        for name, site in _latent_sites(prototype_trace).items()
        if name in transforms
    }
    proto_unconstrained = unconstrain(
        {name: site["value"] for name, site in latents.items()}
    )

    if init_params is not None:
        initial = init_params
    elif callable(init_strategy):
        # reference-parity: initialize_model accepts the autoguide
        # init_to_* strategies (ref mcmc/util.py:370 init_strategy=
        # init_to_uniform); apply per latent site, then unconstrain
        initial = unconstrain(
            {
                name: jnp.asarray(
                    init_strategy(site), jnp.result_type(float)
                )
                for name, site in latents.items()
            }
        )
    elif init_values is not None:
        merged = {
            name: jnp.asarray(
                init_values.get(name, site["value"]),
                jnp.result_type(float),
            )
            for name, site in latents.items()
        }
        initial = unconstrain(merged)
    else:

        def prior_sampler(key):
            tr = poutine.trace(
                poutine.seed(model, rng_key=key)
            ).get_trace(*model_args, **model_kwargs)
            tr = prune_subsample_sites(tr)
            return unconstrain(
                {
                    name: tr.nodes[name]["value"]
                    for name in latents
                    if name in transforms
                }
            )

        initial, ok = _find_valid_initial_params(
            potential_fn,
            proto_unconstrained,
            k_init,
            init_strategy=init_strategy,
            prior_sampler=prior_sampler if init_strategy == "sample" else None,
        )
    return ModelInfo(
        initial, potential_fn, postprocess_fn, prototype_trace, transforms
    )

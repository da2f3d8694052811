"""Automatic guide generation.

Ref ``pyro/infer/autoguide/guides.py``: ``AutoGuide:50``, ``AutoGuideList
:184``, ``AutoDelta:319``, ``AutoNormal:415``, ``AutoContinuous:605``,
``AutoMultivariateNormal:844``, ``AutoDiagonalNormal:909``,
``AutoLowRankMultivariateNormal:965``, ``AutoLaplaceApproximation:1133``.

A guide scans the model once (prototype trace), then at each call creates
``pyro.param`` sites and ``pyro.sample`` statements that mirror the model's
latent sites — re-entering the model's plates so subsampling and
broadcasting behave identically.
"""

from __future__ import annotations

from contextlib import ExitStack
from typing import Callable, Dict, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from ... import poutine
from ...distributions import Delta, Normal, constraints
from ...distributions import LowRankMultivariateNormal, MultivariateNormal
from ...distributions.distribution import Distribution, TransformedDistribution
from ...distributions.transforms import biject_to
from ...poutine.plate_messenger import PlateMessenger
from ...poutine.util import prune_subsample_sites, site_is_subsample
from ...primitives import param as pyro_param
from ...primitives import sample as pyro_sample
from ...primitives import deterministic as pyro_deterministic
from .initialization import init_to_feasible, init_to_median


def _expand_init_to_full(value, frames, event_dim: int):
    """Tile a (possibly subsampled) prototype value to full plate size along
    each subsampled plate dim (ref ``guides.py`` use of ``periodic_repeat``,
    ``pyro/ops/tensor_utils.py:periodic_repeat``)."""
    for f in frames:
        if f.subsample_size == f.size:
            continue
        dim = f.dim - event_dim  # index from the right incl. event dims
        if value.ndim + dim < 0:
            value = jnp.reshape(
                value, (1,) * (-dim - value.ndim) + value.shape
            )
        axis = value.ndim + dim
        cur = value.shape[axis]
        if cur == f.size:
            continue
        if cur == 1:
            reps = [1] * value.ndim
            reps[axis] = f.size
            value = jnp.tile(value, reps)
        else:
            reps = [1] * value.ndim
            reps[axis] = -(-f.size // cur)
            value = jnp.tile(value, reps)
            value = jax.lax.slice_in_dim(value, 0, f.size, axis=axis)
    return value


def _is_latent(site) -> bool:
    return (
        site["type"] == "sample"
        and not site["is_observed"]
        and not site_is_subsample(site)
        and not site["infer"].get("_deterministic")
        and not site["infer"].get("is_auxiliary")
    )


class AutoGuide:
    """Base class (ref ``guides.py:50``)."""

    def __init__(self, model, *, create_plates: Optional[Callable] = None):
        self.model = model
        self.create_plates = create_plates
        self.prototype_trace = None
        self._prototype_frames: Dict[str, tuple] = {}
        self._name = type(self).__name__

    def _setup_prototype(self, *args, **kwargs) -> None:
        with poutine.block():
            trace = poutine.trace(
                poutine.seed(self.model, rng_key=jax.random.key(0))
            ).get_trace(*args, **kwargs)
        self.prototype_trace = prune_subsample_sites(trace)
        self._prototype_frames = {}
        for name, site in self.prototype_trace.nodes.items():
            if _is_latent(site):
                self._prototype_frames[name] = tuple(
                    f for f in site["cond_indep_stack"] if f.dim is not None
                )

    def _create_plates(self, *args, **kwargs):
        if self.create_plates is None:
            plates = {}
            for name, frames in self._prototype_frames.items():
                for f in frames:
                    if f.name not in plates:
                        plates[f.name] = PlateMessenger(
                            f.name,
                            f.size,
                            subsample_size=f.subsample_size
                            if f.subsample_size != f.size
                            else None,
                            dim=f.dim,
                        )
            return plates
        created = self.create_plates(*args, **kwargs)
        if isinstance(created, PlateMessenger):
            created = [created]
        return {p.name: p for p in created}

    def __call__(self, *args, **kwargs) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def median(self, *args, **kwargs) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def quantiles(self, quantiles, *args, **kwargs):
        raise NotImplementedError


class AutoGuideList(AutoGuide):
    """Compose partial guides over disjoint site sets (ref ``guides.py:184``)."""

    def __init__(self, model):
        super().__init__(model)
        self._guides = []

    def append(self, part) -> None:
        if not isinstance(part, AutoGuide):
            # plain callables are wrapped so they expose the AutoGuide
            # interface (ref guides.py:208 wrapping in AutoCallable)
            part = AutoCallable(self.model, part)
        self._guides.append(part)

    def add(self, part) -> None:
        self.append(part)

    def __call__(self, *args, **kwargs):
        result = {}
        for part in self._guides:
            result.update(part(*args, **kwargs))
        return result

    def median(self, *args, **kwargs):
        result = {}
        for part in self._guides:
            result.update(part.median(*args, **kwargs))
        return result


class AutoDelta(AutoGuide):
    """MAP estimation guide (ref ``guides.py:319``)."""

    def __init__(self, model, init_loc_fn=init_to_median, *, create_plates=None):
        super().__init__(model, create_plates=create_plates)
        self.init_loc_fn = init_loc_fn

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        plates = self._create_plates(*args, **kwargs)
        result = {}
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            frames = self._prototype_frames[name]
            # per-site plate stack (ref ``guides.py:319``): entering
            # cumulatively would drag later non-plated sites into
            # earlier sites' plates
            with ExitStack() as stack:
                for f in frames:
                    stack.enter_context(plates[f.name])
                # store the full-size value; plate gathers rows on access
                init = _expand_init_to_full(
                    jnp.asarray(self.init_loc_fn(site)),
                    frames,
                    site["fn"].event_dim,
                )
                value = pyro_param(
                    f"{self._name}.{name}",
                    init,
                    constraint=site["fn"].support,
                    event_dim=site["fn"].event_dim,
                )
                result[name] = pyro_sample(
                    name, Delta(value, event_dim=site["fn"].event_dim)
                )
        return result

    def median(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        out = {}
        for name, site in self.prototype_trace.nodes.items():
            if _is_latent(site):
                out[name] = pyro_param(
                    f"{self._name}.{name}",
                    self.init_loc_fn(site),
                    constraint=site["fn"].support,
                )
        return out


class AutoNormal(AutoGuide):
    """Mean-field normal in unconstrained space, per site
    (ref ``guides.py:415``)."""

    scale_constraint = constraints.softplus_positive

    def __init__(
        self,
        model,
        *,
        init_loc_fn=init_to_median,
        init_scale: float = 0.1,
        create_plates=None,
    ):
        super().__init__(model, create_plates=create_plates)
        self.init_loc_fn = init_loc_fn
        self._init_scale = init_scale

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        self._transforms = {}
        self._event_dims = {}
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            t = biject_to(site["fn"].support)
            self._transforms[name] = t
            # event dim in unconstrained space
            constrained_shape = jnp.shape(site["value"])
            unconstrained = t.inv(site["value"])
            batch_ndim = len(constrained_shape) - site["fn"].event_dim
            self._event_dims[name] = jnp.ndim(unconstrained) - batch_ndim

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        plates = self._create_plates(*args, **kwargs)
        result = {}
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            # per-site plate stack (ref ``guides.py:415``): entering
            # cumulatively would drag later non-plated sites into
            # earlier sites' plates
            with ExitStack() as stack:
                for f in self._prototype_frames[name]:
                    stack.enter_context(plates[f.name])
                t = self._transforms[name]
                event_dim = self._event_dims[name]
                init_loc = _expand_init_to_full(
                    t.inv(self.init_loc_fn(site)),
                    self._prototype_frames[name],
                    event_dim,
                )
                loc = pyro_param(
                    f"{self._name}.locs.{name}", init_loc, event_dim=event_dim
                )
                scale = pyro_param(
                    f"{self._name}.scales.{name}",
                    jnp.full(jnp.shape(init_loc), self._init_scale),
                    constraint=self.scale_constraint,
                    event_dim=event_dim,
                )
                from ...distributions.transforms import IdentityTransform

                base = Normal(loc, scale).to_event(event_dim)
                if isinstance(t, IdentityTransform):
                    fn = base
                else:
                    fn = TransformedDistribution(base, t)
                result[name] = pyro_sample(name, fn)
        return result

    def _get_posterior_params(self, name):
        from ...params.param_store import get_param_store

        store = get_param_store()
        loc = store[f"{self._name}.locs.{name}"]
        scale = store[f"{self._name}.scales.{name}"]
        return loc, scale

    def median(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        out = {}
        for name in self._prototype_frames:
            loc, _ = self._get_posterior_params(name)
            out[name] = self._transforms[name](loc)
        return out

    def quantiles(self, quantiles, *args, **kwargs):
        """Per-site marginal quantiles (ref ``guides.py:540``)."""
        out = {}
        qs = jnp.asarray(quantiles)
        for name in self._prototype_frames:
            loc, scale = self._get_posterior_params(name)
            shaped_q = qs.reshape((-1,) + (1,) * jnp.ndim(loc))
            unconstrained = Normal(loc, scale).icdf(shaped_q)
            out[name] = self._transforms[name](unconstrained)
        return out


class AutoContinuous(AutoGuide):
    """Pack all latents into one unconstrained vector (ref ``guides.py:605``).

    Subclasses define ``get_posterior() -> Distribution`` over R^n.
    """

    def __init__(self, model, init_loc_fn=init_to_median):
        super().__init__(model)
        self.init_loc_fn = init_loc_fn

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        self._transforms = {}
        init_unconstrained = {}
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            if any(
                f.subsample_size != f.size
                for f in self._prototype_frames[name]
            ):
                raise NotImplementedError(
                    f"AutoContinuous does not support subsampled site "
                    f"'{name}'; use AutoNormal"
                )
            t = biject_to(site["fn"].support)
            self._transforms[name] = t
            init_unconstrained[name] = t.inv(self.init_loc_fn(site))
        flat, unravel = jax.flatten_util.ravel_pytree(init_unconstrained)
        self._init_latent = flat
        self._unravel = unravel
        self._site_unc_shapes = {
            k: jnp.shape(v) for k, v in init_unconstrained.items()
        }
        self.latent_dim = flat.shape[0]

    def get_posterior(self, *args, **kwargs) -> Distribution:
        raise NotImplementedError

    def _unravel_batched(self, latent):
        """Unravel the flat latent, mapping over any leading batch dims
        (e.g. the vectorized-particles plate)."""
        batch_shape = latent.shape[:-1]
        if not batch_shape:
            return self._unravel(latent)
        flat = latent.reshape((-1, latent.shape[-1]))
        un = jax.vmap(self._unravel)(flat)
        return {
            k: v.reshape(batch_shape + v.shape[1:]) for k, v in un.items()
        }

    def __call__(self, *args, **kwargs):
        from contextlib import ExitStack

        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        posterior = self.get_posterior(*args, **kwargs)
        latent = pyro_sample(
            f"_{self._name}_latent",
            posterior,
            infer={"is_auxiliary": True},
        )
        unconstrained = self._unravel_batched(latent)
        plates = self._create_plates(*args, **kwargs)
        result = {}
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            t = self._transforms[name]
            u = unconstrained[name]
            # strip padding singleton batch dims: the _latent site's plate
            # broadcast (e.g. a vectorized-particles plate at dim -2) pads
            # its batch with trailing 1s; after unraveling, those 1s sit
            # BETWEEN the particle dim and the site's own plate/event dims
            # and would make the delta broadcast against the site's plates
            # (a 100-particle guide produced (100,100,3) deltas)
            unc_shape = tuple(self._site_unc_shapes[name])
            event_dim = site["fn"].event_dim
            batch = list(u.shape[: jnp.ndim(u) - len(unc_shape)])
            stripped = 0
            while batch and batch[-1] == 1:
                batch.pop()
                stripped += 1
            # an outer plate at dim -k (e.g. vectorized particles) padded
            # the latent's batch with k-1 singletons; in SITE coordinates
            # that plate dim must stay at the same negative position, so
            # re-insert only the singletons not covered by the site's own
            # batch (plate) dims
            site_batch_ndim = jnp.ndim(site["value"]) - event_dim
            pad = max(0, stripped - site_batch_ndim)
            u = u.reshape(tuple(batch) + (1,) * pad + unc_shape)
            value = t(u)
            log_density = t.log_abs_det_jacobian(u, value)
            # delta with the Jacobian correction so guide log-density is
            # correct in constrained space (ref ``guides.py:790-820``)
            event_dim = site["fn"].event_dim
            extra = jnp.ndim(log_density) - (jnp.ndim(value) - event_dim)
            if extra > 0:
                log_density = jnp.sum(
                    log_density, axis=tuple(range(-extra, 0))
                )
            # re-enter the model's plates for this site so the delta's
            # batch dims carry the right cond_indep_stack frames (ref
            # ``guides.py:823-830``)
            with ExitStack() as stack:
                for f in self._prototype_frames.get(name, ()):
                    if f.name in plates:
                        stack.enter_context(plates[f.name])
                result[name] = pyro_sample(
                    name,
                    Delta(
                        value, log_density=-log_density, event_dim=event_dim
                    ),
                )
        return result

    def _loc_scale_params(self):
        raise NotImplementedError

    def median(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        loc, _ = self._loc_scale_params()
        unconstrained = self._unravel(loc)
        return {
            name: self._transforms[name](u)
            for name, u in unconstrained.items()
        }

    def quantiles(self, quantiles, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        loc, scale = self._loc_scale_params()
        qs = jnp.asarray(quantiles)
        out = {}
        latent_q = Normal(loc, scale).icdf(qs[:, None])  # (Q, n)
        unraveled = jax.vmap(self._unravel)(latent_q)
        for name, u in unraveled.items():
            out[name] = self._transforms[name](u)
        return out


class AutoDiagonalNormal(AutoContinuous):
    """Ref ``guides.py:909``."""

    scale_constraint = constraints.softplus_positive

    def __init__(self, model, init_loc_fn=init_to_median, init_scale=0.1):
        super().__init__(model, init_loc_fn)
        self._init_scale = init_scale

    def get_posterior(self, *args, **kwargs):
        loc = pyro_param(f"{self._name}.loc", self._init_latent)
        scale = pyro_param(
            f"{self._name}.scale",
            jnp.full((self.latent_dim,), self._init_scale),
            constraint=self.scale_constraint,
        )
        return Normal(loc, scale).to_event(1)

    def _loc_scale_params(self):
        from ...params.param_store import get_param_store

        store = get_param_store()
        return store[f"{self._name}.loc"], store[f"{self._name}.scale"]


class AutoMultivariateNormal(AutoContinuous):
    """Ref ``guides.py:844``."""

    scale_tril_constraint = constraints.softplus_lower_cholesky

    def __init__(self, model, init_loc_fn=init_to_median, init_scale=0.1):
        super().__init__(model, init_loc_fn)
        self._init_scale = init_scale

    def get_posterior(self, *args, **kwargs):
        loc = pyro_param(f"{self._name}.loc", self._init_latent)
        scale_tril = pyro_param(
            f"{self._name}.scale_tril",
            self._init_scale * jnp.eye(self.latent_dim),
            constraint=self.scale_tril_constraint,
        )
        return MultivariateNormal(loc, scale_tril=scale_tril)

    def _loc_scale_params(self):
        from ...params.param_store import get_param_store

        store = get_param_store()
        L = store[f"{self._name}.scale_tril"]
        return store[f"{self._name}.loc"], jnp.sqrt(jnp.sum(L**2, -1))


class AutoLaplaceApproximation(AutoContinuous):
    """MAP + Laplace covariance (ref ``guides.py:1133``).

    Train with a Delta posterior over the packed latent; then
    ``laplace_approximation(*args)`` returns an AutoMultivariateNormal
    whose scale_tril comes from the inverse Hessian of the negative log
    joint at the MAP."""

    def get_posterior(self, *args, **kwargs):
        loc = pyro_param(f"{self._name}.loc", self._init_latent)
        return Delta(loc, event_dim=1)

    def _loc_scale_params(self):
        from ...params.param_store import get_param_store

        store = get_param_store()
        loc = store[f"{self._name}.loc"]
        return loc, jnp.zeros_like(loc)

    def laplace_approximation(self, *args, **kwargs):
        """Ref ``guides.py:1172``."""
        from ...params.param_store import get_param_store
        from ...poutine.util import prune_subsample_sites
        from ... import poutine

        store = get_param_store()
        loc = store[f"{self._name}.loc"]

        def neg_log_joint(latent):
            unconstrained = self._unravel(latent)
            data = {}
            log_jac = 0.0
            for name, u in unconstrained.items():
                t = self._transforms[name]
                value = t(u)
                data[name] = value
                ladj = t.log_abs_det_jacobian(u, value)
                log_jac = log_jac + jnp.sum(ladj)
            cond = poutine.condition(self.model, data=data)
            tr = poutine.trace(cond).get_trace(*args, **kwargs)
            tr = prune_subsample_sites(tr)
            return -(tr.log_prob_sum() + log_jac)

        H = jax.hessian(neg_log_joint)(loc)
        cov = jnp.linalg.inv(H + 1e-8 * jnp.eye(H.shape[-1]))
        scale_tril = jnp.linalg.cholesky(cov)
        guide = AutoMultivariateNormal(self.model, self.init_loc_fn)
        guide.prototype_trace = self.prototype_trace
        guide._prototype_frames = self._prototype_frames
        guide._transforms = self._transforms
        guide._init_latent = loc
        guide._unravel = self._unravel
        guide.latent_dim = self.latent_dim
        store[f"{guide._name}.loc"] = loc
        from ...distributions.transforms import SoftplusLowerCholeskyTransform

        # store the unconstrained value of scale_tril under its constraint
        store._constraints[f"{guide._name}.scale_tril"] = (
            guide.scale_tril_constraint
        )
        from ...distributions.transforms import transform_to

        store._params[
            f"{guide._name}.scale_tril"
        ] = transform_to(guide.scale_tril_constraint).inv(scale_tril)
        return guide


class AutoNormalizingFlow(AutoContinuous):
    """Posterior = flow-transformed standard normal
    (ref ``guides.py:1032``)."""

    def __init__(self, model, init_transform_fn, init_loc_fn=init_to_median):
        super().__init__(model, init_loc_fn)
        self._init_transform_fn = init_transform_fn

    def get_posterior(self, *args, **kwargs):
        transforms = self._init_transform_fn(self.latent_dim)
        if not isinstance(transforms, (list, tuple)):
            transforms = [transforms]
        # cache (x, y) through sampling so forward-only flows (Planar,
        # Radial, ...) can be scored at their own sample without an
        # inverse — ref guides.py:1061 (AutoNormalizingFlow.get_posterior
        # wraps with .with_cache())
        transforms = [t.with_cache() for t in transforms]
        base = Normal(jnp.zeros(self.latent_dim), 1.0).to_event(1)
        return TransformedDistribution(base, list(transforms))

    def _loc_scale_params(self):
        raise NotImplementedError(
            "median/quantiles are undefined for flow posteriors; use "
            "Predictive samples"
        )


class AutoIAFNormal(AutoNormalizingFlow):
    """IAF posterior (ref ``guides.py:1079``)."""

    def __init__(
        self,
        model,
        hidden_dim=None,
        num_transforms: int = 1,
        init_loc_fn=init_to_median,
        **kwargs,
    ):
        self._hidden_dim = hidden_dim
        self._num_transforms = num_transforms
        self._flow_kwargs = kwargs

        def init_transform_fn(latent_dim):
            from ...distributions.flows import affine_autoregressive

            if latent_dim == 1:
                raise ValueError(
                    "latent dim = 1: AutoIAFNormal needs >= 2 latent "
                    "dimensions; use AutoNormal instead"
                )
            hidden = (
                [3 * latent_dim + 1]
                if self._hidden_dim is None
                else [self._hidden_dim]
            )
            return [
                affine_autoregressive(
                    f"{self._name}.flow{i}", latent_dim, hidden,
                    **self._flow_kwargs,
                )
                for i in range(self._num_transforms)
            ]

        super().__init__(model, init_transform_fn, init_loc_fn)


class AutoLowRankMultivariateNormal(AutoContinuous):
    """Ref ``guides.py:965``."""

    scale_constraint = constraints.softplus_positive

    def __init__(
        self, model, init_loc_fn=init_to_median, init_scale=0.1, rank=None
    ):
        super().__init__(model, init_loc_fn)
        self._init_scale = init_scale
        self.rank = rank

    def get_posterior(self, *args, **kwargs):
        rank = self.rank or max(1, round(self.latent_dim**0.5))
        loc = pyro_param(f"{self._name}.loc", self._init_latent)
        cov_factor = pyro_param(
            f"{self._name}.cov_factor",
            jnp.zeros((self.latent_dim, rank)),
        )
        scale = pyro_param(
            f"{self._name}.scale",
            jnp.full((self.latent_dim,), self._init_scale),
            constraint=self.scale_constraint,
        )
        return LowRankMultivariateNormal(loc, cov_factor, scale**2)

    def _loc_scale_params(self):
        from ...params.param_store import get_param_store

        store = get_param_store()
        W = store[f"{self._name}.cov_factor"]
        scale = store[f"{self._name}.scale"]
        total = jnp.sqrt(jnp.sum(W**2, -1) + scale**2)
        return store[f"{self._name}.loc"], total


class AutoDiscreteParallel(AutoGuide):
    """Discrete mean-field guide: a learned Categorical/Bernoulli/
    OneHotCategorical per discrete model site configured for parallel
    enumeration (ref ``guides.py:1199``)."""

    def _setup_prototype(self, *args, **kwargs):
        from ...distributions.discrete import (
            Bernoulli,
            Categorical,
            OneHotCategorical,
        )
        from ..enum import config_enumerate

        model = config_enumerate(self.model)
        with poutine.block():
            trace = poutine.trace(
                poutine.seed(model, rng_key=jax.random.key(0))
            ).get_trace(*args, **kwargs)
        self.prototype_trace = prune_subsample_sites(trace)
        self._prototype_frames = {}
        self._discrete_sites = []
        for name, site in self.prototype_trace.nodes.items():
            if not _is_latent(site):
                continue
            if site["infer"].get("enumerate") != "parallel":
                raise NotImplementedError(
                    f'Expected sample site "{name}" to be discrete and '
                    "configured for parallel enumeration"
                )
            fn = site["fn"]
            if not isinstance(
                fn, (Bernoulli, Categorical, OneHotCategorical)
            ):
                raise NotImplementedError(
                    f"{type(fn).__name__} is not supported"
                )
            probs = jax.nn.softmax(fn.logits, axis=-1) if isinstance(
                fn, (Categorical, OneHotCategorical)
            ) else jax.nn.sigmoid(fn.logits)
            self._discrete_sites.append((name, type(fn), probs))
            self._prototype_frames[name] = tuple(
                f for f in site["cond_indep_stack"] if f.dim is not None
            )

    def __call__(self, *args, **kwargs):
        from ...distributions import constraints as _c

        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        plates = self._create_plates(*args, **kwargs)
        result = {}
        for name, Dist, probs_init in self._discrete_sites:
            frames = self._prototype_frames[name]
            constraint = (
                _c.simplex
                if probs_init.ndim and probs_init.shape[-1] > 1
                else _c.unit_interval
            )
            probs = pyro_param(
                f"{self._name}.{name}_probs",
                probs_init,
                constraint=constraint,
            )
            with ExitStack() as stack:
                for frame in frames:
                    stack.enter_context(plates[frame.name])
                result[name] = pyro_sample(
                    name,
                    Dist(probs=probs),
                    infer={"enumerate": "parallel"},
                )
        return result


class AutoCallable(AutoGuide):
    """AutoGuide wrapper for a plain callable guide, used when appending
    callables to :class:`AutoGuideList` (ref ``guides.py:279``)."""

    def __init__(self, model, guide, median=lambda *args, **kwargs: {}):
        super().__init__(model)
        self._guide = guide
        self.median = median

    def __call__(self, *args, **kwargs):
        result = self._guide(*args, **kwargs)
        return {} if result is None else result


def mean_field_entropy(model, args, whitelist=None):
    """Entropy of a fully mean-field model/guide: the sum of per-site
    analytic entropies (ref ``guides.py:mean_field_entropy``)."""
    import jax as _jax

    from ... import poutine as _poutine

    trace = _poutine.trace(
        _poutine.seed(model, rng_key=_jax.random.key(0))
    ).get_trace(*args)
    entropy = 0.0
    for name, site in trace.nodes.items():
        if site["type"] == "sample" and not site["is_observed"]:
            if whitelist is None or name in whitelist:
                entropy = entropy + jnp.sum(site["fn"].entropy())
    return entropy

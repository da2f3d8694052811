"""TraceGraph_ELBO: fine-grained Rao-Blackwellization.

Ref ``pyro/infer/tracegraph_elbo.py:290``.  The reference tracks exact
data dependencies via provenance-tainted tensors (``TrackNonReparam:239``);
here the same exact dependency sets are computed by jaxpr data-flow
analysis (``ops/provenance.py:jaxpr_provenance``): the guide is re-traced
abstractly with each non-reparameterized site's value as a tainted input
and every other site pinned to its recorded rng key, so reparameterized
intermediates propagate taints exactly as the reference's
``ProvenanceTensor`` does.  If the probe fails (e.g. effect guides), the
estimator falls back to an execution-order overapproximation — site j is
treated as downstream of site i if j executes at-or-after i in either the
guide or the model — which adds variance but never bias (the extra terms
have zero expectation against the score function).

Baselines (ref ``tracegraph_elbo.py:74-170``): per-site decaying-average
baselines are supported through ``infer={"baseline": {...}}``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions.util import is_identically_zero
from ..poutine.messenger import Messenger
from .elbo import ELBO
from .util import MultiFrameTensor


class TraceGraph_ELBO(ELBO):
    def _differentiable_loss_particle(self, model_trace, guide_trace):
        # elbo value
        elbo = 0.0
        surrogate = 0.0
        for name, site in model_trace.nodes.items():
            if site["type"] == "sample" and not site["infer"].get(
                "_do_not_score"
            ):
                elbo = elbo + site["log_prob_sum"]
                surrogate = surrogate + site["log_prob_sum"]

        guide_order = [
            name
            for name, site in guide_trace.nodes.items()
            if site["type"] == "sample"
            and not site["infer"].get("_do_not_score")
        ]
        downstream_costs = self._compute_downstream_costs(
            model_trace, guide_trace, guide_order
        )

        baseline_losses = []
        for i, name in enumerate(guide_order):
            site = guide_trace.nodes[name]
            log_prob, score_function, entropy_term = site["score_parts"]
            elbo = elbo - site["log_prob_sum"]
            if not is_identically_zero(entropy_term):
                surrogate = surrogate - jnp.sum(entropy_term)
            if not is_identically_zero(score_function):
                dc = downstream_costs[name].sum_to(
                    site["cond_indep_stack"]
                )
                dc = jax.lax.stop_gradient(dc)
                # baselines (ref ``tracegraph_elbo.py:74-170``): a
                # decaying average and/or a data-dependent
                # ``baseline_value`` (NVIL; compute it in the guide from
                # a net registered with flax_module/pyro.param).  The
                # baseline net trains through an auxiliary MSE between
                # the detached downstream cost and the baseline, which
                # we add to the surrogate only (the reported loss value
                # is unchanged — see ``differentiable_loss``).
                baseline_cfg = site["infer"].get("baseline", {})
                if baseline_cfg.get("nn_baseline") is not None:
                    raise NotImplementedError(
                        "nn_baseline modules are torch-specific; compute "
                        "the value in the guide (with a flax_module) and "
                        "pass infer={'baseline': {'baseline_value': v}}"
                    )
                bv = 0.0
                if baseline_cfg.get("use_decaying_avg_baseline", False):
                    bv = bv + self._decaying_baseline(
                        name, dc, baseline_cfg.get("baseline_beta", 0.90)
                    )
                if "baseline_value" in baseline_cfg:
                    baseline_value = baseline_cfg["baseline_value"]
                    bv = bv + baseline_value
                    baseline_losses.append(
                        jnp.sum((dc - baseline_value) ** 2)
                    )
                surrogate = surrogate + jnp.sum(
                    jax.lax.stop_gradient(dc - bv) * score_function
                )
        for bl in baseline_losses:
            surrogate = surrogate - bl  # sign flips with -surrogate below
        return -elbo, -surrogate

    def _decaying_baseline(self, name, dc, beta):
        """Exponential moving average of the downstream cost, used as the
        baseline.  The EMA is FUNCTIONAL state: it enters through
        ``loss_state`` (threaded by SVI through its jitted update/scan as
        an extra carry) and the updated value is collected from
        ``pop_loss_state``.  Matches the reference, which keeps
        ``__baseline_avg_downstream_cost_<name>`` in the param store and
        uses the OLD average as the baseline (``tracegraph_elbo.py:
        use_decaying_avg_baseline``) — using the current step's own cost
        would cancel the score-function signal exactly."""
        key = "__baseline_avg_downstream_cost_" + name
        if not hasattr(self, "_bl_out"):
            self._bl_in, self._bl_out = {}, {}
        prev = self._bl_in.get(key)
        if prev is None:
            prev = jnp.zeros(jnp.shape(dc))
        new = beta * prev + (1 - beta) * jax.lax.stop_gradient(dc)
        self._bl_out[key] = new
        return prev

    def _compute_downstream_costs(self, model_trace, guide_trace, guide_order):
        """Cost downstream of each guide site (ref
        ``tracegraph_elbo.py:_compute_downstream_costs``): exact
        provenance-pruned costs when the dependency probe succeeds,
        execution-order overapproximation otherwise."""
        non_reparam = [
            name
            for name in guide_order
            if not is_identically_zero(
                guide_trace.nodes[name]["score_parts"][1]
            )
        ]
        if non_reparam:
            try:
                deps = self._site_dependencies(
                    model_trace, guide_trace, non_reparam
                )
            except Exception:
                deps = None
            if deps is not None:
                downstream = {
                    name: MultiFrameTensor() for name in non_reparam
                }
                for name, site in model_trace.nodes.items():
                    if site["type"] != "sample" or site["infer"].get(
                        "_do_not_score"
                    ):
                        continue
                    for key in deps[("m", name)]:
                        downstream[key].add(
                            (site["cond_indep_stack"], site["log_prob"])
                        )
                for name, site in guide_trace.nodes.items():
                    if site["type"] != "sample" or site["infer"].get(
                        "_do_not_score"
                    ):
                        continue
                    for key in deps[("g", name)]:
                        downstream[key].add(
                            (site["cond_indep_stack"], -site["log_prob"])
                        )
                return downstream
        return self._order_downstream_costs(
            model_trace, guide_trace, guide_order
        )

    def _site_dependencies(self, model_trace, guide_trace, non_reparam):
        """{("m"/"g", site_name): frozenset(non-reparam guide sites its
        log_prob depends on)} via one abstract re-trace (the JAX analogue
        of ref ``tracegraph_elbo.py:239`` TrackNonReparam).  Dependency
        structure is identical across particles, so the result is cached
        for the duration of one ``differentiable_loss`` call."""
        if getattr(self, "_dep_cache", None) is not None:
            return self._dep_cache
        from ..ops.provenance import jaxpr_provenance
        from ..poutine.guide import GuideMessenger

        model, guide, args, kwargs = self._probe_ctx
        unwrapped = guide
        while hasattr(unwrapped, "_pyro_unwrapped"):
            unwrapped = unwrapped._pyro_unwrapped
        if isinstance(unwrapped, GuideMessenger):
            raise NotImplementedError("effect guides use the order fallback")
        if self.vectorize_particles and self.num_particles > 1:
            model = self._vectorized_num_particles(model)
            guide = self._vectorized_num_particles(guide)

        guide_keys = {
            name: site["rng_key"]
            for name, site in guide_trace.nodes.items()
            if site["type"] == "sample" and not site["is_observed"]
        }
        model_keys = {
            name: site["rng_key"]
            for name, site in model_trace.nodes.items()
            if site["type"] == "sample" and not site["is_observed"]
        }
        inputs = {
            name: guide_trace.nodes[name]["value"] for name in non_reparam
        }

        from .. import poutine as _poutine

        def probe(values):
            gm = _DependencyProbeMessenger(values, guide_keys)
            g_tr = _poutine.trace(gm(guide)).get_trace(*args, **kwargs)
            for name, v in gm.final_values.items():
                g_tr.nodes[name]["value"] = v
            m_tr = _poutine.trace(
                _DependencyProbeMessenger({}, model_keys)(
                    _poutine.replay(model, trace=g_tr)
                )
            ).get_trace(*args, **kwargs)
            out = {}
            for which, tr in (("m", m_tr), ("g", g_tr)):
                for name, site in tr.nodes.items():
                    if site["type"] != "sample" or site["infer"].get(
                        "_do_not_score"
                    ):
                        continue
                    out[(which, name)] = site["fn"].log_prob(site["value"])
            return out

        deps = jaxpr_provenance(probe, inputs)
        # every scored site in the original traces must be accounted for
        for which, tr in (("m", model_trace), ("g", guide_trace)):
            for name, site in tr.nodes.items():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    if (which, name) not in deps:
                        raise KeyError((which, name))
        self._dep_cache = deps
        return deps

    def _order_downstream_costs(self, model_trace, guide_trace, guide_order):
        """Execution-order fallback (superset of the true dependents).

        Execution order bounds the true dependency relation in each trace:
        a term can only depend on values computed before it.  So for guide
        site g we include

        * ``-log q(w)`` for guide sites w sampled at-or-after g in the
          GUIDE (earlier guide sites cannot depend on g's value), and
        * ``log p(w | ...)`` for model sites w that either execute
          at-or-after g's own position in the MODEL (catches densities of
          sites sampled *earlier* in the guide but conditioned on g in
          the model, e.g. p(z3 | z2) when the guide samples z3 before z2)
          OR are sampled at-or-after g in the GUIDE (catches p(w) of a
          site w that executes before g in the model but whose *value*
          is drawn downstream of g in the guide, e.g. p(z1) when the
          guide samples z2 then z1 | z2).  Either pruning alone drops a
          g-dependent term and biases the estimator.

        Terms included that do not actually depend on g add variance but
        never bias (their expectation against the score function is
        zero); the reference prunes further using its dense trace graph."""
        model_order = [
            name
            for name, site in model_trace.nodes.items()
            if site["type"] == "sample"
            and not site["infer"].get("_do_not_score")
        ]
        model_position = {name: i for i, name in enumerate(model_order)}

        downstream = {}
        position = {name: i for i, name in enumerate(guide_order)}
        for name in guide_order:
            mft = MultiFrameTensor()
            i = position[name]
            # guide sites at or after this one contribute -log q
            for other in guide_order[i:]:
                s = guide_trace.nodes[other]
                mft.add(
                    (s["cond_indep_stack"], -s["unscaled_log_prob"] * _as_scale(s))
                )
            # model terms: union of model-order and guide-order downstream
            # (auxiliary guide-only sites conservatively take every term)
            cutoff = model_position.get(name, 0)
            for mname in model_order:
                if (
                    model_position[mname] >= cutoff
                    or position.get(mname, -1) >= i
                ):
                    msite = model_trace.nodes[mname]
                    mft.add((msite["cond_indep_stack"], msite["log_prob"]))
            downstream[name] = mft
        return downstream

    def differentiable_loss(
        self, model, guide, *args, rng_key=None, loss_state=None, **kwargs
    ):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        self._bl_in = dict(loss_state) if loss_state else {}
        self._bl_out = {}
        self._probe_ctx = (model, guide, args, kwargs)
        self._dep_cache = None
        loss = 0.0
        surrogate = 0.0
        for model_trace, guide_trace in self._get_traces(
            model, guide, args, kwargs, rng_key
        ):
            lp, sp = self._differentiable_loss_particle(
                model_trace, guide_trace
            )
            loss = loss + lp / self.num_particles
            surrogate = surrogate + sp / self.num_particles
        return surrogate + jax.lax.stop_gradient(loss - surrogate)

    def pop_loss_state(self):
        """Updated auxiliary loss state (decaying-average baselines) from
        the most recent ``differentiable_loss`` call; SVI threads this
        through its jitted step as a functional carry."""
        out, self._bl_out = getattr(self, "_bl_out", {}), {}
        return out

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs) -> float:
        return float(
            jax.device_get(
                self.differentiable_loss(
                    model, guide, *args, rng_key=rng_key, **kwargs
                )
            )
        )


def _as_scale(site):
    s = site["scale"]
    return s if not isinstance(s, (int, float)) else s


class _DependencyProbeMessenger(Messenger):
    """Abstract re-trace helper for provenance.

    Every latent is pinned to its recorded rng key, so the re-run is
    value-identical to the original trace.  A probed (non-reparameterized)
    site's value is then rebound to ``probe_input + 0 * sampled``: the
    taint set becomes {its own name} ∪ taints(distribution params), which
    is exactly the reference's ``TrackNonReparam`` semantics — the sampled
    value of a non-reparameterized site depends on its own draw AND on
    everything its distribution's parameters depend on (the draw flows
    through the sampling map).  ``final_values`` holds the rebound values
    (the trace messenger records before this post hook runs, so the caller
    patches them back into the trace for the model replay)."""

    def __init__(self, values, keys):
        super().__init__()
        self.values = values
        self.keys = keys
        self.final_values = {}

    def _pyro_sample(self, msg):
        if msg["is_observed"]:
            return
        name = msg["name"]
        if name in self.keys and self.keys[name] is not None:
            msg["rng_key"] = self.keys[name]

    def _pyro_post_sample(self, msg):
        name = msg["name"]
        if msg["is_observed"] or name not in self.values:
            return
        v = self.values[name]
        msg["value"] = v + msg["value"] * jnp.zeros_like(v)
        self.final_values[name] = msg["value"]

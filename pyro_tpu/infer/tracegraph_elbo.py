"""TraceGraph_ELBO: fine-grained Rao-Blackwellization.

Ref ``pyro/infer/tracegraph_elbo.py:290``.  The reference tracks exact
data dependencies via provenance-tainted tensors (``TrackNonReparam:239``);
here dependencies are approximated by trace order — site j is considered
downstream of site i if j was sampled after i — which the reference also
relies on as its coarse default ordering (``traceenum_elbo.py:113`` "TODO
refine this coarse dependency ordering").  This keeps the estimator
unbiased (extra terms have zero expectation) while still removing all
upstream cost terms from each score-function coefficient.

Baselines (ref ``tracegraph_elbo.py:74-170``): per-site decaying-average
baselines are supported through ``infer={"baseline": {...}}``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions.util import is_identically_zero
from .elbo import ELBO
from .util import MultiFrameTensor, get_plate_stacks


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

    _baselines: dict = {}

    def _decaying_baseline(self, name, dc, beta):
        # host-side running average (not inside jit-differentiated path;
        # treated as a constant via stop_gradient semantics of python float)
        prev = self._baselines.get(name)
        avg = jax.lax.stop_gradient(jnp.mean(dc))
        if prev is None:
            new = avg
        else:
            new = beta * prev + (1 - beta) * avg
        self._baselines[name] = new
        return new

    def _compute_downstream_costs(self, model_trace, guide_trace, guide_order):
        """Cost to the 'right' of each guide site (ref
        ``tracegraph_elbo.py:_compute_downstream_costs``), using trace order
        as the dependency relation."""
        model_order = [
            name
            for name, site in model_trace.nodes.items()
            if site["type"] == "sample"
            and not site["infer"].get("_do_not_score")
        ]
        stacks_model = get_plate_stacks(model_trace)
        stacks_guide = get_plate_stacks(guide_trace)

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
            # model sites paired with downstream guide sites + all
            # observation/model-only sites after this site's first use
            downstream_names = set(guide_order[i:])
            for mname in model_order:
                msite = model_trace.nodes[mname]
                if mname in downstream_names or (
                    mname not in position
                    and self._model_site_is_downstream(
                        mname, name, model_order, guide_order, position
                    )
                ):
                    mft.add((msite["cond_indep_stack"], msite["log_prob"]))
            downstream[name] = mft
        return downstream

    @staticmethod
    def _model_site_is_downstream(mname, gname, model_order, guide_order, position):
        # observed/model-only sites: downstream if they appear in the model
        # at/after the guide site's corresponding model position
        if gname not in model_order:
            return True
        return model_order.index(mname) >= model_order.index(gname)

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
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

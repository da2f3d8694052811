"""Model inspection: dependency extraction + graph rendering.

Ref ``pyro/infer/inspect.py`` (``get_dependencies:74``,
``get_model_relations:252``, ``render_model:598``).  The reference tracks
data flow with provenance-tainted tensors; here dependencies are detected
with jax's own machinery: for each latent site, we perturb its value with
a symbolic zero tangent (jvp) and see which downstream site distributions'
parameters carry the tangent — exact data-flow provenance, no tensor
subclassing needed.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .. import poutine
from ..poutine.util import prune_subsample_sites, site_is_subsample


def get_dependencies(model, model_args=(), model_kwargs=None) -> Dict:
    """Ref ``inspect.py:74``: returns dicts
    ``prior_dependencies[downstream][upstream] -> set of plates`` and
    ``posterior_dependencies``."""
    model_kwargs = model_kwargs or {}
    trace = poutine.trace(
        poutine.seed(model, rng_key=jax.random.key(0))
    ).get_trace(*model_args, **model_kwargs)
    trace = prune_subsample_sites(trace)
    def _is_sample_site(site):
        """Ref ``inspect.py:26``: skip subsample sites, mask=False
        observations, and deterministic (Delta-based) sites."""
        if site["type"] != "sample" or site_is_subsample(site):
            return False
        if site["is_observed"] and site.get("mask") is False:
            return False
        fn = site["fn"]
        while hasattr(fn, "base_dist"):
            fn = fn.base_dist
        if type(fn).__name__ == "Delta":
            return False
        return True

    sample_sites = [
        name
        for name, site in trace.nodes.items()
        if _is_sample_site(site)
    ]
    latents = [
        name
        for name in sample_sites
        if not trace.nodes[name]["is_observed"]
    ]

    # jvp-based provenance: run the model substituting latent values, with
    # a tangent on one latent at a time; a downstream site depends on it if
    # its log_prob carries a nonzero symbolic tangent.
    values = {
        name: trace.nodes[name]["value"] for name in latents
    }

    def logprobs_given(values_dict):
        cond = poutine.condition(model, data=values_dict)
        tr = poutine.trace(
            poutine.seed(cond, rng_key=jax.random.key(0))
        ).get_trace(*model_args, **model_kwargs)
        tr = prune_subsample_sites(tr)
        tr.compute_log_prob()
        return {
            name: tr.nodes[name]["log_prob"]
            for name in sample_sites
            if "log_prob" in tr.nodes[name]
        }

    # every site carries a self-edge (ref ``inspect.py:209``)
    prior_dependencies: Dict[str, Dict[str, set]] = OrderedDict()
    for name in sample_sites:
        prior_dependencies[name] = OrderedDict({name: set()})

    order = {n: i for i, n in enumerate(sample_sites)}
    float_latents = [
        n for n in latents if jnp.issubdtype(values[n].dtype, jnp.floating)
    ]
    int_latents = [n for n in latents if n not in float_latents]

    for upstream in float_latents:
        float_vals = {k: values[k] for k in float_latents}

        def fn(*vals):
            d = dict(zip(float_vals, vals))
            d.update({k: values[k] for k in int_latents})
            return logprobs_given(d)

        tangents = tuple(
            jnp.ones_like(v) if k == upstream else jnp.zeros_like(v)
            for k, v in float_vals.items()
        )
        _, out_tangents = jax.jvp(fn, tuple(float_vals.values()), tangents)
        for downstream, tan in out_tangents.items():
            if downstream == upstream or order[downstream] < order[upstream]:
                continue
            if bool(jnp.any(tan != 0)):
                prior_dependencies[downstream][upstream] = set()

    # discrete latents: finite-difference probe (resample and diff)
    for upstream in int_latents:
        base_lps = logprobs_given(values)
        perturbed = dict(values)
        site = trace.nodes[upstream]
        try:
            alt = site["fn"].sample(jax.random.key(99))
        except NotImplementedError:
            continue
        if bool(jnp.all(alt == values[upstream])):
            alt = (values[upstream] + 1) % jnp.maximum(
                values[upstream].max() + 1, 2
            )
        perturbed[upstream] = alt
        new_lps = logprobs_given(perturbed)
        for downstream in sample_sites:
            if downstream == upstream or order[downstream] < order[upstream]:
                continue
            if downstream in base_lps and bool(
                jnp.any(base_lps[downstream] != new_lps[downstream])
            ):
                prior_dependencies[downstream][upstream] = set()

    # posterior dependencies: reverse edges onto latent sites, then
    # moralize within each factor's Markov blanket, annotating edges
    # with the plates that induce FULL (complete-bipartite) coupling —
    # e.g. an observation outside a plate couples all slices of its
    # plated parent (ref ``inspect.py:224-246``)
    site_plates = {
        name: {
            f.name
            for f in trace.nodes[name]["cond_indep_stack"]
            if f.dim is not None
        }
        for name in sample_sites
    }
    posterior_dependencies: Dict[str, Dict[str, set]] = OrderedDict()
    for name in latents:
        posterior_dependencies[name] = OrderedDict()
    for d, upstreams in prior_dependencies.items():
        for u, p in upstreams.items():
            if u in latents:
                posterior_dependencies[u][d] = set(p)
    rev_order = {n: i for i, n in enumerate(reversed(sample_sites))}
    for d, upstreams in prior_dependencies.items():
        lat_ups = {
            u: p for u, p in upstreams.items() if u in latents
        }
        for u1, p1 in lat_ups.items():
            for u2, p2 in lat_ups.items():
                if rev_order[u1] <= rev_order[u2]:
                    p12 = posterior_dependencies[u2].setdefault(
                        u1, set()
                    )
                    p12 |= (
                        site_plates[u1] & site_plates[u2]
                        - site_plates[d]
                    )
                    p12 |= site_plates[u2] & p1
                    p12 |= site_plates[u1] & p2
    return {
        "prior_dependencies": {
            k: dict(v) for k, v in prior_dependencies.items()
        },
        "posterior_dependencies": {
            k: dict(v) for k, v in posterior_dependencies.items()
        },
    }


def get_model_relations(model, model_args=(), model_kwargs=None) -> Dict:
    """Site/plate/param relations for rendering (ref ``inspect.py:252``)."""
    model_kwargs = model_kwargs or {}
    trace = poutine.trace(
        poutine.seed(model, rng_key=jax.random.key(0))
    ).get_trace(*model_args, **model_kwargs)
    trace = prune_subsample_sites(trace)
    sample_sample = get_dependencies(model, model_args, model_kwargs)[
        "prior_dependencies"
    ]
    sample_plates = {
        name: [
            f.name for f in site["cond_indep_stack"] if f.dim is not None
        ]
        for name, site in trace.nodes.items()
        if site["type"] == "sample" and not site_is_subsample(site)
    }
    sample_dist = {
        name: type(site["fn"]).__name__
        for name, site in trace.nodes.items()
        if site["type"] == "sample" and not site_is_subsample(site)
    }
    observed = [
        name
        for name, site in trace.nodes.items()
        if site["type"] == "sample" and site["is_observed"]
    ]
    param_sites = [
        name for name, site in trace.nodes.items() if site["type"] == "param"
    ]
    return {
        "sample_sample": {
            k: [p for p in v if p != k] for k, v in sample_sample.items()
        },
        "sample_plates": sample_plates,
        "sample_dist": sample_dist,
        "observed": observed,
        "params": param_sites,
    }


def render_model(
    model,
    model_args=(),
    model_kwargs=None,
    filename: Optional[str] = None,
    render_distributions: bool = False,
    render_params: bool = False,
):
    """Graphviz rendering of the model structure (ref ``inspect.py:598``).

    Returns graphviz DOT source (and writes ``filename`` if given); falls
    back to returning the DOT string if the graphviz binary is absent.
    """
    relations = get_model_relations(model, model_args, model_kwargs)
    lines = ["digraph {"]
    # plate clusters
    plate_members: Dict[str, list] = {}
    for site, plates in relations["sample_plates"].items():
        for p in plates:
            plate_members.setdefault(p, []).append(site)
    emitted = set()
    for i, (p, members) in enumerate(plate_members.items()):
        lines.append(f'  subgraph cluster_{i} {{ label="{p}";')
        for m in members:
            shape = (
                "filled" if m in relations["observed"] else "none"
            )
            label = m
            if render_distributions:
                label += f"\\n{relations['sample_dist'][m]}"
            lines.append(
                f'    "{m}" [label="{label}", style={shape}];'
            )
            emitted.add(m)
        lines.append("  }")
    for site in relations["sample_sample"]:
        if site not in emitted:
            style = "filled" if site in relations["observed"] else "none"
            label = site
            if render_distributions:
                label += f"\\n{relations['sample_dist'][site]}"
            lines.append(f'  "{site}" [label="{label}", style={style}];')
    if render_params:
        for p in relations["params"]:
            lines.append(f'  "{p}" [shape=box];')
    for child, parents in relations["sample_sample"].items():
        for parent in parents:
            lines.append(f'  "{parent}" -> "{child}";')
    lines.append("}")
    dot = "\n".join(lines)
    if filename:
        with open(filename, "w") as f:
            f.write(dot)
    return dot

"""Core effect handlers.

Ref ``pyro/poutine/handlers.py`` (the ~25 public handlers listed at
``pyro/poutine/__init__.py:31-57``).  Each Messenger is both a context
manager and (via ``_make_handler``) a dual-use function:
``trace(fn)(*args)`` or ``with trace() as t: ...``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from .messenger import Messenger
from .runtime import NonlocalExit, apply_stack, default_site_key
from .trace_struct import Trace


class TraceMessenger(Messenger):
    """Record all sites into a Trace (ref ``trace_messenger.py``)."""

    def __init__(self, graph_type: str = "flat", param_only: bool = False):
        super().__init__()
        self.graph_type = graph_type
        self.param_only = param_only
        self.trace = Trace(graph_type)

    def __enter__(self):
        self.trace = Trace(self.graph_type)
        return super().__enter__()

    def __exit__(self, *args, **kwargs):
        if args[0] is not None and isinstance(args[1], NonlocalExit):
            args[1].site["value"] = None
        return super().__exit__(*args, **kwargs)

    def get_trace(self) -> Trace:
        return self.trace

    def __call__(self, fn):
        # decorating a function with a bare TraceMessenger (e.g.
        # ``@poutine.trace(graph_type=...)``) yields a TraceHandler, as in
        # the reference (``trace_messenger.py:TraceMessenger.__call__``)
        return TraceHandler(self, fn)

    def _reset(self):
        # fresh trace on NonlocalExit re-execution (ref
        # ``trace_messenger.py:_reset``, used by queue/pqueue loops)
        self.trace = Trace(self.graph_type)

    def _postprocess_message(self, msg):
        if msg["type"] in ("sample", "param", "markov_chain") and (
            not self.param_only or msg["type"] == "param"
        ):
            site = dict(msg)
            site.pop("continuation", None)
            self.trace.add_node(msg["name"], **site)


class TraceHandler:
    """Callable wrapper returned by ``trace(fn)`` with ``get_trace``
    (ref ``trace_messenger.py:TraceHandler``)."""

    def __init__(self, msngr: TraceMessenger, fn: Callable):
        self.msngr = msngr
        self.fn = fn
        functools.update_wrapper(self, fn, updated=[])

    def __call__(self, *args, **kwargs):
        with self.msngr:
            ret = self.fn(*args, **kwargs)
            # record fn inputs/return for parity with the reference's
            # trace structure (ref ``trace_messenger.py:TraceHandler``);
            # these nodes have type "args"/"return" so sample/param
            # consumers skip them.
            tr = self.msngr.get_trace()
            if "_INPUT" not in tr.nodes:
                tr.add_node(
                    "_INPUT",
                    name="_INPUT",
                    type="args",
                    args=args,
                    kwargs=kwargs,
                )
            tr.add_node("_RETURN", name="_RETURN", type="return", value=ret)
            return ret

    def get_trace(self, *args, **kwargs) -> Trace:
        self(*args, **kwargs)
        return self.msngr.get_trace()

    @property
    def trace(self) -> Trace:
        return self.msngr.get_trace()


class ReplayMessenger(Messenger):
    """Force sample values from a previous trace or a flat dict
    (ref ``replay_messenger.py``)."""

    def __init__(self, trace: Optional[Trace] = None, params: Optional[dict] = None):
        super().__init__()
        if trace is None and params is None:
            raise ValueError("must provide trace or params to replay against")
        self.trace = trace
        self.params = params

    def _pyro_sample(self, msg):
        name = msg["name"]
        if self.trace is not None and name in self.trace:
            guide_msg = self.trace.nodes[name]
            if msg["is_observed"]:
                return
            if guide_msg["type"] != "sample" or guide_msg["is_observed"]:
                raise RuntimeError(f"site {name} must be sampled in trace")
            msg["done"] = True
            msg["value"] = guide_msg["value"]
            msg["infer"] = guide_msg["infer"]

    def _pyro_param(self, msg):
        name = msg["name"]
        if self.params is not None and name in self.params:
            msg["done"] = True
            msg["value"] = self.params[name]


class ConditionMessenger(Messenger):
    """Fix the value of sample sites as observed (ref
    ``condition_messenger.py``)."""

    def __init__(self, data: Union[Dict[str, Any], Trace]):
        super().__init__()
        self.data = data

    def _pyro_sample(self, msg):
        name = msg["name"]
        if isinstance(self.data, Trace):
            if name in self.data:
                msg["value"] = self.data.nodes[name]["value"]
                msg["is_observed"] = msg["value"] is not None
                msg["done"] = msg["value"] is not None
        elif name in self.data:
            value = self.data[name]
            if value is not None:
                msg["value"] = value
                msg["is_observed"] = True
                msg["done"] = True


class UnconditionMessenger(Messenger):
    """Strip observations so the model samples everything (ref
    ``uncondition_messenger.py``)."""

    def _pyro_sample(self, msg):
        if msg["is_observed"]:
            msg["is_observed"] = False
            msg["infer"] = dict(msg["infer"])
            msg["infer"]["was_observed"] = True
            msg["infer"]["obs"] = msg["value"]
            msg["value"] = None
            msg["done"] = False


class SubstituteMessenger(Messenger):
    """Substitute values for param sites (ref ``substitute_messenger.py``)."""

    def __init__(self, data: Dict[str, Any]):
        super().__init__()
        self.data = data
        self._data_cache: Dict[str, Any] = {}

    def _pyro_param(self, msg):
        name = msg["name"]
        if name in self.data:
            msg["value"] = self.data[name]
            msg["done"] = True


class SeedMessenger(Messenger):
    """Supply deterministic per-site PRNG keys.

    TPU-native replacement for the reference's reliance on the global torch
    RNG (``seed_messenger.py`` only sets a seed temporarily).  Each sample
    site gets ``fold_in(base_key, hash(site_name))`` so that adding or
    reordering sites does not perturb other sites' draws, and a per-call
    counter distinguishes repeated unnamed draws.
    """

    def __init__(
        self,
        rng_seed: Union[int, jax.Array, None] = None,
        rng_key: Optional[jax.Array] = None,
    ):
        super().__init__()
        if rng_key is not None:
            rng_seed = rng_key
        if rng_seed is None:
            raise ValueError("seed requires rng_seed or rng_key")
        if isinstance(rng_seed, int):
            rng_seed = jax.random.key(rng_seed)
        # accept raw uint32 keys too
        if hasattr(rng_seed, "dtype") and rng_seed.dtype == jnp.uint32:
            rng_seed = jax.random.wrap_key_data(rng_seed)
        self.rng_key = rng_seed
        self._counts: Dict[str, int] = {}

    def __enter__(self):
        self._counts = {}
        return super().__enter__()

    def _pyro_sample(self, msg):
        if msg["rng_key"] is None and not msg["is_observed"]:
            name = msg["name"] or ""
            count = self._counts.get(name, 0)
            self._counts[name] = count + 1
            key = default_site_key(name, self.rng_key)
            if count:
                key = jax.random.fold_in(key, count)
            msg["rng_key"] = key




class BlockMessenger(Messenger):
    """Hide sites from handlers above this one (ref ``block_messenger.py``)."""

    _is_block = True

    def __init__(
        self,
        hide_fn: Optional[Callable] = None,
        expose_fn: Optional[Callable] = None,
        hide_all: bool = True,
        expose_all: bool = False,
        hide=None,
        expose=None,
        hide_types=None,
        expose_types=None,
    ):
        super().__init__()
        if not (hide_fn is None or expose_fn is None):
            raise ValueError("only specify one of hide_fn or expose_fn")
        if hide_fn is not None:
            self.hide_fn = hide_fn
        elif expose_fn is not None:
            self.hide_fn = lambda msg: not expose_fn(msg)
        else:
            self.hide_fn = _make_default_hide_fn(
                hide_all, expose_all, hide, expose, hide_types, expose_types
            )

    def _process_message(self, msg):
        msg["stop"] = bool(self.hide_fn(msg))


def _make_default_hide_fn(
    hide_all, expose_all, hide, expose, hide_types, expose_types
):
    # Ref `block_messenger.py:24-74` precedence rules.
    if hide is None and expose is None and hide_types is None and expose_types is None:
        hide, expose, hide_types, expose_types = [], [], [], []
        if hide_all == expose_all:
            hide_all = True
            expose_all = False
    else:
        if hide is not None or hide_types is not None:
            hide_all = False
        if expose is not None or expose_types is not None:
            hide_all = True
        hide = hide or []
        expose = expose or []
        hide_types = hide_types or []
        expose_types = expose_types or []

    def hide_fn(msg):
        if msg["name"] in hide:
            return True
        if msg["name"] in expose:
            return False
        if msg["type"] in hide_types:
            return True
        if msg["type"] in expose_types:
            return False
        return hide_all

    return hide_fn


class MaskMessenger(Messenger):
    """AND a boolean mask into enclosed sample sites
    (ref ``mask_messenger.py``)."""

    def __init__(self, mask):
        super().__init__()
        self.mask = mask

    def _process_message(self, msg):
        if msg["type"] in ("sample", "inspect"):
            cur = msg["mask"]
            if cur is None:
                msg["mask"] = self.mask
            elif isinstance(cur, bool) and isinstance(self.mask, bool):
                msg["mask"] = cur and self.mask
            else:
                msg["mask"] = cur & self.mask


class ScaleMessenger(Messenger):
    """Multiply log-prob scale (ref ``scale_messenger.py``)."""

    def __init__(self, scale):
        super().__init__()
        self.scale = scale

    def _process_message(self, msg):
        msg["scale"] = self.scale * msg["scale"]


class DoMessenger(Messenger):
    """Causal intervention: sever a site and fix its value
    (ref ``do_messenger.py``)."""

    def __init__(self, data: Dict[str, Any]):
        super().__init__()
        self.data = data
        self._intervener_id = str(id(self))

    def _pyro_sample(self, msg):
        import warnings

        import jax.numpy as _jnp

        name = msg["name"]
        if (
            msg["infer"].get("_intervener_id") != self._intervener_id
            and self.data.get(name) is not None
        ):
            if msg["infer"].get("_intervener_id") is not None:
                warnings.warn(
                    f"Attempting to intervene on variable {name} multiple "
                    "times, this is almost certainly incorrect behavior",
                    RuntimeWarning,
                )
            msg["infer"] = dict(msg["infer"])
            msg["infer"]["_intervener_id"] = self._intervener_id

            # split node (ref ``do_messenger.py:73``): a fresh site under
            # the ORIGINAL name whose value does not propagate — it stays
            # a free sample (or picks up an observation from an enclosing
            # condition handler), giving SWIG counterfactual semantics
            new_msg = dict(msg)
            new_msg["infer"] = dict(msg["infer"])
            new_msg["cond_indep_stack"] = ()  # avoid entering plates twice
            apply_stack(new_msg)

            # the continuing message carries the intervention into the
            # model's return flow, recorded under a mangled name
            msg["name"] = name + "__CF"
            msg["value"] = _jnp.asarray(self.data[name])
            msg["is_observed"] = True
            msg["stop"] = True
            msg["done"] = True


class LiftMessenger(Messenger):
    """Lift ``param`` sites to ``sample`` sites under a prior
    (ref ``lift_messenger.py``)."""

    def __init__(self, prior):
        super().__init__()
        self.prior = prior
        self._samples_cache: Dict[str, Any] = {}

    def __enter__(self):
        self._samples_cache = {}
        return super().__enter__()

    def _pyro_param(self, msg):
        from ..distributions.distribution import Distribution

        name = msg["name"]
        if isinstance(self.prior, dict):
            if name not in self.prior:
                return
            fn = self.prior[name]
        else:
            fn = self.prior
        if name in self._samples_cache:
            msg["value"] = self._samples_cache[name]["value"]
            msg["done"] = True
            return
        msg["type"] = "sample"
        if isinstance(fn, Distribution):
            msg["fn"] = fn
            msg["args"] = ()
            msg["kwargs"] = {}
            msg["infer"] = {}
        else:
            # callable prior: stochastic fn
            msg["fn"] = fn
            msg["args"] = msg["args"][1:]
        msg["is_observed"] = False
        self._samples_cache[name] = msg

    def _pyro_post_param(self, msg):
        pass


class InferConfigMessenger(Messenger):
    """Update each site's infer dict via a config function
    (ref ``infer_config_messenger.py``)."""

    def __init__(self, config_fn: Callable):
        super().__init__()
        self.config_fn = config_fn

    def _pyro_sample(self, msg):
        msg["infer"] = {**msg["infer"], **self.config_fn(msg)}

    def _pyro_param(self, msg):
        msg["infer"] = {**msg["infer"], **self.config_fn(msg)}


class EscapeMessenger(Messenger):
    """Raise NonlocalExit at the first site matching a predicate
    (ref ``escape_messenger.py``)."""

    _is_escape = True

    def __init__(self, escape_fn: Callable):
        super().__init__()
        self.escape_fn = escape_fn

    def _pyro_sample(self, msg):
        if self.escape_fn(msg):
            msg["done"] = True
            msg["stop"] = True

            def cont(m):
                raise NonlocalExit(m)

            msg["continuation"] = cont


# -- dual-use API factory (ref ``handlers.py:_make_handler:110``) -------------


def _make_handler(msngr_cls, name):
    def handler(fn=None, *args, **kwargs):
        if fn is not None and not callable(fn):
            # called as `trace()` or with data-first convention
            args = (fn,) + args
            fn = None
        msngr = msngr_cls(*args, **kwargs)
        if fn is None:
            return msngr
        if msngr_cls is TraceMessenger:
            return TraceHandler(msngr, fn)
        return msngr(fn)

    handler.__name__ = name
    return handler


trace = _make_handler(TraceMessenger, "trace")
replay = _make_handler(ReplayMessenger, "replay")
condition = _make_handler(ConditionMessenger, "condition")
uncondition = _make_handler(UnconditionMessenger, "uncondition")
substitute = _make_handler(SubstituteMessenger, "substitute")
block = _make_handler(BlockMessenger, "block")
mask = _make_handler(MaskMessenger, "mask")
scale = _make_handler(ScaleMessenger, "scale")
do = _make_handler(DoMessenger, "do")
lift = _make_handler(LiftMessenger, "lift")
infer_config = _make_handler(InferConfigMessenger, "infer_config")
escape = _make_handler(EscapeMessenger, "escape")
seed = _make_handler(SeedMessenger, "seed")


def enum(fn=None, first_available_dim=None):
    from .enum_messenger import EnumMessenger

    msngr = EnumMessenger(first_available_dim=first_available_dim)
    return msngr if fn is None else msngr(fn)


def queue(
    fn=None,
    queue=None,
    max_tries=None,
    extend_fn=None,
    escape_fn=None,
    num_samples=None,
):
    """Sequential enumeration over discrete variables (ref
    ``poutine/handlers.py:queue``): pops partial traces from ``queue``,
    replays the model against them, and on hitting an unvisited discrete
    site pushes all enumerated extensions back; returns the value of one
    complete trace per call."""
    import jax as _jax

    from .runtime import NonlocalExit
    from .util import discrete_escape, enum_extend

    if max_tries is None:
        max_tries = int(1e6)
    if extend_fn is None:
        extend_fn = enum_extend
    if escape_fn is None:
        escape_fn = discrete_escape
    if num_samples is None:
        num_samples = -1

    def wrapper(wrapped):
        def _fn(*args, **kwargs):
            for _ in range(max_tries):
                assert not queue.empty(), (
                    "trying to get() from an empty queue will deadlock"
                )
                next_trace = queue.get()
                try:
                    ftr = trace(
                        EscapeMessenger(
                            lambda msg, t=next_trace: escape_fn(t, msg)
                        )(
                            replay(
                                seed(wrapped, rng_key=_jax.random.key(0)),
                                trace=next_trace,
                            )
                        )
                    )
                    return ftr(*args, **kwargs)
                except NonlocalExit as site_container:
                    # reset surviving outer frames (e.g. a user's trace
                    # handler around this queue) so the re-execution does
                    # not see stale sites — ref handlers.py queue:
                    # site_container.reset_stack()
                    site_container.reset_stack()
                    for tr in extend_fn(
                        ftr.msngr.get_trace(),
                        site_container.site,
                        num_samples=num_samples,
                    ) if _accepts_num_samples(extend_fn) else extend_fn(
                        ftr.msngr.get_trace(), site_container.site
                    ):
                        queue.put(tr)
            raise ValueError("max tries ({}) exceeded".format(max_tries))

        return _fn

    return wrapper(fn) if fn is not None else wrapper


def _accepts_num_samples(fn):
    import inspect

    try:
        return "num_samples" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


class EqualizeMessenger(Messenger):
    """Force the sample/param statements matching ``sites`` (regular
    expressions, full-matched against site names) to share the value of
    the first matching statement (ref ``poutine/equalize_messenger.py``).

    With ``keep_dist=False`` (default) the second and subsequent matches
    are replaced by masked Delta sites (pure value-tying); with
    ``keep_dist=True`` their distributions are kept and the sites marked
    observed — equivalent to conditioning the model on all matches being
    equal."""

    def __init__(self, sites, type="sample", keep_dist=False):
        import re

        super().__init__()
        if isinstance(sites, str):
            sites = [sites]
        self._patterns = [re.compile(s) for s in sites]
        self.type = type
        self.keep_dist = keep_dist
        self._value = None

    def __enter__(self):
        self._value = None
        return super().__enter__()

    def _is_matching(self, msg):
        return msg["type"] == self.type and any(
            p.fullmatch(msg["name"]) is not None for p in self._patterns
        )

    def _pyro_sample(self, msg):
        if self.type == "sample" and self._is_matching(msg):
            if self._value is not None:
                msg["value"] = self._value
                msg["is_observed"] = True
                if not self.keep_dist:
                    from ..distributions import Delta

                    msg["infer"] = dict(
                        msg.get("infer", {}), _deterministic=True
                    )
                    msg["fn"] = Delta(
                        self._value, event_dim=msg["fn"].event_dim
                    ).mask(False)

    def _pyro_post_sample(self, msg):
        if self.type == "sample" and self._is_matching(msg):
            if self._value is None:
                self._value = msg["value"]

    def _pyro_param(self, msg):
        if self.type == "param" and self._is_matching(msg):
            if self._value is not None:
                msg["value"] = self._value
                msg["done"] = True

    def _pyro_post_param(self, msg):
        if self.type == "param" and self._is_matching(msg):
            if self._value is None:
                self._value = msg["value"]


def equalize(fn=None, sites=None, type="sample", keep_dist=False):
    """Dual-use handler for :class:`EqualizeMessenger`."""
    msngr = EqualizeMessenger(sites, type=type, keep_dist=keep_dist)
    return msngr if fn is None else msngr(fn)


class BroadcastMessenger(Messenger):
    """Automatic broadcasting of sample distributions to enclosing plate
    dims (ref ``broadcast_messenger.py:46``).  In this framework plate
    broadcasting is built into :class:`~.plate_messenger.PlateMessenger`,
    so this handler exists for API parity and is a no-op."""


def broadcast(fn=None):
    msngr = BroadcastMessenger()
    return msngr if fn is None else msngr(fn)


def collapse(fn=None, *args, **kwargs):
    """Ref ``poutine/collapse_messenger.py``: marginalize latents out of
    conjugate prior->observed-likelihood pairs inside the context.  The
    reference contracts lazy funsor terms; this native version computes
    exact sufficient-statistic marginals for recognized pairs (see
    :mod:`pyro_tpu.poutine.collapse_messenger`).  For latent chains use
    enumeration or ``contrib.conjugate.collapse_conjugate``."""
    from .collapse_messenger import CollapseMessenger

    msngr = CollapseMessenger(*args, **kwargs)
    return msngr if fn is None else msngr(fn)

"""Mini Pyro: a complete, self-contained implementation of the core
language in ~300 lines.

Ref ``pyro/contrib/minipyro.py`` — the pedagogical spec of the effect
semantics (handler stack, trace, replay, block, plate, seed, SVI with
Trace_ELBO).  Everything here is independent of the main ``pyro_tpu``
package except the distribution library.
"""

from __future__ import annotations

import weakref
from collections import OrderedDict

import jax
import jax.numpy as jnp

# the effect-handler stack
PYRO_STACK = []

# global param store
PARAM_STORE = {}


def get_param_store():
    return PARAM_STORE


def clear_param_store():
    PARAM_STORE.clear()


class Messenger:
    def __init__(self, fn=None):
        self.fn = fn

    def __enter__(self):
        PYRO_STACK.append(self)
        return self

    def __exit__(self, *args, **kwargs):
        assert PYRO_STACK[-1] is self
        PYRO_STACK.pop()

    def process_message(self, msg):
        pass

    def postprocess_message(self, msg):
        pass

    def __call__(self, *args, **kwargs):
        with self:
            return self.fn(*args, **kwargs)


class trace(Messenger):
    def __enter__(self):
        super().__enter__()
        self.trace = OrderedDict()
        return self.trace

    def postprocess_message(self, msg):
        assert (
            msg["type"] != "sample" or msg["name"] not in self.trace
        ), "sample sites must have unique names"
        self.trace[msg["name"]] = msg.copy()

    def get_trace(self, *args, **kwargs):
        self(*args, **kwargs)
        return self.trace


class replay(Messenger):
    def __init__(self, fn, guide_trace):
        self.guide_trace = guide_trace
        super().__init__(fn)

    def process_message(self, msg):
        if msg["name"] in self.guide_trace:
            msg["value"] = self.guide_trace[msg["name"]]["value"]


class block(Messenger):
    def __init__(self, fn=None, hide_fn=lambda msg: True):
        self.hide_fn = hide_fn
        super().__init__(fn)

    def process_message(self, msg):
        if self.hide_fn(msg):
            msg["stop"] = True


class seed(Messenger):
    """Split a PRNG key across sample sites (JAX-native addition vs the
    torch reference, which relies on the global RNG)."""

    def __init__(self, fn=None, rng_seed=0):
        self.rng_key = (
            jax.random.key(rng_seed)
            if isinstance(rng_seed, int)
            else rng_seed
        )
        super().__init__(fn)

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["value"] is None:
            self.rng_key, sub = jax.random.split(self.rng_key)
            msg["rng_key"] = sub


class plate(Messenger):
    def __init__(self, name, size, dim=None):
        assert dim is not None and dim < 0
        self.name = name
        self.size = size
        self.dim = dim
        super().__init__(None)

    def process_message(self, msg):
        if msg["type"] == "sample":
            batch_shape = msg["fn"].batch_shape
            if len(batch_shape) < -self.dim or batch_shape[self.dim] != self.size:
                batch_shape = [1] * (-self.dim - len(batch_shape)) + list(
                    batch_shape
                )
                batch_shape[self.dim] = self.size
                msg["fn"] = msg["fn"].expand(tuple(batch_shape))

    def __iter__(self):
        return iter(range(self.size))


def apply_stack(msg):
    for pointer, handler in enumerate(reversed(PYRO_STACK)):
        handler.process_message(msg)
        if msg.get("stop"):
            break
    if msg["value"] is None:
        if msg["type"] == "sample":
            msg["value"] = msg["fn"].sample(msg["rng_key"])
        else:
            msg["value"] = msg["fn"](*msg["args"])
    for handler in PYRO_STACK[-pointer - 1 :]:
        handler.postprocess_message(msg)
    return msg


def sample(name, fn, *args, obs=None):
    if not PYRO_STACK:
        return fn.sample(jax.random.key(0))
    msg = dict(
        type="sample",
        name=name,
        fn=fn,
        args=args,
        value=obs,
        rng_key=None,
        stop=False,
    )
    return apply_stack(msg)["value"]


def param(name, init_value=None):
    def fn(init):
        value = PARAM_STORE.setdefault(name, init)
        return value

    if not PYRO_STACK:
        return fn(init_value)
    msg = dict(
        type="param",
        name=name,
        fn=fn,
        args=(init_value,),
        value=None,
        stop=False,
    )
    return apply_stack(msg)["value"]


class Adam:
    """Minimal per-param Adam (ref ``minipyro.py:Adam``)."""

    def __init__(self, optim_args):
        self.lr = optim_args["lr"]
        self.state = {}

    def __call__(self, params, grads):
        out = {}
        for name, p in params.items():
            g = grads[name]
            m, v, t = self.state.get(
                name, (jnp.zeros_like(p), jnp.zeros_like(p), 0)
            )
            t += 1
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1 - 0.9**t)
            vhat = v / (1 - 0.999**t)
            self.state[name] = (m, v, t)
            out[name] = p - self.lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        return out


class SVI:
    def __init__(self, model, guide, optim, loss):
        self.model = model
        self.guide = guide
        self.optim = optim
        self.loss = loss
        self._step = 0

    def step(self, *args, **kwargs):
        self._step += 1
        key = jax.random.key(self._step)
        params = dict(PARAM_STORE)

        def loss_fn(params):
            PARAM_STORE.update(params)
            return self.loss(self.model, self.guide, key, *args, **kwargs)

        # make sure params exist
        loss_val = loss_fn(params)
        params = dict(PARAM_STORE)
        loss_val, grads = jax.value_and_grad(loss_fn)(params)
        new_params = self.optim(params, grads)
        PARAM_STORE.update(new_params)
        return float(loss_val)


def elbo(model, guide, key, *args, **kwargs):
    k1, k2 = jax.random.split(key)
    guide_trace = trace(seed(guide, k1)).get_trace(*args, **kwargs)
    model_trace = trace(
        replay(seed(model, k2), guide_trace)
    ).get_trace(*args, **kwargs)
    result = 0.0
    for site in model_trace.values():
        if site["type"] == "sample":
            result = result + jnp.sum(site["fn"].log_prob(site["value"]))
    for site in guide_trace.values():
        if site["type"] == "sample":
            result = result - jnp.sum(site["fn"].log_prob(site["value"]))
    return -result


Trace_ELBO = lambda **kwargs: elbo

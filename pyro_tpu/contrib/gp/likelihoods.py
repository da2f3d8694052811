"""GP likelihoods (ref ``pyro/contrib/gp/likelihoods/``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist
from ...distributions import constraints
from ...primitives import sample as pyro_sample
from .parameterized import Parameterized


class Likelihood(Parameterized):
    def forward(self, f_loc, f_var, y=None):
        raise NotImplementedError

    def __call__(self, f_loc, f_var, y=None):
        return self.forward(f_loc, f_var, y)


class Gaussian(Likelihood):
    """Ref ``likelihoods/gaussian.py``."""

    def __init__(self, variance=1.0, name=None):
        super().__init__(name)
        self._register_param("variance", variance, constraints.positive)

    def forward(self, f_loc, f_var, y=None):
        y_var = f_var + self.variance
        y_dist = dist.Normal(f_loc, jnp.sqrt(y_var))
        if y is not None:
            y_dist = y_dist.expand(
                jnp.broadcast_shapes(f_loc.shape, y.shape)
            ).to_event(jnp.ndim(y))
        return pyro_sample(f"{self._pyro_name}.y", y_dist, obs=y)


class Binary(Likelihood):
    """Ref ``likelihoods/binary.py``: sample f then Bernoulli(link(f))."""

    def __init__(self, response_function=None, name=None):
        super().__init__(name)
        self.response_function = response_function or jax.nn.sigmoid

    def forward(self, f_loc, f_var, y=None):
        # 1-sample MC estimate of E_q(f)[log p(y|f)]: f is a raw
        # reparameterized draw, NOT a scored site (ref binary.py:48)
        f = pyro_sample(
            f"{self._pyro_name}.f",
            dist.Normal(f_loc, jnp.sqrt(f_var)).to_event(
                jnp.ndim(f_loc)
            ),
            infer={"_do_not_score": True, "is_auxiliary": True},
        )
        if self.response_function is jax.nn.sigmoid:
            y_dist = dist.Bernoulli(logits=f)  # stable (ref binary.py:50)
        else:
            y_dist = dist.Bernoulli(probs=self.response_function(f))
        if y is not None:
            y_dist = y_dist.expand(
                jnp.broadcast_shapes(f.shape, y.shape)
            ).to_event(jnp.ndim(y))
        return pyro_sample(f"{self._pyro_name}.y", y_dist, obs=y)


class Poisson(Likelihood):
    """Ref ``likelihoods/poisson.py``."""

    def __init__(self, response_function=None, name=None):
        super().__init__(name)
        self.response_function = response_function or jnp.exp

    def forward(self, f_loc, f_var, y=None):
        # 1-sample MC estimate of E_q(f)[log p(y|f)]: f is a raw
        # reparameterized draw, NOT a scored site (ref binary.py:48)
        f = pyro_sample(
            f"{self._pyro_name}.f",
            dist.Normal(f_loc, jnp.sqrt(f_var)).to_event(
                jnp.ndim(f_loc)
            ),
            infer={"_do_not_score": True, "is_auxiliary": True},
        )
        rate = self.response_function(f)
        y_dist = dist.Poisson(rate)
        if y is not None:
            y_dist = y_dist.expand(
                jnp.broadcast_shapes(rate.shape, y.shape)
            ).to_event(jnp.ndim(y))
        return pyro_sample(f"{self._pyro_name}.y", y_dist, obs=y)


class MultiClass(Likelihood):
    """Ref ``likelihoods/multi_class.py``: f has a class dim."""

    def __init__(self, num_classes, response_function=None, name=None):
        super().__init__(name)
        self.num_classes = num_classes
        self.response_function = response_function

    def forward(self, f_loc, f_var, y=None):
        # f_loc: (num_classes, N)
        # 1-sample MC estimate of E_q(f)[log p(y|f)]: f is a raw
        # reparameterized draw, NOT a scored site (ref binary.py:48)
        f = pyro_sample(
            f"{self._pyro_name}.f",
            dist.Normal(f_loc, jnp.sqrt(f_var)).to_event(
                jnp.ndim(f_loc)
            ),
            infer={"_do_not_score": True, "is_auxiliary": True},
        )
        logits = jnp.swapaxes(f, -2, -1)  # (N, num_classes)
        y_dist = dist.Categorical(logits=logits)
        if y is not None:
            y_dist = y_dist.to_event(jnp.ndim(y))
        return pyro_sample(f"{self._pyro_name}.y", y_dist, obs=y)

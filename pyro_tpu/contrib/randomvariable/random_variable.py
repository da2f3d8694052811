"""RandomVariable: transform distributions with arithmetic operators.

Ref ``pyro/contrib/randomvariable/random_variable.py``: ``X.rv + 1``,
``(X.rv * 2).exp()`` build TransformedDistributions fluently.
"""

from __future__ import annotations

from ...distributions.distribution import (
    Distribution,
    TransformedDistribution,
)
from ...distributions.transforms import (
    AbsTransform,
    AffineTransform,
    ExpTransform,
    PowerTransform,
    SigmoidTransform,
    SoftmaxTransform,
    TanhTransform,
    Transform,
)


class RandomVariable:
    def __init__(self, distribution: Distribution):
        self.distribution = distribution

    def transform(self, t: Transform) -> "RandomVariable":
        return RandomVariable(
            TransformedDistribution(self.distribution, [t])
        )

    @property
    def dist(self) -> Distribution:
        return self.distribution

    # arithmetic sugar
    def __add__(self, x):
        return self.transform(AffineTransform(x, 1.0))

    __radd__ = __add__

    def __sub__(self, x):
        return self.transform(AffineTransform(-x, 1.0))

    def __rsub__(self, x):
        return self.transform(AffineTransform(x, -1.0))

    def __mul__(self, x):
        return self.transform(AffineTransform(0.0, x))

    __rmul__ = __mul__

    def __truediv__(self, x):
        return self.transform(AffineTransform(0.0, 1.0 / x))

    def __neg__(self):
        return self.transform(AffineTransform(0.0, -1.0))

    def __abs__(self):
        return self.transform(AbsTransform())

    def __pow__(self, x):
        return self.transform(PowerTransform(x))

    def abs(self):
        return self.transform(AbsTransform())

    def exp(self):
        return self.transform(ExpTransform())

    def log(self):
        return self.transform(ExpTransform().inv)

    def sigmoid(self):
        return self.transform(SigmoidTransform())

    def tanh(self):
        return self.transform(TanhTransform())

    def softmax(self):
        return self.transform(SoftmaxTransform())

    def pow(self, x):
        return self.transform(PowerTransform(x))

    def sample(self, key, sample_shape=()):
        return self.distribution.sample(key, sample_shape)

    def log_prob(self, value):
        return self.distribution.log_prob(value)

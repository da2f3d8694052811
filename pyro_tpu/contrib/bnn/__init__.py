"""Bayesian neural network layers (ref ``pyro/contrib/bnn``)."""

from .hidden_layer import HiddenLayer

__all__ = ["HiddenLayer"]

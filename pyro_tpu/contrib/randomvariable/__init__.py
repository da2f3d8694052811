"""Fluent random-variable arithmetic (ref ``pyro/contrib/randomvariable``)."""

from .random_variable import RandomVariable

__all__ = ["RandomVariable"]

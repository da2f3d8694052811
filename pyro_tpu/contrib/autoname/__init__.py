"""Automatic site naming (ref ``pyro/contrib/autoname``)."""

from . import named
from .scoping import name_count, scope

__all__ = ["name_count", "named", "scope"]

"""Mid-level guide DSL (ref ``pyro/contrib/easyguide/easyguide.py``)."""

from .easyguide import EasyGuide, easy_guide

__all__ = ["EasyGuide", "easy_guide"]

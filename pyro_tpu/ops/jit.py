"""JIT compilation utilities.

Ref ``pyro/ops/jit.py`` (CompiledFunction memoizing torch.jit.trace per
argument shapes): under JAX this machinery IS ``jax.jit`` — tracing,
shape-keyed caching, and gradient support are built in.  These shims keep
the reference API importable.
"""

from __future__ import annotations

import jax


class CompiledFunction:
    """Ref ``jit.py:48``: thin wrapper over jax.jit."""

    def __init__(self, fn, ignore_warnings=False, jit_options=None):
        self.fn = fn
        self._compiled = jax.jit(fn, **(jit_options or {}))

    def __call__(self, *args, **kwargs):
        return self._compiled(*args, **kwargs)


def trace(fn=None, ignore_warnings=False, jit_options=None):
    """Ref ``jit.py:132``: decorator form."""
    if fn is None:
        import functools

        return functools.partial(
            trace, ignore_warnings=ignore_warnings, jit_options=jit_options
        )
    return CompiledFunction(fn, ignore_warnings, jit_options)

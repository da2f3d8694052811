"""Plate: vectorized conditional independence, subsampling, broadcasting.

Ref ``pyro/poutine/indep_messenger.py:140`` (IndepMessenger),
``subsample_messenger.py:74`` (SubsampleMessenger),
``broadcast_messenger.py:14`` (BroadcastMessenger), and the public
``pyro.plate`` at ``pyro/primitives.py:283``.

TPU-native notes: subsample indices are drawn with a static
``subsample_size`` via ``jax.random.permutation`` so gathers have static
shapes under ``jit``; the indices are themselves a sample site (an internal
``_Subsample`` distribution) so seeding/replay/tracing work uniformly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..distributions import constraints
from ..distributions.distribution import Distribution
from ..distributions.util import broadcast_shape
from .messenger import Messenger
from .runtime import (
    _DIM_ALLOCATOR,
    CondIndepStackFrame,
    am_i_wrapped,
    apply_stack,
    new_message,
)


class _Subsample(Distribution):
    """Random subsample-index distribution (ref ``subsample_messenger.py:15``)."""

    arg_constraints = {}
    has_rsample = False

    def __init__(self, size: int, subsample_size: Optional[int]):
        self.size = size
        self.subsample_size = subsample_size
        super().__init__()
        self._pyro_init_args = ((size, subsample_size), ())

    def sample(self, key, sample_shape=()):
        assert sample_shape == ()
        if self.subsample_size is None or self.subsample_size >= self.size:
            return jnp.arange(self.size)
        if key is None:
            raise ValueError(
                "subsampled plate requires a seed handler or rng_key"
            )
        perm = jax.random.permutation(key, self.size)
        return perm[: self.subsample_size]

    def log_prob(self, value):
        return jnp.zeros(())


class PlateMessenger(Messenger):
    """``pyro.plate``: context manager, iterator, and vmap-dim declaration.

    Combines the reference's IndepMessenger + SubsampleMessenger +
    BroadcastMessenger into one handler: every enclosed sample site gets

    * a CondIndepStackFrame on its ``cond_indep_stack``
    * its fn broadcast so ``batch_shape[dim] == subsample_size``
    * log-prob scale multiplied by ``size/subsample_size``
    """

    def __init__(
        self,
        name: str,
        size: Optional[int] = None,
        subsample_size: Optional[int] = None,
        subsample=None,
        dim: Optional[int] = None,
        use_cuda=None,  # accepted for API parity; ignored
        device=None,
    ):
        super().__init__()
        if size is None:
            size = -1  # sequential-only plate of unknown size
        self.name = name
        self.size = size
        self.subsample_size = (
            subsample_size if subsample_size is not None else size
        )
        if subsample is not None:
            self.subsample_size = (
                int(subsample.shape[0]) if hasattr(subsample, "shape") else len(subsample)
            )
        self._given_subsample = subsample
        self.dim = dim
        self._allocated_dim: Optional[int] = None
        self._indices = None

    # -- subsampling --------------------------------------------------------
    def _subsample_site(self):
        """Draw (or pass through) subsample indices via a sample site.

        The site is registered even for full-size plates so traces
        record the plate and duplicate plate names collide exactly as in
        the reference ("Multiple sample sites named ...",
        ref ``subsample_messenger.py:74``)."""
        if self._given_subsample is not None:
            if (
                self.subsample_size is not None
                and len(self._given_subsample) != self.subsample_size
            ):
                raise ValueError(
                    f"subsample_size does not match len(subsample), "
                    f"{self.subsample_size} vs {len(self._given_subsample)}"
                )
            return jnp.asarray(self._given_subsample)
        if self.subsample_size > self.size >= 0:
            raise ValueError(
                f"subsample_size {self.subsample_size} exceeds plate "
                f"size {self.size} for plate '{self.name}'"
            )
        fn = _Subsample(self.size, self.subsample_size)
        full_size = self.subsample_size >= self.size
        if not am_i_wrapped():
            if full_size:
                return jnp.arange(self.size)
            from .runtime import _next_eager_key

            return fn.sample(_next_eager_key())
        msg = new_message(
            "sample",
            self.name,
            fn,
            (),
            {"sample_shape": ()},
            # full-size plates are deterministic: pre-set the value so no
            # rng key is drawn (keys are tracers under jit; consuming the
            # global eager key there would leak a tracer)
            value=jnp.arange(self.size) if full_size else None,
            infer={"_do_not_trace": True, "_do_not_score": True, "is_auxiliary": True},
        )
        msg["scale"] = 1.0
        msg = apply_stack(msg)
        return msg["value"]

    @property
    def indices(self):
        if self._indices is None:
            self._indices = self._subsample_site()
        return self._indices

    # -- context manager ------------------------------------------------------
    def __enter__(self):
        if self.size == -1:
            raise ValueError(
                f"plate '{self.name}' needs a size to be used as a context "
                "manager"
            )
        self._allocated_dim = _DIM_ALLOCATOR.allocate(self.name, self.dim)
        # NOTE: indices are sampled once per plate *object* (cached in
        # self._indices, ref ``subsample_messenger.py.__init__``), so a
        # reused plate re-enters without re-registering its site
        try:
            super().__enter__()
            return self.indices
        except Exception:
            # release allocator + stack state so a failed enter does not
            # poison later executions (the with-block's __exit__ never
            # runs when __enter__ raises)
            self.__exit__(None, None, None)
            raise

    def __exit__(self, *args):
        _DIM_ALLOCATOR.free(self.name, self._allocated_dim)
        self._allocated_dim = None
        return super().__exit__(*args)

    # -- sequential iteration (ref ``subsample_messenger.__iter__``) -----------
    def __iter__(self):
        if self.size == -1:
            raise ValueError(f"plate '{self.name}' needs a size to iterate")
        import numpy as np

        if self.subsample_size >= self.size and self._given_subsample is None:
            # host-side indices: a Python loop needs concrete ints, and jnp
            # ops are tracers under jit even for constants
            indices = np.arange(self.size)
        else:
            # cached per plate object (ref ``subsample_messenger``): a
            # plate iterated again — e.g. the inner loop of two nested
            # sequential plates — reuses its indices instead of
            # re-registering the subsample site
            indices = self.indices
            if isinstance(indices, jax.core.Tracer):
                raise ValueError(
                    f"sequential plate('{self.name}') with subsampling "
                    "cannot run under jit: indices are data-dependent. "
                    "Subsample outside jit or use a vectorized plate."
                )
            indices = np.asarray(jax.device_get(indices))
        # Each iteration runs with the subsample scale active, mirroring
        # the reference's per-index ``with self:`` re-entry
        # (ref ``indep_messenger.py:110-130``, ``subsample_messenger.py:174``).
        # Deviation: no per-iteration CondIndepStackFrame is pushed (the
        # sequential frames carry no tensor dim; only the scale matters
        # for loss correctness).
        scale = self.size / self.subsample_size
        if scale != 1.0:
            from .handlers import ScaleMessenger

            for i in indices:
                with ScaleMessenger(scale):
                    yield int(i)
        else:
            for i in indices:
                yield int(i)

    def __len__(self):
        return self.subsample_size

    # -- message processing -----------------------------------------------------
    def _frame(self) -> CondIndepStackFrame:
        return CondIndepStackFrame(
            self.name, self._allocated_dim, self.size, self.subsample_size
        )

    def _pyro_sample(self, msg):
        if msg["infer"].get("_do_not_trace"):
            return
        frame = self._frame()
        msg["cond_indep_stack"] = (frame,) + msg["cond_indep_stack"]
        if self.size != self.subsample_size:
            msg["scale"] = msg["scale"] * (self.size / self.subsample_size)
        self._broadcast(msg)

    def _pyro_inspect(self, msg):
        frame = self._frame()
        msg["cond_indep_stack"] = (frame,) + msg["cond_indep_stack"]

    def _broadcast(self, msg):
        """Expand fn's batch_shape into plate dims
        (ref ``broadcast_messenger.py:46-83``)."""
        fn = msg["fn"]
        if not isinstance(fn, Distribution):
            return
        actual_batch_shape = fn.batch_shape
        target_batch_shape = [
            None if size == 1 else size for size in actual_batch_shape
        ]
        for f in msg["cond_indep_stack"]:
            if f.dim is None:
                continue
            assert f.dim < 0
            if len(target_batch_shape) < -f.dim:
                target_batch_shape = [None] * (
                    -f.dim - len(target_batch_shape)
                ) + target_batch_shape
            if (
                target_batch_shape[f.dim] is not None
                and target_batch_shape[f.dim] != f.subsample_size
            ):
                raise ValueError(
                    f"Shape mismatch inside plate('{f.name}') at site "
                    f"'{msg['name']}' dim {f.dim}: "
                    f"{target_batch_shape[f.dim]} vs {f.subsample_size}"
                )
            target_batch_shape[f.dim] = f.subsample_size
        # fill remaining Nones from the actual shape
        for i in range(-len(target_batch_shape), 0):
            if target_batch_shape[i] is None:
                target_batch_shape[i] = (
                    actual_batch_shape[i]
                    if len(actual_batch_shape) >= -i
                    else 1
                )
        target = tuple(target_batch_shape)
        if target != actual_batch_shape:
            if msg["infer"].get("enumerate") == "parallel":
                # Enumerated sites never draw plate-many samples, so the
                # plate broadcast can stay LAZY: wrapping (instead of
                # dist-specific ``expand`` which broadcasts parameters)
                # lets ``compute_log_prob`` keep the factor compact —
                # size-1 plate axes the packed TVE engine squeezes away.
                # For a homogeneous hidden-Markov transition this is the
                # difference between an O(K^2) and an O(K^2 * B * T)
                # factor (the latter dominated round-3's hmm bench).
                from ..distributions.distribution import (
                    ExpandedDistribution,
                )

                msg["fn"] = ExpandedDistribution(fn, target)
            else:
                msg["fn"] = fn.expand(target)

    def _pyro_param(self, msg):
        frame = self._frame()
        msg["cond_indep_stack"] = (frame,) + msg["cond_indep_stack"]
        if self.size != self.subsample_size:
            msg["scale"] = msg["scale"] * (self.size / self.subsample_size)

    def _pyro_post_param(self, msg):
        self._maybe_subsample_value(msg)

    def _pyro_post_subsample(self, msg):
        self._maybe_subsample_value(msg)

    def _maybe_subsample_value(self, msg):
        """Subsample rows of a param/data tensor along the plate dim
        (ref ``subsample_messenger.py:200-217``)."""
        event_dim = msg["kwargs"].get("event_dim")
        if event_dim is None:
            return
        value = msg["value"]
        if value is None:
            return
        dim = self._allocated_dim - event_dim
        shape = jnp.shape(value)
        if len(shape) >= -dim and shape[dim] != 1:
            if shape[dim] != self.size:
                raise ValueError(
                    f"at site '{msg['name']}', dim {dim} of size "
                    f"{shape[dim]} != plate('{self.name}') size {self.size}"
                )
            if self.subsample_size < self.size:
                idx = self.indices
                msg["value"] = jnp.take(value, idx, axis=len(shape) + dim)


def plate_stack(prefix: str, sizes, rightmost_dim: int = -1):
    """Stack of plates over the rightmost dims (ref ``primitives.py:408``)."""
    from contextlib import ExitStack, contextmanager

    assert rightmost_dim < 0

    @contextmanager
    def ctx():
        with ExitStack() as stack:
            for i, size in enumerate(reversed(sizes)):
                plate = PlateMessenger(
                    f"{prefix}_{len(sizes) - 1 - i}",
                    size,
                    dim=rightmost_dim - i,
                )
                stack.enter_context(plate)
            yield

    return ctx()

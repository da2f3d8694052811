"""Mergeable O(1)-memory streaming statistics (ref ``pyro/ops/streaming.py``)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Hashable

import jax
import jax.numpy as jnp


class StreamingStats:
    """Ref ``streaming.py:14``: ``update(sample)``, ``merge(other)``,
    ``get()``."""

    def update(self, sample) -> None:
        raise NotImplementedError

    def merge(self, other: "StreamingStats") -> "StreamingStats":
        raise NotImplementedError

    def get(self):
        raise NotImplementedError


class CountStats(StreamingStats):
    def __init__(self):
        self.count = 0

    def update(self, sample) -> None:
        self.count += 1

    def merge(self, other):
        out = CountStats()
        out.count = self.count + other.count
        return out

    def get(self):
        return {"count": self.count}


class CountMeanStats(StreamingStats):
    def __init__(self):
        self.count = 0
        self.mean = 0.0

    def update(self, sample) -> None:
        self.count += 1
        self.mean = self.mean + (sample - self.mean) / self.count

    def merge(self, other):
        out = CountMeanStats()
        out.count = self.count + other.count
        if out.count:
            out.mean = (
                self.count * self.mean + other.count * other.mean
            ) / out.count
        return out

    def get(self):
        return {"count": self.count, "mean": self.mean}


class CountMeanVarianceStats(StreamingStats):
    """Welford + Chan parallel merge (ref ``streaming.py:214``)."""

    def __init__(self):
        self.count = 0
        self.mean = 0.0
        self.m2 = 0.0

    def update(self, sample) -> None:
        self.count += 1
        delta = sample - self.mean
        self.mean = self.mean + delta / self.count
        self.m2 = self.m2 + delta * (sample - self.mean)

    def merge(self, other):
        out = CountMeanVarianceStats()
        out.count = self.count + other.count
        if out.count == 0:
            return out
        delta = other.mean - self.mean
        out.mean = (
            self.count * self.mean + other.count * other.mean
        ) / out.count
        out.m2 = (
            self.m2
            + other.m2
            + delta**2 * self.count * other.count / out.count
        )
        return out

    def get(self):
        var = (
            self.m2 / (self.count - 1)
            if self.count > 1
            else jnp.zeros_like(jnp.asarray(self.m2))
        )
        return {"count": self.count, "mean": self.mean, "variance": var}


class StatsOfDict(StreamingStats):
    """Per-key statistics of dict-valued samples (ref ``streaming.py:91``)."""

    def __init__(
        self,
        types: Dict[Hashable, Callable] = {},
        default: Callable = CountMeanVarianceStats,
    ):
        self.stats: Dict[Hashable, StreamingStats] = {
            k: t() for k, t in types.items()
        }
        self.default = default

    def update(self, sample: Dict) -> None:
        for k, v in sample.items():
            if k not in self.stats:
                self.stats[k] = self.default()
            self.stats[k].update(v)

    def merge(self, other):
        out = StatsOfDict(default=self.default)
        keys = set(self.stats) | set(other.stats)
        for k in keys:
            if k in self.stats and k in other.stats:
                out.stats[k] = self.stats[k].merge(other.stats[k])
            else:
                out.stats[k] = self.stats.get(k) or other.stats[k]
        return out

    def get(self):
        return {k: v.get() for k, v in self.stats.items()}


class StackStats(StreamingStats):
    """Stores all samples (ref ``streaming.py:StackStats``)."""

    def __init__(self):
        self.samples = []

    def update(self, sample) -> None:
        self.samples.append(sample)

    def merge(self, other):
        out = StackStats()
        out.samples = self.samples + other.samples
        return out

    def get(self):
        return {
            "count": len(self.samples),
            "samples": jnp.stack(self.samples) if self.samples else None,
        }

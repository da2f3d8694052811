"""Locality-sensitive hashing for nearest-neighbor gating
(ref ``pyro/contrib/tracking/hashing.py``)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LSH:
    """Ref ``hashing.py:LSH``: grid-cell hashing with ``radius`` scale;
    ``nearby(key)`` returns ids in adjacent cells."""

    def __init__(self, radius: float):
        assert radius > 0
        self._radius = radius
        self._hash_to_ids: Dict[Tuple, set] = defaultdict(set)
        self._id_to_hash: Dict = {}

    def _hash(self, point) -> Tuple:
        return tuple(
            np.floor(np.asarray(jax.device_get(point)) / self._radius)
            .astype(int)
            .tolist()
        )

    def add(self, point, id_) -> None:
        h = self._hash(point)
        if id_ in self._id_to_hash:
            self.remove(id_)
        self._hash_to_ids[h].add(id_)
        self._id_to_hash[id_] = h

    def remove(self, id_) -> None:
        h = self._id_to_hash.pop(id_, None)
        if h is not None:
            self._hash_to_ids[h].discard(id_)

    def nearby(self, point) -> set:
        import itertools

        h = self._hash(point)
        result = set()
        for offset in itertools.product([-1, 0, 1], repeat=len(h)):
            cell = tuple(a + b for a, b in zip(h, offset))
            result |= self._hash_to_ids.get(cell, set())
        return result


def merge_points(points, radius: float):
    """Greedily merge points within ``radius`` (ref
    ``hashing.py:merge_points``): returns (merged_points, groups)."""
    pts = np.asarray(jax.device_get(points))
    n = len(pts)
    lsh = LSH(radius)
    for i, p in enumerate(pts):
        lsh.add(p, i)
    assigned = {}
    groups: List[List[int]] = []
    for i in range(n):
        if i in assigned:
            continue
        group = [i]
        assigned[i] = len(groups)
        for j in sorted(lsh.nearby(pts[i])):
            if j not in assigned and np.linalg.norm(
                pts[j] - pts[i]
            ) <= radius:
                group.append(j)
                assigned[j] = len(groups)
        groups.append(group)
    merged = jnp.asarray(
        np.stack([pts[g].mean(0) for g in groups])
    )
    return merged, groups

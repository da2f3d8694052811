"""Profiling helpers (ref ``profiler/profiling_utils.py``): wall-time
benchmarking with device synchronization (block_until_ready replaces
torch.cuda.synchronize)."""

import time
from contextlib import contextmanager

import jax


def benchmark(fn, *args, repeat=5, warmup=2, **kwargs):
    """Time ``fn`` with compile excluded; returns (best_s, mean_s)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times), sum(times) / len(times)


@contextmanager
def timed(name):
    t0 = time.perf_counter()
    yield
    print(f"{name}: {time.perf_counter() - t0:.3f}s")


def print_table(rows, headers):
    widths = [
        max(len(str(r[i])) for r in rows + [headers])
        for i in range(len(headers))
    ]
    fmt = "  ".join("{:>%d}" % w for w in widths)
    print(fmt.format(*headers))
    for r in rows:
        print(fmt.format(*[str(x) for x in r]))

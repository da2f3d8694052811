"""Plate-aware einsum (ubersum) micro-benchmark
(ref ``examples/einsum.py``): times log-prob and gradient queries over
packed factors as plate sizes grow.  Each query is one fused XLA
contraction (the reference's marginal/MAP/sample modes are covered by
TraceEnum_ELBO.compute_marginals and infer_discrete).

Run: ``python examples/einsum.py --method logprob``
"""

from __future__ import annotations

import argparse
import timeit

import jax
import jax.numpy as jnp

from pyro_tpu.ops.contract import ubersum


def jit_logprob(equation, *operands, plates=""):
    return ubersum(equation, *operands, plates=plates)[0]


def jit_gradient(equation, *operands, plates=""):
    def total(ops):
        return jnp.sum(ubersum(equation, *ops, plates=plates)[0])

    return jax.grad(total)(list(operands))


def time_fn(fn, equation, *operands, iters=10, **kwargs):
    # the equation string is static: close over it, jit over the arrays
    compiled = jax.jit(lambda ops: fn(equation, *ops, **kwargs))
    ops = list(operands)
    jax.block_until_ready(compiled(ops))  # compile
    t0 = timeit.default_timer()
    for _ in range(iters):
        out = compiled(ops)
    jax.block_until_ready(out)
    return (timeit.default_timer() - t0) / iters


def main(args):
    methods = (
        ["logprob", "gradient"] if args.method == "all" else [args.method]
    )
    equation = args.equation
    plates = args.plates
    inputs, _ = equation.split("->")
    inputs = inputs.split(",")

    for method in methods:
        fn = {"logprob": jit_logprob, "gradient": jit_gradient}[method]
        print(f"Plate size  Time per iteration of {method} (ms)")
        for plate_size in range(8, 1 + args.max_plate_size, 8):
            operands = []
            for i, dims in enumerate(inputs):
                shape = tuple(
                    plate_size if d in plates else args.dim_size
                    for d in dims
                )
                operands.append(
                    jax.random.uniform(
                        jax.random.key(i), shape, minval=0.5, maxval=1.5
                    )
                )
            dt = time_fn(
                fn, equation, *operands, plates=plates, iters=args.iters
            )
            print(f"{plate_size: <11d} {dt * 1e3:0.4g}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="plate-aware einsum timing")
    parser.add_argument("-e", "--equation", default="a,abi,bcij,adj,deij->")
    parser.add_argument("-p", "--plates", default="ij")
    parser.add_argument("-d", "--dim-size", default=32, type=int)
    parser.add_argument("-s", "--max-plate-size", default=32, type=int)
    parser.add_argument("-n", "--iters", default=10, type=int)
    parser.add_argument(
        "-m", "--method", default="all", choices=["all", "logprob", "gradient"]
    )
    main(parser.parse_args())

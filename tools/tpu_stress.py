#!/usr/bin/env python
"""Device memory/compute stress tool (capability of reference ``train.py:19-66``,
which despite its name is a GPU VRAM-allocation/matmul-spin utility).

Allocates a target amount of device memory and spins bf16 matmuls on it.

  python tools/tpu_stress.py --gb 4 --seconds 30
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--gb", type=float, default=1.0, help="device memory to hold")
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--size", type=int, default=4096, help="matmul dimension")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    n_chunks = max(1, int(args.gb * 2**30 / (args.size * args.size * 2)))
    buffers = [
        jax.device_put(jnp.full((args.size, args.size), float(i), jnp.bfloat16))
        for i in range(n_chunks)
    ]
    print(f"holding {n_chunks} x {args.size}^2 bf16 = {n_chunks*args.size*args.size*2/2**30:.2f} GiB")

    spin = jax.jit(lambda a, b: a @ b)
    t_end = time.time() + args.seconds
    steps = 0
    acc = buffers[0]
    while time.time() < t_end:
        acc = spin(acc, buffers[steps % n_chunks])
        steps += 1
        if steps % 100 == 0:
            float(acc[0, 0])  # force + keep values bounded via fresh start
            acc = buffers[0]
    float(acc[0, 0])
    print(f"spun {steps} matmuls of {args.size}^3")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

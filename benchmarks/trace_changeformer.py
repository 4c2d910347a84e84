"""Capture a jax.profiler trace of the ChangeFormerV6 train step (real
TPU) for benchmarks/parse_trace.py.

Usage: python benchmarks/trace_changeformer.py [outdir]   (5 steps traced)
"""

import os
import sys

import jax

from cfv6_common import build_step

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cfv6_trace"
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "256"))


def main():
    step, (params, bs, opt_state, a, b, label) = build_step(BATCH, SIZE)
    params, bs, opt_state, loss = step(params, bs, opt_state, a, b, label,
                                       jax.random.PRNGKey(3))
    print("warmup loss:", float(loss), flush=True)

    with jax.profiler.trace(OUT):
        for i in range(5):
            params, bs, opt_state, loss = step(params, bs, opt_state, a, b,
                                               label, jax.random.PRNGKey(10 + i))
        float(loss)
    print("trace written to", OUT)


if __name__ == "__main__":
    main()

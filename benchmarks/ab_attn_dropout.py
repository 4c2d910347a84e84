"""A/B: ChangeFormerV6 TRAIN step with attention dropout — fused Pallas
SRA kernel (in-kernel hash-mask dropout, ops/attention.py) vs the einsum
fallback that materializes the (N, M) attention matrix + mask.

This is the VERDICT r2 item 4 close-out: V6's real training config
(attn_drop=0.1, ref models/ChangeFormer.py:1682) previously fell back to
the materialized path; with the stateless-hash in-kernel dropout both
paths produce the SAME masks, so this measures pure kernel throughput at
identical math.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
      benchmarks/ab_attn_dropout.py [batch] [size] > /tmp/ab_attn.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import stcd_tpu.ops.attention as attn_mod
from stcd_tpu.data.augment import eval_preprocess
from stcd_tpu.losses.functional import cross_entropy
from stcd_tpu.models.changeformer import ChangeFormerV6

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ITERS = 8


def main():
    print(f"devices: {jax.devices()} bs={BATCH} size={SIZE}", flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 2, (BATCH, SIZE, SIZE, 1)), jnp.int32)

    model = ChangeFormerV6(embed_dim=256, dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           a[:2], b[:2], True)

    orig = attn_mod.cross_attention

    def run_variant(tag, force_pallas):
        attn_mod.cross_attention = functools.partial(
            orig, use_pallas=force_pallas)
        try:
            def loss_fn(p, xa, xb, key):
                out, _ = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    eval_preprocess(xa), eval_preprocess(xb), True,
                    mutable=["batch_stats"], rngs={"dropout": key})
                return sum(cross_entropy(o, label) for o in out
                           if o.shape[1] == SIZE)

            vg = jax.value_and_grad(loss_fn)

            @jax.jit
            def chain(p, xa, xb):
                def body(c, i):
                    loss, grads = vg(p, xa + c, xb,
                                     jax.random.fold_in(
                                         jax.random.PRNGKey(7), i))
                    gnorm = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                                for g in jax.tree_util.tree_leaves(grads))
                    # 1e-30 (not *0): a zero multiplier would let XLA
                    # dead-code-eliminate the entire backward pass
                    return (loss.astype(jnp.float32) * 1e-30
                            + gnorm * 1e-30), ()
                c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jnp.arange(ITERS))
                return c

            float(chain(variables["params"], a, b))  # compile + sync
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(variables["params"], a, b))
                best = min(best, time.perf_counter() - t0)
            dt = best / ITERS
            print(f"{tag}: {dt * 1e3:.1f} ms/train-step, "
                  f"{BATCH / dt:.1f} pairs/s", flush=True)
            return dt
        finally:
            attn_mod.cross_attention = orig

    t_pallas = run_variant("pallas fused dropout", True)
    t_einsum = run_variant("einsum + mask       ", False)
    print(f"fused speedup: {t_einsum / t_pallas:.2f}x", flush=True)


if __name__ == "__main__":
    main()

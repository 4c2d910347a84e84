"""Shared ChangeFormerV6 bf16 train-step builder.

One definition of the model/inputs/jitted step for every CFv6 harness
(bench.py bench_changeformer, profile_changeformer.py,
trace_changeformer.py — review finding: the step was copy-pasted four
times and the copies had started to drift).
"""

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.losses.functional import cross_entropy
from stcd_tpu.models.changeformer import ChangeFormerV6


def build_step(batch: int, size: int):
    """Returns (step, carry): `step(*carry, rng) -> new carry + loss`,
    carry = (params, batch_stats, opt_state, a, b, label)."""
    model = ChangeFormerV6(embed_dim=256, dtype=jnp.bfloat16)
    a = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2),
                                (batch, size, size)) > 0.8).astype(jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), a[:1], b[:1])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, a, b, label, rng):
        def loss_fn(p):
            preds, mut = model.apply({"params": p, "batch_stats": batch_stats},
                                     a, b, True, mutable=["batch_stats"],
                                     rngs={"dropout": rng})
            return sum(cross_entropy(pr, label) for pr in preds), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), mut["batch_stats"], \
            opt_state2, loss

    carry = (variables["params"], variables.get("batch_stats", {}),
             opt_state, a, b, label)
    return step, carry

"""TrainState with BatchNorm statistics.

Full-resume semantics follow the vestigial CDTrainer's checkpoint dict
(ref models/trainer.py:178-186: model + optimizer + scheduler + epoch +
best metric), which SURVEY.md §5 designates as the scheme to implement.
"""

from __future__ import annotations

from typing import Any, Optional

import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None

    @classmethod
    def create_with_stats(cls, *, apply_fn, params, batch_stats, tx):
        opt_state = tx.init(params)
        return cls(step=0, apply_fn=apply_fn, params=params,
                   batch_stats=batch_stats, tx=tx, opt_state=opt_state)


def create_train_state(model, rng, example_inputs, tx,
                       train_kwargs: Optional[dict] = None,
                       encoder_weights: Optional[str] = None) -> TrainState:
    """Initialize params/batch_stats and wrap into a TrainState.

    ``encoder_weights`` (or, when None, the model's own ``encoder_weights``
    field set via ``create_model``) grafts converted ImageNet weights onto
    the fresh state — the reference's universal starting point
    (ref train_sup.py:303). Resolution failures raise; never silent."""
    variables = model.init(rng, *example_inputs, **(train_kwargs or {}))
    state = TrainState.create_with_stats(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    weights = encoder_weights or getattr(model, "encoder_weights", None)
    if weights is not None:
        from stcd_tpu.convert.pretrained import apply_pretrained_to_state
        state = apply_pretrained_to_state(
            state, weights, encoder_name=getattr(model, "encoder_name", None))
    return state


def adam_poly(base_lr: float = 1e-3, num_epochs: int = 60,
              iters_per_epoch: int = 100, power: float = 0.9,
              b1: float = 0.9, b2: float = 0.999) -> optax.GradientTransformation:
    """The reference's optimizer config: Adam(lr=1e-3, betas=(0.9, 0.999))
    (train_sup.py:307) + per-iteration Poly(0.9) decay (train_sup.py:117)."""
    from stcd_tpu.train.schedules import poly_schedule
    return optax.adam(poly_schedule(base_lr, num_epochs, iters_per_epoch, power),
                      b1=b1, b2=b2)

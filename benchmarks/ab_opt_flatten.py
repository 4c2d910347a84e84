"""A/B: SegCD(resnet50) bs=64 train step with per-leaf Adam (a fused
update kernel per parameter tensor — fixed overhead x ~320 leaves) vs
optax.flatten(adam) (one update over a single concatenated vector).
Measured 1.00x on chip (docs/DESIGN.md); kept as the harness exemplar.
"""

import optax

from segcd_ab import ab, run_variant

if __name__ == "__main__":
    ab("opt_flatten",
       lambda: run_variant({"flatten": False}),
       lambda: run_variant({"flatten": True}, tx_wrap=optax.flatten))

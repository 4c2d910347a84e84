"""A/B: SegCD(resnet50) bs=64 256x256 bf16 train step with the fused
Pallas augmentation kernel (stcd_tpu.ops.augment_kernel) vs the jnp
scan/switch ColorJitter chain. Prints one JSON line per variant.

Run on the real chip:  nohup python benchmarks/ab_aug_pallas.py \
    > /tmp/ab_aug.log 2>&1 &
"""

from segcd_ab import ab, run_variant

from stcd_tpu.data import augment


def _variant(mode, flag):
    augment.set_pallas_augment(mode)
    try:
        return run_variant({"pallas_aug": flag})
    finally:
        augment.set_pallas_augment("auto")


if __name__ == "__main__":
    ab("pallas_aug",
       lambda: _variant("off", False),
       lambda: _variant("on", True))

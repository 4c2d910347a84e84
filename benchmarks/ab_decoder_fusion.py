"""A/B: SegCD(resnet50) bs=64 256x256 bf16 train step with the fused
decoder rewrite (dconv split kernel) vs the materialized
upsample+concat path. Prints one JSON line per variant.

Run on the real chip:  nohup python benchmarks/ab_decoder_fusion.py \
    > /tmp/ab_fusion.log 2>&1 &
"""

from segcd_ab import ab, run_variant

if __name__ == "__main__":
    ab("decoder_fusion",
       lambda: run_variant({"fused": False}, {"decoder_fused": False}),
       lambda: run_variant({"fused": True}, {"decoder_fused": True}))

"""Corrected (zero-free) MFU for the SegCD headline train step.

VERDICT r4 weak #5 / item 8: the recorded 38.3% MFU divides XLA's FLOP
count by step time, but XLA counts the fused decoder's lhs-dilated
(transposed-style) convs at the dense dilated-grid size — every tap that
lands on an INSERTED ZERO row/column is counted as a MAC that the
hardware demonstrably does not pay for (the 4-phase decomposition with
4x fewer counted MACs measured SLOWER, and the hot dilated convs run at
94-97% of their dense-equivalent bound — docs/DESIGN.md "Decoder
fusion"). This script computes the honest numerator:

- lower the EXACT bench.py train step (SegCD resnet50, bf16, fused
  decoder, Pallas-off jnp augmentation path is irrelevant here: the
  conv inventory is the numerator) and parse the StableHLO convolution
  inventory — backend-independent, fwd + bwd + optimizer all included;
- per conv: counted MACs (XLA semantics: every kernel tap at every
  output position) vs zero-free MACs (taps that hit a REAL input
  element: for lhs_dilation L, exactly ceil(k/L) of the k taps per dim);
- report both FLOP totals and the MFU each implies at the measured
  step time.

Run: python benchmarks/mfu_corrected.py [--ms 108.8] [--batch 64]
(the default --ms is the round-2 chip-trace-validated step time for
bs=64 256^2 with fused decoder + Pallas augmentation).
"""

import argparse
import math
import re

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

V5E_BF16_PEAK = 197e12  # TFLOP/s, the peak all prior MFU figures used

CONV_RE = re.compile(
    r"stablehlo\.convolution\(([^)]*)\)\s*dim_numbers\s*=\s*"
    r"\[([^\]]*)\]x\[([^\]]*)\]->\[([^\]]*)\],\s*window\s*=\s*\{([^}]*)\}"
    r".*?:\s*\(tensor<([^>]*)>,\s*tensor<([^>]*)>\)\s*->\s*"
    r"tensor<([^>]*)>")


def _dims(t):
    return [int(x) for x in t.split("x")[:-1]]


def _window_list(window, key):
    m = re.search(key + r"\s*=\s*\[([^\]]*)\]", window)
    if not m:
        return None
    return [int(v) for v in re.findall(r"-?\d+", m.group(1))]


def conv_inventory(text):
    """Yield dicts describing every stablehlo.convolution in the module."""
    for m in CONV_RE.finditer(text):
        _, lhs_dn, rhs_dn, out_dn, window, lhs_t, rhs_t, out_t = m.groups()
        rhs_dims = _dims(rhs_t)
        out_dims = _dims(out_t)
        rhs_spec = [s.strip() for s in rhs_dn.split(",")]
        out_spec = [s.strip() for s in out_dn.split(",")]
        kspatial = [rhs_dims[i] for i, s in enumerate(rhs_spec)
                    if s not in ("i", "o")]
        cin = rhs_dims[rhs_spec.index("i")]
        cout = rhs_dims[rhs_spec.index("o")]
        out_spatial = [out_dims[i] for i, s in enumerate(out_spec)
                       if s not in ("b", "f")]
        batch = out_dims[out_spec.index("b")]
        ldil = _window_list(window, "lhs_dilate") or [1] * len(kspatial)
        fg = re.search(r"feature_group_count\s*=\s*(\d+)", m.group(0))
        fg = int(fg.group(1)) if fg else 1
        counted = batch * cout * cin * math.prod(out_spatial) \
            * math.prod(kspatial)
        # exact average over output positions: each real input element
        # is touched by k outputs per dim while the dilated grid has L
        # positions per real one -> real-tap fraction is 1/L per dim,
        # independent of k (covers k < L: a 1x1 kernel over an L=2
        # dilated input does real work at only 1/4 of its taps)
        zero_free = counted / math.prod(max(l, 1) for l in ldil)
        yield {
            "kernel": "x".join(map(str, kspatial)),
            "lhs_dilate": ldil,
            "cin": cin, "cout": cout, "groups": fg,
            "out": out_spatial, "batch": batch,
            "macs_counted": counted,
            "macs_zero_free": zero_free,
        }


def build_lowered(batch, size):
    from stcd_tpu.models import SegCD
    from stcd_tpu.train.schedules import poly_schedule
    from stcd_tpu.train.state import create_train_state
    from stcd_tpu.train.steps import make_cd_steps

    model = SegCD(encoder_name="resnet50", classes=1,
                  decoder_channels=(256, 128, 64, 32, 16),
                  dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    a = jnp.zeros((batch, size, size, 3), jnp.float32)
    label = jnp.zeros((batch, size, size, 1), jnp.float32)
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    state = create_train_state(model, key, (a, a), tx)
    train_step, _ = make_cd_steps(model, augment=True)
    return train_step.lower(state, {"A": a, "B": a, "label": label},
                            jax.random.PRNGKey(3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", type=float, default=108.8,
                    help="measured chip step time (ms)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    lowered = build_lowered(args.batch, args.size)
    convs = list(conv_inventory(lowered.as_text()))
    assert convs, "no convolutions parsed from the StableHLO"

    counted = sum(c["macs_counted"] for c in convs)
    zero_free = sum(c["macs_zero_free"] for c in convs)
    dilated = [c for c in convs if any(l > 1 for l in c["lhs_dilate"])]

    print(f"convolutions: {len(convs)} "
          f"({len(dilated)} lhs-dilated)")
    agg = {}
    for c in convs:
        key = (c["kernel"], tuple(c["lhs_dilate"]))
        e = agg.setdefault(key, [0, 0, 0])
        e[0] += 1
        e[1] += c["macs_counted"]
        e[2] += c["macs_zero_free"]
    for (kern, ldil), (n, mc, mz) in sorted(agg.items(),
                                            key=lambda kv: -kv[1][1]):
        tag = f" lhs_dilate={list(ldil)}" if any(l > 1 for l in ldil) \
            else ""
        print(f"  k{kern}{tag}: n={n} counted {2 * mc / 1e12:.3f} "
              f"TFLOP zero-free {2 * mz / 1e12:.3f} TFLOP")

    t = args.ms / 1e3
    f_counted, f_zero = 2 * counted, 2 * zero_free
    print(f"\nconv FLOPs counted:   {f_counted / 1e12:.3f} TFLOP "
          f"-> {f_counted / t / V5E_BF16_PEAK * 100:.1f}% MFU "
          f"at {args.ms} ms")
    print(f"conv FLOPs zero-free: {f_zero / 1e12:.3f} TFLOP "
          f"-> {f_zero / t / V5E_BF16_PEAK * 100:.1f}% MFU "
          f"at {args.ms} ms")
    print(f"structural-zero share of counted conv FLOPs: "
          f"{(1 - f_zero / f_counted) * 100:.1f}%")


if __name__ == "__main__":
    main()

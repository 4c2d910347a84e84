"""Convergence regression check on the real chip: SegCD(resnet18) on the
synthetic CD task must reach val F1 > 0.7 in 25 epochs in fp32 AND bf16,
with train-mode and eval-mode metrics in agreement (healthy BN running
statistics). Run: python benchmarks/convergence_segcd.py (~15 min)."""
import numpy as np
import jax, jax.numpy as jnp
import stcd_tpu
from stcd_tpu.data import DataLoader, SyntheticCDDataset
from stcd_tpu.train.state import create_train_state, adam_poly
from stcd_tpu.train.steps import make_cd_steps
from stcd_tpu.train.loops import run_training, evaluate
from stcd_tpu.metrics import SegmentationMetric
from stcd_tpu.metrics.confusion import confusion_matrix
from stcd_tpu.data.augment import eval_preprocess

for dtype, tag in ((None, "fp32"), (jnp.bfloat16, "bf16")):
    model = stcd_tpu.SegCD(encoder_name="resnet18", classes=1,
                           decoder_channels=(64, 32, 24, 16, 8), dtype=dtype)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((8, 64, 64, 3)),) * 2,
                               adam_poly(1e-3, 25, 16))
    ts, es = make_cd_steps(model, augment=False)
    train_ds = SyntheticCDDataset(length=128, size=64)
    val_ds = SyntheticCDDataset(length=32, size=64, seed=9)
    state, best, hist = run_training(ts, es, state,
                                     DataLoader(train_ds, 8, shuffle=True),
                                     DataLoader(val_ds, 8),
                                     n_epochs=25, save_dir=f"/tmp/c4_{tag}",
                                     rng=jax.random.PRNGKey(1))
    f1s = [round(h["val"]["F1"], 3) for h in hist]
    print(f"{tag}: val F1 every5 {f1s[::5]} final {f1s[-1]}", flush=True)

    # train-mode (batch-stats) evaluation of the same weights on the val set
    metric = SegmentationMetric(2)
    for batch in DataLoader(val_ds, 8, prefetch=0):
        batch.pop("name", None)
        a = eval_preprocess(jnp.asarray(batch["A"]))
        b = eval_preprocess(jnp.asarray(batch["B"]))
        (s1, s2, diff), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            a, b, True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        probs = jax.nn.sigmoid(diff.astype(jnp.float32))
        cm = confusion_matrix((probs > 0.5).astype(jnp.int32),
                              jnp.asarray(batch["label"]).astype(jnp.int32), 2)
        metric.confusionMatrix += np.asarray(cm, np.float64)
    print(f"{tag}: TRAIN-MODE val F1 {float(metric.F1score()[1]):.3f}", flush=True)

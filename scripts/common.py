"""Shared CLI plumbing for the three stage scripts.

Flag surface mirrors the reference argparse (train_sup.py:24-36 et al.)
with the reference's hardcoded source-booleans (load_model / select_data /
generate_label, ref train_stcd.py:70,96,137) promoted to real flags, plus
TPU-specific knobs (dtype, mesh shape).
"""

from __future__ import annotations

import argparse
import os

import jax

# This environment may force-register a TPU platform via sitecustomize
# (JAX_PLATFORMS is overridden programmatically); honor an explicit CPU
# request before any backend is initialized.
if os.environ.get("STCD_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
    if os.environ.get("STCD_CPU_DEVICES"):
        # virtual CPU devices for multi-device CLI runs without hardware
        # (env XLA_FLAGS is overridden here; set programmatically)
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ["STCD_CPU_DEVICES"]))

# persistent compile cache (first compile of a config is slow; reuse it)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/stcd_jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def base_parser(dataset_default: str, save_default: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--epoch", type=int, default=0, help="epoch to start training from")
    p.add_argument("--n_epochs", type=int, default=60, help="number of epochs of training")
    p.add_argument("--root_path", type=str, default="data/", help="root path")
    p.add_argument("--dataset_name", type=str, default=dataset_default)
    p.add_argument("--CDdataset_name", type=str, default=dataset_default)
    p.add_argument("--save_name", type=str, default=save_default, help="experiments name")
    p.add_argument("--batch_size", type=int, default=4, help="size of the batches")
    p.add_argument("--n_cpu", type=int, default=4, help="host io threads")
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=256)
    p.add_argument("--load_path", type=str, default="resume/", help="load path")
    # promoted gated booleans (hardcoded in the reference source)
    p.add_argument("--load_model", action="store_true", help="resume weights from --load_path")
    p.add_argument("--select_data", action="store_true", help="reliability ranking -> list files")
    p.add_argument("--generate_label", action="store_true", help="write pseudo labels")
    p.add_argument("--vis_feature", action="store_true",
                   help="JET-colorized probability maps during --generate_label "
                        "(ref train_stcd.py:157-164 vis_feature block)")
    p.add_argument("--vis_dir", type=str, default=None,
                   help="output dir for --vis_feature (default: <dataset>/train/val_pred_temp)")
    # promoted hardcoded hyperparameters (reference defaults preserved)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--encoder", type=str, default="resnet50")
    p.add_argument("--encoder_weights", type=str, default=None,
                   help="converted imagenet weights: a msgpack path, or "
                        "'imagenet' to resolve {encoder}.msgpack under "
                        "$STCD_PRETRAINED_DIR (missing weights raise; "
                        "ref always trains from imagenet, train_sup.py:303)")
    p.add_argument("--decoder_channels", type=str, default="256,128,64,32,16",
                   help="comma-separated unet decoder widths")
    # TPU knobs
    p.add_argument("--float_transfer", action="store_true",
                   help="ship float32 images host->device instead of the "
                        "default uint8 mode (uint8 moves 4x less data; the "
                        "1/255 scale + normalization run on device)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations (bigger batches per HBM)")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches per step "
                        "(batch_size must divide)")
    p.add_argument("--resume", action="store_true",
                   help="full resume (params + optimizer + epoch + best) "
                        "from <save_name>/last_ckpt — the artifact every "
                        "epoch and a SIGTERM preemption write; unlike "
                        "--load_model (weights-only, reference parity) this "
                        "continues the interrupted run exactly")
    p.add_argument("--no_preempt", action="store_true",
                   help="do not install the SIGTERM handler that saves a "
                        "full resume point before exiting")
    p.add_argument("--data_axis", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--space_axis", type=int, default=1,
                   help="spatial-partitioning mesh size: shard image rows "
                        "over this many devices (GSPMD halo exchange) for "
                        "large resolutions where the per-device batch would "
                        "drop below one image; data_axis x space_axis "
                        "devices are used. Forces the jnp augmentation path "
                        "(the fused Pallas kernel is batch-partitioned only)")
    p.add_argument("--model_axis", type=int, default=1,
                   help="tensor-parallel mesh size: shard wide conv kernels "
                        "and transformer attention/MLP Dense kernels over "
                        "this many devices (Megatron column/row layout, "
                        "parallel/mesh.py param_sharding); a memory lever — "
                        "prefer pure DP until HBM forces sharding "
                        "(docs/SCALING.md)")
    return p


def resume_and_guard(args, state):
    """Shared wiring for preemption-safe runs: optionally restore the full
    last_ckpt resume point (--resume) and install the SIGTERM guard
    (default on; --no_preempt opts out). Returns (state, kwargs) where
    kwargs feed straight into run_training."""
    kwargs = {}
    if getattr(args, "resume", False):
        from stcd_tpu.train.checkpoint import CheckpointManager
        restored = CheckpointManager(args.save_name).restore_last(state)
        if restored is None:
            print(f"--resume: no last_ckpt under {args.save_name}; "
                  "starting fresh")
        else:
            state, epoch_id, best, best_epoch = restored
            kwargs.update(start_epoch=epoch_id + 1, best=best,
                          best_epoch=best_epoch)
            print(f"resumed full state from {args.save_name}/last_ckpt "
                  f"(epoch {epoch_id}, best {best:.4f} @ {best_epoch})")
    if not getattr(args, "no_preempt", False):
        from stcd_tpu.train.preemption import PreemptionGuard
        kwargs["preemption"] = PreemptionGuard()
    return state, kwargs


def configure_host_transfer(args) -> None:
    """Default the uint8 H2D transfer mode (4x less PCIe/tunnel traffic,
    +62% end-to-end on tunnel hosts — BASELINE.md realloop numbers);
    --float_transfer opts back into float32 host arrays."""
    from stcd_tpu.data.io import set_uint8_transfer
    set_uint8_transfer(not getattr(args, "float_transfer", False))


def make_mesh(args):
    from stcd_tpu.parallel.mesh import batch_sharding, create_mesh
    space = getattr(args, "space_axis", 1) or 1
    model = getattr(args, "model_axis", 1) or 1
    composed_sp = space > 1 and model > 1
    if space > 1 and not composed_sp:
        # GSPMD-automatic spatial path: the fused Pallas augmentation
        # kernel partitions over batch only; under a spatial sharding
        # GSPMD would all-gather H around it, so these runs use the
        # (sharding-transparent) jnp augmentation path. The MANUAL
        # composed path keeps Pallas aug: its augmentation happens
        # outside the shard_map on data-sharded full-row batches.
        from stcd_tpu.data.augment import set_pallas_augment
        set_pallas_augment("off")
        enc = getattr(args, "encoder", "") or ""
        if enc and not enc.startswith(("resnet", "resnext")):
            # the >= 2-rows-per-shard spatial pins that guard the GSPMD
            # wrong-gradient miscompile (docs/SCALING.md, round 4) are
            # implemented stage-by-stage in the resnet family only; other
            # families train correctly above the floor but are unpinned
            # at sub-floor map sizes
            print(f"warning: --space_axis {space} with encoder {enc!r}: "
                  "spatial-partition gradient pins are validated for the "
                  "resnet/resnext families; keep feature maps >= "
                  f"{2 * space} rows (input >= {64 * space} px) or use a "
                  "resnet encoder (docs/SCALING.md)", flush=True)
    n_dev = len(jax.devices())
    if space * model > n_dev:
        raise SystemExit(
            f"--space_axis {space} x --model_axis {model} exceeds the "
            f"{n_dev} available device(s)")
    data = args.data_axis or n_dev // (space * model)
    n = data * space * model
    if n > n_dev:
        raise SystemExit(
            f"--data_axis {data} x --model_axis {model} x --space_axis "
            f"{space} = {n} devices > {n_dev} available")
    mesh = create_mesh(data=data, model=model, space=space,
                       devices=jax.devices()[:n])
    # register the run's mesh: space>1 pins the canonical P('data','space')
    # activation layout inside the models (mesh.constrain_spatial; VERDICT
    # r2 item 3); model>1 routes ops/attention off the un-partitionable
    # Pallas kernel (ADVICE r3)
    from stcd_tpu.parallel.mesh import set_active_mesh
    set_active_mesh(mesh)
    if composed_sp:
        # composed DP x TP x SP: the 'space' axis runs as a MANUAL
        # shard_map axis (parallel/spatial.py halo exchange — the GSPMD
        # automatic path miscompiles this geometry, tools/gspmd_repro.py).
        # Loaders feed data-sharded full-row batches; the spatial step
        # builders re-shard H inside their shard_map.
        print(f"mesh {data}x{model}x{space} (data x model x space): "
              "'space' via manual shard_map halo exchange "
              "(docs/SCALING.md 'Manual shard_map spatial partitioning')",
              flush=True)
        return mesh, batch_sharding(mesh, spatial=False)
    return mesh, batch_sharding(mesh, spatial=space > 1)


def uses_manual_spatial(mesh) -> bool:
    """True when the run's mesh routes 'space' through the manual
    shard_map implementation (composed space x model geometry)."""
    s = dict(mesh.shape)
    return s.get("space", 1) > 1 and (s.get("model", 1) > 1
                                      or s.get("stage", 1) > 1)


def pick_steps(mesh, model, make_gspmd_steps, make_spatial_steps, args):
    """Choose the step pair for the run's mesh: the manual spatial
    builders on composed meshes, the standard jit builders otherwise.
    The spatial builders take no remat/accum knobs — warn if set."""
    if not uses_manual_spatial(mesh):
        return make_gspmd_steps()
    if getattr(args, "remat", False) or getattr(args, "accum_steps", 1) > 1:
        print("warning: --remat/--accum_steps are not supported by the "
              "manual spatial step builders; ignored", flush=True)
    return make_spatial_steps()


def place_state(mesh, state):
    """CLI wrapper over the canonical mesh placement; called AFTER
    resume_and_guard so restored checkpoints get re-placed too."""
    from stcd_tpu.parallel.mesh import place_train_state
    return place_train_state(mesh, state)

#!/usr/bin/env python
"""Standalone repro of the GSPMD spatial-partitioning miscompiles.

Self-contained (jax + numpy only, no project imports) so it can be
attached to an upstream issue verbatim. Round-4 of this project found
that the GSPMD partitioner — classic AND shardy — miscompiles
spatially-sharded convolutions (NHWC activations sharded along H over a
'space' mesh axis) in three ways whenever the mesh carries a size>1
third axis next to 'data' x 'space', plus one sub-floor case on the
plain 2-axis mesh:

  A. a conv whose kernel operand is an in-graph SLICE of a wider array
     computes wrong VALUES (sharding propagation assigns the derived
     kernel a free-axis sharding);
  B. a conv whose kernel is explicitly out-channel-sharded over the
     free axis computes wrong VALUES against a spatially-sharded input;
  C. with every operand replicated/pinned, the kernel-GRADIENT of a
     wide-channel spatially-sharded conv is wrong (loss stays exact —
     silent training corruption);
  D. (2-axis data x space mesh, no third axis) below 2 rows per space
     shard, the kernel-gradient through a strided residual stage
     followed by a halo conv is wrong.

Affected: jax/jaxlib 0.9.0 (the version pinned in this environment; see
the version banner this script prints). Measured on that version, both
partitioners (jax_use_shardy_partitioner True/False):

  - C reproduces under BOTH partitioners (grad error ~3e1, loss exact);
  - A and D reproduce under SHARDY (jax 0.9's default) — A error ~1e2,
    D grad errors ~3e1..8e1 at 1-row shards with the H=32 control
    exact; the classic partitioner handles these two minimal forms;
  - B's minimal form here does NOT reproduce on 0.9.0 under either
    partitioner (the in-repo param_sharding conv suppression was
    motivated by the round-4 full-model observation; treat B as
    covered by C's geometry).

Each section prints the f64 max|expected - got| — ~1e1..1e2 when the
hazard reproduces, ~1e-5 when a fixed stack no longer reproduces it.
Exit code 0 either way: the script is diagnostic, the numbers are the
report.

Re-check procedure on a jax upgrade: run this script; if every section
prints OK, the guards in stcd_tpu/parallel/mesh.py (batch_sharding's
spatial rejection, param_sharding's conv suppression, the >=2-rows
floor) can be lifted — see docs/SCALING.md 'TP x SP composition'.

Project-side minimal repros (same math, pytest form):
tests/test_parallel.py::test_gspmd_conv_kernel_slice_hazard,
::test_gspmd_free_axis_kernel_grad_hazard,
::test_spatial_backward_tiny_maps.
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

DN = ("NHWC", "HWIO", "NHWC")


def conv(a, k, pad=1):
    return jax.lax.conv_general_dilated(
        a, k, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=DN)


def report(name, expected, got, threshold=1e-4):
    err = float(np.abs(np.asarray(expected, np.float64)
                       - np.asarray(got, np.float64)).max())
    status = "HAZARD REPRODUCES" if err > threshold else "OK (fixed)"
    print(f"  {name}: max|expected-got| = {err:.3e}  -> {status}")
    return err


def hazard_a_sliced_kernel_values(mesh3):
    """Sliced-kernel conv: wrong VALUES on the 3-axis mesh."""
    skip = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 2, 64))
    kw = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 192, 16))
    f = jax.jit(lambda a, k: conv(a, k[:, :, 128:, :]))
    expected = f(skip, kw)
    got = f(jax.device_put(skip, NamedSharding(mesh3, P("data", "space"))),
            jax.device_put(kw, NamedSharding(mesh3, P())))
    return report("A sliced-kernel conv values", expected, got)


def hazard_b_sharded_kernel_values(mesh3):
    """Out-channel-sharded kernel x spatially-sharded input: values."""
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64))
    f = jax.jit(conv)
    expected = f(x, k)
    got = f(jax.device_put(x, NamedSharding(mesh3, P("data", "space"))),
            jax.device_put(k, NamedSharding(mesh3,
                                            P(None, None, None, "model"))))
    return report("B model-sharded-kernel conv values", expected, got)


def hazard_c_free_axis_kernel_grads(mesh3):
    """Replicated kernel, spatially-sharded input, idle third axis:
    the conv KERNEL GRADIENT is wrong while the loss is exact."""
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64))

    def loss(kk, xx):
        return jnp.sum(jnp.sin(conv(xx, kk)))

    expected_l, expected_g = jax.jit(jax.value_and_grad(loss))(k, x)
    got_l, got_g = jax.jit(jax.value_and_grad(loss))(
        jax.device_put(k, NamedSharding(mesh3, P())),
        jax.device_put(x, NamedSharding(mesh3, P("data", "space"))))
    report("C loss (stays exact - the trap)", expected_l, got_l)
    return report("C conv kernel gradient", expected_g, got_g)


def _batchnorm(x):
    m = jnp.mean(x, (0, 1, 2))
    v = jnp.mean(jnp.square(x), (0, 1, 2)) - jnp.square(m)
    return (x - m) * jax.lax.rsqrt(jnp.maximum(v, 0.0) + 1e-5)


def hazard_d_subfloor_strided_grads():
    """2-axis data x space mesh, 1 row per space shard: kernel grads
    through a resnet-style stem (7x7/s2 conv + BN + 3x3/s2 maxpool)
    followed by a strided residual BasicBlock are wrong — but ONLY when
    the deepest maps fall below 2 rows per shard (a simplified diamond
    without the stem chain does NOT reproduce; this full chain does).
    H=32 (all maps >= 2 rows/shard) is the exact control the >=2-rows
    floor guard is built on."""
    mesh2 = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "space"))
    k7 = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64)) * 0.1
    kb1 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 64, 128)) * 0.1
    kb2 = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 128)) * 0.1
    kbd = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 64, 128)) * 0.1
    ks = (k7, kb1, kb2, kbd)

    def loss(kss, xx):
        ka, kb, kc, kd = kss
        h = jax.lax.conv_general_dilated(
            xx, ka, (2, 2), ((3, 3), (3, 3)), dimension_numbers=DN)
        h = jax.nn.relu(_batchnorm(h))
        h = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            h, kb, (2, 2), ((1, 1), (1, 1)), dimension_numbers=DN)
        y = jax.nn.relu(_batchnorm(y))
        y = jax.lax.conv_general_dilated(
            y, kc, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN)
        idn = jax.lax.conv_general_dilated(
            h, kd, (2, 2), ((0, 0), (0, 0)), dimension_numbers=DN)
        out = jax.nn.relu(_batchnorm(y) + _batchnorm(idn))
        return jnp.sum(jnp.sin(out))

    worst = 0.0
    for H, label in ((16, "H=16 (1-row shards) "), (32, "H=32 control ")):
        x = jax.random.normal(jax.random.PRNGKey(0), (16, H, H, 3))
        expected_l, expected_g = jax.jit(jax.value_and_grad(loss))(ks, x)
        got_l, got_g = jax.jit(jax.value_and_grad(loss))(
            jax.device_put(ks, NamedSharding(mesh2, P())),
            jax.device_put(x, NamedSharding(mesh2, P("data", "space"))))
        report(f"D {label}loss", expected_l, got_l, threshold=1e-2)
        errs = [report(f"D {label}kernel grad [{i}]", e, g, threshold=1e-2)
                for i, (e, g) in enumerate(zip(expected_g, got_g))]
        if H == 16:
            worst = max(errs)
    return worst


def main():
    print(f"jax {jax.__version__}, "
          f"jaxlib {jax.lib.__version__}, "  # type: ignore[attr-defined]
          f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")
    for shardy in (False, True):
        jax.config.update("jax_use_shardy_partitioner", shardy)
        jax.clear_caches()
        print(f"\npartitioner: {'shardy' if shardy else 'classic'}")
        mesh3 = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                     ("data", "model", "space"))
        hazard_a_sliced_kernel_values(mesh3)
        hazard_b_sharded_kernel_values(mesh3)
        hazard_c_free_axis_kernel_grads(mesh3)
        hazard_d_subfloor_strided_grads()


if __name__ == "__main__":
    main()

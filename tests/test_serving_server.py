"""Micro-batching inference server (stcd_tpu/serving/server.py +
scripts/serve.py): cross-request tile batching, fixed-shape padding,
stitching, HTTP endpoints, and the CLI end-to-end."""

import base64
import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from stcd_tpu.serving.server import BatchingEngine, serve

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _toy_fn():
    # linear per-pixel "model": zero-padding one tile can't leak into
    # another, so batched == per-tile exactly
    def fn(a, b):
        return jnp.mean(jnp.abs(a - b), axis=-1, keepdims=True)
    return jax.jit(fn)


def _scene(seed, hw=64):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32),
            rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32))


def test_batching_engine_matches_direct():
    fn = _toy_fn()
    engine = BatchingEngine(fn, tile=32, batch=4, max_wait_ms=20.0)
    try:
        scenes = [_scene(i) for i in range(3)]
        results = [None] * 3

        def worker(i):
            results[i] = engine.predict_pair(*scenes[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for (a, b), got in zip(scenes, results):
            want = np.abs(a - b).mean(-1, keepdims=True)
            np.testing.assert_allclose(got, want, atol=1e-6)
        stats = engine.stats_snapshot()
        assert stats["requests"] == 3
        assert stats["tiles"] == 12  # 3 scenes x 4 tiles
        assert stats["batches"] >= 3  # 12 tiles / batch 4
        assert stats["batch_tiles"] == 12
        # latency percentiles over the completed requests/steps
        assert stats["request_latency_ms"]["n"] == 3
        assert (0 < stats["request_latency_ms"]["p50"]
                <= stats["request_latency_ms"]["p99"])
        assert stats["step_ms"]["n"] == stats["batches"]
        assert 0 < stats["step_ms"]["p50"] <= stats["step_ms"]["p99"]
    finally:
        engine.close()


def test_batching_engine_rejects_bad_scenes():
    engine = BatchingEngine(_toy_fn(), tile=32, batch=2)
    try:
        a, b = _scene(0, hw=64)
        with pytest.raises(ValueError, match="differ"):
            engine.predict_pair(a, b[:32])
        with pytest.raises(ValueError, match="smaller"):
            engine.predict_pair(a[:16, :16], b[:16, :16])
    finally:
        engine.close()


def _b64_png(arr01):
    buf = io.BytesIO()
    Image.fromarray((arr01 * 255).astype(np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.load(r)


def test_http_server_endpoints():
    engine = BatchingEngine(_toy_fn(), tile=32, batch=4, max_wait_ms=5.0)
    httpd = serve(engine, "127.0.0.1", 0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.load(r)["status"] == "ok"

        a, b = _scene(7)
        out = _post(f"http://127.0.0.1:{port}/predict",
                    {"image_a": _b64_png(a), "image_b": _b64_png(b),
                     "threshold": 0.2})
        assert out["shape"] == [64, 64]
        mask = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(out["mask_png"]))))
        assert mask.shape == (64, 64)
        # threshold semantics vs the toy model on the uint8-roundtripped
        # images (the request path quantizes to PNG)
        a8 = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(_b64_png(a)))), np.float32) / 255.0
        b8 = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(_b64_png(b)))), np.float32) / 255.0
        scores = np.abs(a8 - b8).mean(-1)
        # uint8 channel diffs average to EXACTLY 0.2 (51/255) on many
        # pixels; jnp vs np mean round the last ulp differently there, so
        # compare only off-boundary pixels
        off = np.abs(scores - 0.2) > 1e-6
        np.testing.assert_array_equal((mask > 127)[off], (scores > 0.2)[off])
        assert out["changed"] == pytest.approx((mask > 127).mean(), abs=1e-6)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.load(r)
        assert stats["requests"] == 1 and stats["tiles"] == 4
        assert 0 < stats["mean_batch_occupancy"] <= 1
        assert stats["request_latency_ms"]["n"] == 1
        assert stats["step_ms"]["n"] == stats["batches"]

        # malformed request -> 400, not a hung future
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://127.0.0.1:{port}/predict", {"image_a": "zz"})
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        engine.close()


@pytest.mark.slow
def test_serve_cli_end_to_end(tmp_path):
    """scripts/serve.py with a real zoo model: save a fresh SiamUnet_abs
    checkpoint, boot the server as a subprocess, and round-trip a
    /predict request."""
    import optax
    from stcd_tpu.models.factory import define_G
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import create_train_state

    model = define_G("SiamUnet_abs", n_class=2)
    z = jnp.zeros((1, 32, 32, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (z, z),
                               optax.sgd(0.0))
    CheckpointManager(str(tmp_path / "ck")).save_best(state, 0.5)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--net_G", "SiamUnet_abs", "--load_path", str(tmp_path / "ck"),
         "--tile", "32", "--batch", "2", "--port", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    assert json.load(r)["status"] == "ok"
                break
            except (urllib.error.URLError, ConnectionError):
                if proc.poll() is not None:
                    out = proc.stdout.read()
                    raise AssertionError(f"server died:\n{out[-3000:]}")
                time.sleep(2)
        else:
            raise AssertionError("server did not come up in 300 s")

        a, b = _scene(3)
        out = _post(f"http://127.0.0.1:{port}/predict",
                    {"image_a": _b64_png(a), "image_b": _b64_png(b)})
        assert out["shape"] == [64, 64]
        assert 0.0 <= out["changed"] <= 1.0
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_engine_close_fails_pending_and_rejects_new():
    """close() must fail queued futures immediately (not leave callers
    blocking out the 120 s future timeout) and reject new requests."""
    from concurrent.futures import Future

    release = threading.Event()

    def slow_fn(a, b):
        release.wait(5.0)
        return np.zeros(a.shape[:3] + (1,), np.float32)

    engine = BatchingEngine(slow_fn, tile=8, batch=1, max_wait_ms=1.0,
                            timeout_s=5.0)
    t = np.zeros((8, 8, 3), np.float32)
    f1, f2 = Future(), Future()
    engine._q.put((t, t, f1))  # worker picks this up and blocks in slow_fn
    time.sleep(0.2)
    engine._q.put((t, t, f2))  # stays queued behind the blocked batch

    closer = threading.Thread(target=engine.close)
    closer.start()
    time.sleep(0.2)  # _stop is now set while the worker is still blocked
    release.set()    # let the in-flight batch finish
    closer.join(timeout=10.0)
    assert not closer.is_alive()

    assert f1.result(timeout=1.0) is not None  # in-flight work completed
    with pytest.raises(RuntimeError, match="closed"):
        f2.result(timeout=1.0)  # drained, not hung
    with pytest.raises(RuntimeError, match="closed"):
        engine.predict_pair(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))


def test_engine_survives_malformed_tile_batch():
    """Direct embedders can submit tiles with heterogeneous shapes; the
    np.stack failure must fail THOSE futures, not kill the worker thread
    (review finding: assembly ran outside the try, so one bad batch hung
    every later request for the full future timeout)."""
    from concurrent.futures import Future

    def mean_fn(a, b):
        return np.abs(np.asarray(a) - np.asarray(b)).mean(-1, keepdims=True)

    engine = BatchingEngine(mean_fn, tile=8, batch=2, max_wait_ms=20.0,
                            timeout_s=10.0)
    try:
        bad1, bad2 = Future(), Future()
        t1 = np.zeros((8, 8, 1), np.float32)  # 1-channel
        t3 = np.zeros((8, 8, 3), np.float32)  # 3-channel: unstackable pair
        with engine._lock:
            engine._q.put((t1, t1, bad1))
            engine._q.put((t3, t3, bad2))
        with pytest.raises(ValueError):
            bad1.result(timeout=5.0)
        with pytest.raises(ValueError):
            bad2.result(timeout=5.0)
        assert engine.stats_snapshot()["errors"] == 1

        # the worker thread is still alive and serves the next request
        scene = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
        out = engine.predict_pair(scene, scene * 0.5)
        np.testing.assert_allclose(
            out, np.abs(scene - scene * 0.5).mean(-1, keepdims=True),
            atol=1e-6)
    finally:
        engine.close()


def test_batching_engine_mesh_sharded_matches_single_device():
    """VERDICT r2 item 7 — mesh-sharded serving: the engine with its
    fixed tile batch sharded over the 8-CPU mesh 'data' axis produces
    stitched maps IDENTICAL to the single-device engine, and /stats
    reports the sharded placement."""
    from stcd_tpu.models import SegCD
    from stcd_tpu.parallel.mesh import batch_sharding, create_mesh

    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 8, 6, 4))
    tile = 32
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, tile, tile, 3)),
                           jnp.zeros((1, tile, tile, 3)))

    @jax.jit
    def fn(a, b):
        return jax.nn.sigmoid(model.apply(variables, a, b)[2])

    mesh = create_mesh(model=1)
    sharded = batch_sharding(mesh)
    scenes = [_scene(i, hw=64) for i in range(2)]

    single = BatchingEngine(fn, tile=tile, batch=8, max_wait_ms=20.0)
    try:
        ref = [single.predict_pair(*s) for s in scenes]
    finally:
        single.close()

    engine = BatchingEngine(fn, tile=tile, batch=8, max_wait_ms=20.0,
                            sharding=sharded)
    try:
        got = [engine.predict_pair(*s) for s in scenes]
        stats = engine.stats_snapshot()
    finally:
        engine.close()

    assert stats["mesh_sharded"] is True
    assert stats["devices"] == len(jax.devices())
    assert stats["batches"] >= 1
    for g, r in zip(got, ref):
        # the sharded and single-device placements compile DIFFERENT
        # XLA:CPU programs, and this host rewrites f32 convs as bf16
        # passes (CLAUDE.md) with program-dependent rounding — so the
        # bound is the conv-rewrite noise floor, not sharding math
        np.testing.assert_allclose(g, r, atol=5e-3)
        assert np.mean(np.abs(g - r)) < 5e-4


def test_batching_engine_sharded_and_quantized():
    """VERDICT r3 item 5 — the configuration a v5e-8 serving host would
    actually run: the batching engine mesh-sharded over 'data' AND
    int8-quantized (serving/quant.py scales applied to the sharded
    step). Stitched maps must equal the single-device int8 engine, and
    /stats must report both flags."""
    from stcd_tpu.models import SegCD
    from stcd_tpu.parallel.mesh import batch_sharding, create_mesh
    from stcd_tpu.serving import calibrate_conv_scales, quantize_fn

    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 8, 6, 4))
    tile = 32
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, tile, tile, 3)),
                           jnp.zeros((1, tile, tile, 3)))

    def fwd(a, b):
        return jax.nn.sigmoid(model.apply(variables, a, b)[2])

    rng = np.random.default_rng(0)
    calib = (jnp.asarray(rng.uniform(0, 1, (8, tile, tile, 3)), jnp.float32),
             jnp.asarray(rng.uniform(0, 1, (8, tile, tile, 3)), jnp.float32))
    scales = calibrate_conv_scales(fwd, [calib])
    assert int(np.isfinite(scales).sum()) > 0, "nothing quantized"
    qfn = jax.jit(quantize_fn(fwd, scales))

    scenes = [_scene(i, hw=64) for i in range(2)]
    single = BatchingEngine(qfn, tile=tile, batch=8, max_wait_ms=20.0,
                            quantized=True)
    try:
        ref = [single.predict_pair(*s) for s in scenes]
    finally:
        single.close()

    mesh = create_mesh(model=1)
    engine = BatchingEngine(qfn, tile=tile, batch=8, max_wait_ms=20.0,
                            sharding=batch_sharding(mesh), quantized=True)
    try:
        got = [engine.predict_pair(*s) for s in scenes]
        stats = engine.stats_snapshot()
    finally:
        engine.close()

    assert stats["mesh_sharded"] is True
    assert stats["quantized"] is True
    assert stats["devices"] == len(jax.devices())
    for g, r in zip(got, ref):
        # int8 conv outputs are integer-exact per tile; the residual
        # float epilogues tolerate the XLA:CPU conv-rewrite noise floor
        # (same bound as the bf16 mesh-sharded test above)
        np.testing.assert_allclose(g, r, atol=5e-3)
        assert np.mean(np.abs(g - r)) < 5e-4

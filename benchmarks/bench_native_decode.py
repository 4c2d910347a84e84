"""Host decode throughput: PIL vs the native C++ IO runtime.

Measures the DataLoader's per-sample decode cost (the host-side floor of
the input pipeline) on 256x256 tiles — the reference's training tile
size (ref split.py:43-46) — for PNG (dataset labels/images) and JPEG:

  pil        : Image.open(...).convert("RGB") -> np.asarray (the fallback)
  native     : stcd_tpu.native.decode_rgb (libjpeg/libpng via ctypes)
  native x4  : stcd_decode_rgb_batch with a 4-thread C++ pool (GIL-free
               collate; on a 1-core host this shows overhead, on a real
               TPU host it scales with cores)

Run: python benchmarks/bench_native_decode.py
"""

import os
import tempfile
import time

import numpy as np
from PIL import Image

from stcd_tpu import native


def timeit(fn, iters):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    assert native.available(), "native IO failed to build"
    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp()
    tile = rng.integers(0, 256, (256, 256, 3), np.uint8)
    png = os.path.join(d, "t.png")
    jpg = os.path.join(d, "t.jpg")
    Image.fromarray(tile).save(png)
    Image.fromarray(tile).save(jpg, quality=90)

    n = 32
    for name, path in (("png", png), ("jpeg", jpg)):
        def pil():
            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"), np.uint8)

        t_pil = timeit(pil, 40)
        t_nat = timeit(lambda: native.decode_rgb(path), 40)
        t_b1 = timeit(lambda: native.decode_rgb_batch([path] * n, 256, 256,
                                                      num_threads=1), 4) / n
        t_b4 = timeit(lambda: native.decode_rgb_batch([path] * n, 256, 256,
                                                      num_threads=4), 4) / n
        print(f"{name}: pil={t_pil * 1e3:.3f}ms "
              f"native={t_nat * 1e3:.3f}ms ({t_pil / t_nat:.2f}x) "
              f"batch1={t_b1 * 1e3:.3f}ms "
              f"batch4={t_b4 * 1e3:.3f}ms ({t_pil / t_b4:.2f}x vs pil) "
              f"per 256^2 tile", flush=True)


if __name__ == "__main__":
    main()

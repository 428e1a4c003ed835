"""Round-5: Pallas LK kernel on real TPU — lowering check + throughput at
the reference protocol (512^2, N=1000, win 21, 40 iters, 3 levels)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from keypoint_bench_tpu.ops.pallas_lk import lk_level_pallas, supported

B = int(os.environ.get("LKP_BATCH", "8"))
SIZE = int(os.environ.get("LKP_SIZE", "512"))
N = int(os.environ.get("LKP_N", "1000"))
WIN = int(os.environ.get("LKP_WIN", "21"))
ITERS = int(os.environ.get("LKP_ITERS", "40"))


def main():
    from keypoint_bench_tpu.datasets.synthetic import _texture
    rng = np.random.default_rng(0)
    imgs1 = jnp.asarray(np.stack([_texture(SIZE, SIZE, rng)
                                  for _ in range(B)]))
    imgs2 = jnp.asarray(np.stack([np.roll(np.asarray(im), (2, -3), (0, 1))
                                  for im in imgs1]))
    pts = jnp.asarray(rng.uniform(20, SIZE - 20, (B, N, 2)), jnp.float32)
    print("supported:", supported((SIZE, SIZE, 3), WIN), flush=True)

    f = lambda: lk_level_pallas(imgs1, imgs2, pts, pts, WIN, ITERS)
    t0 = time.perf_counter()
    r = f()
    jax.block_until_ready(r)
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    # value sanity: known shift (2, -3) -> flow approx (-3, 2)?? img2 =
    # roll(img1, (2,-3)) means img2[y,x] = img1[y-2, x+3]; LK tracks
    # pts1(img1) -> img2 position = pts + (-3, +2)
    flow = np.asarray(r - pts)
    med = np.median(flow.reshape(-1, 2), axis=0)
    print(f"median flow: {med} (expect ~[-3, 2])", flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"one level {B}x{N}pts win{WIN} x{ITERS}: {dt * 1e3:.1f} ms "
          f"= {dt / B * 1e3:.2f} ms/frame/level "
          f"({dt / (B * N * ITERS) * 1e9:.0f} ns/pt/iter)", flush=True)


if __name__ == "__main__":
    main()

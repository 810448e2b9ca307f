"""Microbench: what do the fp32 LayerNorms actually cost on TPU? (round 5)

The roofline puts the step's LN traffic bound at ~13-16 ms while the
round-4 profile attributed ~45 ms to fp32-LN reduce fusions. This times
LayerNormFP32 fwd and fwd+bwd in isolation at every flagship stage shape
(bs8 two-frame = 16 images), total over all block LNs, so the attribution
can be confirmed or corrected before any kernel work is spent on it.

Usage: python tools/bench_ln.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def _timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from mmde_tpu.nn.layers import LayerNormFP32

    # (stage, tokens, C, n_LN_per_step): 2 LNs per block x n_blocks, both
    # directions counted via the grad timing; tokens = 16 images x H x W
    shapes = {
        "s1": (16 * 120 * 160, 128, 2 * 2),
        "s2": (16 * 60 * 80, 256, 2 * 2),
        "s3": (16 * 30 * 40, 512, 18 * 2),
        "s4": (16 * 15 * 20, 1024, 2 * 2),
    }
    print(f"backend={jax.default_backend()}")
    ln = LayerNormFP32()
    total_f = total_fb = 0.0
    for name, (n, c, n_ln) in shapes.items():
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c), jnp.bfloat16)
        params = ln.init(jax.random.PRNGKey(1), x)

        f = jax.jit(lambda p, x: ln.apply(p, x))
        g = jax.jit(jax.grad(
            lambda p, x: jnp.sum(ln.apply(p, x).astype(jnp.float32) ** 2),
            argnums=(0, 1)))

        t_f = _timeit(f, params, x) * 1e3
        t_fb = _timeit(g, params, x) * 1e3
        bytes_f = 2 * n * c * 2 / 1e9
        print(f"  {name}: fwd {t_f:6.3f} ms  fwd+bwd {t_fb:6.3f} ms "
              f"x{n_ln} LNs -> {t_fb * n_ln:6.1f} ms/step "
              f"(fwd r+w {bytes_f:.3f} GB -> {bytes_f / 0.66:.3f} ms "
              f"at 660 GB/s)")
        total_f += t_f * n_ln
        total_fb += t_fb * n_ln
    print(f"  TOTAL per step if serialized: fwd-only {total_f:.0f} ms, "
          f"fwd+bwd {total_fb:.0f} ms (dispatch floor ~1.3-2.2 ms per "
          f"timing included once per shape)")


if __name__ == "__main__":
    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"), min_compile_secs=5.0)
    main()

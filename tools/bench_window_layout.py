"""Microbenchmark: per-block window-layout strategies on real TPU.

Three ways to hand a padded-window stage to the attention kernel, measured
at flagship stage shapes (480x640 two-frame bs8 => B frames):

  map       — the non-resident per-block path: pad -> window_partition
              (transpose) -> [attn] -> window_reverse (transpose) -> slice.
  resident  — padded window residency (round 2): zero layout work per
              block, but LN/MLP run over pad tokens (FLOPs, not measured
              here — this bench isolates the LAYOUT ops only).
  compact   — round-4 candidate: state is the real tokens only, ordered
              window-major as (full-windows, partial-windows) along the
              token axis; expansion to (B*nW, N, C) is reshape + pad +
              concat (no transposes), compaction is two static slices.
              Only W-padding geometries (Hp == H) — all four flagship
              stages qualify.

The roundtrip body is jitted with a dummy elementwise op standing in for
attention so XLA cannot fuse away the layout work.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# (name, B_frames, H, W, ws, C) — bs8 two-frame => 16 frames
STAGES = {
    "s1": ("s1 120x160 w30 C128", 16, 120, 160, 30, 128),
    "s2": ("s2 60x80 w30 C256", 16, 60, 80, 30, 256),
    "s3": ("s3 30x40 w30 C512", 16, 30, 40, 30, 512),
    "s4": ("s4 15x20 w15 C1024", 16, 15, 20, 15, 1024),
}


def _time(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out)
          .astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out)
          .astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def bench(key):
    from mmde_tpu.nn.swin_v2 import window_partition, window_reverse

    name, B, H, W, ws, C = STAGES[key]
    Hp = -(-H // ws) * ws
    Wp = -(-W // ws) * ws
    h_wins, w_wins = Hp // ws, Wp // ws
    wf = w_wins - 1 if Wp != W else w_wins
    rw = W - wf * ws
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                          jnp.float32).astype(jnp.bfloat16)

    def body(w):
        # stand-in for attention. The barriers force the (B*nW, N, C)
        # operand/result to MATERIALIZE, as it does around the opaque
        # pallas custom call in the real model — without them XLA fuses
        # pad/transpose/slice into the elementwise op and the bench
        # measures a fusion the real graph can't have.
        w = jax.lax.optimization_barrier(w)
        w = w * 1.0001 + 0.5
        return jax.lax.optimization_barrier(w)

    def map_path(x):
        xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        wdw = window_partition(xp, ws)
        wdw = body(wdw)
        xp = window_reverse(wdw, ws, Hp, Wp)
        return xp[:, :H, :W]

    A = h_wins * wf * ws * ws
    P = h_wins * ws * rw

    def to_compact(x):
        full = x[:, :, :wf * ws, :]
        full = full.reshape(B, h_wins, ws, wf, ws, C)
        full = full.transpose(0, 1, 3, 2, 4, 5).reshape(B, A, C)
        if rw:
            part = x[:, :, wf * ws:, :].reshape(B, P, C)
            return jnp.concatenate([full, part], axis=1)
        return full

    def compact_path(c):
        # expand: reshape + pad + concat (no transposes)
        full = c[:, :A].reshape(B, h_wins, wf, ws, ws, C)
        if rw:
            part = c[:, A:].reshape(B, h_wins, 1, ws, rw, C)
            part = jnp.pad(part, ((0, 0),) * 4 + ((0, ws - rw), (0, 0)))
            wdw = jnp.concatenate([full, part], axis=2)
        else:
            wdw = full
        wdw = wdw.reshape(B * h_wins * w_wins, ws * ws, C)
        wdw = body(wdw)
        # compact back: two static slices
        w6 = wdw.reshape(B, h_wins, w_wins, ws, ws, C)
        full = w6[:, :, :wf].reshape(B, A, C)
        if rw:
            part = w6[:, :, wf:, :, :rw].reshape(B, P, C)
            return jnp.concatenate([full, part], axis=1)
        return full

    def resident_path(w):
        return body(w)

    c0 = to_compact(x)
    xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    w0 = window_partition(xp, ws)

    print(f"-- {name}: pad_frac={(Hp * Wp - H * W) / (H * W):.2f} "
          f"wf={wf} rw={rw}")
    for label, fn, arg in (("map", map_path, x),
                           ("resident(pad)", resident_path, w0),
                           ("compact", compact_path, c0)):
        ms = _time(jax.jit(fn), arg)
        print(f"   {label:14s} {ms:7.3f} ms")


if __name__ == "__main__":
    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    stages = [a for a in sys.argv[1:] if a in STAGES] or list(STAGES)
    print(f"backend={jax.default_backend()}")
    for s in stages:
        bench(s)

"""Probe Mosaic/Pallas support for layout tricks used by the fused
window-attention redesign (docs/PERF.md roadmap items 1-3).

Each probe compiles + runs a tiny kernel on the current backend and prints
PASS/FAIL plus a correctness check. Run on the real TPU:

    python tools/probe_mosaic.py [probe ...]
"""
from __future__ import annotations

import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _report(name, fn):
    try:
        fn()
        print(f"PASS {name}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        if "-v" in sys.argv:
            traceback.print_exc()


def probe_lane_carved_blockspec():
    """Block last dim 32 carved from a 512-wide channel dim at 32h offsets."""
    N, C, Dh = 256, 512, 32
    nH = C // Dh
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(N, C)

    def kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    out = pl.pallas_call(
        kernel,
        grid=(nH,),
        in_specs=[pl.BlockSpec((N, Dh), lambda h: (0, h))],
        out_specs=pl.BlockSpec((N, Dh), lambda h: (0, h)),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def probe_inkernel_window_reshape():
    """(ws, ws, C) -> (ws*ws, C) reshape inside the kernel; ws=30 (not 8-div)."""
    ws, C = 30, 128
    x = jnp.arange(ws * ws * C, dtype=jnp.float32).reshape(1, ws, ws, C)

    def kernel(x_ref, o_ref):
        t = x_ref[0].reshape(ws * ws, C)
        o_ref[:, :] = t + 1.0

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, ws, ws, C), lambda: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((ws * ws, C), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ws * ws, C), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x).reshape(ws * ws, C) + 1.0)


def probe_inkernel_reshape_back():
    """(ws*ws, C) -> (ws, ws, C) reshape inside the kernel (reverse dir)."""
    ws, C = 30, 128
    x = jnp.arange(ws * ws * C, dtype=jnp.float32).reshape(ws * ws, C)

    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[:, :].reshape(ws, ws, C) * 3.0

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((ws * ws, C), lambda: (0, 0))],
        out_specs=pl.BlockSpec((1, ws, ws, C), lambda: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, ws, ws, C), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x).reshape(1, ws, ws, C) * 3.0)


def probe_static_lane_slice():
    """Static lane slices buf[:, 32h:32h+32] for all h, summed."""
    N, C, Dh = 256, 512, 32
    nH = C // Dh
    x = jnp.ones((N, C), jnp.float32)

    def kernel(x_ref, o_ref):
        acc = jnp.zeros((N, Dh), jnp.float32)
        for h in range(nH):
            acc = acc + x_ref[:, h * Dh:(h + 1) * Dh]
        o_ref[:, :] = acc

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((N, C), lambda: (0, 0))],
        out_specs=pl.BlockSpec((N, Dh), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Dh), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.full((N, Dh), nH, np.float32))


def probe_dynamic_lane_slice():
    """Dynamic lane slice pl.ds(h*32, 32) with h = program_id."""
    N, C, Dh = 256, 512, 32
    nH = C // Dh
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(N, C)

    def kernel(x_ref, o_ref):
        h = pl.program_id(0)
        o_ref[:, :] = x_ref[:, pl.ds(h * Dh, Dh)] * 2.0

    out = pl.pallas_call(
        kernel,
        grid=(nH,),
        in_specs=[pl.BlockSpec((N, C), lambda h: (0, 0))],
        out_specs=pl.BlockSpec((N, Dh), lambda h: (0, h)),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def probe_rank4_map_block_matmul():
    """Read a (1, ws, ws, C) window tile from a (B, Hp, Wp, C) map, reshape
    to (N, C) and matmul — the full fused-partition pattern."""
    B, ws, nwh, nww, C = 2, 30, 2, 3, 128
    Hp, Wp = ws * nwh, ws * nww
    x = jax.random.normal(jax.random.PRNGKey(0), (B, Hp, Wp, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (C, C), jnp.float32)

    def kernel(x_ref, w_ref, o_ref):
        t = x_ref[0].reshape(ws * ws, C)
        y = jnp.dot(t, w_ref[:, :], preferred_element_type=jnp.float32)
        o_ref[0] = y.reshape(ws, ws, C)

    out = pl.pallas_call(
        kernel,
        grid=(B, nwh, nww),
        in_specs=[
            pl.BlockSpec((1, ws, ws, C), lambda b, i, j: (b, i, j, 0)),
            pl.BlockSpec((C, C), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ws, ws, C), lambda b, i, j: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), jnp.float32),
    )(x, w)
    ref = np.einsum("bhwc,cd->bhwd", np.asarray(x), np.asarray(w))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


PROBES = {
    "lane_carved_blockspec": probe_lane_carved_blockspec,
    "inkernel_window_reshape": probe_inkernel_window_reshape,
    "inkernel_reshape_back": probe_inkernel_reshape_back,
    "static_lane_slice": probe_static_lane_slice,
    "dynamic_lane_slice": probe_dynamic_lane_slice,
    "rank4_map_block_matmul": probe_rank4_map_block_matmul,
}


if __name__ == "__main__":
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(PROBES)
    print(f"backend: {jax.default_backend()}")
    for n in names:
        _report(n, PROBES[n])

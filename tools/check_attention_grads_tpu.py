"""On-hardware gradient audit for the fused attention kernels.

Why this exists: compiled Mosaic semantics differ from interpret mode —
output-block accumulation across NON-consecutive grid steps silently
corrupts data (this produced garbage RPE-bias gradients from the v1 kernel
while all CPU tests passed). This script is the regression gate: it
compares compiled TPU gradients of the XLA path, the v1 head-split kernel
and the v2 packed kernel against a CPU fp32 ground truth, using relative
L2 error (element-wise max-rel is meaningless here: TPU matmuls default to
bf16-precision passes, so even the XLA path deviates elementwise on
near-zero entries).

Two phases (ground truth must be produced in a separate process because
the TPU platform is pinned at interpreter startup):

    python tools/check_attention_grads_tpu.py cpu   # writes /tmp/mmde_gt.npz
    python tools/check_attention_grads_tpu.py tpu   # compares, exits 1 on fail

Thresholds: dqkv/dls/dbias must be within 3x the XLA path's own deviation
from ground truth (and absolutely < 5e-2), catching corruption (x1000)
while tolerating precision differences.
"""
from __future__ import annotations

import os
import sys

PHASE = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if PHASE == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if PHASE == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mmde_tpu.ops.window_attention import cosine_window_attention
from mmde_tpu.ops.window_attention_pallas import cosine_window_attention_pallas
from mmde_tpu.ops.window_attention_packed import (
    attention_plan, cosine_window_attention_packed, pack_rpe_bias)
from mmde_tpu.ops.window_attention_slab import (
    cosine_window_attention_slab, pack_rpe_bias_slab, slab_plan)

GT_PATH = "/tmp/mmde_gt.npz"
# (name, B_windows, nH, N, C, nW). For the slab impl the windows are laid
# out as a (B, ws, nW*ws, C) map (one row of nW windows per image).
CASES = [
    ("small_nomask_B1", 1, 4, 49, 128, 0),
    ("small_mask_B4", 4, 4, 49, 128, 2),
    ("w30_nomask_B4", 4, 16, 900, 512, 0),     # q-tiled, C-carved
    ("w30_mask_B6", 6, 8, 900, 256, 6),        # q-tiled + mask
]
GRAD_NAMES = ["dqkv", "dls", "dbias"]


def make(B, nH, N, C, nW):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qkv = jax.random.normal(ks[0], (B, N, 3 * C), jnp.float32) * 0.5
    ls = jax.random.normal(ks[1], (nH, 1, 1), jnp.float32) * 0.3 + 1.0
    bias = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
    mask = None
    if nW:
        m = jax.random.bernoulli(ks[3], 0.3, (nW, N, N))
        mask = jnp.where(m, -100.0, 0.0).astype(jnp.float32)
    return qkv, ls, bias, mask


def lossmakers(B, nH, N, C, mask):
    Dh = C // nH
    _, Np, _, HG, nG, _ = attention_plan(N, nH, Dh, C)

    def split(q):
        x3 = q.reshape(B, N, 3, nH, Dh).transpose(2, 0, 3, 1, 4)
        return x3[0], x3[1], x3[2]

    def lx(q, l, b):
        a, k, v = split(q)
        out = cosine_window_attention(a, k, v, l, b.transpose(2, 0, 1), mask)
        return jnp.sum(jnp.tanh(out))

    def lv1(q, l, b):
        a, k, v = split(q)
        out = cosine_window_attention_pallas(a, k, v, l,
                                             b.transpose(2, 0, 1), mask)
        return jnp.sum(jnp.tanh(out))

    def lpk(q, l, b):
        bp = pack_rpe_bias(b, nG, HG, Np)
        out = cosine_window_attention_packed(q, l, bp, mask, num_heads=nH,
                                             grid_mode="window_resident")
        return jnp.sum(jnp.tanh(out))

    def lpk4(q, l, b):
        # v4 bias-resident grid: in-kernel fp32 dbias accumulation over the
        # innermost (consecutive-revisit) window axis — the pattern this
        # audit exists to police on real hardware.
        bp = pack_rpe_bias(b, nG, HG, Np)
        out = cosine_window_attention_packed(q, l, bp, mask, num_heads=nH,
                                             grid_mode="bias_resident")
        return jnp.sum(jnp.tanh(out))

    def lpks(q, l, b):
        # "split" grid: dbias in a dedicated pallas pass that accumulates
        # in-kernel fp32 across CONSECUTIVE revisits of the (nG, nQ, [nW,]
        # S/B) grid — the exact accumulation pattern that silently
        # corrupted the v1 kernel on hardware while interpret mode passed.
        bp = pack_rpe_bias(b, nG, HG, Np)
        out = cosine_window_attention_packed(q, l, bp, mask, num_heads=nH,
                                             grid_mode="split")
        return jnp.sum(jnp.tanh(out))

    def lpkw(q, l, b):
        # W=2 multi-window cells (round-5 opt-in, default W=1): ds dumps
        # in (W, 1, BQ, ·) blocks + per-window dk/dv accumulation across
        # iq — the block-revisit pattern class this audit polices.
        bp = pack_rpe_bias(b, nG, HG, Np)
        out = cosine_window_attention_packed(q, l, bp, mask, num_heads=nH,
                                             grid_mode="window_resident",
                                             windows_per_cell=2)
        return jnp.sum(jnp.tanh(out))

    def _b(x):
        return None if x is None else x.astype(jnp.bfloat16)

    def lxb(q, l, b):
        # bf16-input XLA anchor: same input rounding as packed_mxu, so the
        # mxu mode is graded against a precision-matched reference
        a, k, v = split(q.astype(jnp.bfloat16))
        out = cosine_window_attention(a, k, v, l,
                                      _b(b.transpose(2, 0, 1)), _b(mask))
        return jnp.sum(jnp.tanh(out.astype(jnp.float32)))

    def lpkb(q, l, b):
        # bf16 inputs -> mxu_bf16 resolves True (folded scale + bf16 MXU
        # operands); hardware-audits the new kernel bodies
        bp = pack_rpe_bias(b, nG, HG, Np).astype(jnp.bfloat16)
        out = cosine_window_attention_packed(
            q.astype(jnp.bfloat16), l, bp, _b(mask), num_heads=nH,
            grid_mode="window_resident")
        return jnp.sum(jnp.tanh(out.astype(jnp.float32)))

    ws = int(round(N ** 0.5))
    fns = {"xla": lx, "xla_bf16": lxb, "v1": lv1, "packed": lpk,
           "packed4": lpk4, "pk_split": lpks, "packed_mxu": lpkb,
           "packed_w": lpkw}
    if ws * ws == N:
        hg_ng = slab_plan(ws, ws, nH, Dh, C)
        if hg_ng is not None:
            HGs, nGs = hg_ng

            def lslab(q, l, b):
                # lay the B windows side by side in ONE map row
                # (1, ws, B*ws, 3C): exercises multi-window slab addressing
                # and the cross-window dbias accumulation on hardware.
                # Windows are independent without a mask, so this equals
                # the windowed reference exactly (mask cases are skipped:
                # their mask indexing differs between layouts).
                qmap = q.reshape(B, ws, ws, 3 * C).transpose(1, 0, 2, 3)
                qmap = qmap.reshape(1, ws, B * ws, 3 * C)
                bp = pack_rpe_bias_slab(b, nGs, HGs)
                out = cosine_window_attention_slab(
                    qmap, l, bp, None, num_heads=nH, window_size=ws)
                out = out.reshape(ws, B, ws, C).transpose(1, 0, 2, 3)
                return jnp.sum(jnp.tanh(out))
            if mask is None:
                fns["slab"] = lslab
    return fns


def main():
    if PHASE == "cpu":
        out = {}
        for name, B, nH, N, C, nW in CASES:
            qkv, ls, bias, mask = make(B, nH, N, C, nW)
            g = jax.grad(lossmakers(B, nH, N, C, mask)["xla"],
                         argnums=(0, 1, 2))(qkv, ls, bias)
            for lbl, v in zip(GRAD_NAMES, g):
                out[f"{name}:{lbl}"] = np.asarray(v)
        np.savez(GT_PATH, **out)
        print(f"wrote ground truth to {GT_PATH}")
        return

    if not os.path.exists(GT_PATH):
        raise SystemExit(f"run `python {sys.argv[0]} cpu` first "
                         f"(missing {GT_PATH})")
    gt = np.load(GT_PATH)
    print(f"backend={jax.default_backend()}")
    # optional filters: MMDE_AUDIT_CASES / MMDE_AUDIT_IMPLS (comma lists,
    # substring match) — lets a kernel change re-audit only its own cases
    # instead of paying every variant's tunnel compile.
    case_f = [c for c in os.environ.get("MMDE_AUDIT_CASES", "").split(",")
              if c]
    impl_f = [c for c in os.environ.get("MMDE_AUDIT_IMPLS", "").split(",")
              if c]
    failures = []
    for name, B, nH, N, C, nW in CASES:
        if case_f and not any(c in name for c in case_f):
            continue
        qkv, ls, bias, mask = make(B, nH, N, C, nW)
        fns = lossmakers(B, nH, N, C, mask)
        if impl_f:
            fns = {k: v for k, v in fns.items()
                   if k in ("xla", "xla_bf16")
                   or any(c in k for c in impl_f)}
        rels = {}
        for lbl in fns:
            g = jax.jit(jax.grad(fns[lbl], argnums=(0, 1, 2)))(qkv, ls, bias)
            rels[lbl] = []
            for gn, v in zip(GRAD_NAMES, g):
                a = np.asarray(v, np.float64)
                b = np.asarray(gt[f"{name}:{gn}"], np.float64)
                rels[lbl].append(np.linalg.norm(a - b) /
                                 (np.linalg.norm(b) + 1e-12))
        for lbl in [k for k in rels if k not in ("xla", "xla_bf16")]:
            anchor = "xla_bf16" if lbl.endswith("_mxu") else "xla"
            msgs = []
            for i, gn in enumerate(GRAD_NAMES):
                r, rx = rels[lbl][i], rels[anchor][i]
                floor = 1e-3
                if lbl.endswith("_mxu") and gn == "dls":
                    # dls is a per-head SCALAR carrying the full bf16-dot
                    # rounding of sc; the xla_bf16 anchor computes its
                    # logits with a different epilogue, so its dls error
                    # can be arbitrarily lucky at small shapes (measured
                    # 9.7e-4 vs packed_mxu's 4.0e-3 at small_mask_B4 while
                    # production w30 shapes agree). Corruption shows as
                    # O(1) errors; bound absolutely instead.
                    floor = 5e-3
                ok = r <= max(3.0 * rx, floor) and r < 5e-2
                if not ok:
                    failures.append(f"{name}/{lbl}/{gn}")
                msgs.append(f"{gn}={r:.1e}{'OK' if ok else 'BAD'}")
            print(f"{name:18s} {lbl:10s} " + "  ".join(msgs)
                  + f"   ({anchor} ref: "
                  + " ".join(f"{r:.1e}" for r in rels[anchor]) + ")")
    if failures:
        raise SystemExit("FAILED: " + ", ".join(failures))
    print("all gradient checks passed")


if __name__ == "__main__":
    main()

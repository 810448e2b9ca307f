"""Computed roofline for the flagship train step's time buckets (round 5).

The round-4 step profile (docs/PERF.md) says where the 770 ms/step goes;
this tool computes, from first principles + measured unit rates, where the
HARDWARE says it could go — turning "we stopped at the ceiling" into
numbers (VERDICT r4 next-steps #1).

Three parts:
  1. `microbench` — measured sustained unit rates ON THIS CHIP via Pallas
     kernels that isolate one resource each: VPU elementwise rate, VPU
     exp (transcendental) rate, VPU lane-axis (minor-dim) reduce rate,
     MXU rate at the model's Dh=32 dot shapes (fp32 and bf16 operands),
     and HBM copy bandwidth (XLA level).
  2. `attention_roofline` — analytic op/byte counts of the packed window
     attention kernel per flagship stage at bs8 (grid/blockspec layout
     from ops/window_attention_packed.py; pass counts from _fwd_body /
     _bwd_body in fold+maxfree+rden mode, the production default),
     converted to time via the measured rates, giving per-stage
     MXU-bound / VPU-bound / HBM-bound components. Because the kernel
     body is a strict dataflow chain (qk dot -> +bias -> exp -> rowsum ->
     @v), the SERIAL bound (sum of components) is the speed-of-light for
     a body with no cross-unit overlap; max() is the bound if Mosaic
     perfectly overlapped VPU, MXU and DMA. Measured times are bracketed
     against both.
  3. Fixed-function buckets — decoder tail convs (flops + bytes at exact
     shapes), the ds->dbias XLA window-sum (pure bytes), and fp32
     LayerNorms (bytes) — compared against the round-4 profile bucket
     measurements passed on the command line (defaults = the r4 numbers).

Usage:  python tools/roofline.py [micro|attn|fixed|all] [--measure]
  --measure also times the real packed kernel per stage at bs8 shapes
  (otherwise reuses the numbers recorded in docs/PERF.md round 4/5).

Reference hot loop being bounded: swin_transformer_v2.py:275-336
(reference repo).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- stages
# Flagship 480x640 two-frame bs8 => 16 images. Padded maps per stage:
# s1 120x180 w30 nW=24, s2 60x90 w30 nW=6, s3 30x60 w30 nW=2,
# s4 15x30 w15 nW=2. B_ = 16 * nW. Masked stages: s1, s2 (use_shift TTFF).
STAGES = {
    # name: (B_, nH, N, C, masked, n_blocks)
    "s1": (384, 4, 900, 128, True, 2),
    "s2": (96, 8, 900, 256, True, 2),
    "s3": (32, 16, 900, 512, False, 18),
    "s4": (32, 32, 225, 1024, False, 2),
}

SUSTAINED_MXU_TFLOPS = 122.0  # 8k bf16 matmul on this chip (docs/PERF.md)


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def _timeit(fn, *args, iters=10, repeats=3):
    """Min-of-repeats per-call time. The remote tunnel adds ~31 ms of
    variable sync cost per measurement; min over repeats + the caller's
    diff-based protocol keep that out of the computed rates."""
    out = fn(*args)
    _sync(out[0] if isinstance(out, (tuple, list)) else out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out[0] if isinstance(out, (tuple, list)) else out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# ------------------------------------------------------------ microbench
def _vpu_kernel(op: str, iters: int):
    """Pallas kernel: one (512, 1024) fp32 block resident in VMEM; each
    fori iteration applies 8 DEPENDENT copies of `op` (partial unroll so
    loop overhead is amortized; fori_loop so the Mosaic VMEM stack stays
    small). Total op passes = 8 * iters."""
    from jax.experimental import pallas as pl

    def body(x_ref, o_ref):
        def step(_, x):
            for _ in range(8):
                if op == "add":
                    x = x + 1.0009765625      # exact; no strength reduction
                elif op == "exp":
                    x = jnp.exp(x * 1e-4)     # stays ~1.0, no overflow
                else:
                    # minor(lane)-axis reduce, broadcast back to keep the
                    # chain same-shape and dependent
                    x = x + jnp.sum(x, -1, keepdims=True) * 1e-6
            return x
        o_ref[...] = jax.lax.fori_loop(0, iters, step, x_ref[...])

    shape = (512, 1024)
    x = jnp.ones(shape, jnp.float32)
    f = jax.jit(functools.partial(
        pl.pallas_call(body, out_shape=jax.ShapeDtypeStruct(shape,
                                                            jnp.float32))))
    return f, x, shape[0] * shape[1] * 8


def _mxu_kernel(dh: int, dtype, iters: int, bq: int = 304, np_: int = 912):
    """Pallas kernel timing the packed kernel's actual dot pattern: the
    4-head loop of INDEPENDENT (BQ, Dh) @ (Np, Dh)^T dots off static
    32-lane slices of 128-lane operands (exactly _fwd_body's shape), so
    the MXU pipeline can fill. Only the accumulator is loop-carried."""
    from jax.experimental import pallas as pl
    hg = 128 // dh

    def body(q_ref, k_ref, o_ref):
        q = q_ref[...]
        k = k_ref[...]

        def step(_, acc):
            s = acc
            for t in range(hg):
                cs = t * dh
                s = s + jax.lax.dot_general(
                    q[:, cs:cs + dh], k[:, cs:cs + dh],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return s

        o_ref[...] = jax.lax.fori_loop(
            0, iters, step, jnp.zeros((bq, np_), jnp.float32))

    q = jnp.ones((bq, 128), dtype)
    k = jnp.ones((np_, 128), dtype)
    f = jax.jit(functools.partial(
        pl.pallas_call(body, out_shape=jax.ShapeDtypeStruct((bq, np_),
                                                            jnp.float32))))
    flops_per_iter = hg * 2 * bq * np_ * dh
    return f, (q, k), flops_per_iter


def microbench():
    """Measured sustained unit rates on this chip. All timings are
    DIFF-based — rate = extra_work / (T(hi) - T(lo)) — so launch overhead
    and the remote tunnel's ~31 ms per-sync cost cancel."""
    rates = {}

    # HBM bandwidth: big fp32 copy-with-op (read + write), diff on iters
    # sized so the extra work is ~150 ms >> tunnel noise
    big = jnp.ones((64, 1024, 1024), jnp.float32)   # 256 MB
    f = jax.jit(lambda x: x * 1.0000001)
    lo, hi = 64, 256
    d = hi * _timeit(f, big, iters=hi, repeats=2) - \
        lo * _timeit(f, big, iters=lo, repeats=2)
    rates["hbm_GBps"] = 2 * big.size * 4 * (hi - lo) / d / 1e9

    # VPU rates, diff on in-kernel iteration count; hi sized for ~0.5 s
    # of pure VPU work per launch (el-rate ~1-3 Tel/s)
    for op in ("add", "exp", "rowsum"):
        lo, hi = 60_000, 240_000
        f_lo, x, per_it = _vpu_kernel(op, lo)
        f_hi, _, _ = _vpu_kernel(op, hi)
        d = _timeit(f_hi, x, iters=1) - _timeit(f_lo, x, iters=1)
        rates[f"vpu_{op}_Gel_s"] = per_it * (hi - lo) / d / 1e9

    # MXU at the kernel's Dh=32 4-head dot pattern; iteration counts sized
    # per dtype for ~0.5 s of dot work per launch
    for dt_name, dty, (lo, hi) in (
            ("fp32", jnp.float32, (12_000, 48_000)),
            ("bf16", jnp.bfloat16, (90_000, 360_000))):
        f_lo, args, fl = _mxu_kernel(32, dty, lo)
        f_hi, _, _ = _mxu_kernel(32, dty, hi)
        d = _timeit(f_hi, *args, iters=1) - _timeit(f_lo, *args, iters=1)
        rates[f"mxu_dh32_{dt_name}_TFs"] = fl * (hi - lo) / d / 1e12

    return rates


# --------------------------------------------------- attention analytics
def attention_cost(stage: str, rates: dict):
    """Per-block fwd and bwd cost model of the packed kernel (production
    config: grid_mode=window_resident, mxu=fold, maxfree softmax with the
    round-4 denominator save). Element/byte counts follow the BlockSpecs
    and body of ops/window_attention_packed.py."""
    from mmde_tpu.ops.window_attention_packed import attention_plan

    B_, nH, N, C, masked, n_blocks = STAGES[stage]
    Dh = C // nH
    BQf, Np, nQf, HG, nG, BQb = attention_plan(N, nH, Dh, C)
    nQb = Np // BQb

    def cells(bq):
        return B_ * nG * (Np // bq)

    def one(mode):
        bq = BQf if mode == "fwd" else BQb
        ncell = cells(bq)
        L = bq * Np                       # logits elements per head per cell
        heads = HG

        # --- MXU flops (fold mode: fp32 operands) per cell
        dots = 2 if mode == "fwd" else 5
        mxu_flops = ncell * heads * dots * 2 * bq * Np * Dh
        mxu_s = mxu_flops / (rates["mxu_dh32_fp32_TFs"] * 1e12)

        # --- VPU passes over the logits per head per cell
        # fwd: +bias, (+mask), exp, rowsum -> 2 simple (+1) / 1 exp / 1 red
        # bwd: +bias, (+mask), exp, *rden, dp*p, ds=p*(dp-row), ds cast,
        #      dls mul, => 6 simple (+1); exp 1; reduces: rowsum(dp*p),
        #      full-sum(ds*sc) => 2
        if mode == "fwd":
            simple, expp, red = (2 + (1 if masked else 0)), 1, 1
        else:
            simple, expp, red = (6 + (1 if masked else 0)), 1, 2
        el = ncell * heads * L
        vpu_s = (el * simple / (rates["vpu_add_Gel_s"] * 1e9)
                 + el * expp / (rates["vpu_exp_Gel_s"] * 1e9)
                 + el * red / (rates["vpu_rowsum_Gel_s"] * 1e9))
        # normalize q/k/v + output epilogue, minor: ~6 passes over
        # (rows, Dh) per head per cell
        vpu_s += ncell * heads * (bq + 2 * Np) * Dh * 3 / (
            rates["vpu_add_Gel_s"] * 1e9)

        # --- HBM bytes per cell (bf16 streams; fp32 mask)
        nq = Np // bq
        bias = bq * HG * Np * 2                      # per cell (re-streamed)
        mask_b = bq * Np * 4 if masked else 0
        qt = bq * HG * Dh * 2
        kv = 2 * Np * HG * Dh * 2 / nq               # resident across iq
        out = bq * HG * Dh * 2
        if mode == "fwd":
            per_cell = bias + mask_b + qt + kv + out
        else:
            gt = bq * HG * Dh * 2
            ds_dump = bq * HG * Np * 2
            dq = bq * HG * Dh * 2
            dkv = 2 * Np * HG * Dh * 2 / nq
            rden = bq * HG * 4
            per_cell = bias + mask_b + qt + kv + gt + ds_dump + dq + dkv + rden
        hbm_s = ncell * per_cell / (rates["hbm_GBps"] * 1e9)

        return {"mxu_ms": mxu_s * 1e3, "vpu_ms": vpu_s * 1e3,
                "hbm_ms": hbm_s * 1e3,
                "serial_ms": (mxu_s + vpu_s) * 1e3,
                "max_ms": max(mxu_s, vpu_s, hbm_s) * 1e3}

    return {"fwd": one("fwd"), "bwd": one("bwd"), "n_blocks": n_blocks,
            "plan": dict(BQf=BQf, Np=Np, HG=HG, nG=nG, BQb=BQb, B_=B_)}


def dispatch_floor():
    """Fixed per-dispatch cost of THIS measurement harness (remote axon
    runtime): a trivial jitted op measures ~2.2 ms/iteration. Every fwd
    kernel timing below carries it once; the bwd timings are differences
    of two dispatches so it cancels. It does NOT apply inside a compiled
    e2e train step (one executable, in-program custom-calls)."""
    tiny = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    return _timeit(f, tiny, iters=20) * 1e3


def xla_side_bwd_ms(stage: str, rates: dict):
    """HBM-bound estimate of the XLA-side work inside the bwd3 timing that
    is NOT the kernel: the ds->dbias window-sum reads + the dqkv concat
    (these live in the step profile's 'reduces'/fusion buckets, not the
    attention bucket)."""
    from mmde_tpu.ops.window_attention_packed import attention_plan
    B_, nH, N, C, masked, _ = STAGES[stage]
    Dh = C // nH
    _, Np, _, HG, nG, _ = attention_plan(N, nH, Dh, C)
    ds_read = B_ * nG * Np * HG * Np * 2
    concat = 2 * 3 * B_ * Np * C * 2                # read + write dq/dk/dv
    return (ds_read + concat) / (rates["hbm_GBps"] * 1e9) * 1e3


def measure_stage(stage: str):
    """Time the real packed kernel (fwd and fwd+bwd3) at bs8 shapes."""
    from mmde_tpu.ops.window_attention_packed import (
        attention_plan, cosine_window_attention_packed, pack_rpe_bias)

    B_, nH, N, C, masked, _ = STAGES[stage]
    Dh = C // nH
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qkv = jax.random.normal(ks[0], (B_, N, 3 * C), jnp.float32
                            ).astype(jnp.bfloat16)
    ls = jnp.full((nH, 1, 1), 1.0, jnp.float32)
    bias_nnh = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
    _, Np, _, HG, nG, _ = attention_plan(N, nH, Dh, C)
    bias_packed = pack_rpe_bias(bias_nnh, nG, HG, Np).astype(jnp.bfloat16)
    mask = None
    if masked:
        nW = {"s1": 24, "s2": 6}[stage]
        m = jax.random.bernoulli(ks[3], 0.3, (nW, N, N))
        mask = jnp.where(m, -100.0, 0.0).astype(jnp.float32)

    fwd = jax.jit(lambda q: cosine_window_attention_packed(
        q, ls, bias_packed, mask, num_heads=nH))
    t_fwd = _timeit(fwd, qkv, iters=10) * 1e3

    g3 = jax.jit(jax.grad(
        lambda q, l, b: jnp.sum(cosine_window_attention_packed(
            q, l, b, mask, num_heads=nH).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2)))
    t_f_b = _timeit(g3, qkv, ls, bias_packed, iters=10) * 1e3
    return t_fwd, t_f_b - t_fwd          # bwd ~= total - fwd


# ------------------------------------------------------- fixed buckets
def fixed_buckets(rates: dict):
    """Byte/flop bounds for the non-attention buckets of the bs8 step."""
    img = 16                              # two-frame bs8
    out = []

    # Decoder tail (per docs/PERF.md r4: ~130 ms measured): exact conv
    # flops at flagship shapes, decoder_v2 = 2 passes over 8-image feats.
    # out_channels = 2*embed = 256 (profile-confirmed: the head convs are
    # [3,3,256,256] at 480x640); all activations bf16. NOTE the round-5
    # profile measured these convs at ~194 TF/s — essentially the chip's
    # 197 TF/s bf16 PEAK (the 122 'sustained' anchor from an 8k matmul is
    # conservative; 3x3 convs have 9x operand reuse).
    convs = [
        # (name, Cin, Cout, H, W, k)
        ("deconv0 2048->32 @30x40", 2048, 32, 30, 40, 2),
        ("deconv1 32->32 @60x80", 32, 32, 60, 80, 2),
        ("deconv2 32->32 @120x160", 32, 32, 120, 160, 2),
        ("conv 32->256 @120x160", 32, 256, 120, 160, 3),
        ("head_a 256->256 @480x640", 256, 256, 480, 640, 3),
        ("head_b 256->1 @480x640", 256, 1, 480, 640, 3),
    ]
    dec_flops = 0
    dec_bytes = 0
    for name, ci, co, h, w, k in convs:
        f = 2 * k * k * ci * co * h * w * img
        dec_flops += 3 * f                     # fwd + input grad + weight grad
        dec_bytes += (ci + co) * h * w * 2 * img * 3
    # bilinear x2 resizes (two per pass) + their VJPs: bytes-bound
    for h, w, c in ((120, 160, 128), (240, 320, 128)):
        dec_bytes += (h * w + 4 * h * w) * c * 2 * img * 2   # fwd+bwd
    # pose branch convs (2048-wide at 15x20/8x10/4x5, 2 passes, bs8)
    pose_flops = 0
    for h, w in ((15, 20), (8, 10), (8, 10), (4, 5), (4, 5)):
        pose_flops += 2 * 9 * 2048 * 2048 * h * w * img
    pose_flops *= 3
    # head convs: MXU efficiency capped by min(C,128)/128 on the lane dim
    t_mxu = 0.0
    for name, ci, co, h, w, k in convs:
        eff = min(co, 128) / 128 * min(1.0, k * k * ci / 128)
        eff = max(eff, 0.1)
        t_mxu += 3 * 2 * k * k * ci * co * h * w * img / (
            SUSTAINED_MXU_TFLOPS * 1e12 * eff)
    t_mxu += pose_flops / (SUSTAINED_MXU_TFLOPS * 1e12)
    t_hbm = dec_bytes / (rates["hbm_GBps"] * 1e9)
    out.append(("decoder tail + pose",
                dict(flops_T=(dec_flops + pose_flops) / 1e12,
                     mxu_ms=t_mxu * 1e3, hbm_ms=t_hbm * 1e3,
                     bound_ms=max(t_mxu, t_hbm) * 1e3)))

    # ds->dbias XLA window sums: pure HBM reads of the ds dumps
    from mmde_tpu.ops.window_attention_packed import attention_plan
    ds_bytes = 0
    for s, (B_, nH, N, C, masked, nb) in STAGES.items():
        Dh = C // nH
        _, Np, _, HG, nG, _ = attention_plan(N, nH, Dh, C)
        ds_bytes += nb * B_ * nG * Np * HG * Np * 2
    out.append(("ds->dbias window sums (XLA reads)",
                dict(bytes_GB=ds_bytes / 1e9,
                     bound_ms=ds_bytes / (rates["hbm_GBps"] * 1e9) * 1e3)))

    # fp32 LayerNorms: fwd 2/block read+write bf16 + bwd ~2.5x
    ln_bytes = 0
    maps = {"s1": (120, 160, 128, 2), "s2": (60, 80, 256, 2),
            "s3": (30, 40, 512, 18), "s4": (15, 20, 1024, 2)}
    for s, (h, w, c, nb) in maps.items():
        t = img * h * w * c * 2
        ln_bytes += nb * 2 * (2 * t + 2.5 * 2 * t)
    out.append(("fp32 LayerNorm traffic",
                dict(bytes_GB=ln_bytes / 1e9,
                     bound_ms=ln_bytes / (rates["hbm_GBps"] * 1e9) * 1e3)))
    return out


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    do_measure = "--measure" in sys.argv
    print(f"backend={jax.default_backend()}")

    rates = microbench()
    print("\n== measured unit rates (this chip) ==")
    for k, v in rates.items():
        print(f"  {k:24s} {v:10.1f}")

    if what in ("attn", "all"):
        floor = dispatch_floor() if do_measure else 0.0
        if do_measure:
            print(f"\n  dispatch floor (per jit call, harness-only): "
                  f"{floor:.2f} ms — subtracted from fwd 'kernel' column; "
                  "bwd timings are differenced so it cancels there")
        print("\n== attention kernel roofline (per block, bs8 shapes) ==")
        hdr = (f"  {'stage':4s} {'mode':4s} {'mxu':>7s} {'vpu':>7s} "
               f"{'hbm':>7s} {'max':>7s} {'serial':>7s} {'meas':>7s} "
               f"{'kernel':>7s} {'k/ser':>6s}")
        print(hdr + "   (ms)")
        total_serial = total_kernel = 0.0
        for s in STAGES:
            c = attention_cost(s, rates)
            meas = measure_stage(s) if do_measure else (float("nan"),) * 2
            xla_ms = xla_side_bwd_ms(s, rates)
            for mode, m in (("fwd", meas[0]), ("bwd", meas[1])):
                d = c[mode]
                # kernel-only estimate: fwd minus the dispatch floor; bwd
                # minus the XLA-side ds-reduce + dqkv concat inside bwd3
                kern = m - (floor if mode == "fwd" else xla_ms)
                ratio = kern / d["serial_ms"]
                print(f"  {s:4s} {mode:4s} {d['mxu_ms']:7.2f} "
                      f"{d['vpu_ms']:7.2f} {d['hbm_ms']:7.2f} "
                      f"{d['max_ms']:7.2f} {d['serial_ms']:7.2f} {m:7.2f} "
                      f"{kern:7.2f} {ratio:6.2f}")
                if not np.isnan(m):
                    total_serial += c["n_blocks"] * d["serial_ms"]
                    total_kernel += c["n_blocks"] * kern
        if total_kernel:
            print(f"  step totals (all blocks): serial-bound "
                  f"{total_serial:.0f} ms, kernel-only measured "
                  f"{total_kernel:.0f} ms "
                  f"({total_kernel / total_serial:.2f}x of serial bound)")

    if what in ("fixed", "all"):
        print("\n== fixed-function buckets (bs8 step) ==")
        for name, d in fixed_buckets(rates):
            parts = " ".join(f"{k}={v:.1f}" for k, v in d.items())
            print(f"  {name:40s} {parts}")


if __name__ == "__main__":
    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"), min_compile_secs=5.0)
    main()

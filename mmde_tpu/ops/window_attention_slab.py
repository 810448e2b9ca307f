"""v3 "slab" fused Pallas TPU kernel: window attention straight off the map.

The v2 packed kernel (window_attention_packed.py) removed the head-split
transposes but still required the model to window-partition the feature map
into (B*nW, N, C) and reverse afterwards — measured at ~20% of the train
step (copy bucket, docs/PERF.md). This kernel reads window tiles DIRECTLY
from the NHWC map:

  * qkv is computed by the Dense on the padded (B, Hp, Wp, 3C) map (the
    projection is pointwise over C, so it commutes with windowing);
  * each grid cell covers one (head-group g, image b, WINDOW-ROW wi) and
    reads a row-of-windows SLAB block (1, ws, Wp, CG) — legal because the
    last two block dims (Wp, CG) are full/128-aligned while ws sits in an
    unconstrained dim; the cell iterates its nww windows with STATIC
    sublane slices at wj*ws and reshapes (ws, ws, Dh) -> (N, Dh) in-kernel
    (probed on hardware: tools/probe_mosaic.py + /tmp probes — static
    unaligned bf16 sublane slices lower fine; DYNAMIC ones crash the
    Mosaic compiler for bf16, which is why the window loop is unrolled
    in-kernel rather than being a grid dimension);
  * output is written back as map slabs — window_reverse disappears.

Grid cells for a fixed head-group are visited consecutively across
(b, wi), which makes the RPE-bias block a GRID-CONSTANT (streamed once per
head-group instead of once per window: at swin-base stage 3 this removes
~850 MB of bias traffic per forward) and makes the backward's dbias
accumulation legal by construction (consecutive-revisit accumulation only —
see the hardware note in window_attention_packed.py: non-consecutive
output revisits silently corrupt).

The cyclic shift (jnp.roll) stays outside: its wrap-around cannot be
expressed as a rectangular BlockSpec.

Grid: (nG, B, nwh) with the window-row index innermost.
Cell operands:
  ls    (nH, 1)           SMEM
  q     (1, ws, Wp, CG)   qkv[b, wi*ws:, :, g*CG:]        CG = HG*Dh = 128
  k     (1, ws, Wp, CG)   qkv[b, wi*ws:, :, C + g*CG:]
  v     (1, ws, Wp, CG)   qkv[b, wi*ws:, :, 2C + g*CG:]
  bias  (1, N, HG*N)      packed (nG, N, HG*N), constant across (b, wi)
  mask  (nww, N, N)       optional row chunk of (nW, N, N), windows of row wi
  out   (1, ws, Wp, CG)   written once per cell (all nww windows)

Backward: same grid; dq/dk/dv computed FULLY per window (no cross-cell
accumulation) and written as map slabs; dbias accumulated in the resident
(1, N, HG*N) block across the consecutive (b, wi) sweep of each head-group
in full fp32; dls accumulated in a never-flushed (nH, 128) block.

Reference behavior matched: cosine window attention with clamped learned
log temperature, models/swin_transformer_v2.py:275-336 (reference repo).

MEASURED OUTCOME (v5e, swin-base stage 3, bs8-equivalent): fwd 7.2 ms /
bwd 20.6 ms vs the packed kernel's 3.6 / 7.5 — Mosaic's lowering of the
non-8-aligned static window slices and in-kernel (ws, ws, C) <-> (N, C)
reshapes costs far more than the XLA partition/reverse transposes this
design eliminates, and compile time per stage runs into many minutes.
Numerically verified on hardware (gradients match the CPU fp32 ground
truth; dbias is full-fp32, tighter than the packed kernel's bf16 dump).
Kept as an OPT-IN experiment (MMDE_SLAB=1) for future toolchains; the
packed kernel remains the production path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmde_tpu.ops.window_attention import MAX_LOGIT_SCALE

_VMEM_CAP = 100 * 1024 * 1024


def slab_plan(ws: int, Wp: int, num_heads: int, head_dim: int,
              channels: int):
    """(HG, nG) or None when the slab layout is unusable."""
    if channels % 128 != 0 or 128 % head_dim != 0:
        return None
    hg = 128 // head_dim
    if num_heads % hg != 0:
        return None
    n = ws * ws
    # per-cell VMEM sanity: bias block + ~6 (N, N) fp32 temporaries + slabs
    cell = 2 * n * hg * n * 4 + 6 * n * n * 4 + 8 * ws * Wp * 128 * 4
    if cell > _VMEM_CAP:
        return None
    return hg, num_heads // hg


def pack_rpe_bias_slab(bias_nnh: jnp.ndarray, ng: int, hg: int) -> jnp.ndarray:
    """(N, N, nH) -> (nG, N, HG*N) head-group-packed (no padding needed:
    the slab kernel works at the true window token count)."""
    n = bias_nnh.shape[0]
    b = bias_nnh.reshape(n, n, ng, hg)
    return b.transpose(2, 0, 3, 1).reshape(ng, n, hg * n)


def _window(slab_ref, wj, ws, dh, t):
    """Slice head t of window wj out of a (1, ws, Wp, CG) slab ref and
    flatten to (N, Dh). wj and t are python ints: STATIC slices only (a
    dynamic bf16 sublane slice at a non-16-aligned offset crashes the
    Mosaic compiler)."""
    w = slab_ref[0, :, wj * ws:(wj + 1) * ws, t * dh:(t + 1) * dh]
    return w.reshape(ws * ws, dh)


def _fwd_body(ls_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
              *, hg: int, dh: int, ws: int, nww: int):
    g = pl.program_id(0)
    n = ws * ws
    for wj in range(nww):
        mask = (mask_ref[wj].astype(jnp.float32)
                if mask_ref is not None else None)
        for t in range(hg):
            q = _window(q_ref, wj, ws, dh, t).astype(jnp.float32)
            k = _window(k_ref, wj, ws, dh, t).astype(jnp.float32)
            v = _window(v_ref, wj, ws, dh, t).astype(jnp.float32)
            qn = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
            kn = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
            scale = jnp.exp(jnp.minimum(ls_ref[g * hg + t, 0],
                                        MAX_LOGIT_SCALE))
            s = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[0][:, t * n:(t + 1) * n].astype(
                jnp.float32)
            if mask is not None:
                s = s + mask
            m = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, -1, keepdims=True)
            o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = (o / denom).astype(out_ref.dtype)
            out_ref[0, :, wj * ws:(wj + 1) * ws, t * dh:(t + 1) * dh] = \
                o.reshape(ws, ws, dh)


def _bwd_body(ls_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, g_ref,
              dq_ref, dk_ref, dv_ref, dbias_ref, dls_ref,
              *, hg: int, dh: int, ws: int, nww: int):
    g = pl.program_id(0)
    b = pl.program_id(1)
    wi = pl.program_id(2)
    n = ws * ws
    first_bw = jnp.logical_and(b == 0, wi == 0)
    first_cell = jnp.logical_and(g == 0, first_bw)

    @pl.when(first_cell)
    def _():
        dls_ref[:, :] = jnp.zeros(dls_ref.shape, jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    for wj in range(nww):
        mask = (mask_ref[wj].astype(jnp.float32)
                if mask_ref is not None else None)
        for t in range(hg):
            q = _window(q_ref, wj, ws, dh, t).astype(jnp.float32)
            k = _window(k_ref, wj, ws, dh, t).astype(jnp.float32)
            v = _window(v_ref, wj, ws, dh, t).astype(jnp.float32)
            gr = _window(g_ref, wj, ws, dh, t).astype(jnp.float32)

            rq = jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
            rk = jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
            qn = q * rq
            kn = k * rk
            ls = ls_ref[g * hg + t, 0]
            scale = jnp.exp(jnp.minimum(ls, MAX_LOGIT_SCALE))
            c = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = c * scale + bias_ref[0][:, t * n:(t + 1) * n].astype(
                jnp.float32)
            if mask is not None:
                s = s + mask
            m = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, -1, keepdims=True)

            dp = jax.lax.dot_general(gr, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, -1, keepdims=True))

            dv = jax.lax.dot_general(p, gr, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dqn = scale * jax.lax.dot_general(
                ds, kn, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = rq * (dqn - qn * jnp.sum(dqn * qn, -1, keepdims=True))
            dkn = scale * jax.lax.dot_general(
                ds, qn, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = rk * (dkn - kn * jnp.sum(dkn * kn, -1, keepdims=True))

            sl_w = slice(wj * ws, (wj + 1) * ws)
            sl_c = slice(t * dh, (t + 1) * dh)
            dq_ref[0, :, sl_w, sl_c] = \
                dq.astype(dq_ref.dtype).reshape(ws, ws, dh)
            dk_ref[0, :, sl_w, sl_c] = \
                dk.astype(dk_ref.dtype).reshape(ws, ws, dh)
            dv_ref[0, :, sl_w, sl_c] = \
                dv.astype(dv_ref.dtype).reshape(ws, ws, dh)

            # dbias: consecutive-revisit accumulation only (the (b, wi)
            # sweep for a fixed head-group is contiguous in this grid
            # order; non-consecutive revisits corrupt on hardware)
            sl_b = slice(t * n, (t + 1) * n)
            if wj == 0:
                @pl.when(first_bw)
                def _():
                    dbias_ref[0, :, sl_b] = ds

                @pl.when(jnp.logical_not(first_bw))
                def _():
                    dbias_ref[0, :, sl_b] += ds
            else:
                dbias_ref[0, :, sl_b] += ds

            gate = (ls < MAX_LOGIT_SCALE).astype(jnp.float32)
            dls_val = scale * jnp.sum(ds * c) * gate
            dls_ref[pl.ds(g * hg + t, 1), :] += \
                jnp.where(lane == 0, dls_val, 0.0)


def _slab_spec(ws, Wp, CG, ch_block):
    return pl.BlockSpec(
        (1, ws, Wp, CG),
        lambda g, b, wi, _cb=ch_block: (b, wi, 0, _cb + g))


def _common(qkv, logit_scale, num_heads, ws):
    B, Hp, Wp, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    HG, nG = slab_plan(ws, Wp, num_heads, Dh, C)
    CG = HG * Dh
    ls2 = logit_scale.reshape(num_heads, 1).astype(jnp.float32)
    return B, Hp, Wp, C, Dh, HG, nG, CG, ls2


def _pallas_forward(qkv, logit_scale, bias_packed, mask, num_heads, ws,
                    interpret):
    B, Hp, Wp, C, Dh, HG, nG, CG, ls2 = _common(qkv, logit_scale,
                                                num_heads, ws)
    n = ws * ws
    nwh, nww = Hp // ws, Wp // ws

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [ls_spec, _slab_spec(ws, Wp, CG, 0),
                _slab_spec(ws, Wp, CG, nG), _slab_spec(ws, Wp, CG, 2 * nG),
                pl.BlockSpec((1, n, HG * n), lambda g, b, wi: (g, 0, 0))]
    args = [ls2, qkv, qkv, qkv, bias_packed]
    if mask is not None:
        in_specs.append(pl.BlockSpec((nww, n, n),
                                     lambda g, b, wi: (wi, 0, 0)))
        args.append(mask)
        body = functools.partial(_fwd_body, hg=HG, dh=Dh, ws=ws, nww=nww)
    else:
        def body(ls, q, k, v, bias, out):
            _fwd_body(ls, q, k, v, bias, None, out, hg=HG, dh=Dh, ws=ws,
                      nww=nww)

    return pl.pallas_call(
        body,
        grid=(nG, B, nwh),
        in_specs=in_specs,
        out_specs=_slab_spec(ws, Wp, CG, 0),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), qkv.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_CAP)
        if not interpret else None,
    )(*args)


def _pallas_backward(qkv, logit_scale, bias_packed, mask, g_out, num_heads,
                     ws, interpret):
    B, Hp, Wp, C, Dh, HG, nG, CG, ls2 = _common(qkv, logit_scale,
                                                num_heads, ws)
    n = ws * ws
    nwh, nww = Hp // ws, Wp // ws

    ls_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [ls_spec, _slab_spec(ws, Wp, CG, 0),
                _slab_spec(ws, Wp, CG, nG), _slab_spec(ws, Wp, CG, 2 * nG),
                pl.BlockSpec((1, n, HG * n), lambda g, b, wi: (g, 0, 0))]
    args = [ls2, qkv, qkv, qkv, bias_packed]
    if mask is not None:
        in_specs.append(pl.BlockSpec((nww, n, n),
                                     lambda g, b, wi: (wi, 0, 0)))
        args.append(mask)
        body = functools.partial(_bwd_body, hg=HG, dh=Dh, ws=ws, nww=nww)
    else:
        def body(ls, q, k, v, bias, gt, dq, dk, dv, dbias, dls):
            _bwd_body(ls, q, k, v, bias, None, gt, dq, dk, dv, dbias, dls,
                      hg=HG, dh=Dh, ws=ws, nww=nww)
    in_specs.append(_slab_spec(ws, Wp, CG, 0))        # upstream grad
    args.append(g_out)

    out_shapes = (
        jax.ShapeDtypeStruct((B, Hp, Wp, C), jnp.float32),   # dq
        jax.ShapeDtypeStruct((B, Hp, Wp, C), jnp.float32),   # dk
        jax.ShapeDtypeStruct((B, Hp, Wp, C), jnp.float32),   # dv
        jax.ShapeDtypeStruct(bias_packed.shape, jnp.float32),
        jax.ShapeDtypeStruct((num_heads, 128), jnp.float32),
    )
    out_specs = (
        _slab_spec(ws, Wp, CG, 0),
        _slab_spec(ws, Wp, CG, 0),
        _slab_spec(ws, Wp, CG, 0),
        pl.BlockSpec((1, n, HG * n), lambda g, b, wi: (g, 0, 0)),
        pl.BlockSpec((num_heads, 128), lambda g, b, wi: (0, 0)),
    )

    dq, dk, dv, dbias, dls = pl.pallas_call(
        body,
        grid=(nG, B, nwh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_CAP)
        if not interpret else None,
    )(*args)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1).astype(qkv.dtype)
    dls_out = dls[:, 0].reshape(logit_scale.shape).astype(logit_scale.dtype)
    return dqkv, dls_out, dbias.astype(bias_packed.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:                                   # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _slab_op(qkv, logit_scale, bias_packed, mask, num_heads, ws, interpret):
    return _pallas_forward(qkv, logit_scale, bias_packed, mask, num_heads,
                           ws, interpret)


def _slab_fwd(qkv, logit_scale, bias_packed, mask, num_heads, ws, interpret):
    out = _pallas_forward(qkv, logit_scale, bias_packed, mask, num_heads,
                          ws, interpret)
    return out, (qkv, logit_scale, bias_packed, mask)


def _slab_bwd(num_heads, ws, interpret, res, g):
    qkv, logit_scale, bias_packed, mask = res
    dqkv, dls, dbias = _pallas_backward(qkv, logit_scale, bias_packed, mask,
                                        g, num_heads, ws, interpret)
    return dqkv, dls, dbias, None


_slab_op.defvjp(_slab_fwd, _slab_bwd)


def cosine_window_attention_slab(qkv_map: jnp.ndarray,
                                 logit_scale: jnp.ndarray,
                                 bias_packed: jnp.ndarray,
                                 mask: Optional[jnp.ndarray] = None,
                                 *, num_heads: int, window_size: int,
                                 interpret: Optional[bool] = None):
    """Map-in/map-out fused cosine window attention.

    qkv_map: (B, Hp, Wp, 3C), Hp/Wp multiples of window_size (pre-rolled for
    shifted blocks); bias_packed: (nG, N, HG*N) from `pack_rpe_bias_slab`;
    mask: (nW, N, N) in row-major window order; returns (B, Hp, Wp, C).
    Falls back to interpret mode off-TPU.
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _slab_op(qkv_map, logit_scale, bias_packed, mask, num_heads,
                    window_size, interpret)

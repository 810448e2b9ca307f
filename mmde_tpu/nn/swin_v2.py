"""SwinTransformerV2 backbone — flax.linen, NHWC, TPU-first.

Capability parity with the reference models/swin_transformer_v2.py (1281
lines of PyTorch) re-designed for XLA:

  * cosine-similarity window attention with learned log temperature clamped
    at ln(100) (ref :176-177, :291-295) — via mmde_tpu.ops (XLA or Pallas);
  * continuous relative position bias: 2-layer MLP over a log-spaced
    relative-coordinate table, sigmoid output x16 (ref :183-242, :312-313);
  * split q/v bias with an implicit zero k bias (ref :261-267, :283-286);
  * post-norm (default) and pre-norm+layerscale block variants
    (ref :355-488, :491-630);
  * cyclic-shift SW-MSA with the additive 0/-100 region mask — the mask and
    all window bookkeeping are computed in numpy at trace time, so they are
    XLA constants rather than device computation (ref builds them on-device
    per forward, :866-892);
  * PatchMerging / PatchReduction1C / ConvPatchMerging downsampling
    (ref :633-747), PatchEmbed conv-4x4 and ResNetDLN patch embeds
    (ref :918-992);
  * strid16 mode, per-stage window/shift flags, stochastic-depth schedule,
    fp32 LayerNorm on outputs, gradient checkpointing per stage
    (ref :995-1282).

Everything here is NHWC with static shapes; shifting uses jnp.roll; windows
are pure reshapes, so XLA fuses partition/attention/reverse into one fusion
per block around the matmuls.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mmde_tpu.nn.layers import DropPath, LayerNormFP32, Mlp, trunc_normal_init

# The full set of gradient-checkpointing policies BasicLayer understands;
# anything else raises loudly (matching the MMDE_ATTN_GRID / grid_mode
# guards) instead of silently running whole-block remat.
_REMAT_POLICIES = ("full", "attn_out", "attn_qkv", "mlp_only", "none")
from mmde_tpu.ops.window_attention import (
    cosine_window_attention, scaled_window_attention)

Dtype = Any


# ---------------------------------------------------------------------------
# Static (trace-time) window bookkeeping — numpy, becomes XLA constants.
# ---------------------------------------------------------------------------

def relative_coords_table(window_size: Tuple[int, int],
                          pretrain_window_size: int = -1,
                          table_type: str = "norm8_log_bylayer") -> np.ndarray:
    """Log-spaced relative-coordinate grid fed to the RPE MLP.

    Returns ((2Wh-1)*(2Ww-1), 2) float32. Matches the construction at
    ref :190-242 for types: linear, linear_bylayer, norm8_log,
    norm8_log_bylayer.
    """
    wh, ww = window_size
    if table_type.endswith("_bylayer") and pretrain_window_size == 1:
        # table /= (pretrain_window_size - 1) would divide by zero and emit
        # NaN/inf coords under a RuntimeWarning, silently poisoning the RPE
        # MLP. Other values (including the -1 "unset" default, which the
        # reference divides by -2 to finite effect, ref :190-242) pass
        # through with reference semantics.
        raise ValueError(
            f"table_type={table_type!r} with pretrain_window_size=1 divides "
            "by zero; set a real pretrain window or a non-_bylayer table "
            "type")
    ch = np.arange(-(wh - 1), wh, dtype=np.float32)
    cw = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1)  # (2Wh-1, 2Ww-1, 2)
    if table_type == "linear":
        table[..., 0] /= (wh - 1)
        table[..., 1] /= (ww - 1)
    elif table_type == "linear_bylayer":
        table /= (pretrain_window_size - 1)
    elif table_type in ("norm8_log", "norm8_log_bylayer"):
        if table_type == "norm8_log":
            table[..., 0] /= (wh - 1)
            table[..., 1] /= (ww - 1)
        else:
            table /= (pretrain_window_size - 1)
        table *= 8.0
        table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    else:
        raise NotImplementedError(table_type)
    return table.reshape(-1, 2).astype(np.float32)


def relative_position_index(window_size: Tuple[int, int]) -> np.ndarray:
    """(N, N) int32 index into the flattened (2Wh-1)(2Ww-1) bias table
    (construction mirrors ref :248-259)."""
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))             # (2, Wh, Ww)
    flat = coords.reshape(2, -1)                              # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]                 # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)             # (N, N, 2)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)                       # (N, N)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C). H, W must be multiples of ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _toeplitz_axis(t: jnp.ndarray, W: int) -> jnp.ndarray:
    """(2W-1, ...) -> (W, W, ...) with out[i, j] = t[i - j + W - 1].

    Built from W static slices + one stack — no gather, and no flat
    mega-dim reshape (GSPMD turns non-divisible reshapes of sharded
    intermediates into all-to-alls, which deadlock the virtual CPU mesh).
    """
    ft = jnp.flip(t, axis=0)
    rows = [ft[W - 1 - i:2 * W - 1 - i] for i in range(W)]
    return jnp.stack(rows, axis=0)


def rpe_bias_from_table(table: jnp.ndarray, Wh: int, Ww: int) -> jnp.ndarray:
    """Expand a ((2Wh-1)(2Ww-1), nH) relative-position table to the
    (N, N, nH) per-token-pair bias via a 2-level block-Toeplitz construction.

    Equivalent to table[relative_position_index] (the reference gathers,
    swin_transformer_v2.py:307-309) but with zero gather ops — an 810k-row
    gather (and scatter-add in the backward) per block is a TPU anti-pattern;
    this version is reshapes and strided slices that XLA fuses away.
    """
    nH = table.shape[-1]
    t2 = table.reshape(2 * Wh - 1, 2 * Ww - 1, nH)
    ty = _toeplitz_axis(t2, Wh)                    # (Wh, Wh, 2Ww-1, nH)
    ty = jnp.moveaxis(ty, 2, 0)                    # (2Ww-1, Wh, Wh, nH)
    txy = _toeplitz_axis(ty, Ww)                   # (Ww, Ww, Wh, Wh, nH)
    out = jnp.transpose(txy, (2, 0, 3, 1, 4))      # (Wh, Ww, Wh, Ww, nH)
    return out.reshape(Wh * Ww, Wh * Ww, nH)


def shifted_window_mask(Hp: int, Wp: int, ws: int, ss: int) -> np.ndarray:
    """Additive 0/-100 mask (nW, N, N) separating the 9 cyclic-shift regions
    (same partitioning as ref :873-892, built host-side)."""
    img = np.zeros((Hp, Wp), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, Hp - ws), slice(Hp - ws, Hp - ss), slice(Hp - ss, Hp)):
        for wsl in (slice(0, Wp - ws), slice(Wp - ws, Wp - ss), slice(Wp - ss, Wp)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.reshape(Hp // ws, ws, Wp // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)          # (nW, N)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def pad_keep_mask(H: int, W: int, Hp: int, Wp: int, ws: int,
                  ss: int = 0) -> np.ndarray:
    """(nW, N, 1) multiplicative 1/0 mask marking REAL (non-pad) tokens of a
    padded (Hp, Wp) map in window-partitioned layout, optionally after a
    cyclic (-ss, -ss) roll. Window-resident stages multiply each block's
    attention input by this to reproduce the map path's fresh zero padding
    (ref pads per block, swin_transformer_v2.py:429-434): with zero pad
    rows, qkv(pad) = the Dense bias — exactly the bytes the reference's
    attention sees — while resident pad rows would otherwise drift."""
    keep = np.zeros((Hp, Wp), dtype=np.float32)
    keep[:H, :W] = 1.0
    if ss:
        keep = np.roll(keep, (-ss, -ss), axis=(0, 1))
    k = keep.reshape(Hp // ws, ws, Wp // ws, ws)
    k = k.transpose(0, 2, 1, 3).reshape(-1, ws * ws, 1)
    return k


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class WindowAttention(nn.Module):
    """W-MSA with cosine attention + continuous RPE (ref :150-336)."""
    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_type: str = "cosine_mh"            # "cosine_mh" | "normal"
    rpe_table_type: str = "norm8_log_bylayer"
    rpe_hidden_dim: int = 512
    rpe_output_type: str = "sigmoid"        # "sigmoid" (x16) | "normal"
    pretrain_window_size: int = -1
    fp32_out: bool = False                  # mlpfp32 projection
    attn_impl: str = "xla"                  # "xla" | "pallas" | "pallas_slab"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        # rank-3 (B*nW, N, C): windowed input (xla / packed / v1 paths);
        # rank-4 (B, Hp, Wp, C): map input for the v3 slab kernel — the
        # qkv/proj Dense layers are pointwise over C so they run on either.
        slab_mode = x.ndim == 4
        if slab_mode:
            _, Hp, Wp, C = x.shape
            N = self.window_size[0] * self.window_size[1]
        else:
            B_, N, C = x.shape
        nH = self.num_heads
        Dh = C // nH

        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="qkv")(x)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
            bias_vec = jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)
            qkv = qkv + bias_vec
        if self.attn_type == "cosine_mh":
            logit_scale = self.param(
                "logit_scale",
                lambda key, shape: jnp.full(shape, float(np.log(10.0))),
                (nH, 1, 1))
        else:
            logit_scale = None

        from mmde_tpu.ops.window_attention_packed import (
            attention_plan, cosine_window_attention_packed, pack_rpe_bias)
        plan = (attention_plan(N, nH, Dh, C)
                if (self.attn_impl in ("pallas", "pallas_slab")
                    and not slab_mode
                    and self.attn_type == "cosine_mh") else None)

        if slab_mode:
            # v3 slab path: window tiles are read straight off the map in
            # the kernel; no window_partition/reverse anywhere.
            from jax.ad_checkpoint import checkpoint_name
            from mmde_tpu.ops.window_attention_slab import (
                cosine_window_attention_slab, pack_rpe_bias_slab, slab_plan)
            hg_ng = slab_plan(self.window_size[0], Wp, nH, Dh, C)
            assert hg_ng is not None, "caller must check slab_plan"
            HG, nG = hg_ng
            qkv = checkpoint_name(qkv, "swin_qkv")
            bias_packed = pack_rpe_bias_slab(
                rpe_bias_from_table(self._rpe_table(), *self.window_size),
                nG, HG)
            out = cosine_window_attention_slab(
                qkv, logit_scale, bias_packed, mask, num_heads=nH,
                window_size=self.window_size[0])
        elif plan is not None:
            # Packed path: qkv stays (B_, N, 3C) — no head-split transposes,
            # dense 128-lane tiles end to end (see window_attention_packed).
            from jax.ad_checkpoint import checkpoint_name
            qkv = checkpoint_name(qkv, "swin_qkv")
            _, Np, _, HG, nG, _ = plan
            bias_packed = pack_rpe_bias(
                rpe_bias_from_table(self._rpe_table(), *self.window_size),
                nG, HG, Np)
            if jnp.dtype(self.dtype) == jnp.bfloat16:
                # bf16 streaming: ~5% fwd / 2% bwd kernel win. The mask is
                # exactly representable (0/-100); the bias loses ~0.4%
                # relative — inside bf16 training noise. fp32 models keep
                # fp32 operands for strict parity.
                bias_packed = bias_packed.astype(jnp.bfloat16)
                if mask is not None:
                    mask = mask.astype(jnp.bfloat16)
            out = cosine_window_attention_packed(
                qkv, logit_scale, bias_packed, mask, num_heads=nH)
        else:
            x3 = qkv.reshape(B_, N, 3, nH, Dh).transpose(2, 0, 3, 1, 4)
            q, k, v = x3[0], x3[1], x3[2]   # (B_, nH, N, Dh)
            rpe_bias = rpe_bias_from_table(
                self._rpe_table(), *self.window_size).transpose(2, 0, 1)

            if self.attn_type == "cosine_mh":
                if self.attn_impl in ("pallas", "pallas_slab"):
                    from mmde_tpu.ops.window_attention_pallas import \
                        cosine_window_attention_pallas
                    out = cosine_window_attention_pallas(
                        q, k, v, logit_scale, rpe_bias, mask)
                else:
                    out = cosine_window_attention(q, k, v, logit_scale,
                                                  rpe_bias, mask)
            elif self.attn_type == "normal":
                out = scaled_window_attention(q, k, v, Dh ** -0.5, rpe_bias,
                                              mask)
            else:
                raise NotImplementedError(self.attn_type)
            out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        if self.fp32_out:
            out = nn.Dense(C, dtype=jnp.float32, param_dtype=jnp.float32,
                           kernel_init=trunc_normal_init(), name="proj")(
                out.astype(jnp.float32))
        else:
            out = nn.Dense(C, dtype=self.dtype,
                           kernel_init=trunc_normal_init(), name="proj")(out)
        return out

    def _rpe_table(self) -> jnp.ndarray:
        """Continuous RPE table: MLP(log-spaced coords), ((2Wh-1)(2Ww-1), nH)
        fp32 (LinearFP32 tail in the reference, :185-187). The sigmoid*16
        output transform is applied HERE, on the ~3.5k-row table, instead of
        on the ~1M-entry expanded bias — exact, since an elementwise map
        commutes with the (gather-equivalent) Toeplitz expansion."""
        if self.rpe_table_type == "none":
            table = self.param(
                "relative_position_bias_table", trunc_normal_init(0.02),
                ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1),
                 self.num_heads))
        else:
            coords = jnp.asarray(relative_coords_table(
                self.window_size, self.pretrain_window_size,
                self.rpe_table_type))                      # (T, 2)
            h = nn.Dense(self.rpe_hidden_dim, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         kernel_init=trunc_normal_init(), name="rpe_fc1")(coords)
            h = nn.relu(h)
            table = nn.Dense(self.num_heads, use_bias=False, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             kernel_init=trunc_normal_init(), name="rpe_fc2")(h)
        table = table.astype(jnp.float32)
        if self.rpe_output_type == "sigmoid":
            table = 16.0 * jax.nn.sigmoid(table)
        return table


class SwinBlock(nn.Module):
    """One Swin block (post-norm default / pre-norm+layerscale variant),
    operating directly on NHWC maps (ref :355-630 works on (B, L, C))."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    postnorm: bool = True
    init_values: Optional[float] = None     # layerscale (pre-norm only)
    use_mlp_norm: bool = False
    endnorm: bool = False
    attn_type: str = "cosine_mh"
    rpe_table_type: str = "norm8_log_bylayer"
    rpe_hidden_dim: int = 512
    rpe_output_type: str = "sigmoid"
    pretrain_window_size: int = -1
    mlpfp32: bool = False
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    deterministic: bool = True
    # "map": input is (B, H, W, C); the block pads/rolls/partitions itself.
    # "windows": input is already window-partitioned (B*nW, N, C) — used by
    # BasicLayer for shift-free stages so the partition/reverse transposes
    # happen ONCE per stage instead of twice per block (LN/MLP/residuals
    # are pointwise over C, hence layout-agnostic). Requires shift_size==0.
    layout: str = "map"
    num_windows: int = 1                    # nW per sample (windows layout)
    # "mlp_only" remat: recompute ONLY the MLP hidden activations in the
    # backward; the attention path is NOT under a remat scope. Rationale
    # (measured, docs/PERF.md round 4): wrapping the whole block re-runs
    # the attention FORWARD kernel during the remat replay — jax cannot
    # dead-code a custom_vjp fwd call even when its output is saved,
    # because the residual rebuild is atomic with it — costing one extra
    # kernel launch per block per step (~82 ms/step at flagship bs8).
    remat_mlp: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray], dp_rate=None,
                 pad_mask: Optional[jnp.ndarray] = None):
        deterministic = self.deterministic
        ws, ss = self.window_size, self.shift_size

        if self.layout == "windows":
            # the stage applies any cyclic shift via window_roll; the block
            # itself only needs the (possibly None) SW-MSA mask. dp_rate
            # optionally overrides drop_path_rate with a traced scalar
            # (scanned-blocks path). pad_mask (non-divisible maps) re-zeroes
            # pad tokens at the attention input — see pad_keep_mask.
            assert ss == 0, "windows layout requires shift_size=0"
            return self._windows_body(x, mask, deterministic, dp_rate,
                                      pad_mask)

        B, H, W, C = x.shape

        shortcut = x
        if not self.postnorm:
            x = LayerNormFP32(name="norm1")(x)

        # pad to window multiples (static at trace time)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            attn_mask = mask
        else:
            attn_mask = None

        # v3 slab kernel: OPT-IN only (attn_impl="pallas_slab", resolved
        # once at model build — see models.two_frame.resolve_attn_impl).
        # Measured on v5e (docs/PERF.md): the map-layout kernel loses ~2x to
        # the packed kernel at swin-base stage shapes — Mosaic's lowering of
        # non-8-aligned static window slices + in-kernel (ws, ws, C)->(N, C)
        # reshapes is far more expensive than XLA's partition/reverse
        # transposes it replaces — and its per-stage compile runs into many
        # minutes. Kept for experimentation on future toolchains. Windows
        # where slab_plan has no legal layout fall back to the packed path.
        from mmde_tpu.ops.window_attention_slab import slab_plan
        use_slab = (self.attn_impl == "pallas_slab"
                    and self.attn_type == "cosine_mh"
                    and slab_plan(ws, Wp, self.num_heads,
                                  C // self.num_heads, C) is not None)
        attn_mod = WindowAttention(
            dim=C, window_size=(ws, ws), num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, attn_type=self.attn_type,
            rpe_table_type=self.rpe_table_type,
            rpe_hidden_dim=self.rpe_hidden_dim,
            rpe_output_type=self.rpe_output_type,
            pretrain_window_size=self.pretrain_window_size,
            fp32_out=self.mlpfp32, attn_impl=self.attn_impl,
            dtype=self.dtype, name="attn",
        )
        from jax.ad_checkpoint import checkpoint_name
        if use_slab:
            # v3: attention consumes/produces the (B, Hp, Wp, C) map —
            # no window_partition/window_reverse copies at all
            x = attn_mod(x, attn_mask)
            x = checkpoint_name(x, "swin_attn_out")
        else:
            windows = window_partition(x, ws)              # (B*nW, ws*ws, C)
            attn = attn_mod(windows, attn_mask)
            attn = checkpoint_name(attn, "swin_attn_out")
            x = window_reverse(attn, ws, Hp, Wp)

        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W, :]

        dp = DropPath(self.drop_path_rate)
        # static_argnums=(2,): `deterministic` (arg 2 counting module self)
        # must stay a Python bool through jax.checkpoint — flax Dropout only
        # short-circuits a traced bool when its rate is 0.0, so Mlp dropout
        # > 0 under mlp_only remat would otherwise ConcretizationTypeError.
        mlp_cls = (nn.remat(Mlp, static_argnums=(2,))
                   if self.remat_mlp else Mlp)
        if self.postnorm:
            x = LayerNormFP32(name="norm1")(x)
            x = shortcut + dp(x, deterministic)
            shortcut = x
            y = mlp_cls(int(C * self.mlp_ratio), dtype=self.dtype,
                        use_norm=self.use_mlp_norm, fp32_out=self.mlpfp32,
                        name="mlp")(x, deterministic)
            y = LayerNormFP32(name="norm2")(y)
            x = shortcut + dp(y, deterministic)
        else:
            if self.init_values is not None and self.init_values >= 0:
                gamma_1 = self.param("gamma_1",
                                     nn.initializers.constant(self.init_values),
                                     (C,))
                gamma_2 = self.param("gamma_2",
                                     nn.initializers.constant(self.init_values),
                                     (C,))
            else:
                gamma_1 = gamma_2 = 1.0
            x = shortcut + dp(gamma_1 * x, deterministic)
            shortcut = x
            y = LayerNormFP32(name="norm2")(x)
            y = mlp_cls(int(C * self.mlp_ratio), dtype=self.dtype,
                        use_norm=self.use_mlp_norm, fp32_out=self.mlpfp32,
                        name="mlp")(y, deterministic)
            x = shortcut + dp(gamma_2 * y, deterministic)

        if self.endnorm:
            x = LayerNormFP32(name="enorm")(x)
        return x

    def _windows_body(self, x, mask, deterministic, dp_rate=None,
                      pad_mask=None):
        """Block body on already-partitioned (B*nW, N, C) input: identical
        math and parameter structure to the map path, minus the pad / roll /
        partition / reverse bookkeeping (all removed ops are layout moves,
        not arithmetic). `mask` is the SW-MSA mask when the stage rolled the
        windows before this block. `pad_mask` (nW, N, 1) zeroes pad tokens
        right before attention — the exact point where the map path's fresh
        zero padding sits (post-norm: raw block input; pre-norm: after
        norm1) — so resident stages on padded maps match the map path
        bit-for-bit at real token positions."""
        C = x.shape[-1]
        shortcut = x
        if not self.postnorm:
            x = LayerNormFP32(name="norm1")(x)
        if pad_mask is not None:
            nw = pad_mask.shape[0]
            xb = x.reshape(-1, nw, x.shape[1], C)
            x = (xb * pad_mask.astype(xb.dtype)).reshape(x.shape)

        attn_mod = WindowAttention(
            dim=C, window_size=(self.window_size, self.window_size),
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_type=self.attn_type, rpe_table_type=self.rpe_table_type,
            rpe_hidden_dim=self.rpe_hidden_dim,
            rpe_output_type=self.rpe_output_type,
            pretrain_window_size=self.pretrain_window_size,
            fp32_out=self.mlpfp32, attn_impl=self.attn_impl,
            dtype=self.dtype, name="attn",
        )
        from jax.ad_checkpoint import checkpoint_name
        x = attn_mod(x, mask)
        x = checkpoint_name(x, "swin_attn_out")

        dpm = DropPath(self.drop_path_rate, window_groups=self.num_windows)
        dp = lambda v, det: dpm(v, det, rate=dp_rate)  # noqa: E731
        # static_argnums=(2,): `deterministic` (arg 2 counting module self)
        # must stay a Python bool through jax.checkpoint — flax Dropout only
        # short-circuits a traced bool when its rate is 0.0, so Mlp dropout
        # > 0 under mlp_only remat would otherwise ConcretizationTypeError.
        mlp_cls = (nn.remat(Mlp, static_argnums=(2,))
                   if self.remat_mlp else Mlp)
        if self.postnorm:
            x = LayerNormFP32(name="norm1")(x)
            x = shortcut + dp(x, deterministic)
            shortcut = x
            y = mlp_cls(int(C * self.mlp_ratio), dtype=self.dtype,
                        use_norm=self.use_mlp_norm, fp32_out=self.mlpfp32,
                        name="mlp")(x, deterministic)
            y = LayerNormFP32(name="norm2")(y)
            x = shortcut + dp(y, deterministic)
        else:
            if self.init_values is not None and self.init_values >= 0:
                gamma_1 = self.param("gamma_1",
                                     nn.initializers.constant(self.init_values),
                                     (C,))
                gamma_2 = self.param("gamma_2",
                                     nn.initializers.constant(self.init_values),
                                     (C,))
            else:
                gamma_1 = gamma_2 = 1.0
            x = shortcut + dp(gamma_1 * x, deterministic)
            shortcut = x
            y = LayerNormFP32(name="norm2")(x)
            y = mlp_cls(int(C * self.mlp_ratio), dtype=self.dtype,
                        use_norm=self.use_mlp_norm, fp32_out=self.mlpfp32,
                        name="mlp")(y, deterministic)
            x = shortcut + dp(gamma_2 * y, deterministic)

        if self.endnorm:
            x = LayerNormFP32(name="enorm")(x)
        return x


class PatchMerging(nn.Module):
    """2x downsample: 2x2 space-to-depth + linear 4C->2C (ref :633-678)."""
    postnorm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)     # (B, H/2, W/2, 4C)
        if self.postnorm:
            x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                         kernel_init=trunc_normal_init(), name="reduction")(x)
            x = LayerNormFP32(name="norm")(x)
        else:
            x = LayerNormFP32(name="norm")(x)
            x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                         kernel_init=trunc_normal_init(), name="reduction")(x)
        return x


class PatchReduction1C(nn.Module):
    """Channel-preserving reduction used by strid16 mode (ref :681-708):
    linear C->C + norm, no spatial change."""
    postnorm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        if self.postnorm:
            x = nn.Dense(C, use_bias=False, dtype=self.dtype,
                         kernel_init=trunc_normal_init(), name="reduction")(x)
            x = LayerNormFP32(name="norm")(x)
        else:
            x = LayerNormFP32(name="norm")(x)
            x = nn.Dense(C, use_bias=False, dtype=self.dtype,
                         kernel_init=trunc_normal_init(), name="reduction")(x)
        return x


class ConvPatchMerging(nn.Module):
    """Conv 3x3 stride-2 downsample variant (ref :711-747)."""
    postnorm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        # torch-style pad (1,1): flax SAME pads (0,1) at stride 2 on even
        # extents, shifting the grid off the reference's Conv2d(3,2,1)
        if self.postnorm:
            x = nn.Conv(2 * C, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="reduction")(x)
            x = LayerNormFP32(name="norm")(x)
        else:
            x = LayerNormFP32(name="norm")(x)
            x = nn.Conv(2 * C, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="reduction")(x)
        return x


class PatchEmbed(nn.Module):
    """Conv 4x4 stride-4 patchify + optional norm (ref :918-957)."""
    embed_dim: int = 96
    patch_size: int = 4
    patch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ps = self.patch_size
        B, H, W, C = x.shape
        pad_b = (ps - H % ps) % ps
        pad_r = (ps - W % ps) % ps
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                    dtype=self.dtype, kernel_init=trunc_normal_init(),
                    name="proj")(x)
        if self.patch_norm:
            x = LayerNormFP32(name="norm")(x)
        return x


class ResNetDLNPatchEmbed(nn.Module):
    """ResNet-style stem patch embed (ref :960-992): 3 convs + LN + GELU +
    maxpool, total stride 4."""
    embed_dim: int = 96
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_b = (4 - H % 4) % 4
        pad_r = (4 - W % 4) % 4
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = LayerNormFP32(name="ln1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = LayerNormFP32(name="ln2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.embed_dim, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv3")(x)
        x = LayerNormFP32(name="norm")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


def window_roll(xw: jnp.ndarray, ws: int, ss: int, h_wins: int, w_wins: int,
                reverse: bool = False) -> jnp.ndarray:
    """Cyclic map-space roll by (-ss, -ss) — or its inverse — applied
    DIRECTLY in window-partitioned layout (B*nW, ws*ws, C) via quadrant
    concatenation: each rolled window is stitched from its own lower-right
    part and the upper/left strips of its (cyclic) right/bottom neighbors.
    Equivalent to window_reverse -> jnp.roll -> window_partition but with
    contiguous (ws*C)-run copies instead of two non-8-aligned transposes
    plus a roll (the map path's dominant copy cost at ws=30)."""
    B_, N, C = xw.shape
    B = B_ // (h_wins * w_wins)
    x6 = xw.reshape(B, h_wins, w_wins, ws, ws, C)
    if not reverse:
        x6 = jnp.concatenate(
            [x6[:, :, :, ss:], jnp.roll(x6, -1, axis=1)[:, :, :, :ss]],
            axis=3)
        x6 = jnp.concatenate(
            [x6[:, :, :, :, ss:], jnp.roll(x6, -1, axis=2)[:, :, :, :, :ss]],
            axis=4)
    else:
        x6 = jnp.concatenate(
            [jnp.roll(x6, 1, axis=1)[:, :, :, ws - ss:],
             x6[:, :, :, :ws - ss]], axis=3)
        x6 = jnp.concatenate(
            [jnp.roll(x6, 1, axis=2)[:, :, :, :, ws - ss:],
             x6[:, :, :, :, :ws - ss]], axis=4)
    return x6.reshape(B_, N, C)


class _ScanBlockCell(nn.Module):
    """lax.scan cell: one windows-layout SwinBlock whose stochastic-depth
    rate arrives as a per-iteration input (`rates[i]`) instead of a static
    attribute. Scanning D identical blocks collapses D copies of the block
    graph into ONE compiled body — at flagship stage 3 (18 blocks) this
    shrinks the train-step HLO ~3x, which is what the remote compile helper
    chokes on at batch 16 (docs/PERF.md). Param tree: blocks under this
    cell get a leading (D,) axis (flax nn.scan variable_axes)."""
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    postnorm: bool = True
    init_values: Optional[float] = None
    use_mlp_norm: bool = False
    attn_type: str = "cosine_mh"
    rpe_table_type: str = "norm8_log_bylayer"
    rpe_hidden_dim: int = 512
    rpe_output_type: str = "sigmoid"
    pretrain_window_size: int = -1
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    deterministic: bool = True
    num_windows: int = 1
    remat_mlp: bool = False

    @nn.compact
    def __call__(self, x, rate, pad_mask=None):
        x = SwinBlock(
            dim=self.dim, num_heads=self.num_heads,
            window_size=self.window_size, shift_size=0,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            drop_path_rate=0.0, postnorm=self.postnorm,
            init_values=self.init_values, use_mlp_norm=self.use_mlp_norm,
            endnorm=False, attn_type=self.attn_type,
            rpe_table_type=self.rpe_table_type,
            rpe_hidden_dim=self.rpe_hidden_dim,
            rpe_output_type=self.rpe_output_type,
            pretrain_window_size=self.pretrain_window_size,
            mlpfp32=False, attn_impl=self.attn_impl, dtype=self.dtype,
            deterministic=self.deterministic, layout="windows",
            num_windows=self.num_windows, remat_mlp=self.remat_mlp,
            name="block",
        )(x, None, dp_rate=rate, pad_mask=pad_mask)
        return x, ()


class BasicLayer(nn.Module):
    """One Swin stage: blocks (alternating shift) + optional downsample
    (ref :750-915). The SW-MSA mask is a trace-time numpy constant."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rates: Sequence[float] = ()
    downsample: Optional[str] = None        # "merge" | "reduce1c" | "conv" | None
    use_checkpoint: bool = False
    init_values: Optional[float] = 1e-5
    endnorm_interval: int = -1
    use_mlp_norm: bool = False
    use_shift: bool = True
    attn_type: str = "cosine_mh"
    rpe_table_type: str = "norm8_log_bylayer"
    rpe_hidden_dim: int = 512
    rpe_output_type: str = "sigmoid"
    mlpfp32_blocks: Sequence[int] = (-1,)
    postnorm: bool = True
    pretrain_window_size: int = -1
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    remat_policy: str = "full"
    # Collapse identical shift-free blocks into one nn.scan body (see
    # _ScanBlockCell). Changes the param tree (blocks_scan/block/** with a
    # leading (depth,) axis instead of blocks_0..blocks_{D-1}/**) — use
    # to_scanned_layout/from_scanned_layout to convert checkpoints.
    scan_blocks: bool = False
    # Residency on a padded map runs LN/MLP over pad tokens (the map path
    # pays padding only inside attention), trading FLOPs for the per-block
    # partition/reverse transposes. Allow it only up to this pad fraction;
    # 0.0 = divisible maps only (measured: full residency at 480x640 is
    # -3.7% e2e because stage 3/4 pad 50%). See SwinConfig.resident_pad_max.
    resident_pad_max: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        ws = self.window_size
        ss = ws // 2
        Hp = -(-H // ws) * ws
        Wp = -(-W // ws) * ws
        mask = jnp.asarray(shifted_window_mask(Hp, Wp, ws, ss)) \
            if (self.use_shift and self.depth > 1) else None

        # Stages run WINDOW-RESIDENT: pad + partition once here, keep every
        # block in (B*nW, N, C), reverse + slice once at the end — instead
        # of a pad/partition + reverse/slice transpose pair per block.
        # Cyclic shifts for SW-MSA blocks are applied in window layout by
        # `window_roll` (quadrant concatenation). Non-divisible maps carry a
        # pad_keep_mask that re-zeroes pad tokens at each block's attention
        # input, reproducing the map path's fresh per-block zero padding
        # exactly (see pad_keep_mask). The slab kernel reads the map
        # directly, so it keeps the per-block path.
        pad_frac = (Hp * Wp - H * W) / float(H * W)
        windows_resident = (self.attn_impl != "pallas_slab"
                            and pad_frac <= self.resident_pad_max + 1e-9)
        pad_mask = pad_mask_shifted = None
        if windows_resident:
            h_wins, w_wins = Hp // ws, Wp // ws
            n_win = h_wins * w_wins
            if Hp != H or Wp != W:
                x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
                pad_mask = jnp.asarray(pad_keep_mask(H, W, Hp, Wp, ws))
                if mask is not None:
                    pad_mask_shifted = jnp.asarray(
                        pad_keep_mask(H, W, Hp, Wp, ws, ss))
            x = window_partition(x, ws)                  # (B*nW, N, C)

        if self.remat_policy not in _REMAT_POLICIES:
            raise ValueError(
                f"unknown remat_policy {self.remat_policy!r}; expected one of "
                f"{_REMAT_POLICIES} (a typo would otherwise silently fall "
                "back to whole-block remat)")
        remat_mlp = self.use_checkpoint and self.remat_policy == "mlp_only"

        def remat_wrap(cls):
            if not self.use_checkpoint or self.remat_policy in ("mlp_only",
                                                                "none"):
                # mlp_only: the block is NOT wrapped; only its MLP remats
                # (SwinBlock.remat_mlp). Whole-block remat replays the
                # attention forward kernel to rebuild the custom-VJP
                # residuals — an extra kernel launch per block per step.
                return cls
            if self.remat_policy == "attn_out":
                return nn.remat(
                    cls,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "swin_attn_out"))
            if self.remat_policy == "attn_qkv":
                # also saves the qkv projection: the attention custom-VJP's
                # residual, so the backward skips the qkv Dense + window
                # partition recompute at ~45 MB/block (bf16 swin-base s3)
                return nn.remat(
                    cls,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "swin_attn_out", "swin_qkv"))
            return nn.remat(cls)

        block_cls = remat_wrap(SwinBlock)

        scannable = (self.scan_blocks and windows_resident
                     and not self.use_shift and self.endnorm_interval <= 0
                     and not any(0 <= b < self.depth
                                 for b in self.mlpfp32_blocks)
                     and self.depth >= 2)
        if scannable:
            rates = jnp.asarray(
                [self.drop_path_rates[i] if i < len(self.drop_path_rates)
                 else 0.0 for i in range(self.depth)], jnp.float32)
            Scan = nn.scan(
                remat_wrap(_ScanBlockCell),
                variable_axes={"params": 0},
                split_rngs={"params": True, "droppath": True,
                            "dropout": True},
                in_axes=(0, nn.broadcast), length=self.depth)
            x, _ = Scan(
                dim=C, num_heads=self.num_heads, window_size=ws,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                postnorm=self.postnorm, init_values=self.init_values,
                use_mlp_norm=self.use_mlp_norm, attn_type=self.attn_type,
                rpe_table_type=self.rpe_table_type,
                rpe_hidden_dim=self.rpe_hidden_dim,
                rpe_output_type=self.rpe_output_type,
                pretrain_window_size=self.pretrain_window_size,
                attn_impl=self.attn_impl, dtype=self.dtype,
                deterministic=deterministic, num_windows=n_win,
                remat_mlp=remat_mlp,
                name="blocks_scan")(x, rates, pad_mask)
            x = window_reverse(x, ws, Hp, Wp)
            if Hp != H or Wp != W:
                x = x[:, :H, :W]
            x_out = x
            if self.downsample == "merge":
                x = PatchMerging(postnorm=self.postnorm, dtype=self.dtype,
                                 name="downsample")(x)
            elif self.downsample == "reduce1c":
                x = PatchReduction1C(postnorm=self.postnorm,
                                     dtype=self.dtype, name="downsample")(x)
            elif self.downsample == "conv":
                x = ConvPatchMerging(postnorm=self.postnorm,
                                     dtype=self.dtype, name="downsample")(x)
            return x_out, x

        for i in range(self.depth):
            shift = 0 if (i % 2 == 0 or not self.use_shift) else ss
            endnorm = (self.endnorm_interval > 0
                       and (i + 1) % self.endnorm_interval == 0)
            if windows_resident and shift > 0:
                x = window_roll(x, ws, shift, h_wins, w_wins)
            x = block_cls(
                dim=C, num_heads=self.num_heads, window_size=ws,
                shift_size=0 if windows_resident else shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop_path_rate=(self.drop_path_rates[i]
                                if i < len(self.drop_path_rates) else 0.0),
                postnorm=self.postnorm, init_values=self.init_values,
                use_mlp_norm=self.use_mlp_norm, endnorm=endnorm,
                attn_type=self.attn_type, rpe_table_type=self.rpe_table_type,
                rpe_hidden_dim=self.rpe_hidden_dim,
                rpe_output_type=self.rpe_output_type,
                pretrain_window_size=self.pretrain_window_size,
                mlpfp32=(i in self.mlpfp32_blocks),
                attn_impl=self.attn_impl, dtype=self.dtype,
                deterministic=deterministic,
                layout="windows" if windows_resident else "map",
                num_windows=n_win if windows_resident else 1,
                remat_mlp=remat_mlp,
                name=f"blocks_{i}",
            )(x, mask if shift > 0 else None, None,
              (pad_mask_shifted if shift > 0 else pad_mask)
              if windows_resident else None)
            if windows_resident and shift > 0:
                x = window_roll(x, ws, shift, h_wins, w_wins, reverse=True)

        if windows_resident:
            x = window_reverse(x, ws, Hp, Wp)
            if Hp != H or Wp != W:
                x = x[:, :H, :W]

        x_out = x
        if self.downsample == "merge":
            x = PatchMerging(postnorm=self.postnorm, dtype=self.dtype,
                             name="downsample")(x)
        elif self.downsample == "reduce1c":
            x = PatchReduction1C(postnorm=self.postnorm, dtype=self.dtype,
                                 name="downsample")(x)
        elif self.downsample == "conv":
            x = ConvPatchMerging(postnorm=self.postnorm, dtype=self.dtype,
                                 name="downsample")(x)
        return x_out, x


class SwinTransformerV2(nn.Module):
    """Full backbone (ref :995-1282). Input NHWC uint8-normalized float;
    returns a list of NHWC feature maps at `out_indices` with fp32 norms."""
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Sequence[int] = (7, 7, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    use_checkpoint: Sequence[bool] | bool = False
    remat_policy: str = "full"
    init_values: Optional[float] = 1e-5
    endnorm_interval: int = -1
    use_mlp_norm_layers: Sequence[int] = ()
    rpe_table_type: str = "norm8_log_bylayer"
    rpe_hidden_dim: int = 512
    attn_type: str = "cosine_mh"
    rpe_output_type: str = "sigmoid"
    postnorm: bool = True
    patch_embed_type: str = "normal"        # "normal" | "resnetdln"
    patch_merge_type: str = "normal"        # "normal" | "conv"
    strid16: bool = False
    mlpfp32_layer_blocks: Sequence[Sequence[int]] = ((-1,), (-1,), (-1,), (-1,))
    out_indices: Sequence[int] = (3,)
    frozen_stages: int = -1
    use_shift: Sequence[bool] | bool = True
    pretrain_window_size: Sequence[int] = (-1, -1, -1, -1)
    pretrain_img_size: int = 224
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    scan_blocks: bool = False               # see BasicLayer.scan_blocks
    resident_pad_max: float = 0.0           # see BasicLayer.resident_pad_max

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_layers = len(self.depths)
        window_size = (list(self.window_size)
                       if not isinstance(self.window_size, int)
                       else [self.window_size] * num_layers)
        use_shift = (list(self.use_shift)
                     if not isinstance(self.use_shift, bool)
                     else [self.use_shift] * num_layers)
        use_ckpt = (list(self.use_checkpoint)
                    if not isinstance(self.use_checkpoint, bool)
                    else [self.use_checkpoint] * num_layers)

        if self.patch_embed_type == "normal":
            x = PatchEmbed(embed_dim=self.embed_dim,
                           patch_norm=self.patch_norm, dtype=self.dtype,
                           name="patch_embed")(x)
        elif self.patch_embed_type == "resnetdln":
            x = ResNetDLNPatchEmbed(embed_dim=self.embed_dim,
                                    dtype=self.dtype, name="patch_embed")(x)
        else:
            raise NotImplementedError(self.patch_embed_type)

        # Frozen-stage gradient stops (ref :1201-1216): fs>=0 freezes
        # patch_embed, fs>=1 the abs pos embed, fs>=i+2 stage i. Weight
        # decay / optimizer updates for the same subtrees are zeroed in
        # train.optim.build_optimizer(frozen_stages=...).
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        if self.ape:
            res = self.pretrain_img_size // 4
            ape = self.param("absolute_pos_embed", trunc_normal_init(0.02),
                             (1, res, res, self.embed_dim))
            ape_r = jax.image.resize(
                ape, (1, x.shape[1], x.shape[2], self.embed_dim), "bicubic")
            if self.frozen_stages >= 1:
                ape_r = jax.lax.stop_gradient(ape_r)
            x = x + ape_r.astype(x.dtype)

        # stochastic-depth schedule over the flattened block list
        total = sum(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, total))

        num_features = []
        outs = []
        for i in range(num_layers):
            if i == num_layers - 1 and self.strid16:
                cur_dim = int(self.embed_dim * 2 ** (i - 1))
            else:
                cur_dim = int(self.embed_dim * 2 ** i)
            num_features.append(cur_dim)

            if i < num_layers - 2:
                ds = "conv" if self.patch_merge_type == "conv" else "merge"
            elif i == num_layers - 2:
                ds = "reduce1c" if self.strid16 else (
                    "conv" if self.patch_merge_type == "conv" else "merge")
            else:
                ds = None

            x_out, x = BasicLayer(
                dim=cur_dim, depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=window_size[i], mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop_path_rates=dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])],
                downsample=ds, use_checkpoint=use_ckpt[i],
                remat_policy=self.remat_policy,
                init_values=self.init_values,
                endnorm_interval=self.endnorm_interval,
                use_mlp_norm=(i in self.use_mlp_norm_layers),
                use_shift=use_shift[i],
                attn_type=self.attn_type, rpe_table_type=self.rpe_table_type,
                rpe_hidden_dim=self.rpe_hidden_dim,
                rpe_output_type=self.rpe_output_type,
                mlpfp32_blocks=self.mlpfp32_layer_blocks[i],
                postnorm=self.postnorm,
                pretrain_window_size=self.pretrain_window_size[i],
                attn_impl=self.attn_impl, dtype=self.dtype,
                scan_blocks=self.scan_blocks,
                resident_pad_max=self.resident_pad_max,
                name=f"layers_{i}",
            )(x, deterministic)

            if self.frozen_stages >= i + 2:
                x = jax.lax.stop_gradient(x)
                x_out = jax.lax.stop_gradient(x_out)

            if i in self.out_indices:
                # fp32 output norm (ref :1269-1275), NHWC
                y = LayerNormFP32(name=f"norm{i}")(x_out.astype(jnp.float32))
                outs.append(y)

        return outs


# ---------------------------------------------------------------------------
# Scanned-blocks layout conversion (checkpoints / torch converts are stored
# in the unstacked blocks_{i} layout; scan_blocks=True models store stage
# blocks as blocks_scan/block/** with a leading (depth,) axis).
# ---------------------------------------------------------------------------

def to_scanned_layout(swin_params, scan_stages):
    """Stack `layers_{i}/blocks_{j}/**` into `layers_{i}/blocks_scan/block/**`
    (leading axis = depth) for every stage index in `scan_stages`.

    `swin_params`: the SwinTransformerV2 param subtree (children layers_*).
    Returns a new dict; input is not mutated.
    """
    import flax
    out = dict(flax.core.unfreeze(swin_params))
    for si in scan_stages:
        key = f"layers_{si}"
        if key not in out:
            continue
        stage = dict(out[key])
        names = sorted((k for k in stage if k.startswith("blocks_")
                        and k != "blocks_scan"),
                       key=lambda k: int(k.split("_")[1]))
        if not names:
            continue
        subtrees = [stage.pop(n) for n in names]
        stage["blocks_scan"] = {
            "block": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *subtrees)}
        out[key] = stage
    return out


def from_scanned_layout(swin_params):
    """Inverse of `to_scanned_layout` for every stage that has a
    blocks_scan subtree."""
    import flax
    out = dict(flax.core.unfreeze(swin_params))
    for key in list(out):
        if key.startswith("layers_") and isinstance(out[key], dict) \
                and "blocks_scan" in out[key]:
            stage = dict(out[key])
            stacked = stage.pop("blocks_scan")["block"]
            depth = jax.tree.leaves(stacked)[0].shape[0]
            for i in range(depth):
                stage[f"blocks_{i}"] = jax.tree.map(
                    lambda x, i=i: x[i], stacked)
            out[key] = stage
    return out

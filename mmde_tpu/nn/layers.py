"""Shared layers: MLP, DropPath (stochastic depth), fp32-forced norm helpers.

Numerics policy mirrors the reference's mixed-precision discipline
(models/swin_transformer_v2.py:41-56): LayerNorm and the attention softmax /
cosine normalization run in float32 even when activations are bfloat16; the
surrounding matmuls stay in the activation dtype so they hit the MXU.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class LayerNormFP32(nn.Module):
    """LayerNorm computed in float32, result cast back to the input dtype.

    Matches LayerNormFP32 (swin_transformer_v2.py:41-47). The reference
    builds every backbone norm with eps=1e-6 (swin_transformer_v2.py:1038),
    hence the non-torch-default epsilon — with the low-variance activations
    of trunc-normal init, a 1e-5 eps shifts outputs by ~1e-3.
    """
    epsilon: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, use_scale=self.use_scale,
                         use_bias=self.use_bias, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
              rng: Optional[jax.Array]) -> jnp.ndarray:
    """Stochastic depth: drop the entire residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth. `window_groups` > 1 marks window-partitioned input
    (leading dim = B * nW, sample-major): the per-SAMPLE drop mask is drawn
    at batch size B and repeated across each sample's nW windows, keeping
    the reference's per-sample semantics in the window-resident layout."""
    rate: float = 0.0
    window_groups: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        """`rate` overrides the static attribute with a (possibly traced)
        scalar — used by the scanned-blocks path, where the per-block
        stochastic-depth rate is a lax.scan per-iteration input and so
        cannot be a static module attribute."""
        if deterministic or (rate is None and self.rate == 0.0):
            return x
        r = self.rate if rate is None else rate
        rng = self.make_rng("droppath")
        g = self.window_groups
        keep = 1.0 - r
        shape = (x.shape[0] // max(g, 1),) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        if g > 1:
            mask = jnp.repeat(mask, g, axis=0)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def trunc_normal_init(std: float = 0.02):
    """Truncated-normal initializer matching timm's trunc_normal_ (±2σ)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class Mlp(nn.Module):
    """Transformer FFN. `fp32_out` forces the second projection to fp32
    (reference mlpfp32 path, swin_transformer_v2.py:82-88)."""
    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    dropout: float = 0.0
    use_norm: bool = False
    fp32_out: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc1")(x)
        if self.use_norm:
            x = LayerNormFP32(name="norm")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.fp32_out:
            x = nn.Dense(out_dim, dtype=jnp.float32, param_dtype=jnp.float32,
                         kernel_init=trunc_normal_init(), name="fc2")(
                x.astype(jnp.float32))
        else:
            x = nn.Dense(out_dim, dtype=self.dtype,
                         kernel_init=trunc_normal_init(), name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def torch_deconv(x, features: int, k: int, *, dtype, name: str,
                 kernel_init) -> jnp.ndarray:
    """torch ConvTranspose2d(k, stride=2) with exact value parity.

    flax's ConvTranspose applies the kernel UNFLIPPED (lax.conv_transpose),
    while torch's transposed conv is the gradient of a strided correlation,
    which reverses the taps: for k=s=2 every 2x2 output block comes out
    spatially flipped. Forward oracles missed this for two rounds because
    randomized-BN eval suppresses the spatial signal (running stats O(1) vs
    tiny conv outputs -> near-constant activations); train-mode BN re-
    amplifies it, which is how the training-dynamics oracle caught it. The
    weight converter (ckpt.torch_convert.deconv_kernel) now stores the
    spatially flipped kernel, and this helper pins the padding geometry of
    the reference's _get_deconv_cfg (decoder_v2.py:143-157):
    k=2 -> pad 0 (VALID); k=4 -> pad 1 (SAME); k=3 -> pad 1 + output
    padding 1 (VALID + leading-edge crop). All verified elementwise
    against torch for each k.
    """
    if k in (2, 3):
        pad = "VALID"
    elif k == 4:
        pad = "SAME"
    else:
        raise ValueError(f"unsupported deconv kernel {k} "
                         "(reference _get_deconv_cfg supports 2/3/4)")
    y = nn.ConvTranspose(features, (k, k), strides=(2, 2), padding=pad,
                         use_bias=False, kernel_init=kernel_init,
                         dtype=dtype, name=name)(x)
    if k == 3:
        y = y[:, 1:, 1:, :]
    return y


class TorchBatchNorm(nn.Module):
    """BatchNorm over the feature (last) axis with EXACT torch train-mode
    semantics, drop-in for flax nn.BatchNorm (same param/stat names).

    The one behavioral difference from flax: torch updates running_var with
    the UNBIASED batch variance (n/(n-1), aten/native/Normalization.cpp)
    while normalizing with the biased one; flax feeds the biased variance
    into the EMA too. At small spatial sizes (decoder head maps) the n/(n-1)
    factor is percent-level, which the training-dynamics oracle
    (tests/test_training_oracle.py) resolves — so the framework's BN
    reproduces the reference trainer's running stats exactly, not almost.
    EMA convention is flax-style: ra = momentum*ra + (1-momentum)*new
    (momentum=0.9 == torch momentum 0.1).
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        nf = x.shape[-1]
        red = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((nf,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((nf,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (nf,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (nf,), jnp.float32)
        xf = x.astype(jnp.float32)
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(jnp.square(xf - mean), axis=red)
            if not self.is_initializing():
                n = x.size // nf
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


class ConvBnRelu(nn.Module):
    """Conv + BatchNorm + ReLU (reference cnn_transformer.py:8-20)."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)

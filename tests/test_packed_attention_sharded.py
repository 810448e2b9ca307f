"""The packed Pallas kernel under SPMD sharding — the production multi-chip
configuration (data-parallel batch sharding over a mesh).

Runs on the 8-virtual-CPU-device mesh from conftest; the kernel executes in
interpret mode per shard. Validates that the custom_vjp pallas_call
composes with jit + sharding constraints: each device sees its local batch
of windows and results/gradients match the single-device reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmde_tpu.ops.window_attention_packed import (
    attention_plan, cosine_window_attention_packed, pack_rpe_bias)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("data",))


def _inputs(B=8, nH=4, N=16, Dh=32):
    C = nH * Dh
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qkv = jax.random.normal(ks[0], (B, N, 3 * C), jnp.float32)
    ls = jax.random.normal(ks[1], (nH, 1, 1), jnp.float32) * 0.3 + 1.0
    bias = jax.random.normal(ks[2], (N, N, nH), jnp.float32)
    return qkv, ls, bias


def _apply(qkv, ls, bias, nH):
    C = qkv.shape[-1] // 3
    _, Np, _, HG, nG, _ = attention_plan(qkv.shape[1], nH, C // nH, C)
    bp = pack_rpe_bias(bias, nG, HG, Np)
    return cosine_window_attention_packed(qkv, ls, bp, None, num_heads=nH)


def test_forward_batch_sharded(mesh):
    qkv, ls, bias = _inputs()
    want = _apply(qkv, ls, bias, 4)

    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))
    ls_sh = jax.device_put(ls, NamedSharding(mesh, P()))
    bias_sh = jax.device_put(bias, NamedSharding(mesh, P()))
    got = jax.jit(lambda q, l, b: _apply(q, l, b, 4))(qkv_sh, ls_sh, bias_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_batch_sharded(mesh):
    qkv, ls, bias = _inputs()

    def loss(q, l, b):
        return jnp.sum(jnp.tanh(_apply(q, l, b, 4)))

    want = jax.grad(loss, argnums=(0, 1, 2))(qkv, ls, bias)

    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))
    ls_sh = jax.device_put(ls, NamedSharding(mesh, P()))
    bias_sh = jax.device_put(bias, NamedSharding(mesh, P()))
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qkv_sh, ls_sh, bias_sh)
    for a, b, name in zip(got, want, ["dqkv", "dls", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)

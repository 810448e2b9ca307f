"""Full SwinBlock numerical parity against an independent torch functional
re-derivation (post-norm variant): shared weights, same input, rtol 1e-4.

Covers the residual/norm ordering (x + norm1(attn), x + norm2(mlp)), the
window partition/shift bookkeeping, cosine attention with the continuous
RPE, and the q/v-only bias — the riskiest parity surface of the rebuild.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mmde_tpu.nn.swin_v2 import SwinBlock, relative_coords_table, \
    relative_position_index, shifted_window_mask


def _params_to_torch(p):
    t = {}

    def walk(d, prefix):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                t["/".join(prefix + (k,))] = torch.from_numpy(np.asarray(v))
    walk(p, ())
    return t


def torch_swin_block(x_np, p, *, ws, nH, shift, Wh_pre, mask_np=None):
    """Functional torch forward of one post-norm swin block (independent
    re-derivation from the SwinV2 paper formulas)."""
    x = torch.from_numpy(x_np).double()
    tp = {k: v.double() for k, v in _params_to_torch(p).items()}
    B, H, W, C = x.shape

    def layer_norm(y, name):
        return torch.nn.functional.layer_norm(
            y, (C,), tp[f"{name}/LayerNorm_0/scale"],
            tp[f"{name}/LayerNorm_0/bias"], eps=1e-6)  # ref :1038 partial

    shortcut = x
    s = x
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        s = torch.nn.functional.pad(s, (0, 0, 0, pad_r, 0, pad_b))
    Hp, Wp = H + pad_b, W + pad_r
    if shift:
        s = torch.roll(s, (-shift, -shift), (1, 2))
    win = s.reshape(B, Hp // ws, ws, Wp // ws, ws, C).permute(
        0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)

    # attention
    N = ws * ws
    qkv = win @ tp["attn/qkv/kernel"]
    bias_vec = torch.cat([tp["attn/q_bias"],
                          torch.zeros_like(tp["attn/q_bias"]),
                          tp["attn/v_bias"]])
    qkv = qkv + bias_vec
    Dh = C // nH
    qkv = qkv.reshape(-1, N, 3, nH, Dh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = torch.nn.functional.normalize(q, dim=-1)
    k = torch.nn.functional.normalize(k, dim=-1)
    scale = torch.clamp(tp["attn/logit_scale"],
                        max=float(np.log(100.0))).exp()
    attn = (q @ k.transpose(-2, -1)) * scale

    coords = torch.from_numpy(
        relative_coords_table((ws, ws), Wh_pre, "norm8_log_bylayer")).double()
    h1 = torch.relu(coords @ tp["attn/rpe_fc1/kernel"] +
                    tp["attn/rpe_fc1/bias"])
    table = h1 @ tp["attn/rpe_fc2/kernel"]
    idx = torch.from_numpy(relative_position_index((ws, ws)).astype(np.int64))
    bias = table[idx.reshape(-1)].reshape(N, N, nH).permute(2, 0, 1)
    attn = attn + (16 * torch.sigmoid(bias))[None]
    if mask_np is not None and shift:
        m = torch.from_numpy(mask_np).double()
        nW = m.shape[0]
        attn = attn.reshape(-1, nW, nH, N, N) + m[None, :, None]
        attn = attn.reshape(-1, nH, N, N)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(-1, N, C)
    out = out @ tp["attn/proj/kernel"] + tp["attn/proj/bias"]

    s = out.reshape(B, Hp // ws, Wp // ws, ws, ws, C).permute(
        0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift:
        s = torch.roll(s, (shift, shift), (1, 2))
    s = s[:, :H, :W]

    x = shortcut + layer_norm(s, "norm1")
    shortcut = x
    y = x @ tp["mlp/fc1/kernel"] + tp["mlp/fc1/bias"]
    y = torch.nn.functional.gelu(y)
    y = y @ tp["mlp/fc2/kernel"] + tp["mlp/fc2/bias"]
    y = layer_norm(y, "norm2")
    return (shortcut + y).numpy()


class TestSwinBlockOracle:
    @pytest.mark.parametrize("shift", [0, 2])
    def test_postnorm_block_matches_torch(self, shift):
        ws, nH, C = 4, 2, 16
        H = W = 8
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, H, W, C)).astype(np.float32)

        blk = SwinBlock(dim=C, num_heads=nH, window_size=ws,
                        shift_size=shift, drop_path_rate=0.0, postnorm=True,
                        pretrain_window_size=4, attn_impl="xla")
        mask = shifted_window_mask(H, W, ws, ws // 2) if shift else None
        variables = blk.init({"params": jax.random.PRNGKey(1)},
                             jnp.asarray(x),
                             jnp.asarray(mask) if mask is not None else None)
        ours = np.asarray(blk.apply(variables, jnp.asarray(x),
                                    jnp.asarray(mask) if mask is not None
                                    else None))

        expect = torch_swin_block(
            x.astype(np.float64),
            jax.tree.map(np.asarray, variables["params"]),
            ws=ws, nH=nH, shift=shift, Wh_pre=4, mask_np=mask)
        np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)

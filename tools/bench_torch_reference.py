#!/usr/bin/env python
"""Measure the PyTorch reference-equivalent throughput on this machine.

The reference repo publishes no benchmark numbers (BASELINE.md), so the
speedup target has to be anchored empirically. This script builds a compact
PyTorch model architecturally equivalent to the reference's flagship
training config (SwinV2-base two-frame encoder + bidirectional decoder —
same depths/heads/windows/cosine-attention/MLP-RPE structure, standard
torch.nn modules) and times full training steps (forward + SiLog/pose loss
+ backward + AdamW) at the same 480x640 shapes bench.py uses.

Only CPU is available in this container (the reference targeted an
unspecified single GPU, train.py:93-97), so the result is recorded with its
hardware tag and bench.py reports vs_baseline against it explicitly as
"vs torch-cpu reference equivalent".

Writes reference_baseline.json next to bench.py.
Env: MMDE_REF_BATCH (default 1), MMDE_REF_STEPS (default 2),
MMDE_REF_SMALL=1 for a quick sanity shape.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# compact SwinV2 (architecturally matched: cosine attention, MLP-RPE,
# shifted windows, post-norm, patch merging)
# ---------------------------------------------------------------------------

class WindowAttention(nn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.logit_scale = nn.Parameter(torch.log(10 * torch.ones(heads, 1, 1)))
        self.rpe = nn.Sequential(nn.Linear(2, 512), nn.ReLU(),
                                 nn.Linear(512, heads, bias=False))
        ws = window
        ch = torch.arange(-(ws - 1), ws, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(ch, ch, indexing="ij"), -1)
        table = table / (ws - 1) * 8
        table = torch.sign(table) * torch.log2(table.abs() + 1) / math.log2(8)
        self.register_buffer("table", table.reshape(-1, 2))
        coords = torch.stack(torch.meshgrid(torch.arange(ws),
                                            torch.arange(ws), indexing="ij"))
        flat = coords.flatten(1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0)
        rel += ws - 1
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        self.register_buffer("idx", idx.reshape(-1))
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B, N, C = x.shape
        bias_vec = torch.cat([self.q_bias, torch.zeros_like(self.v_bias),
                              self.v_bias])
        qkv = F.linear(x, self.qkv.weight, bias_vec)
        qkv = qkv.reshape(B, N, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        scale = torch.clamp(self.logit_scale, max=math.log(100.0)).exp()
        attn = (q @ k.transpose(-2, -1)) * scale
        bias = self.rpe(self.table)[self.idx].reshape(N, N, self.heads)
        attn = attn + 16 * torch.sigmoid(bias.permute(2, 0, 1))[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B // nW, nW, self.heads, N, N) + \
                mask[None, :, None]
            attn = attn.view(B, self.heads, N, N)
        attn = attn.softmax(-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class Block(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.attn = WindowAttention(dim, window, heads)
        self.norm1 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Linear(4 * dim, dim))
        self.norm2 = nn.LayerNorm(dim)

    def forward(self, x, H, W, mask):
        B, L, C = x.shape
        ws = self.window
        s = x.view(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            s = F.pad(s, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        if self.shift:
            s = torch.roll(s, (-self.shift, -self.shift), (1, 2))
        win = s.view(B, Hp // ws, ws, Wp // ws, ws, C).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
        win = self.attn(win, mask if self.shift else None)
        s = win.view(B, Hp // ws, Wp // ws, ws, ws, C).permute(
            0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if self.shift:
            s = torch.roll(s, (self.shift, self.shift), (1, 2))
        s = s[:, :H, :W].reshape(B, L, C)
        x = x + self.norm1(s)
        return x + self.norm2(self.mlp(x))


def make_mask(H, W, ws, ss):
    Hp = -(-H // ws) * ws
    Wp = -(-W // ws) * ws
    img = torch.zeros(Hp, Wp)
    cnt = 0
    for hs in (slice(0, Hp - ws), slice(Hp - ws, Hp - ss), slice(Hp - ss, Hp)):
        for wsl in (slice(0, Wp - ws), slice(Wp - ws, Wp - ss),
                    slice(Wp - ss, Wp)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.view(Hp // ws, ws, Wp // ws, ws).permute(0, 2, 1, 3) \
        .reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))


class SwinEquivalent(nn.Module):
    def __init__(self, embed=128, depths=(2, 2, 18, 2),
                 heads=(4, 8, 16, 32), windows=(30, 30, 30, 15),
                 shifts=(True, True, False, False)):
        super().__init__()
        self.patch = nn.Conv2d(3, embed, 4, 4)
        self.stages = nn.ModuleList()
        self.merges = nn.ModuleList()
        self.cfg = list(zip(depths, heads, windows, shifts))
        dim = embed
        for si, (d, h, w, sh) in enumerate(self.cfg):
            blocks = nn.ModuleList(
                Block(dim, h, w, (w // 2 if (i % 2 and sh) else 0))
                for i in range(d))
            self.stages.append(blocks)
            if si < len(self.cfg) - 1:
                self.merges.append(nn.Linear(4 * dim, 2 * dim, bias=False))
                dim *= 2
        self.out_dim = dim

    def forward(self, x):
        x = self.patch(x)
        B, C, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        for si, blocks in enumerate(self.stages):
            w = self.cfg[si][2]
            mask = make_mask(H, W, w, w // 2).to(x.device)
            for blk in blocks:
                x = blk(x, H, W, mask)
            if si < len(self.stages) - 1:
                s = x.view(B, H, W, -1)
                if H % 2 or W % 2:
                    s = F.pad(s, (0, 0, 0, W % 2, 0, H % 2))
                x = torch.cat([s[:, 0::2, 0::2], s[:, 1::2, 0::2],
                               s[:, 0::2, 1::2], s[:, 1::2, 1::2]], -1)
                H, W = (H + 1) // 2, (W + 1) // 2
                x = self.merges[si](x.view(B, H * W, -1))
        return x.transpose(1, 2).view(B, -1, H, W)


class DecoderEquivalent(nn.Module):
    def __init__(self, cin, cout, max_depth=10.0):
        super().__init__()
        self.max_depth = max_depth
        c = cin * 2
        self.pose = nn.Sequential(
            nn.Conv2d(c, c, 3, 1, 1), nn.BatchNorm2d(c), nn.ReLU(),
            nn.Conv2d(c, c, 3, 2, 1), nn.BatchNorm2d(c), nn.ReLU(),
            nn.Conv2d(c, c, 3, 1, 1), nn.BatchNorm2d(c), nn.ReLU(),
            nn.Conv2d(c, c, 3, 2, 1), nn.BatchNorm2d(c), nn.ReLU(),
            nn.Conv2d(c, c, 3, 1, 1), nn.BatchNorm2d(c), nn.ReLU(),
            nn.AdaptiveAvgPool2d(1), nn.Flatten())
        self.rot = nn.Sequential(nn.Linear(c, c // 2), nn.ReLU(),
                                 nn.Linear(c // 2, c // 4), nn.ReLU(),
                                 nn.Linear(c // 4, 9))
        self.trans = nn.Sequential(nn.Linear(c, c // 2), nn.ReLU(),
                                   nn.Linear(c // 2, c // 4), nn.ReLU(),
                                   nn.Linear(c // 4, 3))
        deconv = []
        inp = c
        for _ in range(3):
            deconv += [nn.ConvTranspose2d(inp, 32, 2, 2, bias=False),
                       nn.BatchNorm2d(32), nn.ReLU()]
            inp = 32
        self.deconv = nn.Sequential(*deconv)
        self.convs = nn.Sequential(nn.Conv2d(32, cout * 2, 3, 1, 1),
                                   nn.BatchNorm2d(cout * 2), nn.ReLU())
        self.head = nn.Sequential(nn.Conv2d(cout * 2, cout * 2, 3, 1, 1),
                                  nn.ReLU(),
                                  nn.Conv2d(cout * 2, 1, 3, 1, 1))

    def forward(self, f1, f2):
        def one(fa, fb):
            feats = torch.cat([fa, fb], 1)
            p = self.pose(feats)
            r, t = self.rot(p), self.trans(p)
            d = self.convs(self.deconv(feats))
            d = F.interpolate(d, scale_factor=2, mode="bilinear")
            d = F.interpolate(d, scale_factor=2, mode="bilinear")
            d = torch.sigmoid(self.head(d)) * self.max_depth
            return d, r, t
        d1, r12, t12 = one(f1, f2)
        d2, r21, t21 = one(f2, f1)
        return d1, r12, t12, d2, r21, t21


class TwoFrameEquivalent(nn.Module):
    def __init__(self, small=False):
        super().__init__()
        if small:
            self.encoder = SwinEquivalent(32, (2, 2, 2, 2), (2, 2, 4, 4),
                                          (6, 6, 6, 3))
        else:
            self.encoder = SwinEquivalent()
        self.decoder = DecoderEquivalent(self.encoder.out_dim, 128)

    def forward(self, x1, x2):
        f = self.encoder(torch.cat([x1, x2]))
        f1, f2 = f.chunk(2, 0)
        return self.decoder(f1, f2)


def silog(pred, target):
    valid = target > 0
    d = torch.log(target[valid]) - torch.log(pred[valid].clamp_min(1e-6))
    return torch.sqrt((d ** 2).mean() - 0.5 * d.mean() ** 2)


def main():
    small = os.environ.get("MMDE_REF_SMALL") == "1"
    B = int(os.environ.get("MMDE_REF_BATCH", "2" if small else "1"))
    steps = int(os.environ.get("MMDE_REF_STEPS", "2"))
    # small shapes must keep the pose branch's stride-64 feature >= 2x2 so
    # BatchNorm has statistics at batch 1
    H, W = (128, 192) if small else (480, 640)

    torch.manual_seed(0)
    model = TwoFrameEquivalent(small)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"torch reference-equivalent params: {n_params/1e6:.1f}M")
    opt = torch.optim.AdamW(model.parameters(), lr=5e-4, weight_decay=0.05)

    x1 = torch.rand(B, 3, H, W)
    x2 = torch.rand(B, 3, H, W)
    gt1 = torch.rand(B, H, W) * 10
    gt2 = torch.rand(B, H, W) * 10
    R = torch.rand(B, 9)
    T = torch.rand(B, 3)

    def step():
        opt.zero_grad()
        d1, r12, t12, d2, r21, t21 = model(x1, x2)
        loss = (silog(d1.squeeze(1), gt1) + silog(d2.squeeze(1), gt2)) / 2 \
            + 100 * F.mse_loss(r12, R) + 100 * F.mse_loss(t12, T)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    ips = B * steps / dt
    print(f"torch-cpu reference equivalent: {ips:.4f} images/sec "
          f"({dt/steps:.1f}s/step, batch {B}, {H}x{W})")

    out = {
        "images_per_sec": ips,
        "hardware": "cpu (torch, this container; reference GPU unavailable)",
        "model": "swin_base_v2 two-frame + decoder_v2 equivalent",
        "shape": [B, H, W],
        "params_m": n_params / 1e6,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "reference_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()

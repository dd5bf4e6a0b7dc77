"""torchvision.models.video stub — plain-torch Swin3D (t/s/b) with
torchvision's exact state-dict layout (``patch_embed.{proj,norm}``,
``features.{0,2,4,6}.{i}.{norm1,attn.{qkv,proj,relative_position_bias_table},
norm2,mlp.0,mlp.3}``, ``features.{1,3,5}.{norm,reduction}``, ``norm``,
``head``) and torchvision's window/shift/pad/mask conventions — the same
network ``tests/test_swin3d_parity.py`` reconstructs and
``compat.torch_port.port_swin3d`` converts.

``weights=`` is accepted and IGNORED (random init; no network/cache in this
image) — fine for A/Bs that inject a full checkpoint afterwards
(``videoswintransformer/inference.py:65-91`` loads a state dict over the
freshly built model).
"""

import itertools

import torch
import torch.nn as nn


class Swin3D_T_Weights:
    KINETICS400_V1 = "KINETICS400_V1"
    DEFAULT = "KINETICS400_V1"


class Swin3D_S_Weights(Swin3D_T_Weights):
    pass


class Swin3D_B_Weights:
    KINETICS400_V1 = "KINETICS400_V1"
    KINETICS400_IMAGENET22K_V1 = "KINETICS400_IMAGENET22K_V1"
    DEFAULT = "KINETICS400_V1"


_WINDOW = (8, 7, 7)
_CONFIGS = {  # torchvision swin3d_{t,s,b}
    "t": dict(embed=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24)),
    "s": dict(embed=96, depths=(2, 2, 18, 2), heads=(3, 6, 12, 24)),
    "b": dict(embed=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32)),
}


def _relative_position_index(window, full_window):
    ft, fh, fw = full_window
    coords = torch.stack(torch.meshgrid(
        torch.arange(window[0]), torch.arange(window[1]),
        torch.arange(window[2]), indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ft - 1
    rel[:, :, 1] += fh - 1
    rel[:, :, 2] += fw - 1
    rel[:, :, 0] *= (2 * fh - 1) * (2 * fw - 1)
    rel[:, :, 1] *= 2 * fw - 1
    return rel.sum(-1)


def _adjust(size_dhw, window, shift):
    win, sh = list(window), list(shift)
    for i in range(3):
        if size_dhw[i] <= window[i]:
            win[i] = size_dhw[i]
            sh[i] = 0
    return tuple(win), tuple(sh)


class _ShiftedWindowAttention3d(nn.Module):
    def __init__(self, dim, num_heads, window, shift):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.window, self.shift = window, shift
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        ft, fh, fw = window
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ft - 1) * (2 * fh - 1) * (2 * fw - 1), num_heads))

    def forward(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        window, shift = _adjust((t, h, w), self.window, self.shift)
        wt, wh, ww = window
        pt, ph, pw = (wt - t % wt) % wt, (wh - h % wh) % wh, (ww - w % ww) % ww
        x = torch.nn.functional.pad(x, (0, 0, 0, pw, 0, ph, 0, pt))
        tp, hp, wp = t + pt, h + ph, w + pw
        if any(shift):
            x = torch.roll(x, shifts=(-shift[0], -shift[1], -shift[2]),
                           dims=(1, 2, 3))
        n = wt * wh * ww
        xw = x.view(b, tp // wt, wt, hp // wh, wh, wp // ww, ww, c)
        xw = xw.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, n, c)

        qkv = self.qkv(xw).reshape(-1, n, 3, self.num_heads,
                                   c // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (c // self.num_heads) ** -0.5) @ k.transpose(-2, -1)

        idx = _relative_position_index(window, self.window).reshape(-1)
        bias = self.relative_position_bias_table[idx].reshape(
            n, n, self.num_heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)

        if any(shift):
            img = torch.zeros((tp, hp, wp), dtype=torch.int32)
            cnt = 0
            segs = []
            for dim_, (wsz, s) in zip((tp, hp, wp), zip(window, shift)):
                segs.append([slice(0, dim_)] if s == 0 else
                            [slice(0, dim_ - wsz),
                             slice(dim_ - wsz, dim_ - s),
                             slice(dim_ - s, dim_)])
            for st, sh_, sw in itertools.product(*segs):
                img[st, sh_, sw] = cnt
                cnt += 1
            wins = img.view(tp // wt, wt, hp // wh, wh, wp // ww, ww)
            wins = wins.permute(0, 2, 4, 1, 3, 5).reshape(-1, n)
            mask = (wins.unsqueeze(1) != wins.unsqueeze(2)).float() * -100.0
            nw = mask.shape[0]
            attn = attn.view(b, nw, self.num_heads, n, n) + mask.view(
                1, nw, 1, n, n)
            attn = attn.reshape(-1, self.num_heads, n, n)

        p = attn.softmax(dim=-1)
        out = (p @ v).transpose(1, 2).reshape(-1, n, c)
        out = self.proj(out)

        out = out.view(b, tp // wt, hp // wh, wp // ww, wt, wh, ww, c)
        out = out.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
        if any(shift):
            out = torch.roll(out, shifts=shift, dims=(1, 2, 3))
        return out[:, :t, :h, :w]


class _SwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = _ShiftedWindowAttention3d(dim, heads, window, shift)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(
            nn.Linear(dim, 4 * dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(4 * dim, dim), nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)

    def forward(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        x = torch.nn.functional.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        return self.reduction(self.norm(torch.cat([x0, x1, x2, x3], dim=-1)))


class _PatchEmbed(nn.Module):
    def __init__(self, embed):
        super().__init__()
        self.proj = nn.Conv3d(3, embed, (2, 4, 4), stride=(2, 4, 4))
        self.norm = nn.LayerNorm(embed, eps=1e-5)

    def forward(self, x):  # (B, C, T, H, W)
        x = self.proj(x).permute(0, 2, 3, 4, 1)
        return self.norm(x)


class _Swin3D(nn.Module):
    def __init__(self, size: str, num_classes: int = 400):
        super().__init__()
        cfg = _CONFIGS[size]
        self.patch_embed = _PatchEmbed(cfg["embed"])
        feats = []
        dim = cfg["embed"]
        for stage, depth in enumerate(cfg["depths"]):
            blocks = []
            for i in range(depth):
                shift = tuple(0 if i % 2 == 0 else wsz // 2
                              for wsz in _WINDOW)
                blocks.append(_SwinBlock(dim, cfg["heads"][stage],
                                         _WINDOW, shift))
            feats.append(nn.Sequential(*blocks))
            if stage < len(cfg["depths"]) - 1:
                feats.append(_PatchMerging(dim))
                dim *= 2
        self.features = nn.Sequential(*feats)
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):  # (B, C, T, H, W)
        x = self.patch_embed(x)
        x = self.features(x)
        x = self.norm(x)
        return self.head(x.mean(dim=(1, 2, 3)))


def swin3d_t(weights=None, progress=True, **kwargs):
    return _Swin3D("t", **kwargs)


def swin3d_s(weights=None, progress=True, **kwargs):
    return _Swin3D("s", **kwargs)


def swin3d_b(weights=None, progress=True, **kwargs):
    return _Swin3D("b", **kwargs)

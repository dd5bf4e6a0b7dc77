"""Swin3D logit parity vs a torch reimplementation of torchvision.

torchvision is absent in this image, so this test reconstructs
``torchvision.models.video.swin3d_t``'s architecture (the model the
reference fine-tunes, ``videoswintransformer/swin_video_classifier/models/
swin3d.py:7-53``) in plain torch, with torchvision's EXACT state-dict
layout (``patch_embed.{proj,norm}``, ``features.{0,2,4,6}.{i}.{norm1,
attn.qkv, attn.proj, attn.relative_position_bias_table, norm2, mlp.0,
mlp.3}``, ``features.{1,3,5}.{norm,reduction}``, ``norm``, ``head``).
Random weights flow through ``compat.torch_port.port_swin3d`` into the Flax
model and the logits must match — covering windowing, shift masks,
rel-pos-bias gather, patch-merge ordering, and head pooling end-to-end,
which the structural manifest tests cannot. The input (16, 224, 224) keeps
every stage's features >= the (8,7,7) window, so stages 1-3 exercise the
real shifted path while stage 4 exercises the clamp-to-size rule.
"""

import itertools

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax.numpy as jnp

from laryngeal_tpu.compat.torch_port import port_swin3d
from laryngeal_tpu.models.swin3d import create_swin3d


def torch_relative_position_index(window, full_window):
    """Independent reimplementation of torchvision's rel-pos index (the
    framework's version is deliberately NOT imported: a wrong-but-shape-valid
    permutation there must fail this parity test, not cancel out)."""
    wt, wh, ww = window
    ft, fh, fw = full_window
    coords = torch.stack(torch.meshgrid(
        torch.arange(wt), torch.arange(wh), torch.arange(ww), indexing="ij"))
    flat = torch.flatten(coords, 1)                      # (3, N)
    rel = flat[:, :, None] - flat[:, None, :]            # (3, N, N)
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ft - 1
    rel[:, :, 1] += fh - 1
    rel[:, :, 2] += fw - 1
    rel[:, :, 0] *= (2 * fh - 1) * (2 * fw - 1)
    rel[:, :, 1] *= 2 * fw - 1
    return rel.sum(-1)                                   # (N, N)

WINDOW = (8, 7, 7)
DEPTHS = (2, 2, 6, 2)
HEADS = (3, 6, 12, 24)
EMBED = 96


def _adjust(size_dhw, window, shift):
    win, sh = list(window), list(shift)
    for i in range(3):
        if size_dhw[i] <= window[i]:
            win[i] = size_dhw[i]
            sh[i] = 0
    return tuple(win), tuple(sh)


class TorchShiftedWindowAttention3d(tnn.Module):
    def __init__(self, dim, num_heads, window, shift):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.window, self.shift = window, shift
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        ft, fh, fw = window
        self.relative_position_bias_table = tnn.Parameter(
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

        qkv = self.qkv(xw).reshape(-1, n, 3, self.num_heads, c // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (c // self.num_heads) ** -0.5) @ k.transpose(-2, -1)

        idx = torch_relative_position_index(window, self.window).reshape(-1)
        bias = self.relative_position_bias_table[idx].reshape(
            n, n, self.num_heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)

        if any(shift):
            img = torch.zeros((tp, hp, wp), dtype=torch.int32)
            cnt = 0
            segs = []
            for dim_, (wsz, s) in zip((tp, hp, wp), zip(window, shift)):
                segs.append([slice(0, dim_)] if s == 0 else
                            [slice(0, dim_ - wsz), slice(dim_ - wsz, dim_ - s),
                             slice(dim_ - s, dim_)])
            for st, sh_, sw in itertools.product(*segs):
                img[st, sh_, sw] = cnt
                cnt += 1
            wins = img.view(tp // wt, wt, hp // wh, wh, wp // ww, ww)
            wins = wins.permute(0, 2, 4, 1, 3, 5).reshape(-1, n)
            mask = (wins.unsqueeze(1) != wins.unsqueeze(2)).float() * -100.0
            nw = mask.shape[0]
            attn = attn.view(b, nw, self.num_heads, n, n) + mask.view(1, nw, 1, n, n)
            attn = attn.reshape(-1, self.num_heads, n, n)

        p = attn.softmax(dim=-1)
        out = (p @ v).transpose(1, 2).reshape(-1, n, c)
        out = self.proj(out)

        out = out.view(b, tp // wt, hp // wh, wp // ww, wt, wh, ww, c)
        out = out.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
        if any(shift):
            out = torch.roll(out, shifts=shift, dims=(1, 2, 3))
        return out[:, :t, :h, :w]


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchShiftedWindowAttention3d(dim, heads, window, shift)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Sequential(
            tnn.Linear(dim, 4 * dim), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(4 * dim, dim), tnn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim, eps=1e-5)

    def forward(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        x = torch.nn.functional.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        return self.reduction(self.norm(torch.cat([x0, x1, x2, x3], dim=-1)))


class TorchPatchEmbed(tnn.Module):
    def __init__(self):
        super().__init__()
        self.proj = tnn.Conv3d(3, EMBED, (2, 4, 4), stride=(2, 4, 4))
        self.norm = tnn.LayerNorm(EMBED, eps=1e-5)

    def forward(self, x):  # (B, C, T, H, W)
        x = self.proj(x).permute(0, 2, 3, 4, 1)  # (B, T, H, W, C)
        return self.norm(x)


class TorchSwin3dT(tnn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        self.patch_embed = TorchPatchEmbed()
        feats = []
        dim = EMBED
        for stage, depth in enumerate(DEPTHS):
            blocks = []
            for i in range(depth):
                shift = tuple(0 if i % 2 == 0 else wsz // 2 for wsz in WINDOW)
                blocks.append(TorchSwinBlock(dim, HEADS[stage], WINDOW, shift))
            feats.append(tnn.Sequential(*blocks))
            if stage < len(DEPTHS) - 1:
                feats.append(TorchPatchMerging(dim))
                dim *= 2
        self.features = tnn.Sequential(*feats)
        self.norm = tnn.LayerNorm(dim, eps=1e-5)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):  # (B, C, T, H, W)
        x = self.patch_embed(x)
        x = self.features(x)
        x = self.norm(x)
        return self.head(x.mean(dim=(1, 2, 3)))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf = TorchSwin3dT(num_classes=2).eval()
    with torch.no_grad():
        for m in hf.modules():
            if isinstance(m, TorchShiftedWindowAttention3d):
                m.relative_position_bias_table.normal_(0, 0.02)
    state = {k: v.detach() for k, v in hf.state_dict().items()}
    params = port_swin3d(state, depths=DEPTHS)
    return hf, params


def test_swin3d_logit_parity(pair):
    hf, params = pair
    rng = np.random.default_rng(3)
    video = rng.normal(0, 1, (1, 16, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        expected = hf(torch.from_numpy(video).permute(0, 4, 1, 2, 3)).numpy()
    model = create_swin3d("tiny", num_classes=2)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(video),
                                 train=False))
    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-3)


def test_param_tree_matches_init(pair):
    import jax

    _, params = pair
    model = create_swin3d("tiny", num_classes=2)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 224, 224, 3), jnp.float32))["params"]
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(params))
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(init)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        assert va.shape == vb.shape, (pa, va.shape, vb.shape)

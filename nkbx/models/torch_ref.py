"""torch ``nn.Module`` replicas emitting timm/torchvision/unicom-layout
``state_dict()``s for EVERY nkbx registry backbone.

These are independent re-derivations of the upstream key layouts (timm's
efficientnet-builder naming, torchvision densenet's Sequential-of-OrderedDict,
microsoft Swin, deepglint unicom) built from real ``torch.nn`` containers, so
the state_dict KEYS come out of torch's own auto-naming mechanics
(``nn.Sequential`` indices, nested attribute paths, BN's
``num_batches_tracked``) rather than hand-written string dicts — the strongest
key-layout evidence available without network access to the real packages
(see MIGRATING.md for the one-command validation to run on a networked host).

Two consumers: the converter parity tests (tests/test_convert.py pins every
registry name's layout against :func:`nkbx.models.convert.convert_torch_state_dict`)
and :mod:`nkbx.models.reverse`, which uses :func:`build_replica` as the
torch-side template when exporting TPU-trained nkbx weights BACK to the
torch/reference layouts.

Sizing arithmetic (channel rounding) is imported from the nkbx models so the
replicas produce the exact shapes the converters must map; the LAYOUT is the
pinned contract. Requires torch (baked in here; an optional dep in
production — everything else in nkbx.models imports without it).
"""

from __future__ import annotations

import math

import torch
from torch import nn

from nkbx.models.common import make_divisible
from nkbx.models.efficientnet import (_B0_SPEC, V2_L_SPEC, V2_M_SPEC, V2_S_SPEC,
                                      _round_channels, _round_repeats)
from nkbx.models.mobilenetv3 import _LARGE_SPEC, _SMALL_SPEC


def _bn(c):
    return nn.BatchNorm2d(c)


def _conv(i, o, k, s=1, p=None, groups=1, bias=False):
    if p is None:
        p = k // 2
    return nn.Conv2d(i, o, k, s, p, groups=groups, bias=bias)


# ---------------------------------------------------------------------------
# ResNet family (timm resnet.py naming)
# ---------------------------------------------------------------------------


class _TimmSE(nn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd, 1, bias=True)
        self.fc2 = nn.Conv2d(rd, ch, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))


def _downsample(inp, out, stride, avg_down):
    """timm downsample shortcut: strided 1x1 conv (classic) or
    AvgPool/Identity + 1x1/s1 conv (avg_down, the 'd' variants — conv/bn land
    at Sequential indices 1/2)."""
    if not avg_down:
        return nn.Sequential(_conv(inp, out, 1, stride, 0), _bn(out))
    pool = (nn.AvgPool2d(2, stride, ceil_mode=True, count_include_pad=False)
            if stride > 1 else nn.Identity())
    return nn.Sequential(pool, _conv(inp, out, 1, 1, 0), _bn(out))


class _TimmBasicBlock(nn.Module):
    def __init__(self, inp, planes, stride, avg_down=False):
        super().__init__()
        self.conv1 = _conv(inp, planes, 3, stride)
        self.bn1 = _bn(planes)
        self.conv2 = _conv(planes, planes, 3, 1)
        self.bn2 = _bn(planes)
        if stride != 1 or inp != planes:
            self.downsample = _downsample(inp, planes, stride, avg_down)

    def forward(self, x):
        sc = self.downsample(x) if hasattr(self, "downsample") else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + sc)


class _TimmBottleneck(nn.Module):
    def __init__(self, inp, planes, stride, cardinality=1, base_width=64,
                 se_ratio=0.0, avg_down=False):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * cardinality
        out = planes * 4
        self.conv1 = _conv(inp, width, 1, 1, 0)
        self.bn1 = _bn(width)
        self.conv2 = _conv(width, width, 3, stride, groups=cardinality)
        self.bn2 = _bn(width)
        self.conv3 = _conv(width, out, 1, 1, 0)
        self.bn3 = _bn(out)
        if se_ratio > 0:
            self.se = _TimmSE(out, int(out * se_ratio))
        if stride != 1 or inp != out:
            self.downsample = _downsample(inp, out, stride, avg_down)

    def forward(self, x):
        sc = self.downsample(x) if hasattr(self, "downsample") else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if hasattr(self, "se"):
            y = self.se(y)
        return torch.relu(y + sc)


class TimmResNet(nn.Module):
    def __init__(self, stage_sizes, bottleneck, tiered=False, stem_width=64,
                 cardinality=1, base_width=64, se_ratio=0.0, deep=False,
                 avg_down=False):
        super().__init__()
        if tiered or deep:
            # tiered ('t'): (3w/4, w, 2w) channels; deep ('d'): (w, w, 2w) —
            # identical Sequential key layout (convs at 0/3/6)
            w = stem_width
            c0 = 3 * w // 4 if tiered else w
            self.conv1 = nn.Sequential(
                _conv(3, c0, 3, 2), _bn(c0), nn.ReLU(inplace=True),
                _conv(c0, w, 3, 1), _bn(w), nn.ReLU(inplace=True),
                _conv(w, 2 * w, 3, 1))
            stem_out = 2 * w
        else:
            self.conv1 = _conv(3, stem_width, 7, 2)
            stem_out = stem_width
        self.bn1 = _bn(stem_out)
        inp = stem_out
        for stage, n in enumerate(stage_sizes):
            planes = 64 * (2 ** stage)
            blocks = []
            for b in range(n):
                stride = 2 if stage > 0 and b == 0 else 1
                if bottleneck:
                    blk = _TimmBottleneck(inp, planes, stride, cardinality,
                                          base_width, se_ratio,
                                          avg_down=avg_down)
                    inp = planes * 4
                else:
                    blk = _TimmBasicBlock(inp, planes, stride,
                                          avg_down=avg_down)
                    inp = planes
                blocks.append(blk)
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
        self.n_stages = len(stage_sizes)
        self.fc = nn.Linear(inp, 1000)  # dropped by the converter

    def forward(self, x):
        """Pooled backbone features (timm forward_features + global pool; the
        ``fc`` layout member is NOT applied — nkbx heads replace it)."""
        x = self.conv1(x)
        x = torch.relu(self.bn1(x))
        x = nn.functional.max_pool2d(x, 3, 2, 1)
        for stage in range(self.n_stages):
            x = getattr(self, f"layer{stage + 1}")(x)
        return x.mean((2, 3))


# ---------------------------------------------------------------------------
# timm efficientnet-builder blocks (mobilenetv3 + efficientnet B/V2 share them)
# ---------------------------------------------------------------------------


class _TimmBuilderSE(nn.Module):
    def __init__(self, ch, rd, act=torch.relu, gate=None):
        super().__init__()
        self.conv_reduce = nn.Conv2d(ch, rd, 1, bias=True)
        self.conv_expand = nn.Conv2d(rd, ch, 1, bias=True)
        self._act, self._gate = act, gate or nn.functional.hardsigmoid

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * self._gate(self.conv_expand(self._act(self.conv_reduce(s))))


class _TimmDepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv: conv_dw/bn1 [+ se] + conv_pw/bn2."""

    def __init__(self, inp, out, k, stride, se_rd=0, act=torch.relu,
                 se_act=torch.relu, se_gate=None):
        super().__init__()
        self.conv_dw = _conv(inp, inp, k, stride, groups=inp)
        self.bn1 = _bn(inp)
        if se_rd:
            self.se = _TimmBuilderSE(inp, se_rd, se_act, se_gate)
        self.conv_pw = _conv(inp, out, 1, 1, 0)
        self.bn2 = _bn(out)
        self._act = act
        self._skip = stride == 1 and inp == out

    def forward(self, x):
        y = self._act(self.bn1(self.conv_dw(x)))
        if hasattr(self, "se"):
            y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        return x + y if self._skip else y


class _TimmInvertedResidual(nn.Module):
    """timm InvertedResidual: conv_pw/bn1 + conv_dw/bn2 [+ se] + conv_pwl/bn3."""

    def __init__(self, inp, mid, out, k, stride, se_rd=0, act=torch.relu,
                 se_act=torch.relu, se_gate=None):
        super().__init__()
        self.conv_pw = _conv(inp, mid, 1, 1, 0)
        self.bn1 = _bn(mid)
        self.conv_dw = _conv(mid, mid, k, stride, groups=mid)
        self.bn2 = _bn(mid)
        if se_rd:
            self.se = _TimmBuilderSE(mid, se_rd, se_act, se_gate)
        self.conv_pwl = _conv(mid, out, 1, 1, 0)
        self.bn3 = _bn(out)
        self._act = act
        self._skip = stride == 1 and inp == out

    def forward(self, x):
        y = self._act(self.bn1(self.conv_pw(x)))
        y = self._act(self.bn2(self.conv_dw(y)))
        if hasattr(self, "se"):
            y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return x + y if self._skip else y


class _TimmConvBnAct(nn.Module):
    def __init__(self, inp, out, k, stride=1, act=torch.relu):
        super().__init__()
        self.conv = _conv(inp, out, k, stride)
        self.bn1 = _bn(out)
        self._act = act
        self._skip = stride == 1 and inp == out

    def forward(self, x):
        y = self._act(self.bn1(self.conv(x)))
        return x + y if self._skip else y


class _TimmEdgeResidual(nn.Module):
    """timm EdgeResidual (fused-MBConv, expand > 1): conv_exp/bn1 + conv_pwl/bn2."""

    def __init__(self, inp, mid, out, k, stride, act=torch.relu):
        super().__init__()
        self.conv_exp = _conv(inp, mid, k, stride)
        self.bn1 = _bn(mid)
        self.conv_pwl = _conv(mid, out, 1, 1, 0)
        self.bn2 = _bn(out)
        self._act = act
        self._skip = stride == 1 and inp == out

    def forward(self, x):
        y = self._act(self.bn1(self.conv_exp(x)))
        y = self.bn2(self.conv_pwl(y))
        return x + y if self._skip else y


class TimmMobileNetV3(nn.Module):
    def __init__(self, spec, stage_blocks, last_conv, head_features):
        super().__init__()
        self.conv_stem = _conv(3, 16, 3, 2)
        self.bn1 = _bn(16)
        flat = []
        inp = 16
        for k, e, o, use_se, act_name, s in spec:
            e, o = make_divisible(e), make_divisible(o)
            se_rd = make_divisible(e // 4) if use_se else 0
            act = nn.functional.hardswish if act_name == "hs" else torch.relu
            if e == inp:
                flat.append(_TimmDepthwiseSeparable(inp, o, k, s, se_rd, act=act))
            else:
                flat.append(_TimmInvertedResidual(inp, e, o, k, s, se_rd, act=act))
            inp = o
        stages, i = [], 0
        for n in stage_blocks:
            stages.append(nn.Sequential(*flat[i:i + n]))
            i += n
        assert i == len(flat), "stage split must cover every block"
        stages.append(nn.Sequential(_TimmConvBnAct(inp, last_conv, 1)))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(last_conv, head_features, 1, bias=True)
        self.classifier = nn.Linear(head_features, 1000)  # dropped

    def forward(self, x):
        hs = nn.functional.hardswish
        x = hs(self.bn1(self.conv_stem(x)))
        x = self.blocks[:-1](x)
        last = self.blocks[-1][0]
        x = hs(last.bn1(last.conv(x)))  # final ConvBnAct runs hardswish
        x = x.mean((2, 3), keepdim=True)
        return hs(self.conv_head(x)).flatten(1)


class TimmEfficientNet(nn.Module):
    def __init__(self, width_mult, depth_mult, stage_blocks):
        super().__init__()
        stem = _round_channels(32, width_mult)
        self.conv_stem = _conv(3, stem, 3, 2)
        self.bn1 = _bn(stem)
        stages = []
        inp = stem
        for si, (expand, k, stride, repeats, out) in enumerate(_B0_SPEC):
            out_c = _round_channels(out, width_mult)
            n = _round_repeats(repeats, depth_mult)
            assert n == stage_blocks[si], (si, n, stage_blocks[si])
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                se_rd = max(1, int(inp * 0.25))
                silu = nn.functional.silu
                if expand == 1:
                    blocks.append(_TimmDepthwiseSeparable(
                        inp, out_c, k, s, se_rd, act=silu, se_act=silu,
                        se_gate=torch.sigmoid))
                else:
                    blocks.append(_TimmInvertedResidual(
                        inp, inp * expand, out_c, k, s, se_rd, act=silu,
                        se_act=silu, se_gate=torch.sigmoid))
                inp = out_c
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        head = _round_channels(1280, width_mult)
        self.conv_head = _conv(inp, head, 1, 1, 0)
        self.bn2 = _bn(head)
        self.classifier = nn.Linear(head, 1000)  # dropped

    def forward(self, x):
        silu = nn.functional.silu
        x = silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = silu(self.bn2(self.conv_head(x)))
        return x.mean((2, 3))


class TimmEfficientNetV2(nn.Module):
    def __init__(self, spec, stem_width=24):
        super().__init__()
        self.conv_stem = _conv(3, stem_width, 3, 2)
        self.bn1 = _bn(stem_width)
        stages = []
        inp = stem_width
        for block, expand, k, stride, repeats, out, se in spec:
            blocks = []
            for b in range(repeats):
                s = stride if b == 0 else 1
                silu = nn.functional.silu
                if block == "fused":
                    if expand == 1:
                        blocks.append(_TimmConvBnAct(inp, out, k, s, act=silu))
                    else:
                        blocks.append(_TimmEdgeResidual(inp, inp * expand, out, k, s, act=silu))
                else:
                    se_rd = max(1, int(inp * se))
                    blocks.append(_TimmInvertedResidual(
                        inp, inp * expand, out, k, s, se_rd, act=silu,
                        se_act=silu, se_gate=torch.sigmoid))
                inp = out
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = _conv(inp, 1280, 1, 1, 0)
        self.bn2 = _bn(1280)
        self.classifier = nn.Linear(1280, 1000)  # dropped

    def forward(self, x):
        silu = nn.functional.silu
        x = silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = silu(self.bn2(self.conv_head(x)))
        return x.mean((2, 3))


# ---------------------------------------------------------------------------
# torchvision/timm DenseNet (shared Sequential-of-OrderedDict naming)
# ---------------------------------------------------------------------------


class _DenseLayer(nn.Module):
    def __init__(self, inp, growth, bn_size=4):
        super().__init__()
        self.norm1 = _bn(inp)
        self.conv1 = _conv(inp, bn_size * growth, 1, 1, 0)
        self.norm2 = _bn(bn_size * growth)
        self.conv2 = _conv(bn_size * growth, growth, 3, 1)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class TorchDenseNet(nn.Module):
    def __init__(self, block_config, growth=32, init_features=64):
        super().__init__()
        from collections import OrderedDict

        feats = OrderedDict()
        feats["conv0"] = _conv(3, init_features, 7, 2)
        feats["norm0"] = _bn(init_features)
        c = init_features
        for bi, n_layers in enumerate(block_config, start=1):
            block = nn.Module()
            for li in range(1, n_layers + 1):
                block.add_module(f"denselayer{li}", _DenseLayer(c, growth))
                c += growth
            feats[f"denseblock{bi}"] = block
            if bi != len(block_config):
                tr = nn.Module()
                tr.add_module("norm", _bn(c))
                tr.add_module("conv", _conv(c, c // 2, 1, 1, 0))
                feats[f"transition{bi}"] = tr
                c //= 2
        feats["norm5"] = _bn(c)
        self.features = nn.Sequential(feats)
        self.n_blocks = len(block_config)
        self.classifier = nn.Linear(c, 1000)  # dropped

    def forward(self, x):
        f = self.features
        x = torch.relu(f.norm0(f.conv0(x)))
        x = nn.functional.max_pool2d(x, 3, 2, 1)
        for bi in range(1, self.n_blocks + 1):
            block = getattr(f, f"denseblock{bi}")
            for layer in block.children():
                x = layer(x)
            if bi != self.n_blocks:
                tr = getattr(f, f"transition{bi}")
                x = tr.conv(torch.relu(tr.norm(x)))
                x = nn.functional.avg_pool2d(x, 2, 2)
        return torch.relu(f.norm5(x)).mean((2, 3))


# ---------------------------------------------------------------------------
# timm ConvNeXt
# ---------------------------------------------------------------------------


class _ConvNeXtBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim, bias=True)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):
        y = self.conv_dw(x).permute(0, 2, 3, 1)
        y = self.norm(y)
        y = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(y)))
        return x + (y * self.gamma).permute(0, 3, 1, 2)


class TimmConvNeXt(nn.Module):
    def __init__(self, depths, dims):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(3, dims[0], 4, 4, bias=True),
                                  nn.LayerNorm(dims[0], eps=1e-6))
        stages = []
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if s > 0:
                stage.downsample = nn.Sequential(
                    nn.LayerNorm(dims[s - 1], eps=1e-6),
                    nn.Conv2d(dims[s - 1], dim, 2, 2, bias=True))
            stage.blocks = nn.Sequential(*[_ConvNeXtBlock(dim) for _ in range(depth)])
            stages.append(stage)
        self.stages = nn.Sequential(*stages)
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(dims[-1], eps=1e-6)  # consumed as head_norm
        self.head.fc = nn.Linear(dims[-1], 1000)  # dropped

    def forward(self, x):
        x = self.stem[0](x)
        x = self.stem[1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                x = stage.downsample[0](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.downsample[1](x)
            x = stage.blocks(x)
        return self.head.norm(x.mean((2, 3)))


# ---------------------------------------------------------------------------
# timm ViT / deepglint unicom
# ---------------------------------------------------------------------------


class _TorchViTBlock(nn.Module):
    def __init__(self, dim, mlp_ratio=4, heads=None, eps=1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.attn.proj = nn.Linear(dim, dim, bias=True)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, mlp_ratio * dim)
        self.mlp.fc2 = nn.Linear(mlp_ratio * dim, dim)
        self._heads = heads or dim // 64

    def forward(self, x):
        # batch-polymorphic under torch.jit.trace: only STATIC dims (n, d) are
        # taken from x.shape (constant-folded, correctly); the batch dim is
        # always -1, so the traced graph serves any batch size (dynamic-batch
        # ONNX/TorchScript exports — reference export.py:169-176 contract)
        n, d = x.shape[1], x.shape[2]
        h = self._heads
        hd = d // h
        qkv = self.attn.qkv(self.norm1(x)).reshape(-1, n, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax((q * hd ** -0.5) @ k.transpose(-2, -1), dim=-1)
        y = (a @ v).transpose(1, 2).reshape(-1, n, d)
        x = x + self.attn.proj(y)
        y = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class TimmViT(nn.Module):
    def __init__(self, dim, depth, patch, img=224):
        super().__init__()
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch, bias=True)
        self.blocks = nn.Sequential(*[_TorchViTBlock(dim) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, 1000)  # dropped

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        # zeros_like broadcast instead of expand(batch, ...): keeps the trace
        # batch-polymorphic (an int batch from x.shape would constant-fold)
        cls = torch.zeros_like(x[:, :1]) + self.cls_token
        x = torch.cat([cls, x], 1) + self.pos_embed
        x = self.blocks(x)
        return self.norm(x)[:, 0]


class UnicomViTReplica(nn.Module):
    """deepglint/unicom VisionTransformer: no cls token; flatten-tokens
    ``feature`` Sequential of Linear(no bias)/BatchNorm1d pairs; the patch
    conv carries no bias (exercises the converter's zeros branch)."""

    def __init__(self, dim, depth, patch, emb, img=224):
        super().__init__()
        n = (img // patch) ** 2
        self.pos_embed = nn.Parameter(torch.zeros(1, n, dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch, bias=False)
        self.blocks = nn.Sequential(
            *[_TorchViTBlock(dim, eps=1e-5) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.feature = nn.Sequential(
            nn.Linear(n * dim, dim, bias=False), nn.BatchNorm1d(dim, eps=2e-5),
            nn.Linear(dim, emb, bias=False), nn.BatchNorm1d(emb, eps=2e-5))

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        x = self.blocks(x)
        x = self.norm(x).flatten(1)  # flatten keeps the batch dim symbolic
        return self.feature(x)


# ---------------------------------------------------------------------------
# timm Swin V1 (>= 0.9 layout: downsample at the INPUT of the next stage)
# ---------------------------------------------------------------------------


class _SwinAttention(nn.Module):
    def __init__(self, dim, heads, window=7):
        super().__init__()
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, heads))
        self.register_buffer(
            "relative_position_index",
            torch.zeros(window * window, window * window, dtype=torch.long))
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self._heads, self._window = heads, window

    def forward(self, xw, win, mask):
        """xw: (B*nW, N, D) windowed tokens; mask: (nW, N, N) or None."""
        import numpy as _np

        from nkbx.models.swin import _relative_position_index

        # batch-polymorphic: n/d are static (window geometry), batch dim -1
        n, d = xw.shape[1], xw.shape[2]
        h = self._heads
        hd = d // h
        qkv = self.qkv(xw).reshape(-1, n, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q * hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.tensor(_np.asarray(
            _relative_position_index(win)).reshape(-1))
        bias = self.relative_position_bias_table[idx]
        a = a + bias.reshape(n, n, h).permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            a = a.view(-1, nw, h, n, n) + mask[None, :, None]
            a = a.view(-1, h, n, n)
        a = torch.softmax(a, -1)
        return self.proj((a @ v).transpose(1, 2).reshape(-1, n, d))


class _SwinBlock(nn.Module):
    def __init__(self, dim, heads, shifted, n_windows=64, window=7):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _SwinAttention(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        if shifted:  # recomputed by nkbx, must be SKIPPED by the converter
            self.register_buffer(
                "attn_mask", torch.zeros(n_windows, window ** 2, window ** 2))
        self._shifted, self._window = shifted, window

    def forward(self, x):
        """x: (B, H, W, D)."""
        from nkbx.models.swin import _shift_attn_mask

        # hc/wc/d are static spatial geometry; the batch dim stays -1 so the
        # trace serves any batch size (dynamic-batch export contract)
        hc, wc, d = x.shape[1], x.shape[2], x.shape[3]
        win = min(self._window, hc, wc)
        shift = (self._window // 2 if self._shifted else 0) if win < min(hc, wc) else 0
        sc = x
        y = self.norm1(x)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        yw = y.reshape(-1, hc // win, win, wc // win, win, d)
        yw = yw.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, d)
        mask = (torch.tensor(_shift_attn_mask(hc, wc, win, shift))
                if shift else None)
        yw = self.attn(yw, win, mask)
        y = yw.reshape(-1, hc // win, wc // win, win, win, d)
        y = y.permute(0, 1, 3, 2, 4, 5).reshape(-1, hc, wc, d)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = sc + y
        return x + self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class _SwinPatchMerging(nn.Module):
    def __init__(self, dim_in):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim_in)
        self.reduction = nn.Linear(4 * dim_in, 2 * dim_in, bias=False)

    def forward(self, x):
        """x: (B, H, W, D) -> (B, H/2, W/2, 2D)."""
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        return self.reduction(self.norm(x))


class TimmSwin(nn.Module):
    def __init__(self, embed_dim, depths, n_heads, window=7):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, 4, 4, bias=True)
        self.patch_embed.norm = nn.LayerNorm(embed_dim)
        layers = []
        dim = embed_dim
        for i, (depth, heads) in enumerate(zip(depths, n_heads)):
            stage = nn.Module()
            if i > 0:  # timm >= 0.9: merge applied entering stage i
                stage.downsample = _SwinPatchMerging(dim)
                dim *= 2
            stage.blocks = nn.Sequential(
                *[_SwinBlock(dim, heads, shifted=bool(j % 2), window=window)
                  for j in range(depth)])
            layers.append(stage)
        self.layers = nn.Sequential(*layers)
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, 1000)  # dropped

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for stage in self.layers:
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
            x = stage.blocks(x)
        return self.norm(x).mean((1, 2))


# ---------------------------------------------------------------------------
# registry-name dispatcher
# ---------------------------------------------------------------------------


def build_replica(name: str) -> nn.Module:
    """timm/unicom-layout torch module for an nkbx registry backbone name."""
    resnets = {
        "resnet_tiny_test": dict(stage_sizes=(1, 1), bottleneck=False, stem_width=16),
        "resnet14t": dict(stage_sizes=(1, 1, 1, 1), bottleneck=True, tiered=True, stem_width=32),
        "resnet18": dict(stage_sizes=(2, 2, 2, 2), bottleneck=False),
        "resnet18d": dict(stage_sizes=(2, 2, 2, 2), bottleneck=False, deep=True, stem_width=32, avg_down=True),
        "resnet26": dict(stage_sizes=(2, 2, 2, 2), bottleneck=True),
        "resnet34": dict(stage_sizes=(3, 4, 6, 3), bottleneck=False),
        "resnet34d": dict(stage_sizes=(3, 4, 6, 3), bottleneck=False, deep=True, stem_width=32, avg_down=True),
        "resnet50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True),
        "resnet50d": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, deep=True, stem_width=32, avg_down=True),
        "resnet101": dict(stage_sizes=(3, 4, 23, 3), bottleneck=True),
        "resnet152": dict(stage_sizes=(3, 8, 36, 3), bottleneck=True),
        "resnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, cardinality=32, base_width=4),
        "resnext101_32x8d": dict(stage_sizes=(3, 4, 23, 3), bottleneck=True, cardinality=32, base_width=8),
        "wide_resnet50_2": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, base_width=128),
        "seresnet50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, se_ratio=1 / 16),
        "seresnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, cardinality=32, base_width=4, se_ratio=1 / 16),
    }
    if name in resnets:
        return TimmResNet(**resnets[name])
    if name == "mobilenetv3_large_100":
        return TimmMobileNetV3(_LARGE_SPEC, [1, 2, 3, 4, 2, 3], 960, 1280)
    if name == "mobilenetv3_small_100":
        return TimmMobileNetV3(_SMALL_SPEC, [1, 2, 3, 2, 3], 576, 1024)
    effnets = {"efficientnet_b0": (1.0, 1.0), "efficientnet_b1": (1.0, 1.1),
               "efficientnet_b2": (1.1, 1.2), "efficientnet_b3": (1.2, 1.4),
               "efficientnet_b4": (1.4, 1.8), "efficientnet_b5": (1.6, 2.2),
               "efficientnet_b6": (1.8, 2.6), "efficientnet_b7": (2.0, 3.1)}
    if name in effnets:
        from nkbx.models.convert import _EFFNET_STAGES

        w, d = effnets[name]
        return TimmEfficientNet(w, d, _EFFNET_STAGES[name])
    if name == "efficientnetv2_s":
        return TimmEfficientNetV2(V2_S_SPEC)
    if name == "efficientnetv2_m":
        return TimmEfficientNetV2(V2_M_SPEC)
    if name == "efficientnetv2_l":
        return TimmEfficientNetV2(V2_L_SPEC, stem_width=32)
    densenets = {"densenet121": (6, 12, 24, 16), "densenet169": (6, 12, 32, 32),
                 "densenet201": (6, 12, 48, 32)}
    if name in densenets:
        return TorchDenseNet(densenets[name])
    convnexts = {"convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
                 "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
                 "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
                 "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
                 "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048))}
    if name in convnexts:
        return TimmConvNeXt(*convnexts[name])
    vits = {"vit_tiny_patch16_224": (192, 12, 16), "vit_small_patch16_224": (384, 12, 16),
            "vit_small_patch32_224": (384, 12, 32), "vit_base_patch16_224": (768, 12, 16),
            "vit_base_patch32_224": (768, 12, 32), "vit_large_patch16_224": (1024, 24, 16),
            "deit_tiny_patch16_224": (192, 12, 16), "deit_small_patch16_224": (384, 12, 16),
            "deit_base_patch16_224": (768, 12, 16),
            "vit_tiny_patch16_384": (192, 12, 16, 384),
            "vit_small_patch16_384": (384, 12, 16, 384),
            "vit_small_patch32_384": (384, 12, 32, 384),
            "vit_base_patch16_384": (768, 12, 16, 384),
            "vit_base_patch32_384": (768, 12, 32, 384),
            "vit_large_patch16_384": (1024, 24, 16, 384),
            "vit_large_patch32_384": (1024, 24, 32, 384)}
    if name in vits:
        return TimmViT(*vits[name])
    unicoms = {"unicom ViT-B/32": (768, 12, 32, 512),
               "unicom ViT-B/16": (768, 12, 16, 768),
               "unicom ViT-L/14": (1024, 24, 14, 768)}
    if name in unicoms:
        return UnicomViTReplica(*unicoms[name])
    swins = {"swin_tiny_patch4_window7_224": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
             "swin_small_patch4_window7_224": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
             "swin_base_patch4_window7_224": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
             "swin_large_patch4_window7_224": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
             "swin_base_patch4_window12_384": (128, (2, 2, 18, 2), (4, 8, 16, 32), 12),
             "swin_large_patch4_window12_384": (192, (2, 2, 18, 2), (6, 12, 24, 48), 12)}
    if name in swins:
        return TimmSwin(*swins[name])
    raise NotImplementedError(name)

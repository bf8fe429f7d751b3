"""Independent torch EfficientNet oracle (test-only).

The reference's attn encoder is `efficientnet_pytorch.EfficientNet.from_pretrained`
+ `extract_endpoints` (/root/reference/core/models/classifiers/attn/eff.py:13-20),
but the efficientnet-pytorch package is not installed here.  This file
re-implements the architecture in torch FROM THE PUBLISHED SPEC (Tan & Le 2019,
table 1 + the compound-scaling rounding rules) so it can serve as a numerical
oracle for models/efficientnet.py.  State-dict key names deliberately follow
efficientnet-pytorch's (`_conv_stem`, `_blocks.{i}._depthwise_conv`, ...) so the
production EFFICIENTNET_RULES importer is exercised exactly as it would be on
real pretrained weights.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

# (width_coefficient, depth_coefficient)
PARAMS = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
}

# (num_repeat, kernel, stride, expand_ratio, in_filters, out_filters, se_ratio)
BLOCK_ARGS = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)


def round_filters(filters, width, divisor=8):
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats, depth):
    return int(math.ceil(depth * repeats))


class SameConv2d(nn.Conv2d):
    """TF-'SAME' padded conv (asymmetric, computed from the runtime size)."""

    def __init__(self, in_ch, out_ch, k, stride=1, groups=1, bias=False):
        super().__init__(in_ch, out_ch, k, stride=stride, padding=0,
                         groups=groups, bias=bias)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return self._conv_forward(x, self.weight, self.bias)


def _bn(ch):
    return nn.BatchNorm2d(ch, eps=1e-3, momentum=0.01)


def swish(x):
    return x * torch.sigmoid(x)


class MBConv(nn.Module):
    def __init__(self, in_f, out_f, k, stride, expand, se_ratio):
        super().__init__()
        mid = in_f * expand
        if expand != 1:
            self._expand_conv = SameConv2d(in_f, mid, 1)
            self._bn0 = _bn(mid)
        self._depthwise_conv = SameConv2d(mid, mid, k, stride=stride, groups=mid)
        self._bn1 = _bn(mid)
        se_ch = max(1, int(in_f * se_ratio))
        self._se_reduce = nn.Conv2d(mid, se_ch, 1)
        self._se_expand = nn.Conv2d(se_ch, mid, 1)
        self._project_conv = SameConv2d(mid, out_f, 1)
        self._bn2 = _bn(out_f)
        self.skip = stride == 1 and in_f == out_f

    def forward(self, x):
        inp = x
        if hasattr(self, "_expand_conv"):
            x = swish(self._bn0(self._expand_conv(x)))
        x = swish(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(swish(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.skip:
            x = x + inp
        return x


class TorchEfficientNet(nn.Module):
    """Stem + flattened MBConv stages + head, with endpoint taps matching the
    consumption pattern of the reference decoder (reduction_1..4 = features
    before each downsampling block; reduction_5 = swish-activated head)."""

    def __init__(self, name="efficientnet-b2"):
        super().__init__()
        width, depth = PARAMS[name]
        stem = round_filters(32, width)
        self._conv_stem = SameConv2d(3, stem, 3, stride=2)
        self._bn0 = _bn(stem)
        blocks = []
        for (r, k, s, e, fi, fo, se) in BLOCK_ARGS:
            fi, fo = round_filters(fi, width), round_filters(fo, width)
            blocks.append(MBConv(fi, fo, k, s, e, se))
            for _ in range(round_repeats(r, depth) - 1):
                blocks.append(MBConv(fo, fo, k, 1, e, se))
        self._blocks = nn.ModuleList(blocks)
        head = round_filters(1280, width)
        self._conv_head = SameConv2d(fo, head, 1)
        self._bn1 = _bn(head)

    def extract_endpoints(self, x):
        endpoints = {}
        x = swish(self._bn0(self._conv_stem(x)))
        prev = x
        for block in self._blocks:
            x = block(x)
            if prev.shape[2] > x.shape[2]:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x
        x = swish(self._bn1(self._conv_head(x)))
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints


def randomize_(model, seed=0):
    """Non-trivial weights AND running stats so BN eval paths are exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
    model.eval()
    return model

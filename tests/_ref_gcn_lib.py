"""A faithful torch `gcn_lib` for golden-testing the reference's ViG models.

The reference imports ``Grapher, act_layer`` from an external ``gcn_lib``
package that is NOT vendored (ref models/pyramid_vig.py:17), so the ViG /
ChangeVIG families cannot run upstream. stcd_tpu reimplements the behavior
in stcd_tpu/models/gcn_lib.py (dense KNN + MRConv, fixed sin-cos
relative-position bias). This module is the torch-side mirror of THAT
contract: installing it as ``gcn_lib`` lets the reference's own
ChangeVIG.py / pyramid_vig.py execute, giving golden coverage of all the
reference-authored ViG code (Stem/FFN/encoders/decoders/fusion blocks)
plus a cross-framework consistency check of the Grapher itself.

Numerics are kept bit-comparable to the JAX side: the relative-position
bias is produced by the same function (stcd_tpu.models.gcn_lib.
relative_pos_bias), similarities use the same 2xy - x^2 - y^2 form, and
top-k uses descending sort in both frameworks.
"""

import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def act_layer(name):
    return {"relu": nn.ReLU(), "leakyrelu": nn.LeakyReLU(0.2),
            "gelu": nn.GELU(), "hswish": nn.Hardswish()}[name]


class Grapher(nn.Module):
    """Mirror of stcd_tpu.models.gcn_lib.Grapher (MRConv/EdgeConv, dense
    dilated KNN vs an r-pooled node set, fixed relative-pos bias).

    Signature matches the reference call site (pyramid_vig.py:136-140):
    Grapher(channels, k, dilation, conv, act, norm, bias, stochastic,
    epsilon, r, n=HW, drop_path=dpr, relative_pos=True).
    """

    def __init__(self, in_channels, kernel_size=9, dilation=1, conv="mr",
                 act="gelu", norm=None, bias=True, stochastic=False,
                 epsilon=0.0, r=1, n=196, drop_path=0.0, relative_pos=False):
        super().__init__()
        c = in_channels
        self.k, self.dilation, self.conv_mode, self.r = (
            kernel_size, dilation, conv, r)
        self.act = act_layer(act)
        self.fc1 = nn.Sequential(nn.Conv2d(c, c, 1, bias=True),
                                 nn.BatchNorm2d(c))
        # MRConv/EdgeConv BasicConv (1x1 conv + BN + act applied in forward)
        self.graph_conv = nn.Sequential(nn.Conv2d(2 * c, 2 * c, 1, bias=bias),
                                        nn.BatchNorm2d(2 * c))
        self.fc2 = nn.Sequential(nn.Conv2d(2 * c, c, 1, bias=True),
                                 nn.BatchNorm2d(c))
        if relative_pos:
            from stcd_tpu.models.gcn_lib import relative_pos_bias
            m = n // (r * r) if r > 1 else n
            bias_np = np.asarray(relative_pos_bias(c, n, m))  # (1, n, m)
            self.register_buffer("relative_pos",
                                 torch.from_numpy(bias_np.copy()).float())
        else:
            self.relative_pos = None

    def _knn(self, x, y):
        # x (B,N,C), y (B,M,C) -> (B,N,k') neighbor indices; public
        # gcn_lib L2-normalizes both node sets before the distance
        x = F.normalize(x, p=2.0, dim=-1)
        y = F.normalize(y, p=2.0, dim=-1)
        x2 = (x * x).sum(-1, keepdim=True)
        y2 = (y * y).sum(-1).unsqueeze(1)
        sim = 2.0 * torch.bmm(x, y.transpose(1, 2)) - x2 - y2
        if self.relative_pos is not None:
            sim = sim + self.relative_pos
        kk = min(self.k * self.dilation, y.shape[1])
        idx = sim.topk(kk, dim=-1).indices
        return idx[:, :, ::self.dilation][:, :, :self.k]

    def forward(self, inp):
        B, C, H, W = inp.shape
        x = self.fc1(inp)
        nodes = x.reshape(B, C, -1).transpose(1, 2).contiguous()  # (B,N,C)
        if self.r > 1:
            pooled = F.avg_pool2d(x, self.r, self.r)
            nbrs = pooled.reshape(B, C, -1).transpose(1, 2).contiguous()
        else:
            nbrs = nodes
        idx = self._knn(nodes, nbrs)
        gathered = torch.stack([nbrs[b][idx[b]] for b in range(B)])  # B,N,k,C
        if self.conv_mode == "mr":
            x_j = (gathered - nodes.unsqueeze(2)).max(dim=2).values  # (B,N,C)
            h = torch.stack([nodes, x_j], dim=-1).reshape(B, H * W, 2 * C)
            h = h.transpose(1, 2).reshape(B, 2 * C, H, W)
            h = self.act(self.graph_conv(h))
        else:  # edge
            xi = nodes.unsqueeze(2).expand_as(gathered)
            h = torch.cat([xi, gathered - xi], dim=-1)  # (B,N,k,2C)
            h = h.permute(0, 3, 1, 2)  # (B,2C,N,k)
            h = self.act(self.graph_conv(h))
            h = h.max(dim=-1).values.reshape(B, 2 * C, H, W)
        out = self.fc2(h)
        return out + inp


def install_real_gcn_lib():
    """Replace any gcn_lib stub with this faithful mirror and evict cached
    reference ViG modules so they rebind on next load."""
    import types
    mod = types.ModuleType("gcn_lib")
    mod.Grapher = Grapher
    mod.act_layer = act_layer
    sys.modules["gcn_lib"] = mod
    for name in ("models.pyramid_vig", "models.ChangeVIG"):
        sys.modules.pop(name, None)
    return mod

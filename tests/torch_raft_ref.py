"""Test-only torch oracle for RAFT golden parity.

torchvision is not installed on this box and the princeton-vl/RAFT repo is
not vendored, so this is an independent torch re-derivation of the RAFT
architecture (Teed & Deng, ECCV 2020) with the princeton state-dict naming
(`fnet.*`, `cnet.*`, `update_block.*`) — the layout of the published
raft-things.pth that VBench's dynamic_degree loads. The JAX implementation
in vap_tpu/eval/raft.py is validated against this module via
`convert_raft_state_dict(oracle.state_dict())`: a cross-framework check of
conv layouts, padding, grid-sample semantics, GRU gate order, and the convex
upsampler. NOT shipped; tests only.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)
        if norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(planes)
            self.norm2 = nn.InstanceNorm2d(planes)
            norm3 = nn.InstanceNorm2d(planes)
        else:
            self.norm1 = nn.BatchNorm2d(planes)
            self.norm2 = nn.BatchNorm2d(planes)
            norm3 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), norm3)

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, stem, channels, output_dim, norm_fn):
        super().__init__()
        self.conv1 = nn.Conv2d(3, stem, 7, stride=2, padding=3)
        self.norm1 = (nn.InstanceNorm2d(stem) if norm_fn == "instance"
                      else nn.BatchNorm2d(stem))
        self.relu1 = nn.ReLU(inplace=True)
        cin = stem
        for li, cout in enumerate(channels):
            stride = 1 if li == 0 else 2
            layer = nn.Sequential(ResidualBlock(cin, cout, norm_fn, stride),
                                  ResidualBlock(cout, cout, norm_fn, 1))
            setattr(self, f"layer{li + 1}", layer)
            cin = cout
        self.conv2 = nn.Conv2d(cin, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


def bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class CorrBlock:
    def __init__(self, fmap1, fmap2, num_levels, radius):
        self.num_levels, self.radius = num_levels, radius
        b, d, h, w = fmap1.shape
        corr = torch.matmul(fmap1.view(b, d, h * w).transpose(1, 2),
                            fmap2.view(b, d, h * w))
        corr = corr.view(b, h, w, 1, h, w) / torch.sqrt(torch.tensor(d).float())
        self.pyramid = [corr.reshape(b * h * w, 1, h, w)]
        for _ in range(num_levels - 1):
            self.pyramid.append(F.avg_pool2d(self.pyramid[-1], 2, stride=2))

    def __call__(self, coords):
        r = self.radius
        coords = coords.permute(0, 2, 3, 1)
        b, h, w, _ = coords.shape
        out = []
        for i in range(self.num_levels):
            dx = torch.linspace(-r, r, 2 * r + 1)
            dy = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            sampled = bilinear_sampler(self.pyramid[i],
                                       centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2))
            out.append(sampled.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous().float()


class BasicMotionEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        cor_planes = cfg.corr_planes
        self.convc1 = nn.Conv2d(cor_planes, cfg.motion_corr_c1, 1)
        self.convc2 = nn.Conv2d(cfg.motion_corr_c1, cfg.motion_corr_c2, 3, padding=1)
        self.convf1 = nn.Conv2d(2, cfg.motion_flow_c1, 7, padding=3)
        self.convf2 = nn.Conv2d(cfg.motion_flow_c1, cfg.motion_flow_c2, 3, padding=1)
        self.conv = nn.Conv2d(cfg.motion_corr_c2 + cfg.motion_flow_c2,
                              cfg.motion_dim - 2, 3, padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc1(corr))
        cor = F.relu(self.convc2(cor))
        flo = F.relu(self.convf1(flow))
        flo = F.relu(self.convf2(flo))
        out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
        return torch.cat([out, flow], dim=1)


class SepConvGRU(nn.Module):
    def __init__(self, hidden_dim, input_dim):
        super().__init__()
        hi = hidden_dim + input_dim
        self.convz1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        for z_c, r_c, q_c in ((self.convz1, self.convr1, self.convq1),
                              (self.convz2, self.convr2, self.convq2)):
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(z_c(hx))
            r = torch.sigmoid(r_c(hx))
            q = torch.tanh(q_c(torch.cat([r * h, x], dim=1)))
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    def __init__(self, input_dim, hidden_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class BasicUpdateBlock(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = BasicMotionEncoder(cfg)
        self.gru = SepConvGRU(cfg.hidden_dim, cfg.context_dim + cfg.motion_dim)
        self.flow_head = FlowHead(cfg.hidden_dim, cfg.flow_head_hidden)
        self.mask = nn.Sequential(
            nn.Conv2d(cfg.hidden_dim, cfg.flow_head_hidden, 3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(cfg.flow_head_hidden, 64 * 9, 1))

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        delta = self.flow_head(net)
        mask = 0.25 * self.mask(net)
        return net, mask, delta


def coords_grid(b, h, w):
    ys, xs = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float(),
                            indexing="ij")
    return torch.stack([xs, ys], dim=0)[None].repeat(b, 1, 1, 1)


class TorchRAFT(nn.Module):
    """cfg is a vap_tpu.eval.raft.RAFTConfig (shared parameterization)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.fnet = BasicEncoder(cfg.encoder_stem, cfg.encoder_channels,
                                 cfg.fnet_dim, "instance")
        self.cnet = BasicEncoder(cfg.encoder_stem, cfg.encoder_channels,
                                 cfg.hidden_dim + cfg.context_dim, "batch")
        self.update_block = BasicUpdateBlock(cfg)

    def upsample_flow(self, flow, mask):
        n, _, h, w = flow.shape
        mask = torch.softmax(mask.view(n, 1, 9, 8, 8, h, w), dim=2)
        up = F.unfold(8 * flow, (3, 3), padding=1).view(n, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2)
        return up.permute(0, 1, 4, 2, 5, 3).reshape(n, 2, 8 * h, 8 * w)

    @torch.no_grad()
    def forward(self, image1, image2, iters):
        cfg = self.cfg
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0
        fmap1 = self.fnet(image1)
        fmap2 = self.fnet(image2)
        corr_fn = CorrBlock(fmap1, fmap2, cfg.corr_levels, cfg.corr_radius)
        cnet = self.cnet(image1)
        net = torch.tanh(cnet[:, :cfg.hidden_dim])
        inp = torch.relu(cnet[:, cfg.hidden_dim:])
        b, _, h8, w8 = fmap1.shape
        coords0 = coords_grid(b, h8, w8)
        coords1 = coords_grid(b, h8, w8)
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
        return self.upsample_flow(coords1 - coords0, up_mask)

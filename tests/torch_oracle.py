"""Test-only torch oracle reproducing the reference Deeplabv2 semantics
(regda/_resnets.py + regda/resnet.py + regda/models/Encoder.py) so the Flax
model and the checkpoint converter can be validated numerically without the
`ever`/`torchvision` dependencies (not installed in this image).

Checkpoint key names intentionally match the reference state_dict layout
(encoder.resnet.layerX.Y..., layer5.ppm.i..., layer5.conv_last...).
"""

import torch
import torch.nn as nn
import torch.nn.functional as tnf

DEPTHS = {'resnet50': (3, 4, 6, 3), 'resnet101': (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        y = tnf.relu(self.bn1(self.conv1(x)))
        y = tnf.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return tnf.relu(y + idt)


class _ResNetBody(nn.Module):
    """torchvision-style body with OS=16 dilation in layer4."""

    def __init__(self, resnet_type='resnet50'):
        super().__init__()
        depths = DEPTHS[resnet_type]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        # (stride, first_dil, rest_dil) mirroring _nostride_dilate at OS=16
        plans = [(1, 1, 1), (2, 1, 1), (2, 1, 1), (1, 1, 2)]
        for li, (n, (stride, d0, d1)) in enumerate(zip(depths, plans), 1):
            planes = 64 * 2 ** (li - 1)
            blocks = []
            for b in range(n):
                if b == 0 and (stride != 1 or inplanes != planes * 4):
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                        nn.BatchNorm2d(planes * 4))
                else:
                    down = None
                blocks.append(Bottleneck(inplanes, planes,
                                         stride if b == 0 else 1,
                                         d0 if b == 0 else d1, down))
                inplanes = planes * 4
            setattr(self, f'layer{li}', nn.Sequential(*blocks))

    def forward(self, x):
        x = tnf.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c5


class EncoderWrap(nn.Module):
    def __init__(self, resnet_type='resnet50'):
        super().__init__()
        self.resnet = _ResNetBody(resnet_type)

    def forward(self, x):
        return self.resnet(x)


class PPMBilinear(nn.Module):
    def __init__(self, num_classes=6, fc_dim=2048, pool_scales=(1, 2, 3, 6)):
        super().__init__()
        self.ppm = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s),
                          nn.Conv2d(fc_dim, 512, 1, bias=False),
                          nn.BatchNorm2d(512), nn.ReLU(inplace=True))
            for s in pool_scales])
        self.conv_last = nn.Sequential(
            nn.Conv2d(fc_dim + len(pool_scales) * 512, 512, 3, padding=1,
                      bias=False),
            nn.BatchNorm2d(512), nn.ReLU(inplace=True), nn.Dropout2d(0.1),
            nn.Conv2d(512, num_classes, 1))

    def forward(self, x):
        outs = [x]
        for p in self.ppm:
            outs.append(tnf.interpolate(p(x), x.shape[2:], mode='bilinear',
                                        align_corners=False))
        return self.conv_last(torch.cat(outs, 1))


class Deeplabv2Oracle(nn.Module):
    def __init__(self, resnet_type='resnet50', num_classes=6):
        super().__init__()
        self.encoder = EncoderWrap(resnet_type)
        self.layer5 = PPMBilinear(num_classes)
        self.layer6 = PPMBilinear(num_classes)
        self.instance_norm = nn.InstanceNorm2d(2048)

    def forward(self, x):
        feat = self.instance_norm(self.encoder(x))
        x1, x2 = self.layer5(feat), self.layer6(feat)
        if self.training:
            return x1, x2, feat
        x1 = tnf.interpolate(x1, x.shape[-2:], mode='bilinear', align_corners=True)
        x2 = tnf.interpolate(x2, x.shape[-2:], mode='bilinear', align_corners=True)
        return (x1.softmax(1) + x2.softmax(1)) / 2

"""MobileNetV1: depthwise-separable conv family (grouped-conv exercise).

Not in the reference zoo (SURVEY.md §2.3); included because depthwise
convolution is the one conv variant the plain zoo never touches — it runs
through ``Conv2d(groups=channels)`` -> XLA's native grouped integer
convolution with the same zero-point-offset/requant pipeline (the
per-output-channel rowsum already spans only that channel's own taps, so
the offset math is unchanged).

This is the BN-free variant (convs carry bias; ReLU after every conv), with
a matching hand-written torch twin for differential testing — the BN-folding
workflow is exercised by the ResNet family instead.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import Conv2d, Linear
from ..module import Module
from ..ops import functional as F

__all__ = ["MobileNetV1", "torch_mobilenet_v1", "MOBILENET_CFG"]

# (out_channels, stride) per depthwise-separable block, MobileNetV1-1.0.
MOBILENET_CFG = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                 (512, 2), (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
                 (1024, 2), (1024, 1)]


class MobileNetV1(Module):
    INPUT_SHAPE = (3, 224, 224)

    def __init__(self, num_classes: int = 10,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.conv1 = Conv2d(3, 32, 3, stride=2, padding=1, config=config)
        c = 32
        for i, (c_out, stride) in enumerate(MOBILENET_CFG, start=1):
            setattr(self, f"dw{i}", Conv2d(c, c, 3, stride=stride, padding=1,
                                           groups=c, config=config))
            setattr(self, f"pw{i}", Conv2d(c, c_out, 1, config=config))
            c = c_out
        self.fc = Linear(1024, num_classes, config=config)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        for i in range(1, len(MOBILENET_CFG) + 1):
            x = F.relu(getattr(self, f"dw{i}")(x))
            x = F.relu(getattr(self, f"pw{i}")(x))
        x = F.adaptive_avg_pool2d_1x1(x)
        x = x.reshape(-1, 1024)
        return self.fc(x)


def torch_mobilenet_v1(num_classes: int = 10, seed: int = 42):
    """Matching torch oracle (same attribute names -> state_dict loads)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    torch.manual_seed(seed)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 32, 3, stride=2, padding=1)
            c = 32
            for i, (c_out, stride) in enumerate(MOBILENET_CFG, start=1):
                setattr(self, f"dw{i}", nn.Conv2d(c, c, 3, stride=stride,
                                                  padding=1, groups=c))
                setattr(self, f"pw{i}", nn.Conv2d(c, c_out, 1))
                c = c_out
            self.fc = nn.Linear(1024, num_classes)

        def forward(self, x):
            x = tF.relu(self.conv1(x))
            for i in range(1, len(MOBILENET_CFG) + 1):
                x = tF.relu(getattr(self, f"dw{i}")(x))
                x = tF.relu(getattr(self, f"pw{i}")(x))
            x = tF.adaptive_avg_pool2d(x, (1, 1)).reshape(-1, 1024)
            return self.fc(x)

    return Net()

"""Model zoo (the reference's sample/notebooks as library code, plus ResNet)."""

from .resnet import ResNet18, torch_resnet18
from .zoo import MODEL_SPECS, AlexNet, FCMnist, LeNet, SimpleConv, build, torch_twin

__all__ = [
    "FCMnist", "SimpleConv", "AlexNet", "LeNet", "ResNet18",
    "build", "torch_twin", "MODEL_SPECS", "torch_resnet18",
]

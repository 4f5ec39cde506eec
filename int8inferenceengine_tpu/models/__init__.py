"""Model zoo (the reference's sample/notebooks as library code)."""

from .zoo import MODEL_SPECS, AlexNet, FCMnist, LeNet, SimpleConv, build, torch_twin

__all__ = [
    "FCMnist", "SimpleConv", "AlexNet", "LeNet",
    "build", "torch_twin", "MODEL_SPECS",
]

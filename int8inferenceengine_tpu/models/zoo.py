"""Model zoo: the reference's sample models as framework Modules.

The reference ships its "model zoo" as Jupyter notebooks that each define a
torch ``Net`` and an equivalent engine ``MyNet`` side by side (reference:
sample/notebooks/Fully_Connected_mnist.ipynb,
Simple_Convolution_cifar10.ipynb, AlexNet_cifar10_resize224.ipynb cell 0;
plus the LeNet-style test net in unittest/test_quantized_layer.py:26-42).
Here the same four architectures are first-class library code, and
``torch_twin(name)`` builds the matching ``torch.nn`` model so user code,
tests, and benchmarks can run the reference's differential workflow
(load the twin's ``state_dict``, compare against its FP32 forward).

All models take NCHW float input via the framework ``tensor()`` and return
logits [batch, classes], exactly like the notebooks.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, QuantConfig
from ..layers import Conv2d, Linear
from ..module import Module
from ..ops import functional as F

__all__ = [
    "FCMnist", "SimpleConv", "AlexNet", "LeNet", "VGG11", "VGG16", "VGG19",
    "build", "torch_twin", "MODEL_SPECS",
]


class FCMnist(Module):
    """One-layer MNIST classifier (Fully_Connected_mnist.ipynb cell 0)."""

    INPUT_SHAPE = (1, 28, 28)

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.fc1 = Linear(784, 10, config=config)

    def forward(self, x):
        if len(x.shape) != 2:
            x = x.reshape(-1, 784)
        return self.fc1(x)


class SimpleConv(Module):
    """3-conv CIFAR10 net (Simple_Convolution_cifar10.ipynb cell 0).

    conv(3->20,k5)-relu-conv(20->50,k5)-relu-maxpool(2,2)-
    conv(50->120,k5)-relu-fc(7680->10); 32x32 input.
    """

    INPUT_SHAPE = (3, 32, 32)

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.conv1 = Conv2d(3, 20, kernel_size=5, config=config)
        self.conv2 = Conv2d(20, 50, kernel_size=5, config=config)
        self.conv3 = Conv2d(50, 120, kernel_size=5, config=config)
        self.fc1 = Linear(7680, 10, config=config)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.max_pool2d(x, kernel_size=2, stride=2)
        x = F.relu(self.conv3(x))
        x = x.reshape(-1, 7680)
        return self.fc1(x)


class AlexNet(Module):
    """AlexNet for CIFAR10 resized to 224 (AlexNet_cifar10_resize224.ipynb
    cell 0) — the reference's headline benchmark model.
    """

    INPUT_SHAPE = (3, 224, 224)

    def __init__(self, num_classes: int = 10,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.conv1 = Conv2d(3, 96, kernel_size=11, stride=4, padding=2,
                            config=config)
        self.conv2 = Conv2d(96, 256, kernel_size=5, padding=2, config=config)
        self.conv3 = Conv2d(256, 384, kernel_size=3, padding=1, config=config)
        self.conv4 = Conv2d(384, 384, kernel_size=3, padding=1, config=config)
        self.conv5 = Conv2d(384, 256, kernel_size=3, padding=1, config=config)
        self.fc1 = Linear(256 * 6 * 6, 4096, config=config)
        self.fc2 = Linear(4096, 4096, config=config)
        self.fc3 = Linear(4096, num_classes, config=config)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = F.relu(self.conv2(x))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = F.relu(self.conv3(x))
        x = F.relu(self.conv4(x))
        x = F.relu(self.conv5(x))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = x.reshape(-1, 256 * 6 * 6)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.fc3(x)


# VGG configurations A/D/E: convs per stage; every stage ends in a 2x2/2
# max-pool and widths are fixed (64, 128, 256, 512, 512).
_VGG_STAGES = {11: (1, 1, 2, 2, 2), 16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}
_VGG_WIDTHS = (64, 128, 256, 512, 512)


class _VGG(Module):
    """Config-driven VGG for 224x224 input — deep plain-conv chains
    exercising long requant-boundary sequences and the 3x3/512-channel
    shapes where the int8 MXU advantage is largest. Not in the reference
    zoo; weights load from the generated torch twin (``torch_twin('vggN')``),
    conv1..convN / fc1..fc3 naming (flat, reference-style single-dot keys).
    """

    INPUT_SHAPE = (3, 224, 224)
    DEPTH = None  # set by subclasses

    def __init__(self, num_classes: int = 10,
                 config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        idx, in_ch = 1, 3
        for n_convs, width in zip(_VGG_STAGES[self.DEPTH], _VGG_WIDTHS):
            for _ in range(n_convs):
                setattr(self, f"conv{idx}",
                        Conv2d(in_ch, width, 3, padding=1, config=config))
                in_ch, idx = width, idx + 1
        self.fc1 = Linear(512 * 7 * 7, 4096, config=config)
        self.fc2 = Linear(4096, 4096, config=config)
        self.fc3 = Linear(4096, num_classes, config=config)

    def forward(self, x):
        idx = 1
        for n_convs in _VGG_STAGES[self.DEPTH]:
            for _ in range(n_convs):
                x = F.relu(getattr(self, f"conv{idx}")(x))
                idx += 1
            x = F.max_pool2d(x, 2, 2)
        x = x.reshape(-1, 512 * 7 * 7)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.fc3(x)


class VGG11(_VGG):
    """VGG-11 (configuration A): conv1..conv8."""
    DEPTH = 11


class VGG16(_VGG):
    """VGG-16 (configuration D): conv1..conv13."""
    DEPTH = 16


class VGG19(_VGG):
    """VGG-19 (configuration E): conv1..conv16."""
    DEPTH = 19


class LeNet(Module):
    """LeNet-style MNIST net (unittest/test_quantized_layer.py:26-42)."""

    INPUT_SHAPE = (1, 28, 28)

    def __init__(self, config: QuantConfig = DEFAULT_CONFIG):
        super().__init__(config)
        self.conv1 = Conv2d(1, 20, kernel_size=5, config=config)
        self.conv2 = Conv2d(20, 50, kernel_size=5, config=config)
        self.fc1 = Linear(800, 500, config=config)
        self.fc2 = Linear(500, 10, config=config)

    def forward(self, x):
        x = self.conv1(x)
        x = F.max_pool2d(x, kernel_size=2, stride=2)
        x = self.conv2(x)
        x = F.max_pool2d(x, kernel_size=2, stride=2)
        x = x.reshape(-1, 800)
        x = F.relu(self.fc1(x))
        return self.fc2(x)


def _resnet18(**kw):
    from .resnet import ResNet18
    return ResNet18(**kw)


def _mobilenet_v1(**kw):
    from .mobilenet import MobileNetV1
    return MobileNetV1(**kw)


def _mobilenet_v2(**kw):
    from .mobilenet import MobileNetV2
    return MobileNetV2(**kw)


def _resnet34(**kw):
    from .resnet import ResNet34
    return ResNet34(**kw)


def _resnet50(**kw):
    from .resnet import ResNet50
    return ResNet50(**kw)


def _resnet101(**kw):
    from .resnet import ResNet101
    return ResNet101(**kw)


def _resnet152(**kw):
    from .resnet import ResNet152
    return ResNet152(**kw)


def _mobilenet_v3_large(**kw):
    from .mobilenet_v3 import MobileNetV3
    return MobileNetV3(variant="large", **kw)


def _mobilenet_v3_small(**kw):
    from .mobilenet_v3 import MobileNetV3
    return MobileNetV3(variant="small", **kw)


def _efficientnet_b0(**kw):
    from .efficientnet import EfficientNetB0
    return EfficientNetB0(**kw)


def _text_tiny(**kw):
    from .text_transformer import TextTransformer
    return TextTransformer(**kw)


def _gpt_tiny(**kw):
    from .text_decoder import TextDecoder
    return TextDecoder(**kw)


def _llama_tiny(**kw):
    from .llama import LlamaDecoder
    kw.setdefault("kv_heads", 2)        # GQA by default (heads=4 over 2)
    return LlamaDecoder(**kw)


def _moe_tiny(**kw):
    from .moe import MoEDecoder
    kw.setdefault("kv_heads", 2)
    return MoEDecoder(**kw)


def _gemma_tiny(**kw):
    from .gemma import GemmaDecoder
    kw.setdefault("kv_heads", 2)
    return GemmaDecoder(**kw)


def _neox_tiny(**kw):
    from .neox import NeoXDecoder
    return NeoXDecoder(**kw)


def _bloom_tiny(**kw):
    from .bloom import BloomDecoder
    return BloomDecoder(**kw)


def _opt_tiny(**kw):
    # OPT = the gpt block with learned positions, pre-LN, and a ReLU
    # MLP; HF naming (model.decoder.*, position offset 2) in utils/hf
    from .text_decoder import TextDecoder
    kw.setdefault("act", "relu")
    return TextDecoder(**kw)


def _mistral_tiny(**kw):
    # mistral = llama topology + sliding-window attention (the window
    # and GQA geometry come from the HF config; utils/hf.from_hf_config
    # maps a real config.json to these kwargs)
    from .llama import LlamaDecoder
    kw.setdefault("kv_heads", 2)
    kw.setdefault("sliding_window", 16)
    return LlamaDecoder(**kw)


def _vit_tiny(**kw):
    from .vit import ViT
    return ViT(**kw)


def _shufflenet_v2(**kw):
    from .shufflenet import ShuffleNetV2
    return ShuffleNetV2(**kw)


def _squeezenet(**kw):
    from .squeezenet import SqueezeNet
    return SqueezeNet(**kw)


def _googlenet(**kw):
    from .googlenet import GoogLeNet
    return GoogLeNet(**kw)


def _densenet121(**kw):
    from .densenet import DenseNet121
    return DenseNet121(**kw)


MODEL_SPECS = {
    "fc_mnist": FCMnist,
    "simple_conv": SimpleConv,
    "alexnet": AlexNet,
    "lenet": LeNet,
    "vgg11": VGG11,
    "vgg16": VGG16,
    "vgg19": VGG19,
    "resnet18": _resnet18,
    "resnet34": _resnet34,
    "resnet50": _resnet50,
    "resnet101": _resnet101,
    "resnet152": _resnet152,
    "mobilenet_v1": _mobilenet_v1,
    "mobilenet_v2": _mobilenet_v2,
    "mobilenet_v3_large": _mobilenet_v3_large,
    "mobilenet_v3_small": _mobilenet_v3_small,
    "efficientnet_b0": _efficientnet_b0,
    "shufflenet_v2": _shufflenet_v2,
    "vit_tiny": _vit_tiny,
    "text_tiny": _text_tiny,
    "gpt_tiny": _gpt_tiny,
    "llama_tiny": _llama_tiny,
    "moe_tiny": _moe_tiny,
    "gemma_tiny": _gemma_tiny,
    "neox_tiny": _neox_tiny,
    "mistral_tiny": _mistral_tiny,
    "opt_tiny": _opt_tiny,
    "bloom_tiny": _bloom_tiny,
    "squeezenet": _squeezenet,
    "googlenet": _googlenet,
    "densenet121": _densenet121,
}


def build(name: str, config: QuantConfig = DEFAULT_CONFIG, **kw) -> Module:
    """Build a zoo model by name."""
    try:
        cls = MODEL_SPECS[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_SPECS)}")
    return cls(config=config, **kw)


def torch_twin(name: str, seed: int = 42):
    """Build the matching ``torch.nn`` model (the differential oracle).

    Layer attribute names match the framework model exactly, so
    ``framework_model.load(torch_twin(name).state_dict())`` works as-is —
    the reference notebooks' cell-0 pattern.
    """
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF

    torch.manual_seed(seed)

    if name == "fc_mnist":
        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(784, 10)

            def forward(self, x):
                return self.fc1(x.reshape(-1, 784))

    elif name == "simple_conv":
        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 20, 5)
                self.conv2 = nn.Conv2d(20, 50, 5)
                self.conv3 = nn.Conv2d(50, 120, 5)
                self.fc1 = nn.Linear(7680, 10)

            def forward(self, x):
                x = tF.relu(self.conv1(x))
                x = tF.relu(self.conv2(x))
                x = tF.max_pool2d(x, 2, 2)
                x = tF.relu(self.conv3(x))
                return self.fc1(x.reshape(-1, 7680))

    elif name == "alexnet":
        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 96, 11, stride=4, padding=2)
                self.conv2 = nn.Conv2d(96, 256, 5, padding=2)
                self.conv3 = nn.Conv2d(256, 384, 3, padding=1)
                self.conv4 = nn.Conv2d(384, 384, 3, padding=1)
                self.conv5 = nn.Conv2d(384, 256, 3, padding=1)
                self.fc1 = nn.Linear(9216, 4096)
                self.fc2 = nn.Linear(4096, 4096)
                self.fc3 = nn.Linear(4096, 10)

            def forward(self, x):
                x = tF.max_pool2d(tF.relu(self.conv1(x)), 3, 2)
                x = tF.max_pool2d(tF.relu(self.conv2(x)), 3, 2)
                x = tF.relu(self.conv3(x))
                x = tF.relu(self.conv4(x))
                x = tF.max_pool2d(tF.relu(self.conv5(x)), 3, 2)
                x = x.reshape(-1, 9216)
                x = tF.relu(self.fc1(x))
                x = tF.relu(self.fc2(x))
                return self.fc3(x)

    elif name in ("vgg11", "vgg16", "vgg19"):
        stages = _VGG_STAGES[int(name[3:])]

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                idx, in_ch = 1, 3
                for n_convs, width in zip(stages, _VGG_WIDTHS):
                    for _ in range(n_convs):
                        setattr(self, f"conv{idx}",
                                nn.Conv2d(in_ch, width, 3, padding=1))
                        in_ch, idx = width, idx + 1
                self.fc1 = nn.Linear(512 * 7 * 7, 4096)
                self.fc2 = nn.Linear(4096, 4096)
                self.fc3 = nn.Linear(4096, 10)

            def forward(self, x):
                idx = 1
                for n_convs in stages:
                    for _ in range(n_convs):
                        x = tF.relu(getattr(self, f"conv{idx}")(x))
                        idx += 1
                    x = tF.max_pool2d(x, 2, 2)
                x = x.reshape(-1, 512 * 7 * 7)
                x = tF.relu(self.fc1(x))
                x = tF.relu(self.fc2(x))
                return self.fc3(x)

    elif name == "resnet18":
        from .resnet import torch_resnet18
        return torch_resnet18(seed=seed)

    elif name == "resnet34":
        from .resnet import torch_resnet34
        return torch_resnet34(seed=seed)

    elif name == "resnet50":
        from .resnet import torch_resnet50
        return torch_resnet50(seed=seed)

    elif name == "resnet101":
        from .resnet import torch_resnet101
        return torch_resnet101(seed=seed)

    elif name == "resnet152":
        from .resnet import torch_resnet152
        return torch_resnet152(seed=seed)

    elif name == "googlenet":
        from .googlenet import torch_googlenet
        return torch_googlenet(seed=seed)

    elif name == "squeezenet":
        from .squeezenet import torch_squeezenet
        return torch_squeezenet(seed=seed)

    elif name == "densenet121":
        from .densenet import torch_densenet121
        return torch_densenet121(seed=seed)

    elif name == "mobilenet_v1":
        from .mobilenet import torch_mobilenet_v1
        torch.manual_seed(seed)
        return torch_mobilenet_v1(seed=seed)

    elif name == "mobilenet_v2":
        from .mobilenet import torch_mobilenet_v2
        return torch_mobilenet_v2(seed=seed)

    elif name in ("mobilenet_v3_large", "mobilenet_v3_small"):
        from .mobilenet_v3 import torch_mobilenet_v3
        return torch_mobilenet_v3(variant=name.rsplit("_", 1)[1], seed=seed)

    elif name == "efficientnet_b0":
        from .efficientnet import torch_efficientnet_b0
        return torch_efficientnet_b0(seed=seed)

    elif name == "shufflenet_v2":
        from .shufflenet import torch_shufflenet_v2
        return torch_shufflenet_v2(seed=seed)

    elif name == "vit_tiny":
        from .vit import torch_vit
        return torch_vit(seed=seed)

    elif name == "text_tiny":
        from .text_transformer import torch_text_transformer
        return torch_text_transformer(seed=seed)

    elif name == "gpt_tiny":
        from .text_decoder import torch_text_decoder
        return torch_text_decoder(seed=seed)

    elif name == "llama_tiny":
        from .llama import torch_llama
        return torch_llama(kv_heads=2, seed=seed)

    elif name == "moe_tiny":
        from .moe import torch_moe
        return torch_moe(kv_heads=2, seed=seed)

    elif name == "gemma_tiny":
        from .gemma import torch_gemma
        return torch_gemma(kv_heads=2, seed=seed)

    elif name == "neox_tiny":
        from .neox import torch_neox
        return torch_neox(seed=seed)

    elif name == "bloom_tiny":
        from .bloom import torch_bloom
        return torch_bloom(seed=seed)

    elif name == "opt_tiny":
        from .text_decoder import torch_text_decoder
        return torch_text_decoder(seed=seed, act="relu")

    elif name == "mistral_tiny":
        from .llama import torch_llama
        return torch_llama(kv_heads=2, sliding_window=16, seed=seed)

    elif name == "lenet":
        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(1, 20, 5)
                self.conv2 = nn.Conv2d(20, 50, 5)
                self.fc1 = nn.Linear(800, 500)
                self.fc2 = nn.Linear(500, 10)

            def forward(self, x):
                x = tF.max_pool2d(self.conv1(x), 2, 2)
                x = tF.max_pool2d(self.conv2(x), 2, 2)
                x = x.reshape(-1, 800)
                x = tF.relu(self.fc1(x))
                return self.fc2(x)

    else:
        raise ValueError(f"unknown model {name!r}")

    return Net()

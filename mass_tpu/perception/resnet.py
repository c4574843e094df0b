"""Flax ResNet-50 feature extractor (stem + stage 1).

The cross-phase instance matcher pools 256-d embeddings from a
ResNet-50 truncated after its first bottleneck stage at 1/4 camera
resolution (reference: mass/nn/applications/resnet_projection_layer.py:
134-157, with ImageNet preprocessing :136-141).  Implemented in flax
with inference-mode batch norm; weights import from torchvision's
pretrained checkpoint for behavioral parity.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# numpy, NOT jnp: module-level device ops initialize the default
# backend at import, before any runtime platform selection
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    project: bool = False
    # detectron2 Caffe-style ResNets stride the 1x1 conv; torchvision
    # strides the 3x3 (weights are identical, numerics are not)
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        y = nn.Conv(self.features, (1, 1), strides=(s1, s1),
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3),
                    strides=(s3, s3),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn3")(y)
        if self.project:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=True,
                                    name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Stage1(nn.Module):
    """conv1 -> bn -> relu -> maxpool -> layer1 (3 bottlenecks, 256ch)."""

    @nn.compact
    def __call__(self, x):
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Bottleneck(64, project=True, name="layer1_0")(x)
        x = Bottleneck(64, name="layer1_1")(x)
        x = Bottleneck(64, name="layer1_2")(x)
        return x


def make_backbone(params):
    """``[h, w, 3] in 0-1 -> [h/4, w/4, 256]`` feature fn for FeatureMap."""
    model = ResNet50Stage1()

    def backbone(rgb: jax.Array) -> jax.Array:
        return model.apply(params, rgb[None])[0]

    return backbone


# ---------------------------------------------------------------------
# torchvision weight import
# ---------------------------------------------------------------------

def _conv(w):
    import numpy as np
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))


def _bn(sd, prefix):
    import numpy as np
    return ({"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
             "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))},
            {"mean": jnp.asarray(np.asarray(
                sd[f"{prefix}.running_mean"])),
             "var": jnp.asarray(np.asarray(
                 sd[f"{prefix}.running_var"]))})


def params_from_torchvision(state_dict: Dict[str, Any]):
    """Convert a torchvision resnet50 state dict into flax variables for
    :class:`ResNet50Stage1`."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv(state_dict["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(state_dict, "bn1")

    for b in range(3):
        name = f"layer1_{b}"
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for i in (1, 2, 3):
            p[f"conv{i}"] = {"kernel": _conv(
                state_dict[f"layer1.{b}.conv{i}.weight"])}
            p[f"bn{i}"], s[f"bn{i}"] = _bn(state_dict,
                                           f"layer1.{b}.bn{i}")
        if b == 0:
            p["down_conv"] = {"kernel": _conv(
                state_dict["layer1.0.downsample.0.weight"])}
            p["down_bn"], s["down_bn"] = _bn(
                state_dict, "layer1.0.downsample.1")
        params[name] = p
        stats[name] = s

    return {"params": params, "batch_stats": stats}


def load_pretrained_backbone():
    """Torchvision-pretrained stage-1 backbone (host download/cache)."""
    from torchvision.models import resnet50
    net = resnet50(weights="IMAGENET1K_V1")
    variables = params_from_torchvision(net.state_dict())
    return make_backbone(variables), variables


def init_backbone(rng=None):
    """Randomly-initialized stage-1 backbone variables (for smoke runs
    and as the ``like`` tree when restoring a checkpoint)."""
    import jax as _jax
    model = ResNet50Stage1()
    return model.init(rng if rng is not None else
                      _jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3)))


def save_backbone_checkpoint(path: str):
    """One-time export: torchvision weights -> orbax, so hosts without
    torchvision (like TPU images) can run --use-feature-matching from
    ``--backbone-checkpoint``."""
    from mass_tpu.utils.checkpoint import save_pytree
    _, variables = load_pretrained_backbone()
    return save_pytree(path, variables)


def load_backbone_checkpoint(path: str):
    """Stage-1 backbone from an orbax checkpoint (no torchvision)."""
    from mass_tpu.utils.checkpoint import load_pytree
    variables = load_pytree(path, init_backbone())
    return make_backbone(variables), variables

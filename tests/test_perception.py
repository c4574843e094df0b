"""Perception tests: GT color lookup, detector fusion, ResNet stage-1
parity against a hand-built torch reference."""

import numpy as np
import jax
import jax.numpy as jnp

from mass_tpu import taxonomy
from mass_tpu.perception.segmentation import (
    Detections, colors_to_classes, detections_to_semantic)
from mass_tpu.perception import resnet as RN


def test_colors_to_classes_exact_and_fallback():
    colors = taxonomy.class_colors_array(normalized=False).astype(
        np.uint8)
    frame = np.zeros((4, 6, 3), np.uint8)
    frame[0, 0] = colors[5]
    frame[1, 2] = colors[53]
    frame[2, 3] = (1, 2, 3)          # unknown -> OccupiedSpace
    out = np.asarray(colors_to_classes(jnp.asarray(frame)))[..., 0]
    assert out[0, 0] == 5 and out[1, 2] == 53
    assert out[2, 3] == 0 and out[3, 3] == 0


def test_detections_to_semantic_threshold_and_argmax():
    h = w = 8
    masks = np.zeros((3, h, w), np.float32)
    masks[0, :4] = 1.0    # class 2, score .95
    masks[1, 2:6] = 1.0   # class 7, score .95 (overlaps rows 2-3)
    masks[2, 6:] = 1.0    # class 9, score .5 -> dropped
    det = Detections(masks=jnp.asarray(masks),
                     classes=jnp.asarray([2, 7, 9]),
                     scores=jnp.asarray([0.95, 0.95, 0.5]))
    out = np.asarray(detections_to_semantic(det, 0.9))[..., 0]
    assert (out[0] == 2).all()
    assert (out[4:6] == 7).all()
    assert (out[6:] == 0).all()      # dropped detection -> background
    # overlap rows: both classes accumulated once each -> argmax = first
    # max (class 2 channel index < 7 ties resolved by argmax order)
    assert out[2, 0] in (2, 7)


def _torch_stage1():
    """stem + layer1 of ResNet-50 with torchvision's parameter names."""
    import torch.nn as tn

    class Bot(tn.Module):
        def __init__(self, cin, mid, down):
            super().__init__()
            self.conv1 = tn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = tn.BatchNorm2d(mid)
            self.conv2 = tn.Conv2d(mid, mid, 3, padding=1, bias=False)
            self.bn2 = tn.BatchNorm2d(mid)
            self.conv3 = tn.Conv2d(mid, mid * 4, 1, bias=False)
            self.bn3 = tn.BatchNorm2d(mid * 4)
            self.relu = tn.ReLU()
            self.downsample = tn.Sequential(
                tn.Conv2d(cin, mid * 4, 1, bias=False),
                tn.BatchNorm2d(mid * 4)) if down else None

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idn)

    class Net(tn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tn.Conv2d(3, 64, 7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = tn.BatchNorm2d(64)
            self.relu = tn.ReLU()
            self.maxpool = tn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = tn.Sequential(Bot(64, 64, True),
                                        Bot(256, 64, False),
                                        Bot(256, 64, False))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer1(x)

    return Net()


def test_resnet_stage1_matches_torch():
    import torch
    torch.manual_seed(0)
    net = _torch_stage1().eval()
    # give batch norms non-trivial running stats
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    variables = RN.params_from_torchvision(net.state_dict())
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)

    with torch.no_grad():
        xin = (torch.from_numpy(img) -
               torch.tensor([0.485, 0.456, 0.406])) / \
            torch.tensor([0.229, 0.224, 0.225])
        ref = net(xin.permute(2, 0, 1)[None]).numpy()[0].transpose(
            1, 2, 0)

    out = np.asarray(RN.ResNet50Stage1().apply(
        variables, jnp.asarray(img)[None]))[0]
    assert out.shape == (8, 8, 256)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_backbone_in_feature_map():
    """Random-weight backbone drives a FeatureMap update end to end."""
    from mass_tpu.config import CameraConfig
    from mass_tpu.maps import FeatureMap

    rng = jax.random.PRNGKey(0)
    model = RN.ResNet50Stage1()
    variables = model.init(rng, jnp.zeros((1, 32, 32, 3)))
    backbone = RN.make_backbone(variables)

    cam = CameraConfig(height=32, width=32)
    fmap = FeatureMap(cam, 256, backbone, stride=4, map_height=32,
                      map_width=32, map_depth=8, grid_resolution=0.2)
    obs = dict(position=np.zeros(3, np.float32), yaw=0.0, elevation=0.0,
               depth=np.full((32, 32, 1), 1.0, np.float32),
               rgb=np.random.RandomState(0).rand(32, 32, 3).astype(
                   np.float32))
    fmap.update_from_observation(obs)
    assert np.asarray(fmap.voxel_map.data).any()


def test_detections_to_semantic_tta_pools_passes():
    """TTA fusion pools confident masks across passes: a detection that
    only one pass finds still paints the pixels, and accumulated
    evidence from both passes outvotes a single-pass class."""
    from mass_tpu.perception.segmentation import (
        detections_to_semantic_tta)
    h = w = 8
    m1 = np.zeros((2, h, w), np.float32)
    m1[0, :4] = 1.0                   # class 2 rows 0-3
    m1[1, 4:] = 0.6                   # class 7 rows 4-7, weak
    det1 = Detections(masks=jnp.asarray(m1),
                      classes=jnp.asarray([2, 7]),
                      scores=jnp.asarray([0.95, 0.95]))
    m2 = np.zeros((2, h, w), np.float32)
    m2[0, 4:] = 0.6                   # class 7 again (second pass)
    m2[1, 6:] = 1.0                   # class 9 only in pass 2
    det2 = Detections(masks=jnp.asarray(m2),
                      classes=jnp.asarray([7, 9]),
                      scores=jnp.asarray([0.95, 0.95]))

    out = np.asarray(detections_to_semantic_tta(
        [det1, det2], 0.9))[..., 0]
    assert (out[:4] == 2).all()       # pass-1-only detection kept
    assert (out[4:6] == 7).all()      # pooled 0.6+0.6 evidence
    # rows 6-7: class 7 pooled 1.2 vs class 9 single 1.0 -> 7 wins
    assert (out[6:] == 7).all()

    # single pass degenerates to the plain fusion
    single = np.asarray(detections_to_semantic(det1, 0.9))
    tta1 = np.asarray(detections_to_semantic_tta([det1], 0.9))
    np.testing.assert_array_equal(single, tta1)

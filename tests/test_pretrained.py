"""Pretrained-encoder fidelity: seeded torch-style checkpoints convert,
graft, and produce the SAME activations as a direct torch evaluation of
the state_dict (the reference builds every production encoder from such
ImageNet checkpoints, encoders.py:10-19,121-164). Also covers the
end-to-end flow: cfg.model.pretrained=True -> SegmentationRunner grafts
at init and trains."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from salt_tpu.models.encoders import DenseNetEncoder, ResNetEncoder
from salt_tpu.models.torch_import import (convert_densenet_encoder,
                                          convert_encoder,
                                          convert_resnet_encoder,
                                          graft_encoder, load_state_dict)

RESNET34_LAYERS = [3, 4, 6, 3]
DN121_LAYERS = [6, 12, 24, 16]


def _conv_init(rng, o, i, k):
    return (rng.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32)


def _add_bn(sd, rng, name, c):
    sd[name + ".weight"] = (0.8 + 0.4 * rng.rand(c)).astype(np.float32)
    sd[name + ".bias"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[name + ".running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[name + ".running_var"] = (0.8 + 0.4 * rng.rand(c)).astype(np.float32)


def fake_resnet34_sd(seed=0):
    rng = np.random.RandomState(seed)
    sd = {"conv1.weight": _conv_init(rng, 64, 3, 7)}
    _add_bn(sd, rng, "bn1", 64)
    widths = [64, 128, 256, 512]
    in_w = 64
    for stage, (w, n) in enumerate(zip(widths, RESNET34_LAYERS), start=1):
        for i in range(n):
            pre = f"layer{stage}.{i}"
            cin = in_w if i == 0 else w
            sd[pre + ".conv1.weight"] = _conv_init(rng, w, cin, 3)
            _add_bn(sd, rng, pre + ".bn1", w)
            sd[pre + ".conv2.weight"] = _conv_init(rng, w, w, 3)
            _add_bn(sd, rng, pre + ".bn2", w)
            if i == 0 and cin != w:
                sd[pre + ".downsample.0.weight"] = _conv_init(rng, w, cin, 1)
                _add_bn(sd, rng, pre + ".downsample.1", w)
        in_w = w
    return sd


def fake_densenet121_sd(seed=0):
    rng = np.random.RandomState(seed)
    sd = {"features.conv0.weight": _conv_init(rng, 64, 3, 7)}
    _add_bn(sd, rng, "features.norm0", 64)
    c = 64
    for b, n in enumerate(DN121_LAYERS, start=1):
        for l in range(1, n + 1):
            pre = f"features.denseblock{b}.denselayer{l}"
            _add_bn(sd, rng, pre + ".norm1", c)
            sd[pre + ".conv1.weight"] = _conv_init(rng, 128, c, 1)
            _add_bn(sd, rng, pre + ".norm2", 128)
            sd[pre + ".conv2.weight"] = _conv_init(rng, 32, 128, 3)
            c += 32
        if b < 4:
            _add_bn(sd, rng, f"features.transition{b}.norm", c)
            sd[f"features.transition{b}.conv.weight"] = _conv_init(
                rng, c // 2, c, 1)
            c //= 2
    return sd


# -- direct torch evaluation of the state_dicts (eval mode) ----------------

def _t(sd, k):
    return torch.from_numpy(sd[k])


def _tbn(sd, x, p):
    return F.batch_norm(x, _t(sd, p + ".running_mean"),
                        _t(sd, p + ".running_var"), _t(sd, p + ".weight"),
                        _t(sd, p + ".bias"), False, 0.9, 1e-5)


def torch_resnet34_features(sd, x):
    x = F.conv2d(x, _t(sd, "conv1.weight"), stride=2, padding=3)
    x = F.relu(_tbn(sd, x, "bn1"))
    feats = []
    for stage, n in enumerate(RESNET34_LAYERS, start=1):
        for i in range(n):
            pre = f"layer{stage}.{i}"
            stride = 2 if (stage > 1 and i == 0) else 1
            y = F.conv2d(x, _t(sd, pre + ".conv1.weight"), stride=stride,
                         padding=1)
            y = F.relu(_tbn(sd, y, pre + ".bn1"))
            y = F.conv2d(y, _t(sd, pre + ".conv2.weight"), padding=1)
            y = _tbn(sd, y, pre + ".bn2")
            if pre + ".downsample.0.weight" in sd:
                res = F.conv2d(x, _t(sd, pre + ".downsample.0.weight"),
                               stride=stride)
                res = _tbn(sd, res, pre + ".downsample.1")
            else:
                res = x
            x = F.relu(y + res)
        feats.append(x)
    return feats


def torch_densenet121_features(sd, x):
    x = F.conv2d(x, _t(sd, "features.conv0.weight"), stride=2, padding=3)
    x = F.relu(_tbn(sd, x, "features.norm0"))
    feats = []
    for b, n in enumerate(DN121_LAYERS, start=1):
        for l in range(1, n + 1):
            pre = f"features.denseblock{b}.denselayer{l}"
            y = F.relu(_tbn(sd, x, pre + ".norm1"))
            y = F.conv2d(y, _t(sd, pre + ".conv1.weight"))
            y = F.relu(_tbn(sd, y, pre + ".norm2"))
            y = F.conv2d(y, _t(sd, pre + ".conv2.weight"), padding=1)
            x = torch.cat([x, y], dim=1)
        feats.append(x)
        if b < 4:
            x = F.relu(_tbn(sd, x, f"features.transition{b}.norm"))
            x = F.conv2d(x, _t(sd, f"features.transition{b}.conv.weight"))
            x = F.avg_pool2d(x, 2, 2)
    return feats


def _compare_features(flax_feats, torch_feats, rtol=2e-3, atol=2e-3):
    assert len(flax_feats) == len(torch_feats)
    for i, (f, t) in enumerate(zip(flax_feats, torch_feats)):
        got = np.transpose(np.asarray(f), (0, 3, 1, 2))   # NHWC -> NCHW
        want = t.numpy()
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg=f"stage {i} diverged")


def test_resnet34_grafted_forward_matches_torch():
    sd = fake_resnet34_sd()
    enc_params, enc_stats = convert_resnet_encoder(sd)
    model = ResNetEncoder(depth=34, pool0=False)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    # the encoder itself IS the model here: merge at top level
    variables = {"params": enc_params_merge(variables["params"], enc_params),
                 "batch_stats": enc_params_merge(variables["batch_stats"],
                                                 enc_stats)}
    feats = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        tfeats = torch_resnet34_features(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    _compare_features(feats, tfeats)


def enc_params_merge(tree_a, tree_b):
    out = dict(tree_a)
    for k, v in tree_b.items():
        out[k] = (enc_params_merge(tree_a[k], v) if isinstance(v, dict)
                  else np.asarray(v))
    return out


def test_densenet121_grafted_forward_matches_torch():
    sd = fake_densenet121_sd()
    enc_params, enc_stats = convert_densenet_encoder(sd)
    model = DenseNetEncoder(depth=121, pool0=False)
    x = np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    variables = {"params": enc_params_merge(variables["params"], enc_params),
                 "batch_stats": enc_params_merge(variables["batch_stats"],
                                                 enc_stats)}
    feats = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        tfeats = torch_densenet121_features(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    _compare_features(feats, tfeats)


def test_convert_encoder_dispatch():
    assert "conv0" in convert_encoder(fake_densenet121_sd())[0]
    assert "conv1" in convert_encoder(fake_resnet34_sd())[0]


def test_pretrained_flows_through_runner(tmp_path):
    """cfg.model.pretrained=True + a .pth file: the runner grafts at
    init_state (value-level check on conv1 + BN stats) and a train step
    runs on the grafted weights."""
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner
    from jax.sharding import Mesh

    sd = fake_resnet34_sd()
    path = str(tmp_path / "resnet34.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.model.encoder_depth = 34
    cfg.model.pretrained = True
    cfg.model.pretrained_weights_path = path
    cfg.training.dtype = "float32"
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    runner = SegmentationRunner(cfg, mesh=mesh)
    state = runner.init_state(0)

    got = np.asarray(state.params["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), rtol=1e-6)
    got_bn = state.batch_stats["encoder"]["bn1"]["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(got_bn["var"]),
                               sd["bn1.running_var"], rtol=1e-6)

    images = (np.random.RandomState(0).rand(4, 101, 101) * 255).astype(np.uint8)
    masks = (np.random.RandomState(1).rand(4, 101, 101) > 0.5).astype(np.uint8)
    deps = np.zeros((4, 1), np.float32)
    di, dm, dd = runner.device_batch(images, masks, deps)
    _, loss = runner.train_step(state, di, dm, dd, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_pretrained_without_path_raises():
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner
    from jax.sharding import Mesh

    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.model.pretrained = True
    cfg.training.dtype = "float32"
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    runner = SegmentationRunner(cfg, mesh=mesh)
    with pytest.raises(ValueError, match="pretrained_weights_path"):
        runner.init_state(0)


def test_npz_state_dict_roundtrip(tmp_path):
    """.npz checkpoints (torch-free serving hosts) load identically."""
    sd = fake_resnet34_sd()
    path = str(tmp_path / "resnet34.npz")
    np.savez(path, **sd)
    loaded = load_state_dict(path)
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(loaded["conv1.weight"], sd["conv1.weight"])

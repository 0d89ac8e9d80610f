"""Torch checkpoint conversion tests: a synthetic torchvision-style
resnet18 state_dict converts and grafts into the flax encoder with
values preserved (reference capability: pretrained encoders,
encoders.py:10-19)."""
import numpy as np
import pytest

from salt_tpu.models.torch_import import (convert_resnet_encoder,
                                          graft_encoder)


def _fake_resnet18_state_dict(rng):
    """torchvision resnet18 naming/shapes (the encoder part)."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_w = 64
    for stage, w in enumerate(widths, start=1):
        for i in range(2):
            pre = f"layer{stage}.{i}"
            cin = in_w if i == 0 else w
            conv(pre + ".conv1", w, cin, 3)
            bn(pre + ".bn1", w)
            conv(pre + ".conv2", w, w, 3)
            bn(pre + ".bn2", w)
            if i == 0 and cin != w:
                conv(pre + ".downsample.0", w, cin, 1)
                bn(pre + ".downsample.1", w)
        in_w = w
    return sd


def test_convert_and_graft_resnet18(rng):
    import jax
    import jax.numpy as jnp
    from salt_tpu.models.unet import UNetResNet

    sd = _fake_resnet18_state_dict(rng)
    params, stats = convert_resnet_encoder(sd)

    # conv layout: [O,I,kh,kw] -> [kh,kw,I,O]
    np.testing.assert_allclose(params["conv1"]["kernel"],
                               np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    assert params["layer2_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 128)

    model = UNetResNet(encoder_depth=18, num_classes=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    grafted = graft_encoder(variables, params, stats)

    got = np.asarray(grafted["params"]["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    got_bn = grafted["batch_stats"]["encoder"]["bn1"]["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(got_bn["mean"]),
                               sd["bn1.running_mean"])
    # the grafted model still runs
    out = model.apply(grafted, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 2)


def test_graft_shape_mismatch_raises(rng):
    import jax
    import jax.numpy as jnp
    from salt_tpu.models.unet import UNetResNet

    sd = _fake_resnet18_state_dict(rng)
    sd["conv1.weight"] = rng.randn(64, 3, 5, 5).astype(np.float32)  # wrong k
    params, stats = convert_resnet_encoder(sd)
    model = UNetResNet(encoder_depth=18, num_classes=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="shape mismatch"):
        graft_encoder(variables, params, stats)


def test_senet_naming_scheme(rng):
    """pretrainedmodels layer0.* stem + se_module gates convert."""
    sd = {}
    sd["layer0.conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    for suffix, shape in [("weight", 64), ("bias", 64),
                          ("running_mean", 64), ("running_var", 64)]:
        sd[f"layer0.bn1.{suffix}"] = rng.rand(shape).astype(np.float32)
    sd["layer1.0.conv1.weight"] = rng.randn(64, 64, 1, 1).astype(np.float32)
    for suffix in ["weight", "bias", "running_mean", "running_var"]:
        sd[f"layer1.0.bn1.{suffix}"] = rng.rand(64).astype(np.float32)
    sd["layer1.0.se_module.fc1.weight"] = rng.randn(4, 64, 1, 1).astype(np.float32)
    sd["layer1.0.se_module.fc1.bias"] = rng.randn(4).astype(np.float32)
    sd["layer1.0.se_module.fc2.weight"] = rng.randn(64, 4, 1, 1).astype(np.float32)
    sd["layer1.0.se_module.fc2.bias"] = rng.randn(64).astype(np.float32)
    params, stats = convert_resnet_encoder(sd)
    assert "conv1" in params and "layer1_0" in params
    assert params["layer1_0"]["se"]["fc1"]["kernel"].shape == (1, 1, 64, 4)
"""Whole-flagship torch-forward golden (VERDICT r2 #2): the flax
UNetResNet trunk — encoder + center + scSE decoder ladder + hypercolumn
+ head — evaluated on a converted full reference state_dict must match
a direct torch evaluation of the same weights.

The reference quirks are reproduced exactly for this comparison:
- asymmetric top+right replication padding on every decoder conv
  (reference: base.py:26-31) via pad_mode="reference",
- torch-0.3.1 align_corners bilinear upsampling (base.py:70,
  unet.py:101-107) via upsample_mode="align_corners".
A second test quantifies the default build's deliberate divergence
(SAME pad + half-pixel resize) on the same weights.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from salt_tpu.models.torch_import import convert_unet_resnet, graft_model
from salt_tpu.models.unet import UNetResNet

RESNET18_LAYERS = [2, 2, 2, 2]


# -- seeded full reference state_dict (UNetResNet18, hypercolumn) ----------

def _conv_init(rng, o, i, kh, kw=None):
    kw = kh if kw is None else kw
    return (rng.randn(o, i, kh, kw) / np.sqrt(i * kh * kw)).astype(np.float32)


def _add_bn(sd, rng, name, c):
    sd[name + ".weight"] = (0.8 + 0.4 * rng.rand(c)).astype(np.float32)
    sd[name + ".bias"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[name + ".running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[name + ".running_var"] = (0.8 + 0.4 * rng.rand(c)).astype(np.float32)


def _add_cbr(sd, rng, pre, cin, cout):
    """Conv2dBnRelu weights WITH conv bias (nn.Conv2d default — the
    reference never disables it, base.py:27)."""
    sd[pre + ".conv.weight"] = _conv_init(rng, cout, cin, 3)
    sd[pre + ".conv.bias"] = (0.05 * rng.randn(cout)).astype(np.float32)
    _add_bn(sd, rng, pre + ".batch_norm", cout)


def _add_decoder(sd, rng, pre, cin, cmid, cout):
    _add_cbr(sd, rng, pre + ".conv1", cin, cmid)
    _add_cbr(sd, rng, pre + ".conv2", cmid, cout)
    hid = max(cout // 16, 1)
    sd[pre + ".channel_se.fc.0.weight"] = (
        rng.randn(hid, cout) / np.sqrt(cout)).astype(np.float32)
    sd[pre + ".channel_se.fc.0.bias"] = (
        0.05 * rng.randn(hid)).astype(np.float32)
    sd[pre + ".channel_se.fc.2.weight"] = (
        rng.randn(cout, hid) / np.sqrt(hid)).astype(np.float32)
    sd[pre + ".channel_se.fc.2.bias"] = (
        0.05 * rng.randn(cout)).astype(np.float32)
    sd[pre + ".spatial_se.fc.weight"] = _conv_init(rng, 1, cout, 1)
    sd[pre + ".spatial_se.fc.bias"] = (
        0.05 * rng.randn(1)).astype(np.float32)


def fake_unet_resnet18_sd(seed=0):
    rng = np.random.RandomState(seed)
    sd = {"encoders.encoder.conv1.weight": _conv_init(rng, 64, 3, 7)}
    _add_bn(sd, rng, "encoders.encoder.bn1", 64)
    widths = [64, 128, 256, 512]
    in_w = 64
    for stage, (w, n) in enumerate(zip(widths, RESNET18_LAYERS), start=1):
        for i in range(n):
            pre = f"encoders.encoder.layer{stage}.{i}"
            cin = in_w if i == 0 else w
            sd[pre + ".conv1.weight"] = _conv_init(rng, w, cin, 3)
            _add_bn(sd, rng, pre + ".bn1", w)
            sd[pre + ".conv2.weight"] = _conv_init(rng, w, w, 3)
            _add_bn(sd, rng, pre + ".bn2", w)
            if i == 0 and cin != w:
                sd[pre + ".downsample.0.weight"] = _conv_init(rng, w, cin, 1)
                _add_bn(sd, rng, pre + ".downsample.1", w)
        in_w = w
    b = 512
    # center, decoders, hypercolumn head (reference: unet.py:60-87)
    _add_cbr(sd, rng, "center.0", b, b)
    _add_cbr(sd, rng, "center.1", b, b // 2)
    _add_decoder(sd, rng, "dec5", b + b // 2, b, b // 8)
    _add_decoder(sd, rng, "dec4", b // 2 + b // 8, b // 2, b // 8)
    _add_decoder(sd, rng, "dec3", b // 4 + b // 8, b // 4, b // 8)
    _add_decoder(sd, rng, "dec2", b // 8 + b // 8, b // 8, b // 8)
    _add_decoder(sd, rng, "dec1", b // 8, b // 16, b // 8)
    _add_cbr(sd, rng, "final.0", 5 * b // 8, b // 8)
    sd["final.1.weight"] = _conv_init(rng, 2, b // 8, 1)
    sd["final.1.bias"] = (0.05 * rng.randn(2)).astype(np.float32)
    return sd


# -- direct torch evaluation (eval mode, reference semantics) --------------

def _t(sd, k):
    return torch.from_numpy(sd[k])


def _tbn(sd, x, p):
    return F.batch_norm(x, _t(sd, p + ".running_mean"),
                        _t(sd, p + ".running_var"), _t(sd, p + ".weight"),
                        _t(sd, p + ".bias"), False, 0.9, 1e-5)


def _t_cbr(sd, x, pre):
    """Conv2dBnRelu forward: ReplicationPad2d((0, kw-1, kh-1, 0)) then
    VALID conv (reference: base.py:26-31)."""
    x = F.pad(x, (0, 2, 2, 0), mode="replicate")
    x = F.conv2d(x, _t(sd, pre + ".conv.weight"), _t(sd, pre + ".conv.bias"))
    return F.relu(_tbn(sd, x, pre + ".batch_norm"))


def _t_up(x, factor=2):
    """torch-0.3.1 nn.Upsample(bilinear) == align_corners=True."""
    return F.interpolate(x, scale_factor=factor, mode="bilinear",
                         align_corners=True)


def _t_decoder(sd, x, e, pre):
    x = _t_up(x)
    if e is not None:
        x = torch.cat([x, e], 1)
    x = _t_cbr(sd, x, pre + ".conv1")
    x = _t_cbr(sd, x, pre + ".conv2")
    y = x.mean(dim=(2, 3))
    y = F.relu(F.linear(y, _t(sd, pre + ".channel_se.fc.0.weight"),
                        _t(sd, pre + ".channel_se.fc.0.bias")))
    y = torch.sigmoid(F.linear(y, _t(sd, pre + ".channel_se.fc.2.weight"),
                               _t(sd, pre + ".channel_se.fc.2.bias")))
    cse = x * y[:, :, None, None]
    s = torch.sigmoid(F.conv2d(x, _t(sd, pre + ".spatial_se.fc.weight"),
                               _t(sd, pre + ".spatial_se.fc.bias")))
    sse = x * s
    return F.relu(cse + sse)


def _t_resnet18_features(sd, x):
    pre0 = "encoders.encoder."
    x = F.conv2d(x, _t(sd, pre0 + "conv1.weight"), stride=2, padding=3)
    x = F.relu(_tbn(sd, x, pre0 + "bn1"))
    feats = []
    for stage, n in enumerate(RESNET18_LAYERS, start=1):
        for i in range(n):
            pre = f"{pre0}layer{stage}.{i}"
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


def torch_unet_resnet18_logits(sd, x):
    """Full reference UNetResNet forward (unet.py:89-109), hypercolumn
    on, eval mode, dropout 0."""
    enc2, enc3, enc4, enc5 = _t_resnet18_features(sd, x)
    center = _t_cbr(sd, enc5, "center.0")
    center = _t_cbr(sd, center, "center.1")
    center = F.avg_pool2d(center, 2, 2)
    dec5 = _t_decoder(sd, center, enc5, "dec5")
    dec4 = _t_decoder(sd, dec5, enc4, "dec4")
    dec3 = _t_decoder(sd, dec4, enc3, "dec3")
    dec2 = _t_decoder(sd, dec3, enc2, "dec2")
    dec1 = _t_decoder(sd, dec2, None, "dec1")
    hyper = torch.cat([dec1, _t_up(dec2, 2), _t_up(dec3, 4),
                       _t_up(dec4, 8), _t_up(dec5, 16)], 1)
    y = _t_cbr(sd, hyper, "final.0")
    return F.conv2d(y, _t(sd, "final.1.weight"), _t(sd, "final.1.bias"))


# -- the goldens -----------------------------------------------------------

def _flax_logits(sd, x_nhwc, **build_kwargs):
    model = UNetResNet(encoder_depth=18, num_classes=2,
                       use_hypercolumn=True, dtype=jnp.float32,
                       **build_kwargs)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc),
                           train=False)
    params, stats = convert_unet_resnet(sd)
    variables = graft_model(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"])},
        params, stats)
    return np.asarray(model.apply(variables, jnp.asarray(x_nhwc),
                                  train=False))


@pytest.mark.parametrize("impl", ["concat", "sum"])
def test_flagship_forward_matches_torch(impl):
    """Reference-parity build (conv_pad_mode='reference' +
    upsample_mode='align_corners'): whole-trunk logits agree with the
    torch evaluation of the same weights, in both decoder impls
    (checkpoint compatibility of sum vs concat is part of the claim)."""
    sd = fake_unet_resnet18_sd()
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    got = _flax_logits(sd, x, pad_mode="reference",
                       upsample_mode="align_corners",
                       hypercolumn_impl=impl, decoder_impl=impl)
    with torch.no_grad():
        want = torch_unet_resnet18_logits(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got_nchw = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=2e-3, atol=2e-3)


def test_flagship_default_build_divergence_quantified():
    """The DEFAULT build (SAME pad, half-pixel resize) deliberately
    diverges from the reference quirks (blocks.py docstring). Quantify:
    on the same weights the two builds differ (the quirk is real) but
    remain correlated — the divergence is a ~1px feature-map shift, not
    a different function."""
    sd = fake_unet_resnet18_sd()
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    ref = _flax_logits(sd, x, pad_mode="reference",
                       upsample_mode="align_corners")
    default = _flax_logits(sd, x)
    diff = np.abs(ref - default)
    assert diff.max() > 1e-3, "pad/upsample quirk had no effect?"
    corr = np.corrcoef(ref.ravel(), default.ravel())[0, 1]
    assert corr > 0.5, f"default build decorrelated from reference: {corr}"

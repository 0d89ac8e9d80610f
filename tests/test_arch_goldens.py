"""Whole-model torch-forward goldens for every remaining ARCHITECTURES
entry (VERDICT r3 #2) — the flagship UNetResNet is covered by
tests/test_flagship_golden.py; this file pins the other seven trunks:

- UNetSeResNet      (reference: common_blocks/architectures/unet.py:112-172)
- UNetSeResNetXt    (unet.py:175-235)
- UNetDenseNet      (unet.py:238-307)
- LargeKernelMatters (large_kernel_matters.py:8-97)
- PSPNet            (pspnet.py:43-100)
- UNetResNetWithDepth (models_with_depth.py:9-77)
- EmptinessClassifier (misc.py:39-81)
- StackingFCN / StackingFCNWithDepth (misc.py:8-36)

Pattern (same as the flagship golden): a seeded fake reference
state_dict -> a direct torch *functional* re-enactment of the reference
forward (eval mode, dropout 0) vs the converted flax forward in
reference-parity modes (pad_mode="reference",
upsample_mode="align_corners"). The torch re-enactments are built from
the reference module sources line by line, so a passing test means the
flax model + converter reproduce the reference architecture's math, not
merely a self-consistent pair.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from test_flagship_golden import (RESNET18_LAYERS, _add_bn, _add_cbr,
                                  _add_decoder, _conv_init, _t, _t_cbr,
                                  _t_decoder, _t_resnet18_features, _t_up,
                                  _tbn, fake_unet_resnet18_sd)
from test_pretrained import fake_densenet121_sd, torch_densenet121_features

from salt_tpu.models import torch_import as ti

SE50_LAYERS = (3, 4, 6, 3)
SE50_WIDTHS = (256, 512, 1024, 2048)
PARITY = dict(pad_mode="reference", upsample_mode="align_corners")


def _rand(rng, *shape, scale=0.05):
    return (scale * rng.randn(*shape)).astype(np.float32)


# -- generic fake builders ---------------------------------------------------

def fake_se_encoder_sd(rng, groups=1, base_width=64):
    """pretrainedmodels-SENet-shaped state_dict (layer0 stem + per-block
    se_module gates; SEResNetBottleneck when groups==1, SEResNeXt
    32x4d when groups=32/base_width=4)."""
    sd = {"layer0.conv1.weight": _conv_init(rng, 64, 3, 7)}
    _add_bn(sd, rng, "layer0.bn1", 64)
    cin = 64
    for stage, (w, n) in enumerate(zip(SE50_WIDTHS, SE50_LAYERS), start=1):
        inner = w // 4
        width = int(inner * base_width / 64) * groups
        for i in range(n):
            pre = f"layer{stage}.{i}"
            c_in = cin if i == 0 else w
            sd[pre + ".conv1.weight"] = _conv_init(rng, width, c_in, 1)
            _add_bn(sd, rng, pre + ".bn1", width)
            sd[pre + ".conv2.weight"] = _conv_init(
                rng, width, width // groups, 3)
            _add_bn(sd, rng, pre + ".bn2", width)
            sd[pre + ".conv3.weight"] = _conv_init(rng, w, width, 1)
            _add_bn(sd, rng, pre + ".bn3", w)
            if i == 0:
                sd[pre + ".downsample.0.weight"] = _conv_init(rng, w, c_in, 1)
                _add_bn(sd, rng, pre + ".downsample.1", w)
            hid = w // 16
            sd[pre + ".se_module.fc1.weight"] = _conv_init(rng, hid, w, 1)
            sd[pre + ".se_module.fc1.bias"] = _rand(rng, hid)
            sd[pre + ".se_module.fc2.weight"] = _conv_init(rng, w, hid, 1)
            sd[pre + ".se_module.fc2.bias"] = _rand(rng, w)
        cin = w
    return sd


def add_unet_top(sd, rng, enc, b, center_out=None):
    """center + dec5..dec1 + final for any encoder channel tuple ``enc``
    (reference channel arithmetic: unet.py:60-87 / 258-297)."""
    co = center_out or b // 2
    _add_cbr(sd, rng, "center.0", b, b)
    _add_cbr(sd, rng, "center.1", b, co)
    _add_decoder(sd, rng, "dec5", b + co, b, b // 8)
    _add_decoder(sd, rng, "dec4", enc[2] + b // 8, b // 2, b // 8)
    _add_decoder(sd, rng, "dec3", enc[1] + b // 8, b // 4, b // 8)
    _add_decoder(sd, rng, "dec2", enc[0] + b // 8, b // 8, b // 8)
    _add_decoder(sd, rng, "dec1", b // 8, b // 16, b // 8)
    _add_cbr(sd, rng, "final.0", 5 * b // 8, b // 8)
    sd["final.1.weight"] = _conv_init(rng, 2, b // 8, 1)
    sd["final.1.bias"] = _rand(rng, 2)


# -- torch functional re-enactments -----------------------------------------

def _t_se_block(sd, x, pre, stride, stride_conv1, groups):
    """SEResNet/SEResNeXt bottleneck (pretrainedmodels senet.py):
    SEResNetBottleneck strides conv1 (Caffe style), SEResNeXt conv2;
    SE gate applied BEFORE the residual add."""
    s1, s2 = (stride, 1) if stride_conv1 else (1, stride)
    y = F.conv2d(x, _t(sd, pre + ".conv1.weight"), stride=s1)
    y = F.relu(_tbn(sd, y, pre + ".bn1"))
    y = F.conv2d(y, _t(sd, pre + ".conv2.weight"), stride=s2, padding=1,
                 groups=groups)
    y = F.relu(_tbn(sd, y, pre + ".bn2"))
    y = F.conv2d(y, _t(sd, pre + ".conv3.weight"))
    y = _tbn(sd, y, pre + ".bn3")
    z = y.mean(dim=(2, 3), keepdim=True)
    z = F.relu(F.conv2d(z, _t(sd, pre + ".se_module.fc1.weight"),
                        _t(sd, pre + ".se_module.fc1.bias")))
    z = torch.sigmoid(F.conv2d(z, _t(sd, pre + ".se_module.fc2.weight"),
                               _t(sd, pre + ".se_module.fc2.bias")))
    y = y * z
    if pre + ".downsample.0.weight" in sd:
        res = _tbn(sd, F.conv2d(x, _t(sd, pre + ".downsample.0.weight"),
                                stride=stride), pre + ".downsample.1")
    else:
        res = x
    return F.relu(y + res)


def _t_se_features(sd, x, stride_conv1, groups, prefix=""):
    """SeResNet(Xt)Encoders forward, pool0=False (reference:
    encoders.py:48-118 — layer0 conv/bn/relu stem, no maxpool)."""
    g = lambda k: sd[prefix + k]
    x = F.conv2d(x, torch.from_numpy(g("layer0.conv1.weight")),
                 stride=2, padding=3)
    psd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    x = F.relu(_tbn(psd, x, "layer0.bn1"))
    feats = []
    for stage, n in enumerate(SE50_LAYERS, start=1):
        for i in range(n):
            stride = 2 if (stage > 1 and i == 0) else 1
            x = _t_se_block(psd, x, f"layer{stage}.{i}", stride,
                            stride_conv1, groups)
        feats.append(x)
    return feats


def _t_unet_top(sd, feats):
    """center -> dec5..dec1 -> hypercolumn -> final (unet.py:89-109 and
    the SE/DenseNet twins 112-307, identical math)."""
    enc2, enc3, enc4, enc5 = feats
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


def _t_cbr_k(sd, x, pre, kh, kw, relu=True):
    """Conv2dBnRelu with arbitrary kernel (reference base.py:7-37:
    replication pad of kh-1 rows TOP + kw-1 cols RIGHT, then VALID
    conv; optional relu)."""
    x = F.pad(x, (0, kw - 1, kh - 1, 0), mode="replicate")
    x = F.conv2d(x, _t(sd, pre + ".conv.weight"), _t(sd, pre + ".conv.bias"))
    x = _tbn(sd, x, pre + ".batch_norm")
    return F.relu(x) if relu else x


# -- flax side helpers -------------------------------------------------------

def _graft_apply(model, convert, sd, *args, **apply_kwargs):
    variables = model.init(jax.random.PRNGKey(0), *map(jnp.asarray, args),
                           train=False)
    params, stats = convert(sd)
    variables = ti.graft_model(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray,
                                     variables.get("batch_stats", {}))},
        params, stats)
    out = model.apply(variables, *map(jnp.asarray, args), train=False,
                      **apply_kwargs)
    return np.asarray(out)


def _assert_match(got_nhwc, want_torch, rtol=2e-3, atol=2e-3):
    got = np.transpose(got_nhwc, (0, 3, 1, 2))
    np.testing.assert_allclose(got, want_torch.numpy(), rtol=rtol, atol=atol)


# -- the goldens -------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("kind", ["se_resnet", "se_resnext"])
def test_unet_se_trunks_match_torch(kind):
    """UNetSeResNet / UNetSeResNetXt whole-model forward (unet.py:112-235)
    incl. the Caffe-style conv1-stride quirk of pretrainedmodels'
    SEResNetBottleneck vs SEResNeXt's conv2 stride."""
    from salt_tpu.models.unet import UNetSeResNet, UNetSeResNetXt
    rng = np.random.RandomState(3 if kind == "se_resnet" else 4)
    groups, bw = (1, 64) if kind == "se_resnet" else (32, 4)
    enc_sd = fake_se_encoder_sd(rng, groups=groups, base_width=bw)
    sd = {f"encoders.encoder.{k}": v for k, v in enc_sd.items()}
    add_unet_top(sd, rng, SE50_WIDTHS[:3], 2048)
    x = np.random.RandomState(5).rand(1, 64, 64, 3).astype(np.float32)

    ctor = UNetSeResNet if kind == "se_resnet" else UNetSeResNetXt
    got = _graft_apply(ctor(encoder_depth=50, dtype=jnp.float32, **PARITY),
                       ti.convert_unet_resnet, sd, x)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        feats = _t_se_features(sd, xt, stride_conv1=(kind == "se_resnet"),
                               groups=groups, prefix="encoders.encoder.")
        want = _t_unet_top(sd, feats)
    _assert_match(got, want)


@pytest.mark.slow
def test_unet_densenet_matches_torch():
    """UNetDenseNet121 whole-model forward (unet.py:238-307): stage
    features BEFORE transitions, center emitting encoder_channel_nr[2]
    (1024 for 121) rather than bottom//2."""
    from salt_tpu.models.unet import UNetDenseNet
    enc_sd = fake_densenet121_sd(seed=6)
    sd = {f"encoders.encoder.{k}": v for k, v in enc_sd.items()}
    rng = np.random.RandomState(7)
    add_unet_top(sd, rng, (256, 512, 1024), 1024, center_out=1024)
    x = np.random.RandomState(8).rand(1, 64, 64, 3).astype(np.float32)

    got = _graft_apply(
        UNetDenseNet(encoder_depth=121, dtype=jnp.float32, **PARITY),
        ti.convert_unet_resnet, sd, x)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        feats = torch_densenet121_features(enc_sd, xt)
        want = _t_unet_top(sd, feats)
    _assert_match(got, want)


def _fake_lkm_sd(seed=9, k=9, ic=21):
    base = fake_unet_resnet18_sd(seed)
    sd = {key: v for key, v in base.items() if key.startswith("encoders.")}
    rng = np.random.RandomState(seed + 1)

    def cbr(pre, cin, cout, kh, kw):
        sd[pre + ".conv.weight"] = (
            rng.randn(cout, cin, kh, kw) / np.sqrt(cin * kh * kw)
        ).astype(np.float32)
        sd[pre + ".conv.bias"] = _rand(rng, cout)
        _add_bn(sd, rng, pre + ".batch_norm", cout)

    for stage, cin in zip(range(2, 6), (64, 128, 256, 512)):
        cbr(f"gcn{stage}.conv1.0", cin, ic, k, 1)
        cbr(f"gcn{stage}.conv1.1", ic, ic, 1, k)
        cbr(f"gcn{stage}.conv2.0", cin, ic, 1, k)
        cbr(f"gcn{stage}.conv2.1", ic, ic, k, 1)
        cbr(f"enc_br{stage}.conv.0", ic, ic, 3, 3)
        cbr(f"enc_br{stage}.conv.1", ic, ic, 3, 3)
    for stage in range(2, 6):
        sd[f"deconv{stage}.deconv.weight"] = (
            rng.randn(ic, ic, 3, 3) / np.sqrt(ic * 9)).astype(np.float32)
        sd[f"deconv{stage}.deconv.bias"] = _rand(rng, ic)
        _add_bn(sd, rng, f"deconv{stage}.batch_norm", ic)
    for stage in range(1, 5):
        cbr(f"dec_br{stage}.conv.0", ic, ic, 3, 3)
        cbr(f"dec_br{stage}.conv.1", ic, ic, 3, 3)
    sd["final.weight"] = _conv_init(rng, 2, ic, 1)
    sd["final.bias"] = _rand(rng, 2)
    return sd


def test_lkm_matches_torch():
    """LargeKernelMatters whole-model forward
    (large_kernel_matters.py:84-97): factorized GCN branches + boundary
    refinements + ConvTranspose ladder with additive skips. Registry
    default use_relu=True (reference models.py:36-40)."""
    from salt_tpu.models.large_kernel_matters import LargeKernelMatters
    k, ic = 9, 21
    sd = _fake_lkm_sd(k=k, ic=ic)
    x = np.random.RandomState(10).rand(2, 64, 64, 3).astype(np.float32)

    got = _graft_apply(
        LargeKernelMatters(encoder_depth=18, kernel_size=k,
                           internal_channels=ic, use_relu=True,
                           pad_mode="reference", dtype=jnp.float32),
        ti.convert_lkm, sd, x)

    def gcn(xin, pre):
        a = _t_cbr_k(sd, xin, pre + ".conv1.0", k, 1)
        a = _t_cbr_k(sd, a, pre + ".conv1.1", 1, k)
        b = _t_cbr_k(sd, xin, pre + ".conv2.0", 1, k)
        b = _t_cbr_k(sd, b, pre + ".conv2.1", k, 1)
        return a + b

    def br(xin, pre):
        y = _t_cbr_k(sd, xin, pre + ".conv.0", 3, 3, relu=True)
        y = _t_cbr_k(sd, y, pre + ".conv.1", 3, 3, relu=False)
        return xin + y

    def deconv(xin, pre):
        y = F.conv_transpose2d(xin, _t(sd, pre + ".deconv.weight"),
                               _t(sd, pre + ".deconv.bias"), stride=2,
                               padding=1, output_padding=1)
        return F.relu(_tbn(sd, y, pre + ".batch_norm"))

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        e2, e3, e4, e5 = _t_resnet18_features(sd, xt)
        g2 = br(gcn(e2, "gcn2"), "enc_br2")
        g3 = br(gcn(e3, "gcn3"), "enc_br3")
        g4 = br(gcn(e4, "gcn4"), "enc_br4")
        g5 = br(gcn(e5, "gcn5"), "enc_br5")
        d5 = deconv(g5, "deconv5")
        d4 = deconv(br(d5 + g4, "dec_br4"), "deconv4")
        d3 = deconv(br(d4 + g3, "dec_br3"), "deconv3")
        d2 = br(deconv(br(d3 + g2, "dec_br2"), "deconv2"), "dec_br1")
        want = F.conv2d(d2, _t(sd, "final.weight"), _t(sd, "final.bias"))
    _assert_match(got, want)


def test_pspnet_matches_torch():
    """PSPNet whole-model forward (pspnet.py:43-100): adaptive-pool
    pyramid (incl. the non-divisor 6x6-from-4x4 overlapping-bin case) +
    align-corners blow-up + PReLU upsample ladder + hypercolumn head."""
    from salt_tpu.models.pspnet import PSPNet
    f = 256
    base = fake_unet_resnet18_sd(11)
    sd = {k: v for k, v in base.items() if k.startswith("encoders.")}
    rng = np.random.RandomState(12)
    for i in range(4):
        sd[f"psp.stages.{i}.1.weight"] = _conv_init(rng, 512, 512, 1)
    sd["psp.bottleneck.weight"] = _conv_init(rng, f, 512 * 5, 1)
    sd["psp.bottleneck.bias"] = _rand(rng, f)
    c = f
    for up in ("up4", "up3", "up2", "up1"):
        sd[f"{up}.conv.0.weight"] = _conv_init(rng, c // 2, c, 3)
        sd[f"{up}.conv.0.bias"] = _rand(rng, c // 2)
        _add_bn(sd, rng, f"{up}.conv.1", c // 2)
        sd[f"{up}.conv.2.weight"] = np.full((1,), 0.2, np.float32)
        c //= 2
    _add_cbr(sd, rng, "final.0", f // 16 * 15, 64)
    sd["final.1.weight"] = _conv_init(rng, 2, 64, 1)
    sd["final.1.bias"] = _rand(rng, 2)

    x = np.random.RandomState(13).rand(2, 64, 64, 3).astype(np.float32)
    got = _graft_apply(
        PSPNet(encoder_depth=18, deep_features_size=f, dtype=jnp.float32,
               **PARITY),
        ti.convert_pspnet, sd, x)

    def t_up_stage(pre, y):
        y = F.interpolate(y, scale_factor=2, mode="bilinear",
                          align_corners=True)
        y = F.conv2d(y, _t(sd, pre + ".conv.0.weight"),
                     _t(sd, pre + ".conv.0.bias"), padding=1)
        y = _tbn(sd, y, pre + ".conv.1")
        return F.prelu(y, _t(sd, pre + ".conv.2.weight"))

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        enc5 = _t_resnet18_features(sd, xt)[-1]
        h, w = enc5.shape[2:]
        priors = []
        for i, size in enumerate((1, 2, 3, 6)):
            p = F.adaptive_avg_pool2d(enc5, size)
            p = F.conv2d(p, _t(sd, f"psp.stages.{i}.1.weight"))
            priors.append(F.interpolate(p, size=(h, w), mode="bilinear",
                                        align_corners=True))
        priors.append(enc5)
        y = F.relu(F.conv2d(torch.cat(priors, 1),
                            _t(sd, "psp.bottleneck.weight"),
                            _t(sd, "psp.bottleneck.bias")))
        up4 = t_up_stage("up4", y)
        up3 = t_up_stage("up3", up4)
        up2 = t_up_stage("up2", up3)
        up1 = t_up_stage("up1", up2)
        hyper = torch.cat([up1, _t_up(up2, 2), _t_up(up3, 4),
                           _t_up(up4, 8)], 1)
        y = _t_cbr(sd, hyper, "final.0")
        want = F.conv2d(y, _t(sd, "final.1.weight"), _t(sd, "final.1.bias"))
    _assert_match(got, want)


def test_unet_resnet_with_depth_matches_torch():
    """UNetResNetWithDepth whole-model forward (models_with_depth.py:
    9-77): the depth-excitation gate multiplies the HYPERCOLUMN features
    before the final ConvBnRelu + head."""
    from salt_tpu.models.models_with_depth import UNetResNetWithDepth
    sd = fake_unet_resnet18_sd(14)
    rng = np.random.RandomState(15)
    c = 5 * 512 // 8
    sd["depth_channel_excitation.fc.0.weight"] = (
        rng.randn(c, 1).astype(np.float32))
    sd["depth_channel_excitation.fc.0.bias"] = _rand(rng, c)
    x = np.random.RandomState(16).rand(2, 64, 64, 3).astype(np.float32)
    d = np.asarray([[0.25], [0.8]], np.float32)

    got = _graft_apply(
        UNetResNetWithDepth(encoder_depth=18, dtype=jnp.float32, **PARITY),
        ti.convert_unet_resnet_with_depth, sd, x, d)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        enc2, enc3, enc4, enc5 = _t_resnet18_features(sd, xt)
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
        gate = torch.sigmoid(F.linear(
            torch.from_numpy(d),
            _t(sd, "depth_channel_excitation.fc.0.weight"),
            _t(sd, "depth_channel_excitation.fc.0.bias")))
        hyper = hyper * gate[:, :, None, None]
        y = _t_cbr(sd, hyper, "final.0")
        want = F.conv2d(y, _t(sd, "final.1.weight"), _t(sd, "final.1.bias"))
    _assert_match(got, want)


def test_emptiness_classifier_matches_torch():
    """EmptinessClassifier forward (misc.py:39-81): resnet18 trunk
    (conv1 stem WITHOUT maxpool) + AvgPool2d(8) + 1x1 conv head. At the
    production 128px input the 8x8 enc5 average IS the global mean the
    flax model computes."""
    from salt_tpu.models.emptiness import EmptinessClassifier
    base = fake_unet_resnet18_sd(17)
    pre = "encoders.encoder."
    sd = {"encoder." + k[len(pre):]: v for k, v in base.items()
          if k.startswith(pre)}
    rng = np.random.RandomState(18)
    sd["classifier.1.weight"] = _conv_init(rng, 2, 512, 1)
    sd["classifier.1.bias"] = _rand(rng, 2)
    x = np.random.RandomState(19).rand(2, 128, 128, 3).astype(np.float32)

    got = _graft_apply(EmptinessClassifier(encoder_depth=18,
                                           dtype=jnp.float32),
                       ti.convert_emptiness, sd, x)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tsd = {pre + k[len("encoder."):]: v for k, v in sd.items()
               if k.startswith("encoder.")}
        enc5 = _t_resnet18_features(tsd, xt)[-1]
        pred = F.avg_pool2d(enc5, 8)
        want = F.conv2d(pred, _t(sd, "classifier.1.weight"),
                        _t(sd, "classifier.1.bias"))
    np.testing.assert_allclose(got, want.numpy().reshape(2, 2),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("with_depth", [False, True])
def test_stacking_fcn_matches_torch(with_depth):
    """StackingFCN(±Depth) forward (misc.py:8-36): one 3x3 Conv2dBnRelu
    over the stacked model-probability channels (+ optional depth gate)
    + 1x1 head."""
    from salt_tpu.models.stacking import StackingFCN, StackingFCNWithDepth
    n_models, filt = 4, 8
    rng = np.random.RandomState(20)
    sd = {}
    _add_cbr(sd, rng, "conv.0", n_models, filt)
    if with_depth:
        sd["depth_channel_excitation.fc.0.weight"] = (
            rng.randn(filt, 1).astype(np.float32))
        sd["depth_channel_excitation.fc.0.bias"] = _rand(rng, filt)
    sd["final.0.weight"] = _conv_init(rng, 2, filt, 1)
    sd["final.0.bias"] = _rand(rng, 2)
    x = np.random.RandomState(21).rand(2, 32, 32, n_models).astype(np.float32)
    d = np.asarray([[0.3], [0.7]], np.float32)

    if with_depth:
        model = StackingFCNWithDepth(input_model_nr=n_models, filter_nr=filt,
                                     pad_mode="reference", dtype=jnp.float32)
        got = _graft_apply(model, ti.convert_stacking_fcn, sd, x, d)
    else:
        model = StackingFCN(input_model_nr=n_models, filter_nr=filt,
                            pad_mode="reference", dtype=jnp.float32)
        got = _graft_apply(model, ti.convert_stacking_fcn, sd, x)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        y = _t_cbr(sd, xt, "conv.0")
        if with_depth:
            gate = torch.sigmoid(F.linear(
                torch.from_numpy(d),
                _t(sd, "depth_channel_excitation.fc.0.weight"),
                _t(sd, "depth_channel_excitation.fc.0.bias")))
            y = y * gate[:, :, None, None]
        want = F.conv2d(y, _t(sd, "final.0.weight"), _t(sd, "final.0.bias"))
    _assert_match(got, want)


def test_adaptive_avg_pool_matches_torch_all_sizes():
    """The exact AdaptiveAvgPool2d replacement (models/pspnet.py) must
    match torch bin semantics for every (in, out) pair the PSP pyramid
    can see, including overlapping bins (out > in)."""
    from salt_tpu.models.pspnet import adaptive_avg_pool
    rng = np.random.RandomState(22)
    for n_in in (4, 5, 7, 8):
        x = rng.rand(2, n_in, n_in, 3).astype(np.float32)
        for out in (1, 2, 3, 6):
            got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out))
            with torch.no_grad():
                want = F.adaptive_avg_pool2d(
                    torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), out)
            np.testing.assert_allclose(
                np.transpose(got, (0, 3, 1, 2)), want.numpy(),
                rtol=1e-5, atol=1e-6,
                err_msg=f"adaptive pool {n_in}->{out}")

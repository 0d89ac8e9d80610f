"""Model architecture tests: every registry entry initializes and emits
correct shapes; encoder feature pyramids match the reference's stage
structure (reference: encoders.py, unet.py, misc.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.core.config import ModelConfig
from salt_tpu.models.registry import ARCHITECTURES, build_model, takes_depth


def _init_and_apply(model, x, d=None):
    rng = jax.random.PRNGKey(0)
    args = (x,) if d is None else (x, d)
    variables = model.init({"params": rng, "dropout": rng}, *args, train=False)
    return model.apply(variables, *args, train=False)


def test_resnet34_encoder_pyramid():
    from salt_tpu.models.encoders import ResNetEncoder
    enc = ResNetEncoder(depth=34, pool0=False)
    x = jnp.zeros((1, 128, 128, 3))
    feats = _init_and_apply(enc, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 64, 64, 64), (1, 32, 32, 128),
                      (1, 16, 16, 256), (1, 8, 8, 512)]


def test_resnet50_encoder_pyramid():
    from salt_tpu.models.encoders import ResNetEncoder
    enc = ResNetEncoder(depth=50, pool0=False)
    feats = _init_and_apply(enc, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]


def test_densenet121_encoder_channels():
    from salt_tpu.models.encoders import DenseNetEncoder, encoder_channels
    assert encoder_channels("densenet", 121) == (256, 512, 1024, 1024)
    enc = DenseNetEncoder(depth=121, pool0=False)
    feats = _init_and_apply(enc, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 1024]


def test_unet_resnet34_output_shape():
    from salt_tpu.models.unet import UNetResNet
    model = UNetResNet(encoder_depth=34, num_classes=2, use_hypercolumn=True)
    out = _init_and_apply(model, jnp.zeros((1, 128, 128, 3)))
    assert out.shape == (1, 128, 128, 2)
    assert out.dtype == jnp.float32


def test_unet_no_hypercolumn():
    from salt_tpu.models.unet import UNetResNet
    model = UNetResNet(encoder_depth=18, num_classes=2, use_hypercolumn=False)
    out = _init_and_apply(model, jnp.zeros((1, 128, 128, 3)))
    assert out.shape == (1, 128, 128, 2)


@pytest.mark.parametrize("name,cfg_kwargs,needs_depth", [
    ("SaltUNet", dict(n_filters=8, repeat_blocks=2), False),
    ("SaltLinkNet", dict(n_filters=8, repeat_blocks=2), False),
    ("UNetResNet", dict(encoder_depth=18), False),
    ("LargeKernelMatters", dict(encoder_depth=18, kernel_size=5), False),
    ("PSPNet", dict(encoder_depth=18), False),
    ("UNetResNetWithDepth", dict(encoder_depth=18), True),
    ("StackingFCN", dict(input_model_nr=4), False),
    ("StackingFCNWithDepth", dict(input_model_nr=4), True),
])
def test_registry_segmentation_models(name, cfg_kwargs, needs_depth):
    cfg = ModelConfig(architecture=name, num_classes=2, **cfg_kwargs)
    model = build_model(cfg, "float32")
    c_in = cfg.input_model_nr if name.startswith("Stacking") else 3
    x = jnp.zeros((2, 64, 64, c_in))
    d = jnp.zeros((2, 1)) if needs_depth else None
    out = _init_and_apply(model, x, d)
    assert out.shape == (2, 64, 64, 2)
    assert takes_depth(name) == needs_depth


def test_emptiness_classifier():
    cfg = ModelConfig(architecture="EmptinessClassifier", num_classes=2)
    model = build_model(cfg, "float32")
    out = _init_and_apply(model, jnp.zeros((2, 128, 128, 3)))
    assert out.shape == (2, 2)


@pytest.mark.slow
def test_heavy_encoders_initialize():
    """SE-ResNet50 / SE-ResNeXt50 / DenseNet121 U-Nets build and run on
    a small input (full 128px covered by the e2e/bench paths)."""
    from salt_tpu.models.unet import (UNetDenseNet, UNetSeResNet,
                                      UNetSeResNetXt)
    for model in [UNetSeResNet(encoder_depth=50),
                  UNetSeResNetXt(encoder_depth=50),
                  UNetDenseNet(encoder_depth=121)]:
        out = _init_and_apply(model, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 64, 64, 2)


def test_registry_covers_reference_architectures():
    """Every entry in the reference ARCHITECTURES dict
    (reference: models.py:15-64) has a counterpart here."""
    reference_names = {"UNetResNet", "UNetSeResNet", "UNetSeResNetXt",
                       "UNetDenseNet", "LargeKernelMatters", "PSPNet",
                       "UNetResNetWithDepth", "StackingFCN",
                       "StackingFCNWithDepth", "EmptinessClassifier"}
    assert reference_names.issubset(set(ARCHITECTURES))


def test_predict_dataset_scan_matches_per_batch():
    """The scan-based predict_dataset must equal direct predict_step
    calls batch by batch (including the ragged tail)."""
    import numpy as np
    import jax
    from salt_tpu.core.config import default_config
    from salt_tpu.train.steps import SegmentationRunner

    cfg = default_config()
    cfg.model.architecture = "SaltUNet"
    cfg.model.n_filters = 8
    cfg.model.repeat_blocks = 3
    cfg.training.dtype = "float32"
    cfg.training.batch_size_inference = 8
    r = SegmentationRunner(cfg)
    state = r.init_state(0)
    rng = np.random.RandomState(0)
    images = (rng.rand(19, 101, 101) * 255).astype(np.uint8)  # ragged: 19 = 2*8+3

    got = r.predict_dataset(state, images)
    assert got.shape == (19, 2, 101, 101)

    ref = []
    for lo in range(0, 19, 8):
        batch = images[lo:lo + 8]
        pad = 8 - batch.shape[0]
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad, 101, 101), np.uint8)])
        d = np.zeros((8, 1), np.float32)
        db, dd = r.device_batch(batch, d)
        p = r.predict_step(state.params, state.batch_stats, db, dd)
        ref.append(np.asarray(p)[:min(8, 19 - lo)])
    ref = np.concatenate(ref)
    np.testing.assert_allclose(got, ref, atol=1e-6)

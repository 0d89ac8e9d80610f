"""Model-config string knobs are ==-matched in the blocks; the registry
must reject typos instead of silently building the default variant."""
import dataclasses

import pytest

from salt_tpu.core.config import default_config
from salt_tpu.models.registry import build_model


@pytest.mark.parametrize("field,value", [
    ("conv_pad_mode", "ref"),
    ("upsample_mode", "alignCorners"),
    ("hypercolumn_impl", "summ"),
    ("decoder_impl", "cat"),
    ("pallas_conv", "yes"),
])
def test_unknown_mode_strings_raise(field, value):
    cfg = dataclasses.replace(default_config().model, architecture="UNetResNet",
                              **{field: value})
    with pytest.raises(ValueError, match=field):
        build_model(cfg)


def test_valid_modes_build():
    cfg = dataclasses.replace(default_config().model,
                              architecture="UNetResNet",
                              conv_pad_mode="reference",
                              upsample_mode="align_corners")
    build_model(cfg)

"""One-time converter: torch encoder checkpoints -> flax param pytrees.

The reference gets its ImageNet encoders from torchvision /
pretrainedmodels at model construction (reference:
common_blocks/architectures/encoders.py:10-19,52-57,90-93,125-132).
Those packages download weights at runtime; this build instead converts
a torch ``state_dict`` file ONCE into the framework's own npz checkpoint
format, so no torch dependency exists on the TPU serving path.

Weight layout rules:
- conv weight  [O, I, kh, kw]  ->  flax kernel [kh, kw, I, O]
- linear weight [O, I]         ->  flax kernel [I, O]
- BatchNorm weight/bias        ->  params scale/bias
- BatchNorm running_mean/var   ->  batch_stats mean/var

Supported naming schemes: torchvision ResNet (resnet18/34/50/101/152)
and pretrainedmodels SENet (se_resnet*/se_resnext*; layer0.conv1 stem,
per-block se_module.fc1/fc2 1x1-conv gates).

Usage::

    sd = load_state_dict("resnet34.pth")          # any torch pickle
    params, stats = convert_resnet_encoder(sd)
    variables = graft_encoder(model_variables, params, stats)
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a checkpoint into numpy. ``.npz`` files (torch-style key
    names, numpy values) load without torch; anything else goes through
    ``torch.load`` (torch is only needed here, on the host, never on the
    TPU path)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def convert_resnet_encoder(sd: Dict[str, np.ndarray]
                           ) -> Tuple[dict, dict]:
    """torchvision-ResNet or pretrainedmodels-SENet state_dict ->
    (params, batch_stats) trees matching
    salt_tpu.models.encoders.ResNetEncoder."""
    senet = any(k.startswith("layer0.") for k in sd)
    stem = "layer0." if senet else ""
    params: dict = {}
    stats: dict = {}

    params["conv1"] = {"kernel": _conv(sd[f"{stem}conv1.weight"])}
    bn_p, bn_s = _bn(sd, f"{stem}bn1")
    params["bn1"], stats["bn1"] = {"BatchNorm_0": bn_p}, {"BatchNorm_0": bn_s}

    for stage in range(1, 5):
        i = 0
        while f"layer{stage}.{i}.conv1.weight" in sd:
            pre = f"layer{stage}.{i}"
            name = f"layer{stage}_{i}"
            block_p: dict = {}
            block_s: dict = {}
            for conv_id in (1, 2, 3):
                ck = f"{pre}.conv{conv_id}.weight"
                if ck not in sd:
                    continue
                block_p[f"conv{conv_id}"] = {"kernel": _conv(sd[ck])}
                bp, bs = _bn(sd, f"{pre}.bn{conv_id}")
                block_p[f"bn{conv_id}"] = {"BatchNorm_0": bp}
                block_s[f"bn{conv_id}"] = {"BatchNorm_0": bs}
            if f"{pre}.downsample.0.weight" in sd:
                block_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{pre}.downsample.0.weight"])}
                bp, bs = _bn(sd, f"{pre}.downsample.1")
                block_p["downsample_bn"] = {"BatchNorm_0": bp}
                block_s["downsample_bn"] = {"BatchNorm_0": bs}
            if f"{pre}.se_module.fc1.weight" in sd:
                block_p["se"] = {
                    "fc1": {"kernel": _conv(sd[f"{pre}.se_module.fc1.weight"]),
                            "bias": sd[f"{pre}.se_module.fc1.bias"]},
                    "fc2": {"kernel": _conv(sd[f"{pre}.se_module.fc2.weight"]),
                            "bias": sd[f"{pre}.se_module.fc2.bias"]},
                }
            params[name] = block_p
            if block_s:
                stats[name] = block_s
            i += 1
    return params, stats


def convert_densenet_encoder(sd: Dict[str, np.ndarray]
                             ) -> Tuple[dict, dict]:
    """torchvision-DenseNet state_dict (``features.*`` naming) ->
    (params, batch_stats) trees matching
    salt_tpu.models.encoders.DenseNetEncoder
    (reference loads these weights at encoders.py:121-164)."""
    params: dict = {}
    stats: dict = {}

    def put_bn(torch_prefix: str, tree_name: str):
        bn_p, bn_s = _bn(sd, torch_prefix)
        params[tree_name] = {"BatchNorm_0": bn_p}
        stats[tree_name] = {"BatchNorm_0": bn_s}

    params["conv0"] = {"kernel": _conv(sd["features.conv0.weight"])}
    put_bn("features.norm0", "norm0")

    block = 1
    while f"features.denseblock{block}.denselayer1.conv1.weight" in sd:
        layer = 1
        while (f"features.denseblock{block}.denselayer{layer}.conv1.weight"
               in sd):
            pre = f"features.denseblock{block}.denselayer{layer}"
            name = f"denseblock{block}_{layer - 1}"   # 0-based flax naming
            lp: dict = {}
            ls: dict = {}
            for norm_id, conv_id in ((1, 1), (2, 2)):
                bn_p, bn_s = _bn(sd, f"{pre}.norm{norm_id}")
                lp[f"norm{norm_id}"] = {"BatchNorm_0": bn_p}
                ls[f"norm{norm_id}"] = {"BatchNorm_0": bn_s}
                lp[f"conv{conv_id}"] = {
                    "kernel": _conv(sd[f"{pre}.conv{conv_id}.weight"])}
            params[name] = lp
            stats[name] = ls
            layer += 1
        if f"features.transition{block}.conv.weight" in sd:
            put_bn(f"features.transition{block}.norm",
                   f"transition{block}_norm")
            params[f"transition{block}_conv"] = {
                "kernel": _conv(sd[f"features.transition{block}.conv.weight"])}
        block += 1
    return params, stats


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _cbr(sd: Dict[str, np.ndarray], pre: str) -> Tuple[dict, dict]:
    """Reference ``Conv2dBnRelu`` (base.py:7-37) -> flax ConvBnRelu
    params/stats. The reference's conv keeps its bias even under BN
    (nn.Conv2d default); flax drops it — the bias is folded into the BN
    running mean (mean' = mean - bias), which is exact: in eval the BN
    subtracts it right back, and in train mode a pre-BN bias cancels in
    the batch-mean subtraction."""
    p = {"Conv_0": {"kernel": _conv(sd[f"{pre}.conv.weight"])}}
    bn_p, bn_s = _bn(sd, f"{pre}.batch_norm")
    if f"{pre}.conv.bias" in sd:
        bn_s = {"mean": bn_s["mean"] - sd[f"{pre}.conv.bias"],
                "var": bn_s["var"]}
    p["BatchNorm_0"] = bn_p
    return p, {"BatchNorm_0": bn_s}


def _decoder_block(sd: Dict[str, np.ndarray], pre: str) -> Tuple[dict, dict]:
    """Reference scSE ``DecoderBlock`` (base.py:65-117) -> flax
    DecoderBlock params/stats. The spatial-SE 1x1 conv maps onto the
    flax Dense formulation (identical math — blocks.py SpatialSELayer)."""
    p: dict = {}
    s: dict = {}
    p["ConvBnRelu_0"], s["ConvBnRelu_0"] = _cbr(sd, f"{pre}.conv1")
    p["ConvBnRelu_1"], s["ConvBnRelu_1"] = _cbr(sd, f"{pre}.conv2")
    p["ChannelSELayer_0"] = {
        "Dense_0": {"kernel": _linear(sd[f"{pre}.channel_se.fc.0.weight"]),
                    "bias": sd[f"{pre}.channel_se.fc.0.bias"]},
        "Dense_1": {"kernel": _linear(sd[f"{pre}.channel_se.fc.2.weight"]),
                    "bias": sd[f"{pre}.channel_se.fc.2.bias"]},
    }
    w = sd[f"{pre}.spatial_se.fc.weight"]           # [1, C, 1, 1]
    p["SpatialSELayer_0"] = {
        "Dense_0": {"kernel": w.reshape(w.shape[:2]).T,   # -> [C, 1]
                    "bias": sd[f"{pre}.spatial_se.fc.bias"]},
    }
    return p, s


def convert_unet_resnet(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """FULL reference U-Net trunk state_dict (architectures/unet.py:
    22-109 UNetResNet, 112-172 UNetSeResNet, 175-235 UNetSeResNetXt,
    238-307 UNetDenseNet: encoders + center + dec5..dec1 + final) ->
    complete (params, batch_stats) trees for the flax UNetTrunk. The
    encoder sub-checkpoint dispatches on its naming scheme (torchvision
    ResNet / pretrainedmodels SENet / torchvision DenseNet). Run the
    flax model with ``conv_pad_mode="reference"`` and
    ``upsample_mode="align_corners"`` for forward fidelity with the
    torch original (tests/test_flagship_golden.py,
    tests/test_arch_goldens.py)."""
    enc_prefix = "encoders.encoder."
    enc_sd = {k[len(enc_prefix):]: v for k, v in sd.items()
              if k.startswith(enc_prefix)}
    if not enc_sd:
        raise KeyError("state_dict has no 'encoders.encoder.*' keys — "
                       "not a full reference U-Net checkpoint")
    enc_p, enc_s = convert_encoder(enc_sd)
    params: dict = {"encoder": enc_p}
    stats: dict = {"encoder": enc_s}
    params["center_conv1"], stats["center_conv1"] = _cbr(sd, "center.0")
    params["center_conv2"], stats["center_conv2"] = _cbr(sd, "center.1")
    for k in range(1, 6):
        params[f"dec{k}"], stats[f"dec{k}"] = _decoder_block(sd, f"dec{k}")
    params["final_conv"], stats["final_conv"] = _cbr(sd, "final.0")
    params["head"] = {"kernel": _conv(sd["final.1.weight"]),
                      "bias": sd["final.1.bias"]}
    return params, stats


def _depth_gate(sd: Dict[str, np.ndarray], pre: str) -> dict:
    """Reference ``DepthChannelExcitation`` (base.py:120-131): a single
    Linear(1 -> C) + sigmoid -> flax DepthChannelExcitation/Dense_0."""
    return {"Dense_0": {"kernel": _linear(sd[f"{pre}.fc.0.weight"]),
                        "bias": sd[f"{pre}.fc.0.bias"]}}


def convert_unet_resnet_with_depth(sd: Dict[str, np.ndarray]
                                   ) -> Tuple[dict, dict]:
    """Reference ``UNetResNetWithDepth`` (models_with_depth.py:9-77) ->
    flax UNetResNetWithDepth trees: the shared trunk nests under
    'trunk' (minus final/head, which sit after the depth gate at the
    top level, mirroring the reference's gate-before-final order)."""
    p, s = convert_unet_resnet(sd)
    final_p, final_s = p.pop("final_conv"), s.pop("final_conv")
    head = p.pop("head")
    params = {"trunk": p,
              "depth_gate": _depth_gate(sd, "depth_channel_excitation"),
              "final_conv": final_p, "head": head}
    return params, {"trunk": s, "final_conv": final_s}


def _deconv_cbr(sd: Dict[str, np.ndarray], pre: str) -> Tuple[dict, dict]:
    """Reference ``DeconvConv2dBnRelu`` (base.py:40-57):
    ConvTranspose2d(k=3, s=2, p=1, output_padding=1) + BN + ReLU ->
    flax DeconvConvBnRelu (pad_mode='reference'). torch's transposed
    conv is the gradient of a correlation — equivalently a correlation
    of the stride-dilated input with the spatially FLIPPED kernel and
    in/out swapped: [I, O, kh, kw] -> flip(kh, kw) -> [kh, kw, I, O].
    The deconv bias folds into the BN running mean (see _cbr)."""
    w = sd[f"{pre}.deconv.weight"]
    kernel = np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
    p = {"ConvTranspose_0": {"kernel": kernel}}
    bn_p, bn_s = _bn(sd, f"{pre}.batch_norm")
    if f"{pre}.deconv.bias" in sd:
        bn_s = {"mean": bn_s["mean"] - sd[f"{pre}.deconv.bias"],
                "var": bn_s["var"]}
    p["BatchNorm_0"] = bn_p
    return p, {"BatchNorm_0": bn_s}


def _gcn(sd: Dict[str, np.ndarray], pre: str) -> Tuple[dict, dict]:
    """Reference ``GlobalConvolutionalNetwork`` (base.py:152-178): two
    factorized (k,1)+(1,k) branches of Conv2dBnRelu. flax call order is
    conv1.0, conv1.1, conv2.0, conv2.1 -> ConvBnRelu_0..3."""
    p: dict = {}
    s: dict = {}
    for i, torch_name in enumerate(("conv1.0", "conv1.1",
                                    "conv2.0", "conv2.1")):
        p[f"ConvBnRelu_{i}"], s[f"ConvBnRelu_{i}"] = _cbr(
            sd, f"{pre}.{torch_name}")
    return p, s


def _br(sd: Dict[str, np.ndarray], pre: str) -> Tuple[dict, dict]:
    """Reference ``BoundaryRefinement`` (base.py:181-197)."""
    p: dict = {}
    s: dict = {}
    for i in range(2):
        p[f"ConvBnRelu_{i}"], s[f"ConvBnRelu_{i}"] = _cbr(
            sd, f"{pre}.conv.{i}")
    return p, s


def convert_lkm(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Reference ``LargeKernelMatters`` (large_kernel_matters.py:8-97)
    -> flax LargeKernelMatters trees."""
    enc_prefix = "encoders.encoder."
    enc_sd = {k[len(enc_prefix):]: v for k, v in sd.items()
              if k.startswith(enc_prefix)}
    enc_p, enc_s = convert_resnet_encoder(enc_sd)
    params: dict = {"encoder": enc_p}
    stats: dict = {"encoder": enc_s}
    for k in range(2, 6):
        params[f"gcn_{k}"], stats[f"gcn_{k}"] = _gcn(sd, f"gcn{k}")
        params[f"enc_br_{k}"], stats[f"enc_br_{k}"] = _br(sd, f"enc_br{k}")
    for k in range(2, 6):
        params[f"deconv{k}"], stats[f"deconv{k}"] = _deconv_cbr(
            sd, f"deconv{k}")
    for k in range(1, 5):
        params[f"dec_br{k}"], stats[f"dec_br{k}"] = _br(sd, f"dec_br{k}")
    params["final"] = {"kernel": _conv(sd["final.weight"]),
                       "bias": sd["final.bias"]}
    return params, stats


def convert_pspnet(sd: Dict[str, np.ndarray],
                   sizes=(1, 2, 3, 6)) -> Tuple[dict, dict]:
    """Reference ``PSPNet`` (pspnet.py:43-100) -> flax PSPNet trees.
    psp.stages.{i} is Sequential(AdaptiveAvgPool2d, Conv2d) so the conv
    sits at index 1; the PSPUpsample conv block is Sequential(Conv2d,
    BatchNorm2d, PReLU) whose PReLU carries one learnable scalar."""
    enc_prefix = "encoders.encoder."
    enc_sd = {k[len(enc_prefix):]: v for k, v in sd.items()
              if k.startswith(enc_prefix)}
    enc_p, enc_s = convert_resnet_encoder(enc_sd)
    params: dict = {"encoder": enc_p}
    stats: dict = {"encoder": enc_s}
    psp: dict = {}
    for i, size in enumerate(sizes):
        psp[f"stage_{size}"] = {
            "kernel": _conv(sd[f"psp.stages.{i}.1.weight"])}
    psp["bottleneck"] = {"kernel": _conv(sd["psp.bottleneck.weight"]),
                         "bias": sd["psp.bottleneck.bias"]}
    params["psp"] = psp
    for k in range(1, 5):
        pre = f"up{k}.conv"
        bn_p, bn_s = _bn(sd, f"{pre}.1")
        params[f"up{k}"] = {
            "Conv_0": {"kernel": _conv(sd[f"{pre}.0.weight"]),
                       "bias": sd[f"{pre}.0.bias"]},
            "BatchNorm_0": bn_p,
            "prelu_alpha": sd[f"{pre}.2.weight"].reshape(()),
        }
        stats[f"up{k}"] = {"BatchNorm_0": bn_s}
    params["final_conv"], stats["final_conv"] = _cbr(sd, "final.0")
    params["head"] = {"kernel": _conv(sd["final.1.weight"]),
                      "bias": sd["final.1.bias"]}
    return params, stats


def convert_emptiness(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Reference ``EmptinessClassifier`` (misc.py:39-81) -> flax
    EmptinessClassifier trees. The torch module aliases the torchvision
    resnet under both 'encoder.*' and the stage attributes; the
    'encoder.*' view is converted (fc.* ignored — the reference replaces
    the ImageNet head with AvgPool2d + 1x1 conv)."""
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.") and not k.startswith("encoder.fc")}
    enc_p, enc_s = convert_resnet_encoder(enc_sd)
    params = {"encoder": enc_p,
              "classifier": {"kernel": _conv(sd["classifier.1.weight"]),
                             "bias": sd["classifier.1.bias"]}}
    return params, {"encoder": enc_s}


def convert_stacking_fcn(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Reference ``StackingFCN`` / ``StackingFCNWithDepth``
    (misc.py:8-36) -> flax trees (depth gate included when present)."""
    params: dict = {}
    stats: dict = {}
    params["conv"], stats["conv"] = _cbr(sd, "conv.0")
    if "depth_channel_excitation.fc.0.weight" in sd:
        params["depth_gate"] = _depth_gate(sd, "depth_channel_excitation")
    params["final"] = {"kernel": _conv(sd["final.0.weight"]),
                       "bias": sd["final.0.bias"]}
    return params, stats


def convert_encoder(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Dispatch on the checkpoint's naming scheme: torchvision DenseNet
    (``features.*``), pretrainedmodels SENet (``layer0.*``), or
    torchvision ResNet."""
    if any(k.startswith("features.") for k in sd):
        return convert_densenet_encoder(sd)
    return convert_resnet_encoder(sd)


def _check(tree_a, tree_b, path=""):
    for k, v in tree_b.items():
        if k not in tree_a:
            raise KeyError(f"pretrained key {path}/{k} not in model")
        if isinstance(v, dict):
            _check(tree_a[k], v, f"{path}/{k}")
        else:
            want = np.shape(tree_a[k])
            got = np.shape(v)
            if want != got:
                raise ValueError(
                    f"shape mismatch at {path}/{k}: model {want}, "
                    f"checkpoint {got}")


def _merge(tree_a, tree_b):
    out = dict(tree_a)
    for k, v in tree_b.items():
        if isinstance(v, dict):
            out[k] = _merge(tree_a[k], v)
        else:
            out[k] = np.asarray(v, dtype=np.asarray(tree_a[k]).dtype)
    return out


def graft_model(variables: dict, params: dict, stats: dict) -> dict:
    """Replace a model's WHOLE param/batch-stat trees with converted
    weights (e.g. a full reference UNetResNet checkpoint via
    :func:`convert_unet_resnet`), with leaf-by-leaf shape checking."""
    _check(variables["params"], params)
    _check(variables.get("batch_stats", {}), stats)
    return {"params": _merge(variables["params"], params),
            "batch_stats": _merge(variables.get("batch_stats", {}), stats)}


def graft_encoder(variables: dict, enc_params: dict, enc_stats: dict,
                  scope: str = "encoder") -> dict:
    """Replace the encoder subtree of a model's variables with converted
    pretrained weights, after checking shape agreement leaf-by-leaf."""
    new_vars = {k: dict(v) for k, v in variables.items()}
    target_p = new_vars["params"]
    target_s = new_vars.get("batch_stats", {})
    if scope not in target_p:
        raise KeyError(f"model has no {scope!r} scope; params keys: "
                       f"{sorted(target_p)}")
    _check(target_p[scope], enc_params)
    new_vars["params"] = {**target_p, scope: _merge(target_p[scope],
                                                    enc_params)}
    if enc_stats:
        _check(target_s[scope], enc_stats)
        new_vars["batch_stats"] = {**target_s,
                                   scope: _merge(target_s[scope], enc_stats)}
    return new_vars

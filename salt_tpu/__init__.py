"""salt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for the TGS Salt
Identification Challenge, with the full capability surface of
neptune-ai/open-solution-salt-identification rebuilt TPU-first.

Layer map (mirrors SURVEY.md §1, re-designed for TPU):

- ``salt_tpu.core``      config tree, experiment/artifact store, registry, logging
- ``salt_tpu.data``      metadata, depth-stratified K-fold, packed datasets, input pipeline
- ``salt_tpu.ops``       on-device preprocessing/augmentation/TTA kernels, RLE codec
- ``salt_tpu.metrics``   IoU / IOUT (Kaggle mAP@IoU 0.5:0.05:0.95), jitted + numpy parity
- ``salt_tpu.losses``    Lovász hinge/softmax, stable BCE, dice & mixed losses
- ``salt_tpu.models``    flax U-Nets (ResNet/SE-ResNeXt/DenseNet encoders, scSE decoders,
                         hypercolumns), LKM, PSPNet, stacking & emptiness heads
- ``salt_tpu.train``     sharded train/eval steps, callbacks, checkpointing
- ``salt_tpu.parallel``  mesh construction and sharding policies
- ``salt_tpu.pipeline``  train/evaluate/predict/CV/TTA/stacking orchestration
"""

__version__ = "0.1.0"

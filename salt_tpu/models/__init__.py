from salt_tpu.models.registry import ARCHITECTURES, build_model

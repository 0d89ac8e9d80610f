from salt_tpu.core.config import Config, load_config, default_config
from salt_tpu.core.experiment import Experiment
from salt_tpu.core.logging import get_logger, init_logger

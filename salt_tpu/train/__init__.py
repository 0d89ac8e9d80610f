from salt_tpu.train.state import TrainState, create_train_state, make_optimizer
from salt_tpu.train.steps import SegmentationRunner
from salt_tpu.train.loop import fit

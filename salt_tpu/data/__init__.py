from salt_tpu.data.kfold import KFoldBySortedValue
from salt_tpu.data.metadata import generate_metadata, generate_metadata_stacking

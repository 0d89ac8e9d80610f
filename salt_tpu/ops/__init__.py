from salt_tpu.ops.rle import (run_length_encoding, run_length_decoding,
                              encode_rle, create_submission)

"""Quality gate for int8 inference: train the flagship briefly on
synthetic data (TPU), then evaluate the SAME checkpoint with bf16 vs
AQT-int8 predict paths and compare IOU/IOUT.

Decides whether model.quant_bits=8 may be a production inference
default (bench headline) or stays opt-in.
"""
import copy
import json
import shutil
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

EXP = "/tmp/int8_quality_exp"


def main():
    from salt_tpu.core.config import default_config
    from salt_tpu.core.experiment import Experiment
    from salt_tpu.data.bundle import synthetic_bundle
    from salt_tpu.pipeline import api

    cfg = default_config()
    cfg.model.architecture = "UNetResNet"
    cfg.training.dtype = "bfloat16"
    cfg.training.epochs = 12
    cfg.training.batch_size_train = 64
    cfg.training.batch_size_inference = 64
    cfg.postpro.use_tta = True
    cfg.paths.experiment_dir = EXP

    shutil.rmtree(EXP, ignore_errors=True)
    exp = Experiment(EXP)
    bundle = synthetic_bundle(512, seed=11)
    api.train(cfg, exp, bundle)

    res_bf16 = api.evaluate(cfg, exp, bundle)

    cfg_q = copy.deepcopy(cfg)
    cfg_q.model.quant_bits = 8
    res_int8 = api.evaluate(cfg_q, exp, bundle)

    out = {"bf16": res_bf16, "int8": res_int8,
           "iout_delta": res_int8["iout"] - res_bf16["iout"]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

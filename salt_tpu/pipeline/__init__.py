from salt_tpu.pipeline.api import (train, evaluate, predict,
                                   train_evaluate_cv,
                                   train_evaluate_predict_cv,
                                   evaluate_cv, evaluate_predict_cv)

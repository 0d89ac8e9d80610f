from salt_tpu.metrics.iout import (iou, compute_ious, compute_precision_at,
                                   compute_eval_metric, intersection_over_union,
                                   intersection_over_union_thresholds,
                                   batch_iou_iout, IOUT_THRESHOLDS)

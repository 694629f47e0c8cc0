"""Evaluation: on-device two-pass prediction + NMS, host-side mAP protocol."""

from yolat_tpu.eval.predict import make_predict_fn
from yolat_tpu.eval.metrics import (
    average_precision,
    ap_per_class,
    batch_statistics,
    Evaluator,
)

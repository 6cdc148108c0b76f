"""Evaluation: HICO-DET mAP, result unpacking, official-format caching."""

from skghoi_tpu.eval.hoi_eval import evaluate_hicodet, unpack_image_results

__all__ = ["evaluate_hicodet", "unpack_image_results"]

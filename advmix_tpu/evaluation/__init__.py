from . import coco_eval, mpii_eval, cocoeval_np

__all__ = ["coco_eval", "mpii_eval", "cocoeval_np"]

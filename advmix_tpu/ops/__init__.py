from . import transforms, heatmap, losses

__all__ = ["transforms", "heatmap", "losses"]

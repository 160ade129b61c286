from . import transforms, heatmap, losses, quant

__all__ = ["transforms", "heatmap", "losses", "quant"]

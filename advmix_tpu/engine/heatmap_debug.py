"""Debug-output helper for the train steps: output heatmaps + decoded peak
coordinates, returned sharded so the host dumps images every PRINT_FREQ
(reference `save_debug_images`, lib/core/function.py:92-95, 194-197)."""

from __future__ import annotations

from ..ops.heatmap import get_max_preds


def debug_outputs(out):
    preds, maxvals = get_max_preds(out)
    return {"output": out, "pred_coords": preds, "pred_maxvals": maxvals}

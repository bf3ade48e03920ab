"""Prediction-grid plotting (capability mirror of the reference's
create_predictions_plot, /root/reference/scOT/train.py:75-117): a grid with
alternating prediction/label rows for 4 random samples, one column per sample,
one row-pair per channel. Saved as PNG; logged to W&B when available."""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np


def create_predictions_plot(predictions: np.ndarray, labels: np.ndarray,
                            out_path: Optional[str] = None,
                            wandb_prefix: Optional[str] = None,
                            seed: int = 0):
    assert predictions.shape[0] >= 4, "need at least 4 samples"
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1 import ImageGrid

    rng = random.Random(seed)
    indices = rng.sample(range(predictions.shape[0]), 4)
    preds = predictions[indices]
    labs = labels[indices]

    fig = plt.figure()
    grid = ImageGrid(fig, 111,
                     nrows_ncols=(preds.shape[1] + labs.shape[1], 4),
                     axes_pad=0.1)
    vmax = max(preds.max(), labs.max())
    vmin = min(preds.min(), labs.min())
    for idx, ax in enumerate(grid):
        i, j = idx // 4, idx % 4
        img = preds[j, i // 2] if i % 2 == 0 else labs[j, i // 2]
        ax.imshow(img, cmap="gist_ncar", origin="lower", vmin=vmin, vmax=vmax)
        ax.set_xticks([])
        ax.set_yticks([])

    if out_path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    if wandb_prefix is not None:
        try:
            import wandb

            if wandb.run is not None:
                wandb.log({wandb_prefix + "/predictions": wandb.Image(fig)})
        except ImportError:
            pass
    plt.close(fig)
    return out_path

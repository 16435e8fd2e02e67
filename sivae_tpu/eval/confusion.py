"""Classifier evaluation: accuracy loop + confusion-matrix heatmap PNG.

Port of utils/confusion.py (`testing` :10-29, `make_confusion_matrix`
:32-45) using matplotlib directly (no seaborn dependency).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np


def predict_all(eval_step, state, pipeline) -> Tuple[np.ndarray, np.ndarray, float]:
    """Run the jitted classifier eval over a pipeline.

    Returns (predictions, labels, accuracy)."""
    preds: List[np.ndarray] = []
    labs: List[np.ndarray] = []
    for vox, lab in pipeline.epoch(0):
        _, p = eval_step(state, vox, lab)
        preds.append(np.asarray(p))
        labs.append(np.asarray(lab))
    preds_c = np.concatenate(preds)
    labs_c = np.concatenate(labs)
    return preds_c, labs_c, float((preds_c == labs_c).mean())


def make_confusion_matrix(
    preds: Sequence[int],
    labels: Sequence[int],
    class_map: Dict[str, int],
    path: str,
) -> np.ndarray:
    """Confusion-matrix heatmap (reference confusion.py:32-45)."""
    from sklearn.metrics import confusion_matrix

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = [k for k, _ in sorted(class_map.items(), key=lambda kv: kv[1])]
    cm = confusion_matrix(labels, preds, labels=sorted(set(class_map.values())))
    fig, ax = plt.subplots(figsize=(1.2 * len(names) + 2, 1.0 * len(names) + 2))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(names)), names, rotation=45, ha="right")
    ax.set_yticks(range(len(names)), names)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                    color="black" if cm[i, j] < cm.max() / 2 else "white")
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    fig.colorbar(im)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return cm

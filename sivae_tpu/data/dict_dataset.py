"""Dict-style dataset view over catalog records.

The reference exposes `utils/data_class.py:BrainData` (:63-92): a torch
Dataset over `load_data()` records whose samples are dicts
{"voxel": (1, D, H, W) tensor, "label": int}; its consumers are the smoke
script and the recon viewer (test.py, testshow.ipynb). This is the
framework-native equivalent: plain numpy, channel-LAST (D, H, W, 1) —
the layout every sivae_tpu model and preprocess op takes — indexable,
sliceable and iterable, with `as_arrays()` bridging into
`BrainDataSource`/`DataPipeline` for batch work.

Parity decision (documented deviation): the reference constructor loops
`for sample in data: sample = transform(sample)` — rebinding the loop
variable, so the transform is silently a NO-OP (data_class.py:76-78).
Here `transform` actually applies, lazily at access time.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from sivae_tpu.data.catalog import CLASS_MAP


class BrainData:
    """Dict-sample dataset: BrainData(load_data(...))[i] ->
    {"voxel": float32 (D, H, W, 1), "label": int, "uid": ..., "pid": ...}.
    """

    def __init__(
        self,
        records: Sequence[dict],
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        class_map: Dict[str, int] = CLASS_MAP,
    ):
        self.records = list(records)
        self.transform = transform
        self.class_map = class_map

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return [self[i] for i in range(*idx.indices(len(self)))]
        rec = self.records[idx]
        voxel = np.asarray(rec["voxel"], np.float32)
        if self.transform is not None:
            voxel = np.asarray(self.transform(voxel), np.float32)
        if voxel.ndim == 3:  # channel-last, the sivae_tpu model layout
            voxel = voxel[..., None]
        return {"voxel": voxel, "label": self.class_map[rec["label"]],
                "uid": rec.get("uid"), "pid": rec.get("pid")}

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def labels(self) -> np.ndarray:
        return np.asarray([self.class_map[r["label"]] for r in self.records],
                          np.int32)

    def as_arrays(self):
        """(voxels (N, D, H, W, 1) float32, labels (N,) int32) — the batch
        form `BrainDataSource`/`preprocess_batch` take."""
        samples = [self[i] for i in range(len(self))]
        return (np.stack([s["voxel"] for s in samples]),
                np.asarray([s["label"] for s in samples], np.int32))

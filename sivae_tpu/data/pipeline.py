"""Host data pipeline: split, shuffle, batch, prefetch to device.

Replaces the reference's torch DataLoader with 4-28 worker processes +
pin_memory (reference main.py:101-104, z-1200main.py:120-123). TPU-native
shape: volumes live as one contiguous numpy array on host; each epoch is a
seeded permutation; batches are device_put with the data-parallel sharding
from a background prefetch thread (double buffering) so the host-to-HBM copy
overlaps the previous step's compute; normalization runs on device
(sivae_tpu/data/preprocess.py).

The patient-grouped stratified split ports main.py:84-98
(StratifiedGroupKFold(5), fold index 4, grouped by pid so no patient spans
train/val).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence, Tuple

import jax
import numpy as np

from sivae_tpu.data.preprocess import preprocess_batch


def grouped_split(
    labels: Sequence[int],
    groups: Sequence[str],
    n_splits: int = 5,
    split_index: int = 4,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """StratifiedGroupKFold split (reference main.py:84-98) -> (train_idx, val_idx)."""
    from sklearn.model_selection import StratifiedGroupKFold

    sgkf = StratifiedGroupKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    splits = list(sgkf.split(np.zeros(len(labels)), labels, groups))
    return splits[split_index]


class BrainDataSource:
    """Records -> contiguous (voxels, labels) arrays."""

    def __init__(self, records: Sequence[dict]):
        self.voxels = np.stack([r["voxel"] for r in records]).astype(np.float32)
        self.labels = np.asarray([r["nu_label"] for r in records], np.int32)
        self.pids = [r["pid"] for r in records]

    def __len__(self) -> int:
        return len(self.labels)

    def subset(self, idx: np.ndarray) -> "BrainDataSource":
        out = object.__new__(BrainDataSource)
        out.voxels = self.voxels[idx]
        out.labels = self.labels[idx]
        out.pids = [self.pids[i] for i in idx]
        return out


class DataPipeline:
    """Epoch iterator yielding device-placed, sharded, preprocessed batches.

    - static shapes: the trailing partial batch is dropped (jit-stable);
    - seeded per-epoch shuffling (reference seeds workers, main.py:65-68);
    - background thread prefetches `prefetch` batches ahead (replaces the
      DataLoader worker pool: here the only host work is slicing + the
      host->device DMA, normalization happens on device).
    """

    def __init__(
        self,
        source: BrainDataSource,
        batch_size: int,
        mesh=None,
        shuffle: bool = True,
        seed: int = 103,           # seed_ti in the entry scripts (main.py:51)
        prefetch: int = 2,
        preprocess_on_device: bool = True,
        augment=None,              # callable (rng_key, vox) -> vox, on device
    ):
        self.source = source
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.preprocess_on_device = preprocess_on_device
        self.augment = augment
        self.steps_per_epoch = len(source) // batch_size
        if self.steps_per_epoch == 0:
            raise ValueError(
                f"dataset of {len(source)} volumes < batch size {batch_size}")

    def _sharding(self):
        if self.mesh is None:
            return None
        from sivae_tpu.parallel.mesh import data_sharding

        return data_sharding(self.mesh)

    def epoch(self, epoch_idx: int) -> Iterator[Tuple[jax.Array, jax.Array]]:
        order = np.arange(len(self.source))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        sharding = self._sharding()
        stop = threading.Event()

        def _put(q: queue.Queue, item) -> bool:
            # Bounded-queue put that aborts when the consumer is gone, so an
            # abandoned generator can't strand the producer thread on a full
            # queue (one leaked thread + queue per abandoned epoch otherwise).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.05)
                    return True
                except queue.Full:
                    continue
            return False

        def produce(q: queue.Queue):
            try:
                for step in range(self.steps_per_epoch):
                    if stop.is_set():
                        return
                    idx = order[step * self.batch_size:(step + 1) * self.batch_size]
                    vox = self.source.voxels[idx]
                    lab = self.source.labels[idx]
                    if sharding is not None:
                        vox = jax.device_put(vox, sharding)
                        lab = jax.device_put(lab, sharding)
                    else:
                        vox = jax.device_put(vox)
                        lab = jax.device_put(lab)
                    if self.augment is not None:
                        # reference applies TorchIO transforms BEFORE the
                        # clip/minmax preprocess (data_load.py:21-23); same
                        # order here, with a per-(epoch, step) key
                        key = jax.random.key(
                            self.seed * 100003 + epoch_idx * self.steps_per_epoch + step)
                        vox = self.augment(key, vox)
                    if self.preprocess_on_device:
                        vox = preprocess_batch(vox)
                    if not _put(q, (vox, lab)):
                        return
                _put(q, None)
            except Exception as e:  # surface worker errors to the consumer
                _put(q, e)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # Runs on normal exhaustion AND on generator close/GC (the
            # trainer's panel path takes only the first batch). Unblock a
            # producer mid-put, then join so no thread outlives the epoch.
            stop.set()
            for _ in range(3):
                while True:
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break
                t.join(timeout=5.0)
                if not t.is_alive():
                    break
            else:
                # A producer stuck >15s (e.g. device-side augment of one
                # batch on a loaded host) would otherwise outlive the epoch
                # silently; make it visible instead.
                import warnings

                warnings.warn("DataPipeline producer thread did not exit "
                              "within 15s of epoch teardown; it may still "
                              "be running", stacklevel=2)

    def first_batch(self) -> Tuple[jax.Array, jax.Array]:
        """One batch from epoch 0 with deterministic cleanup of the prefetch
        thread (used by recon-panel rendering, train/loop.py save_panels)."""
        gen = self.epoch(0)
        try:
            return next(gen)
        finally:
            gen.close()

"""VOC12 data pipeline: lists, labels and properly sharded batch iterators.

What the reference does (and its gaps — SURVEY.md §2.7):

* name lists read with ``read_file``/``read_file_2`` (``myTool.py:867-880``;
  the latter slices chars 12:23 of VOC path-pair lines);
* multi-hot labels precomputed into ``cls_labels.npy`` from VOC XML
  (``voc12/make_cls_labels.py``) and looked up per batch;
* a chunker over an (epochs+1)x shuffled list with **no per-rank sharding**
  — every DDP rank consumes the same stream, deduped only by seed
  divergence (``train_acr.py:112-117``).

Here each host gets a disjoint shard (``index % num_hosts == host_id`` after
a seeded global shuffle per epoch), batches are assembled by a thread pool
(replacing the reference's synchronous cv2 loop — the per-step host stall
called out in SURVEY.md §3.1), and arrays come out NHWC ready for
``jax.device_put`` with a batch sharding.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from acr_wsss_tpu.configs import VOC_CLASSES
from acr_wsss_tpu.data import transforms

CLASS_TO_INDEX: Dict[str, int] = {c: i for i, c in enumerate(VOC_CLASSES)}


# ---------------------------------------------------------------------------
# Lists and labels
# ---------------------------------------------------------------------------

def read_file(path: str) -> List[str]:
    """Bare-id list, one id per line (reference ``myTool.py:867-873``)."""
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def read_file_2(path: str) -> List[str]:
    """VOC path-pair list: id = chars 12:23 of each line
    (reference ``myTool.py:875-880``; lines look like
    '/JPEGImages/2007_000032.jpg /SegmentationClassAug/...')."""
    with open(path) as f:
        return [line[12:23] for line in f if line.strip()]


def chunker(seq: Sequence, size: int) -> Iterator[Sequence]:
    return (seq[pos:pos + size] for pos in range(0, len(seq), size))


def make_cls_labels(voc12_root: str, name_lists: Sequence[Sequence[str]],
                    out_path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Build the multi-hot label store from VOC XML annotations
    (reference ``voc12/make_cls_labels.py:1-22``)."""
    labels: Dict[str, np.ndarray] = {}
    for names in name_lists:
        for name in names:
            if name in labels:
                continue
            xml_path = os.path.join(voc12_root, "Annotations", f"{name}.xml")
            vec = np.zeros(len(VOC_CLASSES), np.float32)
            tree = ET.parse(xml_path)
            for obj in tree.findall("object"):
                cls = obj.findtext("name")
                if cls in CLASS_TO_INDEX:
                    vec[CLASS_TO_INDEX[cls]] = 1.0
            labels[name] = vec
    if out_path:
        np.save(out_path, labels)  # type: ignore[arg-type]
    return labels


def load_cls_labels(path: str) -> Dict[str, np.ndarray]:
    return np.load(path, allow_pickle=True).item()


# ---------------------------------------------------------------------------
# Batch iterators
# ---------------------------------------------------------------------------

class VOCClassificationSource:
    """Loads and augments single examples; thread-safe.

    ``cache_decoded=True`` keeps decoded uint8 rasters in RAM after the
    first epoch (decoded VOC train_aug is ~6 GB — trivial next to a TPU
    host's memory), removing the per-epoch JPEG re-decode the reference
    pays every step (``myTool.py:1168``). Dict insertion is GIL-atomic, so
    the threaded iterator needs no lock; a racing double-decode is benign.
    """

    def __init__(self, image_dir: str, labels: Dict[str, np.ndarray],
                 crop_size: int, cache_decoded: bool = False):
        self.image_dir = image_dir
        self.labels = labels
        self.crop_size = crop_size
        self._cache: Optional[Dict[str, np.ndarray]] = (
            {} if cache_decoded else None)

    def _decoded(self, name: str) -> np.ndarray:
        if self._cache is not None:
            img = self._cache.get(name)
            if img is not None:
                return img
        img = transforms.load_image_rgb(
            os.path.join(self.image_dir, f"{name}.jpg"))
        if self._cache is not None:
            self._cache[name] = img
        return img

    def load_train(self, name: str, rng: np.random.Generator):
        img = self._decoded(name)
        crop, _ = transforms.train_transform(img, self.crop_size, rng)
        return crop, self.labels[name].astype(np.float32)

    def load_train_packed(self, name: str, rng: np.random.Generator,
                          pad_to: int):
        """Device-augmentation path: raw uint8 raster (padded to a static
        square) + the augmentation descriptor; the pixel math runs inside
        the jit train step (``data/device_aug.py``)."""
        from acr_wsss_tpu.data import device_aug

        img = self._decoded(name)
        params = transforms.train_aug_params(
            img.shape[:2], self.crop_size, rng)
        padded, vec = device_aug.pack_example(img, params, pad_to)
        return padded, vec, self.labels[name].astype(np.float32)

    def load_val(self, name: str):
        img = self._decoded(name)
        return transforms.val_transform(img, self.crop_size), \
            self.labels[name].astype(np.float32)


def shard_names(names: Sequence[str], host_id: int, num_hosts: int) -> List[str]:
    return list(names[host_id::num_hosts])


class TrainIterator:
    """Infinite shuffled per-host-sharded batch iterator with threaded
    prefetch (capability upgrade over the reference's synchronous loader;
    its ``BatchThreader`` pool, ``tool/pyutils.py:76-120``, was never wired
    into the main path)."""

    def __init__(
        self,
        source: VOCClassificationSource,
        names: Sequence[str],
        batch_size: int,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        num_workers: int = 8,
        prefetch: int = 2,
        device_aug: bool = False,
        aug_pad: int = 512,
    ):
        self.source = source
        self.names = list(names)
        self.batch_size = batch_size
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self._epoch = 0
        self._queue: List = []
        self._name_iter = self._iter_names()
        self.prefetch = prefetch
        self._pending: List = []
        # device_aug: emit {"image_u8", "aug"} batches for the fused
        # in-step augmentation (data/device_aug.py) instead of host-side
        # float crops. aug_pad must cover the corpus's largest raster.
        self.device_aug = device_aug
        self.aug_pad = aug_pad

    def _iter_names(self) -> Iterator[str]:
        while True:
            rng = np.random.default_rng((self.seed, self._epoch))
            order = rng.permutation(len(self.names))
            shard = order[self.host_id::self.num_hosts]
            for idx in shard:
                yield self.names[idx]
            self._epoch += 1

    def _submit_batch(self):
        names = [next(self._name_iter) for _ in range(self.batch_size)]
        # Stable per-example seed: crc32 of the name, NOT Python hash() —
        # str hashing is randomized per process (PYTHONHASHSEED), which
        # would make augmentations irreproducible across runs/hosts.
        seeds = [(self.seed, self._epoch, self.host_id,
                  zlib.crc32(n.encode())) for n in names]

        def load(name, seed_seq):
            rng = np.random.default_rng(seed_seq)
            if self.device_aug:
                return self.source.load_train_packed(name, rng, self.aug_pad)
            return self.source.load_train(name, rng)

        futures = [self.pool.submit(load, n, s) for n, s in zip(names, seeds)]
        self._pending.append((names, futures))

    def __iter__(self):
        return self

    def __next__(self):
        while len(self._pending) < self.prefetch + 1:
            self._submit_batch()
        names, futures = self._pending.pop(0)
        results = [f.result() for f in futures]
        if self.device_aug:
            return {
                "image_u8": np.stack([r[0] for r in results]),  # (B,S,S,3) u8
                "aug": np.stack([r[1] for r in results]),       # (B, 9) i32
                "label": np.stack([r[2] for r in results]),
                "name": names,
            }
        images = np.stack([r[0] for r in results])       # (B, H, W, 3) f32
        labels = np.stack([r[1] for r in results])       # (B, C)
        return {"image": images, "label": labels, "name": names}


class EvalIterator:
    """Deterministic sequential batches for validation / CAM inference."""

    def __init__(self, source: VOCClassificationSource, names: Sequence[str],
                 batch_size: int = 1, num_workers: int = 4):
        self.source = source
        self.names = list(names)
        self.batch_size = batch_size
        self.pool = ThreadPoolExecutor(max_workers=num_workers)

    def __iter__(self):
        futures = {
            name: self.pool.submit(self.source.load_val, name)
            for name in self.names
        }
        for batch_names in chunker(self.names, self.batch_size):
            results = [futures[n].result() for n in batch_names]
            yield {
                "image": np.stack([r[0] for r in results]),
                "label": np.stack([r[1] for r in results]),
                "name": list(batch_names),
            }

    def __len__(self):
        return (len(self.names) + self.batch_size - 1) // self.batch_size

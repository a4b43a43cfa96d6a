"""VOC12 name-list generation.

The reference ships its split lists as checked-in txt files
(``voc12/train_aug(id).txt`` etc.). Those are derivable artifacts of the
VOC12 devkit + SBC augmented annotations; this module regenerates them so
the framework carries no dataset payload:

* bare-id lists from ``ImageSets/Segmentation(Aug)/*.txt``;
* path-pair lists (``/JPEGImages/<id>.jpg /SegmentationClassAug/<id>.png``)
  matching the reference's ``train_aug.txt`` format, whose id slice
  [12:23] convention ``read_file_2`` depends on (``myTool.py:875-880``).
"""

from __future__ import annotations

import argparse
import os
from typing import List


def ids_from_imagesets(voc12_root: str, split: str) -> List[str]:
    for subdir in ("ImageSets/SegmentationAug", "ImageSets/Segmentation",
                   "ImageSets/Main"):
        path = os.path.join(voc12_root, subdir, f"{split}.txt")
        if os.path.exists(path):
            with open(path) as f:
                return [line.split()[0].strip().replace("/JPEGImages/", "")
                            .replace(".jpg", "")[:11] or line.strip()
                        for line in f if line.strip()]
    raise FileNotFoundError(f"no ImageSets list for split {split!r}")


def write_id_list(ids: List[str], out_path: str) -> None:
    with open(out_path, "w") as f:
        f.write("\n".join(ids) + "\n")


def write_pathpair_list(ids: List[str], out_path: str) -> None:
    with open(out_path, "w") as f:
        for i in ids:
            f.write(f"/JPEGImages/{i}.jpg /SegmentationClassAug/{i}.png\n")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Generate VOC12 split lists + cls_labels.npy")
    parser.add_argument("--voc12_root", required=True)
    parser.add_argument("--out_dir", default="voc12")
    parser.add_argument("--splits", nargs="+",
                        default=["train", "train_aug", "val"])
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    all_ids = []
    for split in args.splits:
        ids = ids_from_imagesets(args.voc12_root, split)
        all_ids.append(ids)
        write_id_list(ids, os.path.join(args.out_dir, f"{split}_id.txt"))
        write_pathpair_list(ids, os.path.join(args.out_dir, f"{split}.txt"))
        print(f"{split}: {len(ids)} ids")

    from acr_wsss_tpu.data.voc import make_cls_labels

    make_cls_labels(args.voc12_root, all_ids,
                    os.path.join(args.out_dir, "cls_labels.npy"))
    print("cls_labels.npy written")


if __name__ == "__main__":
    main()

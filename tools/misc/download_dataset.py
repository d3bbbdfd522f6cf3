#!/usr/bin/env python
"""Dataset fetch + verify + layout tool (reference surface:
tools/misc/download_dataset.py) — one command from an empty machine to
the north-star VOC 15+5 / COCO 40+40 measurements.

Usage:
  python tools/misc/download_dataset.py --dataset-name voc2007 [--data-root data]
  python tools/misc/download_dataset.py --dataset-name coco2017 --data-root data
  python tools/misc/download_dataset.py --dataset-name voc2007 --verify-only

After the VOC fetch succeeds, the full north-star sequence is:
  bash train_list.sh          # 15+5: task 1 then task 2
  python tools/test.py cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_2.py \
      work_dirs/ns3_split_id/cl_faster_rcnn_ns3_split_id_15_5_2/best_*.npz
Reference anchor: VOC07 AP50 80.4 (configs/pascal_voc/README.md:22).

The tool is offline-safe: with no network it prints the mirror URLs and
exits non-zero instead of hanging, and --verify-only validates an
existing tree (count images, parse one annotation) without touching the
network.
"""
import argparse
import hashlib
import os
import os.path as osp
import sys
import tarfile
import urllib.error
import urllib.request
import zipfile

MIRRORS = {
    "voc2007": [
        # (url, extract-dir check)
        ("http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar",
         "VOCdevkit/VOC2007/ImageSets/Main/trainval.txt"),
        ("http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar",
         "VOCdevkit/VOC2007/ImageSets/Main/test.txt"),
    ],
    "voc2012": [
        ("http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar",
         "VOCdevkit/VOC2012/ImageSets/Main/trainval.txt"),
    ],
    "coco2017": [
        ("http://images.cocodataset.org/zips/train2017.zip", "train2017"),
        ("http://images.cocodataset.org/zips/val2017.zip", "val2017"),
        ("http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
         "annotations/instances_train2017.json"),
    ],
}


def fetch(url: str, dst: str) -> str:
    path = osp.join(dst, osp.basename(url))
    if osp.exists(path):
        print(f"[skip] {path} exists")
        return path
    print(f"[get ] {url}")
    try:
        urllib.request.urlretrieve(url, path + ".part")
    except (urllib.error.URLError, OSError) as e:
        raise SystemExit(
            f"download failed ({e}); fetch manually:\n  {url}\n"
            f"and place the archive at {path}"
        )
    os.rename(path + ".part", path)
    return path


def extract(path: str, dst: str):
    print(f"[untr] {path}")
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(dst)
    else:
        with tarfile.open(path) as t:
            t.extractall(dst)


def verify(name: str, root: str) -> bool:
    ok = True
    if name.startswith("voc"):
        year = name[-4:]
        base = osp.join(root, "VOCdevkit", f"VOC{year}")
        for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
            p = osp.join(base, sub)
            n = len(os.listdir(p)) if osp.isdir(p) else 0
            print(f"  {p}: {n} entries")
            ok &= n > 0
        if ok:
            sys.path.insert(
                0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
            )
            from nsgp_repre_tpu.datasets.voc import VOCTaskDataset

            ds = VOCTaskDataset(
                data_root=osp.join(root, "VOCdevkit"),
                ann_file=f"VOC{year}/ImageSets/Main/trainval.txt",
                sub_data_root=f"VOC{year}/",
                task_split=[0, 15, 20], task_id=1,
            )
            print(f"  VOCTaskDataset(task1): {len(ds)} records")
            ok &= len(ds) > 0
    else:
        for sub in ("train2017", "val2017", "annotations"):
            p = osp.join(root, "coco", sub)
            n = len(os.listdir(p)) if osp.isdir(p) else 0
            print(f"  {p}: {n} entries")
            ok &= n > 0
    print("VERIFY", "OK" if ok else "FAILED")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-name", required=True, choices=sorted(MIRRORS))
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()

    root = args.data_root
    os.makedirs(root, exist_ok=True)
    if args.verify_only:
        sys.exit(0 if verify(args.dataset_name, root) else 1)

    dst = root if args.dataset_name.startswith("voc") else osp.join(root, "coco")
    os.makedirs(dst, exist_ok=True)
    for url, check in MIRRORS[args.dataset_name]:
        if osp.exists(osp.join(dst, check)):
            print(f"[skip] {check} present")
            continue
        extract(fetch(url, dst), dst)
    verify(args.dataset_name, root)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate mini-VOC: a small, fully offline VOC2007-format detection
dataset built from the real photographic material available in this
image (matplotlib's grace_hopper.jpg portrait and labmaze's
photographic wall/sky textures), composited into scenes with
exactly-known ground-truth boxes.

Why it exists: the environment has no network egress, so PASCAL VOC
cannot be downloaded (tools/misc/download_dataset.py fails on DNS).
This dataset is the strongest real-data substitute the environment
allows: real JPEG encode/decode, real XML annotations, the full
resize/flip/pad pipeline, multi-epoch convergence and the incremental
15+5 protocol (task filtering, teacher pseudo-labels, per-task mAP)
all run end-to-end on it. Results are tracked as regression numbers in
BENCHMARKS.md.

Each of the 20 VOC classes is a visually distinct object: 'person' is a
grace-hopper portrait crop; the other 19 are (shape mask x real texture
x hue shift) combos pasted with random scale/rotation/brightness onto
real-texture backgrounds. GT boxes are the exact mask bounding boxes.
Tiny objects (<24 px) are marked difficult, matching VOC semantics
(difficult GTs are ignored by the VOC evaluator).

Usage:
    python tools/misc/make_mini_voc.py [--root data/mini_voc/VOCdevkit]
        [--train 160] [--test 80] [--seed 0]
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import cv2
import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
    "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)
PERSON_IDX = VOC_CLASSES.index("person")

SHAPES = (
    "ellipse", "rect", "tri_up", "tri_down", "diamond",
    "cross", "ring", "star", "capsule_h", "capsule_v",
)

XML_TMPL = """<annotation>
  <folder>VOC2007</folder>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  <segmented>0</segmented>
{objects}
</annotation>
"""
OBJ_TMPL = """  <object>
    <name>{cls}</name>
    <pose>Unspecified</pose>
    <truncated>0</truncated>
    <difficult>{diff}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def _find_textures():
    import labmaze

    root = osp.join(osp.dirname(labmaze.__file__), "assets")
    paths = sorted(glob.glob(osp.join(root, "*", "*.png")))
    assert paths, f"no labmaze textures under {root}"
    return paths


def _find_hopper():
    import matplotlib

    return osp.join(
        osp.dirname(matplotlib.__file__), "mpl-data", "sample_data",
        "grace_hopper.jpg",
    )


def shape_mask(shape: str, s: int) -> np.ndarray:
    """(s, s) float mask in [0, 1] for one of the SHAPES."""
    m = np.zeros((s, s), np.uint8)
    c = s // 2
    if shape == "ellipse":
        cv2.ellipse(m, (c, c), (s // 2 - 1, s // 3), 0, 0, 360, 255, -1)
    elif shape == "rect":
        cv2.rectangle(m, (s // 8, s // 5), (s - s // 8, s - s // 5), 255, -1)
    elif shape == "tri_up":
        pts = np.array([[c, 2], [2, s - 3], [s - 3, s - 3]])
        cv2.fillPoly(m, [pts], 255)
    elif shape == "tri_down":
        pts = np.array([[2, 2], [s - 3, 2], [c, s - 3]])
        cv2.fillPoly(m, [pts], 255)
    elif shape == "diamond":
        pts = np.array([[c, 2], [s - 3, c], [c, s - 3], [2, c]])
        cv2.fillPoly(m, [pts], 255)
    elif shape == "cross":
        t = s // 4
        cv2.rectangle(m, (c - t // 2, 2), (c + t // 2, s - 3), 255, -1)
        cv2.rectangle(m, (2, c - t // 2), (s - 3, c + t // 2), 255, -1)
    elif shape == "ring":
        cv2.circle(m, (c, c), s // 2 - 2, 255, -1)
        cv2.circle(m, (c, c), s // 5, 0, -1)
    elif shape == "star":
        ang = np.linspace(-np.pi / 2, 1.5 * np.pi, 11)[:-1]
        r = np.where(np.arange(10) % 2 == 0, s // 2 - 2, s // 5)
        pts = np.stack([c + r * np.cos(ang), c + r * np.sin(ang)], -1)
        cv2.fillPoly(m, [pts.astype(np.int32)], 255)
    elif shape == "capsule_h":
        cv2.rectangle(m, (s // 5, s // 3), (s - s // 5, s - s // 3), 255, -1)
        cv2.circle(m, (s // 5, c), s // 6, 255, -1)
        cv2.circle(m, (s - s // 5, c), s // 6, 255, -1)
    elif shape == "capsule_v":
        cv2.rectangle(m, (s // 3, s // 5), (s - s // 3, s - s // 5), 255, -1)
        cv2.circle(m, (c, s // 5), s // 6, 255, -1)
        cv2.circle(m, (c, s - s // 5), s // 6, 255, -1)
    else:  # pragma: no cover
        raise ValueError(shape)
    return m.astype(np.float32) / 255.0


class ClassLibrary:
    """Deterministic visual identity per class (generic over class count
    so mini-COCO can reuse the same compositor with 80 classes)."""

    def __init__(self, rng: np.random.RandomState, n_classes: int = 20,
                 person_idx: int = PERSON_IDX):
        self.n_classes = n_classes
        self.person_idx = person_idx
        tex_paths = _find_textures()
        order = rng.permutation(len(tex_paths))
        self.textures = [
            cv2.imread(tex_paths[order[i % len(tex_paths)]])
            for i in range(n_classes)
        ]
        self.hopper = cv2.imread(_find_hopper())
        assert self.hopper is not None
        self.identity = {}
        for i in range(n_classes):
            self.identity[i] = dict(
                shape=SHAPES[i % len(SHAPES)],
                hue=int((i * 37) % 180),
                tex=i,
                # classes ≥20 that share (shape, tex-cycle) get distinct
                # saturation bands so 80-class identities stay separable;
                # i<20 keeps the original constant so mini-VOC output is
                # byte-identical to the round-3 regression dataset
                sat=60 if i < 20 else 60 - 45 * ((i // len(SHAPES)) % 3),
            )

    def render(self, cls_idx: int, size: int, rng: np.random.RandomState):
        """→ (patch bgr uint8, mask float [0,1]) both (size, size)."""
        if cls_idx == self.person_idx:
            # random upper-body crop of the real portrait
            h, w = self.hopper.shape[:2]
            cw = rng.randint(int(0.6 * w), w)
            ch = rng.randint(int(0.6 * h), h)
            x0 = rng.randint(0, w - cw + 1)
            y0 = rng.randint(0, h - ch + 1)
            patch = cv2.resize(self.hopper[y0:y0 + ch, x0:x0 + cw], (size, size))
            mask = np.ones((size, size), np.float32)
            return patch, mask
        ident = self.identity[cls_idx]
        tex = self.textures[ident["tex"]]
        th, tw = tex.shape[:2]
        x0 = rng.randint(0, tw - size) if tw > size else 0
        y0 = rng.randint(0, th - size) if th > size else 0
        patch = tex[y0:y0 + size, x0:x0 + size]
        if patch.shape[:2] != (size, size):
            patch = cv2.resize(patch, (size, size))
        hsv = cv2.cvtColor(patch, cv2.COLOR_BGR2HSV)
        hsv[..., 0] = (hsv[..., 0].astype(np.int32) + ident["hue"]) % 180
        hsv[..., 1] = np.clip(hsv[..., 1].astype(np.int32) + ident["sat"], 0, 255)
        patch = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)
        mask = shape_mask(ident["shape"], size)
        return patch, mask


def compose_scene(lib: ClassLibrary, cls_pool, rng: np.random.RandomState):
    """→ (scene bgr uint8, list of (cls_idx, x1, y1, x2, y2, difficult))."""
    if rng.rand() < 0.5:
        W, H = rng.choice([560, 640, 720]), rng.choice([400, 480])
    else:
        H, W = rng.choice([560, 640, 720]), rng.choice([400, 480])
    bg_tex = lib.textures[rng.randint(20)]
    bg = cv2.resize(bg_tex, (W, H)).astype(np.float32) * rng.uniform(0.35, 0.6)
    noise = rng.randn(H, W, 3) * 6
    scene = np.clip(bg + noise, 0, 255)

    n_obj = rng.randint(1, 6)
    boxes, anns = [], []
    for _ in range(n_obj):
        cls_idx = int(rng.choice(cls_pool))
        size = int(rng.uniform(48, min(200, 0.6 * min(H, W))))
        # occasional tiny (difficult) object
        if rng.rand() < 0.08:
            size = int(rng.uniform(14, 22))
        patch, mask = lib.render(cls_idx, size, rng)
        ang = rng.uniform(-20, 20) if cls_idx != lib.person_idx else 0.0
        if ang:
            M = cv2.getRotationMatrix2D((size / 2, size / 2), ang, 0.9)
            patch = cv2.warpAffine(patch, M, (size, size))
            mask = cv2.warpAffine(mask, M, (size, size))
        ys, xs = np.nonzero(mask > 0.5)
        if len(xs) == 0:
            continue
        bx1, bx2 = xs.min(), xs.max() + 1
        by1, by2 = ys.min(), ys.max() + 1
        bw, bh = bx2 - bx1, by2 - by1
        placed = False
        for _try in range(20):
            x = rng.randint(0, max(1, W - size))
            y = rng.randint(0, max(1, H - size))
            cand = (x + bx1, y + by1, x + bx2, y + by2)
            if all(_iou(cand, b) < 0.25 for b in boxes):
                placed = True
                break
        if not placed:
            continue
        gain = rng.uniform(0.8, 1.2)
        m3 = cv2.GaussianBlur(mask, (3, 3), 0)[..., None]
        roi = scene[y:y + size, x:x + size]
        roi_h, roi_w = roi.shape[:2]
        m3, patch = m3[:roi_h, :roi_w], patch[:roi_h, :roi_w]
        scene[y:y + size, x:x + size] = (
            roi * (1 - m3) + np.clip(patch * gain, 0, 255) * m3
        )
        boxes.append(cand)
        difficult = int(max(bw, bh) < 24)
        anns.append((cls_idx, *cand, difficult))
    return np.clip(scene, 0, 255).astype(np.uint8), anns


def _iou(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1)


def generate(root: str, n_train: int, n_test: int, seed: int):
    base = osp.join(root, "VOC2007")
    for d in ("JPEGImages", "Annotations", osp.join("ImageSets", "Main")):
        os.makedirs(osp.join(base, d), exist_ok=True)
    rng = np.random.RandomState(seed)
    lib = ClassLibrary(rng)

    splits = {"trainval": n_train, "test": n_test}
    counts = np.zeros(20, np.int64)
    idx = 0
    for split, n in splits.items():
        names = []
        for k in range(n):
            # round-robin a guaranteed class so every class appears
            forced = k % 20
            pool = np.concatenate([[forced], rng.randint(0, 20, 8)])
            while True:
                scene, anns = compose_scene(lib, pool, rng)
                if anns:  # never emit an empty image into trainval
                    break
            name = f"{idx:06d}"
            idx += 1
            cv2.imwrite(
                osp.join(base, "JPEGImages", f"{name}.jpg"), scene,
                [cv2.IMWRITE_JPEG_QUALITY, int(rng.uniform(85, 96))],
            )
            objs = []
            for cls_idx, x1, y1, x2, y2, diff in anns:
                counts[cls_idx] += 1
                objs.append(OBJ_TMPL.format(
                    cls=VOC_CLASSES[cls_idx], diff=diff,
                    # VOC boxes are 1-based inclusive pixel indices
                    x1=x1 + 1, y1=y1 + 1, x2=x2, y2=y2,
                ))
            xml = XML_TMPL.format(
                name=name, w=scene.shape[1], h=scene.shape[0],
                objects="\n".join(objs),
            )
            with open(osp.join(base, "Annotations", f"{name}.xml"), "w") as f:
                f.write(xml)
            names.append(name)
        with open(osp.join(base, "ImageSets", "Main", f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    print(f"mini-VOC at {base}: {n_train} trainval + {n_test} test images")
    for c, n in zip(VOC_CLASSES, counts):
        print(f"  {c:12s} {n}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/mini_voc/VOCdevkit")
    ap.add_argument("--train", type=int, default=160)
    ap.add_argument("--test", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.root, args.train, args.test, args.seed)

"""Checkpoint and cross-task artifact I/O.

The reference's cross-task on-disk protocol (SURVEY §2.1):
- model checkpoints: mmengine CheckpointHook, ``best_*`` naming,
  auto-scan of previous_dir by ``ckpt_keywords`` (nsrunner:295-299);
- ``covariance.pth``  → here ``covariance.npz``   (dict name → (C,C));
- ``rois_etc.pth``    → here ``rois_etc.npz``     (6 arrays);
- ``ewc_reg_terms_ewc.pth`` → ``ewc_reg_terms_ewc.npz``;
- ``mask.pth``        → here ``mask.pkl``         (nested bool masks).

Model checkpoints are orbax where available, with a msgpack/npz fallback.
"""
from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# pytree checkpoints (model params / train state)
# ---------------------------------------------------------------------------

def _flatten_tree(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out["/".join(parts)] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays as one .npz (structure stored as paths)."""
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten_tree(tree))


def load_pytree_flat(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def restore_into(tree, flat: Dict[str, np.ndarray], strict: bool = True):
    """Restore a flat {path: array} dict into an existing pytree template."""
    missing: List[str] = []

    def fn(path, leaf):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        key = "/".join(parts)
        if key in flat:
            arr = flat[key]
            assert arr.shape == leaf.shape, f"{key}: {arr.shape} vs {leaf.shape}"
            return arr.astype(leaf.dtype)
        missing.append(key)
        return leaf

    out = jax.tree_util.tree_map_with_path(fn, tree)
    if strict and missing:
        raise KeyError(f"missing checkpoint entries: {missing[:10]} (+{len(missing)-10 if len(missing)>10 else 0})")
    return out


def find_checkpoint(directory: str, keyword: str) -> Optional[str]:
    """First file in ``directory`` whose name contains ``keyword``
    (nsrunner:295-299 auto-scan semantics)."""
    if not osp.isdir(directory):
        return None
    for name in sorted(os.listdir(directory)):
        if keyword in name:
            return osp.join(directory, name)
    return None


# ---------------------------------------------------------------------------
# artifacts
# ---------------------------------------------------------------------------

def save_covariance(work_dir: str, cov: Dict[str, Any]) -> str:
    path = osp.join(work_dir, "covariance.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in cov.items()})
    return path

def load_covariance(work_dir: str) -> Dict[str, np.ndarray]:
    with np.load(osp.join(work_dir, "covariance.npz")) as z:
        return {k: z[k] for k in z.files}


ROIS_KEYS = ("bbox_feats", "cls_targets", "cls_weights", "bbox_targets", "bbox_weights", "rois")

def save_rois_etc(work_dir: str, arrays: Sequence[np.ndarray]) -> str:
    path = osp.join(work_dir, "rois_etc.npz")
    np.savez(path, **dict(zip(ROIS_KEYS, [np.asarray(a) for a in arrays])))
    return path

def load_rois_etc(work_dir: str) -> Tuple[np.ndarray, ...]:
    with np.load(osp.join(work_dir, "rois_etc.npz")) as z:
        return tuple(z[k] for k in ROIS_KEYS)


def save_ewc_terms(work_dir: str, terms: Dict[str, Tuple[Any, Any]]) -> str:
    path = osp.join(work_dir, "ewc_reg_terms_ewc.npz")
    flat = {}
    for k, (imp, par) in terms.items():
        flat[f"imp::{k}"] = np.asarray(imp)
        flat[f"par::{k}"] = np.asarray(par)
    np.savez(path, **flat)
    return path

def load_ewc_terms(work_dir: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    with np.load(osp.join(work_dir, "ewc_reg_terms_ewc.npz")) as z:
        out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for k in z.files:
            if k.startswith("imp::"):
                name = k[5:]
                out[name] = (z[k], z[f"par::{name}"])
        return out


def save_masks(work_dir: str, masks) -> str:
    path = osp.join(work_dir, "mask.pkl")
    with open(path, "wb") as f:
        pickle.dump([[np.asarray(m) for m in cls] for cls in masks], f)
    return path

def load_masks(work_dir: str):
    path = osp.join(work_dir, "mask.pkl")
    if not osp.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)

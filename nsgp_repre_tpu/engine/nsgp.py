"""NSGP — Null Space Gradient Projection machinery.

Parity targets:
- adaptive elbow threshold: SGD_NSCL.py:98-177 (Gaussian smoothing σ=10
  for dims ≥ 128, 2nd-order finite differences, 3% boundary drop, argmax
  curvature, offset shift) — exact port, runs on host (tiny arrays).
- eigendecomposition: SGD_NSCL.py:292-380 uses full ``torch.svd`` on the
  (C, C) covariance; covariances are symmetric PSD, so ``jnp.linalg.eigh``
  gives identical values/vectors (descending after a flip) and is the
  right TPU primitive.
- transform build: SGD_NSCL.py:203-290 — keep the eigenvectors *below*
  the elbow (the small-singular-value / null-space directions:
  ``zero_idx[i_thres:] = 1``), P = V_keep @ V_keepᵀ, and backbone
  transforms normalized by their Frobenius norm (:283).
- fixed-threshold ablation (SGDNSCLNA): keep eigenvalues below
  ``thres * min(eigenvalue)`` (SGD_NSCL_NoAdaptive.py semantics).
- covariance accumulation across batches/devices and with the previous
  task: nsrunner_roi_replay.py:704-763 (cal_fea_in).
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter1d


def adaptive_threshold_index(svals: np.ndarray, offset: float = 0.0) -> int:
    """Elbow index in a descending singular-value spectrum.

    Returns ``i_thres``: indices >= i_thres are the null-space (kept for
    projection). Exact port of SGD_NSCL.py:98-177.
    """
    points = np.asarray(svals, dtype=np.float64)
    assert points.ndim == 1
    n = len(points)
    if n >= 128:
        fil = gaussian_filter1d(points, sigma=10)
        diff_o1 = fil[:-1] - fil[1:]
        diff_o2 = diff_o1[:-1] - diff_o1[1:]
        drop_num = int(n * 0.03 / 2)
        assert n - drop_num >= 10
        valid_o2 = diff_o2[drop_num:-drop_num]
        thres_val = points[int(np.argmax(valid_o2)) + int((n - len(valid_o2)) / 2)]
    else:
        diff_o1 = points[:-1] - points[1:]
        diff_o2 = diff_o1[:-1] - diff_o1[1:]
        thres_val = points[int(np.argmax(diff_o2)) + int((n - len(diff_o2)) / 2)]

    i_thres = int(np.arange(n)[points >= thres_val].max())
    if -1 <= offset <= 1:
        i_thres = min(i_thres + int(offset * i_thres), n - 1)
        i_thres = max(0, i_thres)
    else:
        i_thres = max(min(i_thres + int(offset), n - 1), 0)
    return i_thres


def null_space_mask(svals: np.ndarray, offset: float = 0.0) -> np.ndarray:
    """Boolean mask — True for the kept (null-space) eigenvalue tail."""
    i = adaptive_threshold_index(svals, offset)
    mask = np.zeros(len(svals), dtype=bool)
    mask[i:] = True
    return mask


def fixed_threshold_mask(svals: np.ndarray, thres: float = 1.001) -> np.ndarray:
    """SGDNSCLNA ablation: ``eigen_value <= eigen_value[-1] * thres``
    (SGD_NSCL_NoAdaptive.py:157) on the descending torch.svd spectrum —
    the minimum is the LAST entry and is non-negative (singular values),
    tiny-positive rather than zero for rank-deficient covariances."""
    svals = np.asarray(svals)
    return svals <= svals[-1] * thres


def eigh_descending(cov: jnp.ndarray):
    """Symmetric eigendecomposition, eigenvalues descending (torch.svd
    order). Runs on device; covariances are (C, C) with C ≤ ~4608."""
    evals, evecs = jnp.linalg.eigh(cov)
    return evals[::-1], evecs[:, ::-1]


def build_transforms(
    cov_dict: Dict[str, jnp.ndarray],
    offset: float = 0.0,
    ignore_patterns: Sequence[str] = (),
    adaptive: bool = True,
    fixed_thres: float = 1.001,
    logger=None,
) -> Dict[str, jnp.ndarray]:
    """cov name → P = V_null @ V_nullᵀ projection matrices.

    Args:
        cov_dict: {param-path-name: (C, C) covariance}. Names matching any
            ``ignore_patterns`` prefix-regex are skipped
            (update_optim_transforms, nsrunner:634-662 re.match semantics).
        offset: elbow shift knob (cfg ``offset``).
        adaptive: False selects the SGDNSCLNA fixed threshold.

    Returns:
        {param-path-name: (C, C) float32}; 'backbone' entries normalized
        by Frobenius norm (SGD_NSCL.py:283).
    """
    out: Dict[str, jnp.ndarray] = {}
    for name, cov in cov_dict.items():
        if any(re.match(p, name) for p in ignore_patterns):
            continue
        # host numpy eigh: the matrices are small (C ≤ ~4608) and the
        # axon TPU backend rejects the eigh custom-call; a one-off host
        # decomposition per task is negligible
        evals_h, evecs_h = np.linalg.eigh(np.asarray(cov, np.float64))
        # torch.svd on a symmetric matrix (SGD_NSCL.py:377) yields
        # singular values = |eigenvalues| in descending order; eigh gives
        # signed ascending values (tiny NEGATIVES for numerically
        # rank-deficient PSD). Take |.| and re-sort descending so both
        # the adaptive elbow and the NA fixed threshold see the torch
        # spectrum.
        evals_abs = np.abs(evals_h)
        order = np.argsort(-evals_abs, kind="stable")
        evals_np = evals_abs[order]
        evecs = jnp.asarray(evecs_h[:, order], jnp.float32)
        if adaptive:
            mask = null_space_mask(evals_np, offset)
        else:
            mask = fixed_threshold_mask(evals_np, fixed_thres)
        if logger is not None:
            kept = int(mask.sum())
            denom = evals_np[mask][0] if kept and evals_np[mask][0] > 0 else 1.0
            logger.info(
                f"{name}: reserving basis {kept}/{len(evals_np)}; "
                f"cond: {evals_np[0] / denom:.3e}, "
                f"energy ratio: {evals_np[mask].sum() / max(evals_np.sum(), 1e-30):.4f}"
            )
        basis = evecs[:, np.where(mask)[0]]
        transform = basis @ basis.T
        if "backbone" in name:
            transform = transform / jnp.linalg.norm(transform)
        out[name] = jax.lax.stop_gradient(transform.astype(jnp.float32))
    return out


def cov_collection_to_param_names(cov_state: dict) -> Dict[str, jnp.ndarray]:
    """Flatten a flax 'cov' collection into {param-kernel-name: (C, C)}.

    The 'cov' collection paths look like
    ``backbone/layer2_0/conv1/cov`` — the corresponding projected param
    is ``backbone/layer2_0/conv1/kernel`` (mirrors the reference keying
    covariance by ``module_name + '.weight'``, nsrunner:893-896).
    """
    flat = jax.tree_util.tree_flatten_with_path(cov_state)[0]
    out = {}
    for path, value in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            else:
                parts.append(str(p))
        # drop the trailing 'cov' sow name; address the conv/dense kernel
        if parts and parts[-1] == "cov":
            parts = parts[:-1]
        if parts and parts[-1] == "cov":
            parts = parts[:-1]
        out["/".join(parts) + "/kernel"] = value
    return out


def accumulate_cov(
    total: Optional[Dict[str, jnp.ndarray]], new: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Running sum of covariance dicts (cal_fea_in accumulation)."""
    if total is None:
        return dict(new)
    return {k: total[k] + v for k, v in new.items()}


def plot_spectra(
    cov_dict: Dict[str, jnp.ndarray],
    save_path: str,
    offset: float = 0.0,
) -> None:
    """Singular-value spectrum grid with the elbow split colored
    (plot_sval_figures, SGD_NSCL.py:180-201)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(cov_dict.keys())
    rows = len(names) // 4 + 1
    fig, axes = plt.subplots(rows, 4, figsize=(15, max(3 * rows, 3)), squeeze=False)
    for i, name in enumerate(names):
        evals = np.maximum(
            np.linalg.eigvalsh(np.asarray(cov_dict[name], np.float64))[::-1], 0.0
        )
        i_thres = adaptive_threshold_index(evals, offset)
        ax = axes[i // 4][i % 4]
        ax.plot(np.arange(i_thres + 1), evals[: i_thres + 1], color="blue")
        ax.plot(np.arange(i_thres, len(evals)), evals[i_thres:], color="red")
        ax.set_title(name, fontsize=6)
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)

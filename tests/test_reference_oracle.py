"""Parity against the reference's ACTUAL optimizer classes.

Loads /root/reference/mmdet/engine/optimizers/{SGD_NSCL, SGD_NSCL_NoAdaptive,
Adam_NSCL, AdamW_NSCL}.py at test time (read-only import with a 5-line
mmengine stub) and drives the real torch implementations as the oracle for:

- adaptive_threshold elbow masks over random spectra (both branches,
  proportional and absolute offsets)           vs engine/nsgp.py
- get_eigens + get_transforms projection build vs nsgp.build_transforms
- multi-step SGD/Adam/AdamW trajectories with momentum, weight decay and
  installed projections (2D linear + 4D conv)  vs engine/optim.py
- SGDNSCLNA fixed-threshold kept-set, incl. the rank-deficient edge

This replaces the round-2 hand-written numpy simulations as the ground
truth (a replica can share a misreading with the port; these classes
cannot).
"""
from __future__ import annotations

import importlib.util
import sys
import types
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/mmdet/engine/optimizers"


def _install_mmengine_stub():
    from ref_stubs import install_mmengine_stub

    install_mmengine_stub()


def _load(name: str, fname: str):
    _install_mmengine_stub()
    key = f"_ref_oracle_{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, f"{REF}/{fname}")
    mod = importlib.util.module_from_spec(spec)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec.loader.exec_module(mod)
    sys.modules[key] = mod
    return mod


def ref_sgd():
    return _load("sgd", "SGD_NSCL.py").SGDNSCL


def ref_sgd_na():
    return _load("sgd_na", "SGD_NSCL_NoAdaptive.py").SGDNSCLNA


def ref_adam():
    return _load("adam", "Adam_NSCL.py").AdamNSCL


def ref_adamw():
    return _load("adamw", "AdamW_NSCL.py").AdamWNSCL


def _spectrum(rng, n, decay=3.0):
    """Random positive descending spectrum with noise (sorted)."""
    v = np.exp(-decay * np.linspace(0, 1, n)) * (1 + 0.05 * rng.randn(n))
    return np.sort(np.abs(v))[::-1].astype(np.float32)


# ---------------------------------------------------------------------------
# adaptive_threshold
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("n", [32, 100, 128, 256, 513, 2048])
@pytest.mark.parametrize("offset", [0.0, 0.3, -0.5, 1.0, 5.0, -3.0])
def test_adaptive_threshold_oracle(n, offset):
    from nsgp_repre_tpu.engine.nsgp import null_space_mask

    SGDNSCL = ref_sgd()
    opt = SGDNSCL([torch.nn.Parameter(torch.zeros(1))], lr=0.1)
    rng = np.random.RandomState(n)
    for trial in range(3):
        sv = _spectrum(rng, n, decay=2.0 + trial)
        ref_mask = (
            opt.adaptive_threshold(torch.from_numpy(sv.copy()), offset=offset)
            .numpy()
        )
        got = null_space_mask(sv, offset=offset)
        np.testing.assert_array_equal(got, ref_mask, err_msg=f"n={n} t={trial}")


# ---------------------------------------------------------------------------
# get_eigens + get_transforms
# ---------------------------------------------------------------------------
def _make_opt(cls, shapes_names, **kw):
    params = [torch.nn.Parameter(torch.zeros(*s)) for s, _ in shapes_names]
    groups = [
        {"params": params, "names": [n for _, n in shapes_names], "svd": True}
    ]
    return cls(groups, svd=True, **kw), params


def test_get_transforms_oracle():
    """P = V_keep V_keepᵀ (+ backbone Frobenius normalization) matches the
    real get_transforms for adaptive elbow selection."""
    from nsgp_repre_tpu.engine.nsgp import build_transforms

    rng = np.random.RandomState(0)
    names = ["backbone.layer1.conv.weight", "roi_head.shared_fcs.0.weight"]
    covs = {}
    for i, n in enumerate(names):
        C = 144 if i == 0 else 64
        X = rng.randn(4 * C, C).astype(np.float32)
        # anisotropic: give the spectrum a real elbow
        X *= np.exp(-2.0 * np.linspace(0, 1, C))[None, :]
        covs[n] = X.T @ X

    SGDNSCL = ref_sgd()
    opt, _ = _make_opt(
        SGDNSCL, [((3, 3), n) for n in names], lr=0.1
    )
    opt.get_eigens({n: torch.from_numpy(c.copy()) for n, c in covs.items()})
    opt.get_transforms(offset=0.0)

    ours = build_transforms({n: c for n, c in covs.items()}, offset=0.0)
    for n in names:
        ref_P = opt.transforms[n].numpy()
        got_P = np.asarray(ours[n])
        np.testing.assert_allclose(got_P, ref_P, atol=2e-4, err_msg=n)


def test_fixed_threshold_oracle_well_separated():
    """SGDNSCLNA kept-set == eigen_value <= eigen_value[-1]*thres on a
    spectrum where the 1.001 band is unambiguous."""
    from nsgp_repre_tpu.engine.nsgp import build_transforms

    rng = np.random.RandomState(1)
    C = 32
    evals = np.concatenate(
        [np.linspace(9.0, 2.0, C - 3), [1.0004, 1.0002, 1.0]]
    ).astype(np.float64)
    Q, _ = np.linalg.qr(rng.randn(C, C))
    cov = (Q * evals) @ Q.T
    cov = (cov + cov.T) / 2

    SGDNSCLNA = ref_sgd_na()
    name = "roi_head.fc.weight"
    opt, _ = _make_opt(SGDNSCLNA, [((3, 3), name)], lr=0.1, thres=1.001)
    opt.get_eigens({name: torch.from_numpy(cov.astype(np.float32))})
    opt.get_transforms()
    ref_P = opt.transforms[name].numpy()

    ours = build_transforms(
        {name: cov.astype(np.float32)}, adaptive=False, fixed_thres=1.001
    )
    np.testing.assert_allclose(np.asarray(ours[name]), ref_P, atol=2e-4)
    # exactly the three 1.00x eigenvalues are kept → P has rank 3
    assert int(round(np.trace(ref_P))) == 3


def test_fixed_threshold_rank_deficient_edge():
    """Rank-deficient covariance (weak #6a): both sides keep a subspace
    inside the numerical null space. The individual tiny eigenvalues (and
    hence the exact kept set) are solver noise, so assert the STRUCTURAL
    contract instead: every kept direction is annihilated by the
    covariance, on the oracle and on ours."""
    from nsgp_repre_tpu.engine.nsgp import build_transforms, fixed_threshold_mask

    rng = np.random.RandomState(2)
    C, r = 48, 20
    X = rng.randn(r, C).astype(np.float32)
    cov = X.T @ X  # rank r < C

    SGDNSCLNA = ref_sgd_na()
    name = "roi_head.fc.weight"
    opt, _ = _make_opt(SGDNSCLNA, [((3, 3), name)], lr=0.1, thres=1.001)
    opt.get_eigens({name: torch.from_numpy(cov.copy())})
    opt.get_transforms()
    ref_P = opt.transforms[name].numpy()
    scale = float(np.linalg.norm(cov))
    assert np.linalg.norm(cov @ ref_P) / scale < 1e-4

    ours = np.asarray(build_transforms(
        {name: cov}, adaptive=False, fixed_thres=1.001
    )[name])
    assert np.linalg.norm(cov @ ours) / scale < 1e-4
    # and the mask rule itself is the reference's literal expression
    sv = np.sort(np.abs(np.linalg.eigvalsh(cov.astype(np.float64))))[::-1]
    mask = fixed_threshold_mask(sv, 1.001)
    np.testing.assert_array_equal(mask, sv <= sv[-1] * 1.001)


# ---------------------------------------------------------------------------
# step() trajectories
# ---------------------------------------------------------------------------
def _torch_transform_from_cov(cls, name, cov, **kw):
    opt_t, _ = _make_opt(cls, [((2, 2), name)], lr=0.1, **kw)
    opt_t.get_eigens({name: torch.from_numpy(cov.copy())})
    opt_t.get_transforms()
    return opt_t.transforms[name].numpy()


def _run_ref_steps(cls, w0, grads, name, P, **kw):
    """Drive the real optimizer class for len(grads) steps."""
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = cls(
        [{"params": [p], "names": [name], "svd": True}], svd=True, **kw
    )
    if P is not None:
        opt.transforms[name] = torch.from_numpy(P.copy())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for g in grads:
            p.grad = torch.from_numpy(g.copy())
            opt.step()
    return p.detach().numpy()


def _run_ours_steps(tx_factory, w0_jax, grads_jax, name_path, P):
    import jax

    from nsgp_repre_tpu.engine import optim

    params = w0_jax
    tx = tx_factory()
    state = tx.init(params)
    if P is not None:
        state = optim.set_transforms(state, {name_path: P})
    for g in grads_jax:
        upd, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
    return params


@pytest.mark.parametrize("momentum,wd", [(0.9, 1e-4), (0.0, 0.0), (0.9, 0.0)])
def test_sgd_nscl_step_oracle_linear(momentum, wd):
    import jax.numpy as jnp

    from nsgp_repre_tpu.engine import optim

    rng = np.random.RandomState(3)
    O, C = 8, 24
    name = "roi_head.fc.weight"
    X = rng.randn(64, C).astype(np.float32) * np.exp(
        -2.0 * np.linspace(0, 1, C)
    )[None, :]
    cov = (X.T @ X).astype(np.float32)
    P = _torch_transform_from_cov(ref_sgd(), name, cov)

    w0 = rng.randn(O, C).astype(np.float32)
    grads = [rng.randn(O, C).astype(np.float32) for _ in range(6)]
    expect = _run_ref_steps(
        ref_sgd(), w0, grads, name, P, lr=0.1, momentum=momentum, weight_decay=wd
    )

    params = {"fc": {"kernel": jnp.asarray(w0.T)}}
    got = _run_ours_steps(
        lambda: optim.sgd_nscl(0.1, momentum=momentum, weight_decay=wd),
        params,
        [{"fc": {"kernel": jnp.asarray(g.T)}} for g in grads],
        "fc/kernel",
        jnp.asarray(P),
    )
    np.testing.assert_allclose(
        np.asarray(got["fc"]["kernel"]).T, expect, rtol=2e-4, atol=2e-5
    )


def test_sgd_nscl_step_oracle_conv4d():
    import jax.numpy as jnp

    from nsgp_repre_tpu.engine import optim

    rng = np.random.RandomState(4)
    cout, cin, kh, kw = 6, 4, 3, 3
    C = cin * kh * kw
    name = "backbone.layer.conv.weight"
    X = rng.randn(96, C).astype(np.float32) * np.exp(
        -1.5 * np.linspace(0, 1, C)
    )[None, :]
    cov = (X.T @ X).astype(np.float32)
    P = _torch_transform_from_cov(ref_sgd(), name, cov)  # backbone-normalized

    w0 = rng.randn(cout, cin, kh, kw).astype(np.float32)
    grads = [rng.randn(cout, cin, kh, kw).astype(np.float32) for _ in range(5)]
    expect = _run_ref_steps(
        ref_sgd(), w0, grads, name, P, lr=0.05, momentum=0.9, weight_decay=1e-4
    )

    to_jax = lambda w: jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW→HWIO
    params = {"conv": {"kernel": to_jax(w0)}}
    got = _run_ours_steps(
        lambda: optim.sgd_nscl(0.05, momentum=0.9, weight_decay=1e-4),
        params,
        [{"conv": {"kernel": to_jax(g)}} for g in grads],
        "conv/kernel",
        jnp.asarray(P),
    )
    got_t = np.transpose(np.asarray(got["conv"]["kernel"]), (3, 2, 0, 1))
    np.testing.assert_allclose(got_t, expect, rtol=2e-4, atol=2e-5)


def test_adam_nscl_step_oracle():
    import jax.numpy as jnp

    from nsgp_repre_tpu.engine import optim

    rng = np.random.RandomState(5)
    O, C = 8, 16
    name = "roi_head.fc.weight"
    X = rng.randn(48, C).astype(np.float32) * np.exp(
        -2.0 * np.linspace(0, 1, C)
    )[None, :]
    cov = (X.T @ X).astype(np.float32)
    P = _torch_transform_from_cov(ref_adam(), name, cov)

    w0 = rng.randn(O, C).astype(np.float32)
    grads = [rng.randn(O, C).astype(np.float32) for _ in range(6)]
    expect = _run_ref_steps(
        ref_adam(), w0, grads, name, P, lr=1e-2, weight_decay=1e-4
    )

    params = {"fc": {"kernel": jnp.asarray(w0.T)}}
    got = _run_ours_steps(
        lambda: optim.adam_nscl(1e-2, weight_decay=1e-4),
        params,
        [{"fc": {"kernel": jnp.asarray(g.T)}} for g in grads],
        "fc/kernel",
        jnp.asarray(P),
    )
    np.testing.assert_allclose(
        np.asarray(got["fc"]["kernel"]).T, expect, rtol=2e-4, atol=2e-5
    )


def test_adamw_nscl_step_oracle_decoupled_wd():
    """AdamW: decoupled decay joins the update BEFORE projection
    (AdamW_NSCL.py step: update = get_update(...) - lr*wd*p, then @P)."""
    import jax.numpy as jnp

    from nsgp_repre_tpu.engine import optim

    rng = np.random.RandomState(6)
    O, C = 6, 12
    name = "roi_head.fc.weight"
    X = rng.randn(36, C).astype(np.float32) * np.exp(
        -2.0 * np.linspace(0, 1, C)
    )[None, :]
    cov = (X.T @ X).astype(np.float32)
    P = _torch_transform_from_cov(ref_adamw(), name, cov)

    w0 = rng.randn(O, C).astype(np.float32)
    grads = [rng.randn(O, C).astype(np.float32) for _ in range(5)]
    expect = _run_ref_steps(
        ref_adamw(), w0, grads, name, P, lr=1e-2, weight_decay=0.05
    )

    params = {"fc": {"kernel": jnp.asarray(w0.T)}}
    got = _run_ours_steps(
        lambda: optim.adam_nscl(1e-2, weight_decay=0.05, decoupled_wd=True),
        params,
        [{"fc": {"kernel": jnp.asarray(g.T)}} for g in grads],
        "fc/kernel",
        jnp.asarray(P),
    )
    np.testing.assert_allclose(
        np.asarray(got["fc"]["kernel"]).T, expect, rtol=2e-4, atol=2e-5
    )

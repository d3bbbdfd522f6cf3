"""Parity: fused Pallas RPN head vs the CovConv/XLA head.

The kernel must reproduce the dense 3x3+ReLU+1x1 head exactly (same
compute dtype, f32 conv accumulation) across level shapes including
non-multiple-of-8 widths and single-band maps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.models.rpn_head import RPNHead
from nsgp_repre_tpu.ops.rpn_head_pallas import _pick_band, rpn_head_fused


def _head_and_feats(c=32, a=3, shapes=((2, 16, 24), (2, 8, 12), (2, 5, 7))):
    head = RPNHead(feat_channels=c, num_base_priors=a)
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
             for b, h, w in shapes]
    variables = head.init(jax.random.PRNGKey(0), feats)
    return head, variables, feats


def _packed(variables, c, a, p=128):
    pv = variables["params"]
    w1 = pv["rpn_conv"]["kernel"]
    b1 = pv["rpn_conv"]["bias"]
    wc = pv["rpn_cls"]["kernel"].reshape(c, a)
    wr = pv["rpn_reg"]["kernel"].reshape(c, 4 * a)
    wcr = jnp.concatenate([wc, wr, jnp.zeros((c, p - 5 * a))], axis=1)
    bcr = jnp.concatenate(
        [pv["rpn_cls"]["bias"], pv["rpn_reg"]["bias"],
         jnp.zeros((p - 5 * a,))]
    )
    return w1, b1, wcr, bcr


def test_fused_head_matches_dense():
    c, a = 32, 3
    head, variables, feats = _head_and_feats(c=c, a=a)
    cls_ref, reg_ref = head.apply(variables, feats)
    w1, b1, wcr, bcr = _packed(variables, c, a)
    for f, cr, rr in zip(feats, cls_ref, reg_ref):
        out = rpn_head_fused(f, w1, b1, wcr, bcr, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out[..., :a]), np.asarray(cr), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[..., a : 5 * a]),
            np.asarray(rr.reshape(rr.shape[:3] + (4 * a,))),
            rtol=1e-5, atol=1e-5,
        )


def test_fused_head_multi_band_rows():
    """H=16 with band 16 vs H=32 (two bands) must agree row-for-row on
    identical content — checks the halo DMA/zero logic."""
    c, a = 16, 3
    head = RPNHead(feat_channels=c, num_base_priors=a)
    rs = np.random.RandomState(1)
    f32 = jnp.asarray(rs.randn(1, 32, 16, c).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), [f32])
    cls_ref, reg_ref = head.apply(variables, [f32])
    w1, b1, wcr, bcr = _packed(variables, c, a)
    assert _pick_band(32) < 32  # exercises interior bands + both halos
    out = rpn_head_fused(f32, w1, b1, wcr, bcr, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[..., :a]), np.asarray(cls_ref[0]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out[..., a : 5 * a]), np.asarray(reg_ref[0]),
        rtol=1e-5, atol=1e-5,
    )


def test_pick_band_divides():
    for h in (200, 100, 50, 25, 13, 16, 7, 1):
        th = _pick_band(h)
        assert h % th == 0 and 1 <= th <= max(16, h)


def test_module_fused_flag_uses_kernel(monkeypatch):
    """fused=True routes through the kernel unless 'cov' is mutable."""
    c, a = 16, 3
    head, variables, feats = _head_and_feats(
        c=c, a=a, shapes=((1, 8, 8),)
    )
    calls = []
    import nsgp_repre_tpu.models.rpn_head as rh

    real = rh.__dict__  # module namespace untouched; patch the ops fn
    import nsgp_repre_tpu.ops.rpn_head_pallas as rhp

    orig = rhp.rpn_head_fused

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, interpret=True, **kw)

    monkeypatch.setattr(rhp, "rpn_head_fused", spy)
    cls_f, reg_f = head.apply(variables, feats, fused=True)
    assert calls, "fused path did not invoke the Pallas kernel"
    cls_d, reg_d = head.apply(variables, feats, fused=False)
    np.testing.assert_allclose(
        np.asarray(cls_f[0]), np.asarray(cls_d[0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(reg_f[0]), np.asarray(reg_d[0]), rtol=1e-5, atol=1e-5
    )
    # covariance pass keeps the CovConv path (taps must fire)
    calls.clear()
    _, state = head.apply(variables, feats, fused=True, mutable=["cov"])
    assert not calls and "cov" in state

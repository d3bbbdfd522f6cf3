"""Numerical parity of the NSCL optimizer chain against a step-by-step
torch-semantics simulation (SGD_NSCL.py:59-96,387-415 math in numpy)."""
import jax
import jax.numpy as jnp
import numpy as np

from nsgp_repre_tpu.engine import optim


def torch_sgd_nscl_sim(steps, grads, p0, lr, momentum, wd, transform=None):
    """Reference math: grad += wd*p; buf = grad (step1) else m*buf + grad;
    update = -lr*buf; update = update_2d @ P; p += update."""
    p = p0.copy()
    buf = np.zeros_like(p)
    for t in range(steps):
        g = grads[t] + wd * p
        if t == 0:
            buf = g.copy()
        else:
            buf = momentum * buf + g
        upd = -lr * buf
        if transform is not None:
            if upd.ndim == 4:  # torch conv (out, in, kh, kw)
                o = upd.shape[0]
                upd = (upd.reshape(o, -1) @ transform).reshape(upd.shape)
            else:
                upd = upd @ transform
        p = p + upd
    return p


def test_dense_parity_with_projection():
    rng = np.random.RandomState(0)
    C, O = 16, 8
    steps = 5
    # torch linear weight (O, C); jax kernel (C, O) = transpose
    w_torch = rng.randn(O, C).astype(np.float32)
    grads_torch = [rng.randn(O, C).astype(np.float32) for _ in range(steps)]
    P = rng.randn(C, C).astype(np.float32)
    P = P @ P.T / C

    expect = torch_sgd_nscl_sim(
        steps, grads_torch, w_torch, lr=0.1, momentum=0.9, wd=0.01, transform=P
    )

    params = {"layer": {"kernel": jnp.asarray(w_torch.T)}}
    tx = optim.sgd_nscl(0.1, momentum=0.9, weight_decay=0.01)
    state = tx.init(params)
    state = optim.set_transforms(state, {"layer/kernel": jnp.asarray(P)})
    for t in range(steps):
        g = {"layer": {"kernel": jnp.asarray(grads_torch[t].T)}}
        upd, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
    got = np.asarray(params["layer"]["kernel"]).T
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_conv_parity_with_projection():
    rng = np.random.RandomState(1)
    kh = kw = 3
    cin, cout = 4, 6
    C = cin * kh * kw
    steps = 4
    w_torch = rng.randn(cout, cin, kh, kw).astype(np.float32)
    grads_torch = [rng.randn(cout, cin, kh, kw).astype(np.float32) for _ in range(steps)]
    P = rng.randn(C, C).astype(np.float32)
    P = P @ P.T / C

    expect = torch_sgd_nscl_sim(
        steps, grads_torch, w_torch, lr=0.05, momentum=0.9, wd=0.0, transform=P
    )

    to_jax = lambda w: jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW→HWIO
    params = {"conv": {"kernel": to_jax(w_torch)}}
    tx = optim.sgd_nscl(0.05, momentum=0.9, weight_decay=0.0)
    state = tx.init(params)
    state = optim.set_transforms(state, {"conv/kernel": jnp.asarray(P)})
    for t in range(steps):
        g = {"conv": {"kernel": to_jax(grads_torch[t])}}
        upd, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
    got = np.transpose(np.asarray(params["conv"]["kernel"]), (3, 2, 0, 1))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_adamw_decoupled_wd():
    # decoupled decay applies to the update, not the gradient
    params = {"w": jnp.asarray(np.array([2.0], np.float32))}
    tx = optim.adam_nscl(0.1, weight_decay=0.5, decoupled_wd=True)
    state = tx.init(params)
    g = {"w": jnp.asarray(np.array([0.0], np.float32))}
    upd, _ = tx.update(g, state, params)
    # grad 0 → adam term 0; update = -lr*wd*p = -0.1*0.5*2 = -0.1
    np.testing.assert_allclose(np.asarray(upd["w"]), [-0.1], rtol=1e-5)

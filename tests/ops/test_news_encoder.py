"""Fused news-encoder pallas kernel: numeric parity with the pure-XLA
reference math in interpreter mode (TPU execution is covered by
scripts/bench_kernels.py on hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ebnerd_tpu.ops.news_encoder import (fused_news_encoder,
    news_encoder, news_encoder_reference)


def _params(rng, din, d, a):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.05)
    return mk(din, d), mk(din, d), mk(din, d), mk(d, a), mk(a), mk(a, 1)


@pytest.mark.parametrize(
    "n,t,din,heads,head_dim,a,block",
    [
        (10, 30, 256, 4, 32, 64, 4),     # uneven N vs block
        (8, 30, 128, 20, 20, 200, 8),    # NRMS head geometry (20 x 20)
        (5, 12, 64, 2, 16, 32, 2),
    ],
)
def test_fused_matches_reference(n, t, din, heads, head_dim, a, block):
    rng = np.random.default_rng(0)
    d = heads * head_dim
    x = jnp.asarray(rng.standard_normal((n, t, din), dtype=np.float32))
    wq, wk, wv, w, b, q = _params(rng, din, d, a)
    ref = news_encoder_reference(x, wq, wk, wv, w, b, q, num_heads=heads)
    out = fused_news_encoder(x, wq, wk, wv, w, b, q, num_heads=heads,
                             block_n=block, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_custom_vjp_matches_autodiff():
    """The recompute backward kernel's grads equal autodiff of the XLA
    reference math for every input and weight."""
    from ebnerd_tpu.ops.news_encoder import news_encoder

    rng = np.random.default_rng(0)
    n, t, din, heads, head_dim, a = 10, 12, 64, 4, 16, 32
    d = heads * head_dim
    mk = lambda *s, sc=0.05: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * sc)
    args = (mk(n, t, din, sc=1.0), mk(din, d), mk(din, d), mk(din, d),
            mk(d, a), mk(a), mk(a, 1))

    dummy = jnp.ones((8, 128), jnp.float32)

    def loss_fused(*a_):
        return jnp.sum(jnp.sin(news_encoder(*a_, dummy, None, heads, 4, True)))

    def loss_ref(*a_):
        return jnp.sum(jnp.sin(news_encoder_reference(*a_, num_heads=heads)))

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=5e-5)


def test_custom_vjp_with_dropout_matches_masked_reference():
    """Training-mode path: the in-kernel dropout (mask applied between
    attention and pooling) matches an XLA computation using the SAME mask,
    in both outputs and all gradients."""
    from ebnerd_tpu.ops.news_encoder import news_encoder

    rng = np.random.default_rng(3)
    n, t, din, heads, head_dim, a = 6, 10, 64, 4, 16, 32
    d = heads * head_dim
    keep = 0.8
    mk = lambda *s, sc=0.05: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * sc)
    args = (mk(n, t, din, sc=1.0), mk(din, d), mk(din, d), mk(din, d),
            mk(d, a), mk(a), mk(a, 1))
    mask = jnp.asarray((rng.random((n, t, d)) < keep).astype(np.float32))

    def ref_masked(x, wq, wk, wv, w_att, b_att, q_att):
        qh = jnp.einsum("ntd,df->ntf", x, wq).reshape(n, t, heads, head_dim)
        kh = jnp.einsum("ntd,df->ntf", x, wk).reshape(n, t, heads, head_dim)
        vh = jnp.einsum("ntd,df->ntf", x, wv).reshape(n, t, heads, head_dim)
        logits = jnp.einsum("nqhd,nkhd->nhqk", qh, kh) / np.sqrt(head_dim)
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", probs, vh).reshape(n, t, d)
        o = o * mask / keep
        att = (jnp.tanh(o @ w_att + b_att) @ q_att)[..., 0]
        att = att - jnp.max(att, axis=-1, keepdims=True)
        expo = jnp.exp(att)
        w = expo / (jnp.sum(expo, axis=-1, keepdims=True) + 1e-8)
        return jnp.einsum("ntd,nt->nd", o, w)

    def loss_fused(*a_):
        return jnp.sum(jnp.sin(news_encoder(*a_, mask, None, heads, 2, True, keep)))

    def loss_ref(*a_):
        return jnp.sum(jnp.sin(ref_masked(*a_)))

    np.testing.assert_allclose(
        np.asarray(news_encoder(*args, mask, None, heads, 2, True, keep)),
        np.asarray(ref_masked(*args)), atol=3e-5,
    )
    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=5e-5)


def test_reference_matches_flax_layers():
    """The pure-XLA reference math equals the flax SelfAttention+
    AdditiveAttention modules with the same weights."""
    from ebnerd_tpu.models.layers import AdditiveAttention, SelfAttention

    rng = np.random.default_rng(1)
    n, t, din, heads, head_dim, a = 6, 10, 32, 4, 8, 16
    d = heads * head_dim
    x = jnp.asarray(rng.standard_normal((n, t, din), dtype=np.float32))
    sa = SelfAttention(heads, head_dim)
    sa_vars = sa.init(jax.random.key(0), x, x, x)
    pool = AdditiveAttention(a)
    y = sa.apply(sa_vars, x, x, x)
    pool_vars = pool.init(jax.random.key(1), y)
    expected = pool.apply(pool_vars, y)
    out = news_encoder_reference(
        x,
        sa_vars["params"]["WQ"], sa_vars["params"]["WK"], sa_vars["params"]["WV"],
        pool_vars["params"]["W"], pool_vars["params"]["b"], pool_vars["params"]["q"],
        num_heads=heads,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_bf16_compute_close_to_fp32_reference():
    """compute_dtype='bfloat16' (bf16 MXU operands, fp32 accumulation) must
    track the fp32 reference within bf16 rounding, fwd and bwd."""
    from ebnerd_tpu.ops.news_encoder import news_encoder

    rng = np.random.default_rng(1)
    n, t, din, heads, head_dim, a = 12, 10, 48, 4, 8, 16
    d = heads * head_dim
    mk = lambda *s, sc=0.1: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * sc)
    args = (mk(n, t, din, sc=1.0), mk(din, d), mk(din, d), mk(din, d),
            mk(d, a), mk(a), mk(a, 1))
    ref = news_encoder_reference(*args, num_heads=heads)
    xb = args[0].astype(jnp.bfloat16)
    out = fused_news_encoder(xb, *args[1:], num_heads=heads, block_n=4,
                             interpret=True, compute_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    dummy = jnp.ones((8, 128), jnp.float32)

    def loss_fused(*a_):
        return jnp.sum(news_encoder(*a_, dummy, None, heads, 4, True, 1.0, "bfloat16"))

    def loss_ref(*a_):
        return jnp.sum(news_encoder_reference(*a_, num_heads=heads))

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(xb, *args[1:])
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    assert g1[0].dtype == jnp.bfloat16  # dx in the input dtype
    for a_, b_ in zip(g1, g2):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-9
        err = float(jnp.max(jnp.abs(a_.astype(jnp.float32) - b_))) / scale
        assert err < 6e-2, f"bf16 grad rel err {err}"


def test_n_valid_block_skip_matches_full_compute():
    """n_valid (dedup bucket padding): valid rows match the full-compute
    output exactly, fully-padded blocks emit zeros, and weight/x grads
    match when the pad rows' cotangent is zero (as slot gathers
    guarantee)."""
    import jax

    heads, t, din, d, a = 2, 6, 16, 8, 4
    n, nv, bn = 24, 13, 4  # blocks 0..3: starts 0,4,8,12 valid; 16,20 skip
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((n, t, din)), jnp.float32)
    wq, wk, wv = (jnp.asarray(rng.standard_normal((din, d)) * 0.1, jnp.float32)
                  for _ in range(3))
    w = jnp.asarray(rng.standard_normal((d, a)) * 0.1, jnp.float32)
    b = jnp.zeros((a,), jnp.float32)
    q = jnp.asarray(rng.standard_normal((a, 1)) * 0.1, jnp.float32)
    dummy = jnp.ones((8, 128), jnp.float32)

    full = news_encoder(x, wq, wk, wv, w, b, q, dummy, None, heads, bn, True)
    nv_arr = jnp.asarray([nv], jnp.int32)
    part = news_encoder(x, wq, wk, wv, w, b, q, dummy, None, heads, bn, True,
                        1.0, "float32", 1.0, nv_arr)
    # blocks containing any valid row compute fully -> equal through the
    # boundary block; fully-pad blocks are zero
    boundary = -(-nv // bn) * bn
    np.testing.assert_array_equal(np.asarray(part[:boundary]),
                                  np.asarray(full[:boundary]))
    np.testing.assert_array_equal(np.asarray(part[boundary:]), 0.0)

    # gradient parity with zero cotangent on pad rows (the dedup
    # invariant: no slot references a pad article)
    g = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    g = g.at[nv:].set(0.0)

    def loss_full(x_, wq_, wk_, wv_, w_, q_):
        out = news_encoder(x_, wq_, wk_, wv_, w_, b, q_, dummy, None,
                           heads, bn, True)
        return jnp.sum(out * g)

    def loss_part(x_, wq_, wk_, wv_, w_, q_):
        out = news_encoder(x_, wq_, wk_, wv_, w_, b, q_, dummy, None,
                           heads, bn, True, 1.0, "float32", 1.0, nv_arr)
        return jnp.sum(out * g)

    gf = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4, 5))(x, wq, wk, wv, w, q)
    gp = jax.grad(loss_part, argnums=(0, 1, 2, 3, 4, 5))(x, wq, wk, wv, w, q)
    for a_, b_ in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)

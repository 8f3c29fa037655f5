"""Fused news-encoder pallas kernel: numeric parity with the pure-XLA
reference math in interpreter mode (TPU execution is covered by
scripts/bench_kernels.py on hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ebnerd_tpu.ops.news_encoder import fused_news_encoder, news_encoder_reference


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

"""Fused-kernel NRMS: identical parameter tree and identical outputs to
the unfused model (interpret-mode kernels on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.newsrec import NRMS

B, H, K, T, VOCAB = 4, 6, 5, 10, 500


def _batch():
    rng = np.random.default_rng(0)
    return {
        "hist_tokens": jnp.asarray(rng.integers(1, VOCAB, (B, H, T)).astype(np.int32)),
        "cand_tokens": jnp.asarray(rng.integers(1, VOCAB, (B, K, T)).astype(np.int32)),
    }


def test_fused_nrms_matches_unfused():
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=4, head_dim=8,
                     attention_hidden_dim=16)
    batch = _batch()
    base = NRMS(hp, vocab_size=VOCAB, word_emb_dim=32)
    fused = NRMS(hp, vocab_size=VOCAB, word_emb_dim=32,
                 use_fused_encoder=True, fused_block_n=4, fused_interpret=True)
    v = base.init(jax.random.key(0), batch, train=False)
    v2 = fused.init(jax.random.key(0), batch, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v2["params"]))
    out_base = base.apply(v, batch, train=False)
    out_fused = fused.apply(v, batch, train=False)  # same params
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_fused),
                               atol=1e-5)


def test_fused_nrms_train_step_gradients_flow():
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=4, head_dim=8,
                     attention_hidden_dim=16)
    batch = _batch()
    fused = NRMS(hp, vocab_size=VOCAB, word_emb_dim=32,
                 use_fused_encoder=True, fused_block_n=4, fused_interpret=True)
    v = fused.init(jax.random.key(0), batch, train=False)
    labels = jnp.zeros((B, K)).at[:, 0].set(1.0)

    def loss(params):
        logits = fused.apply({"params": params}, batch, train=True,
                             rngs={"dropout": jax.random.key(1)})
        return -jnp.mean(jnp.sum(labels * jax.nn.log_softmax(logits), -1))

    grads = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    # every fused-path parameter receives gradient signal
    norms = {"/".join(map(str, p)): float(jnp.abs(g).sum())
             for p, g in jax.tree_util.tree_flatten_with_path(grads)[0]}
    assert all(n > 0 for n in norms.values()), norms

"""Gold-standard model-parity check: run the REFERENCE TF/Keras NRMS
(imported from /root/reference — executed, not copied) with the same
weights as our flax NRMS and compare outputs.

Covers the full forward math chain: embedding -> multi-head self-attention
(no biases, no output projection, 1/sqrt(head_dim)) -> additive attention
pooling -> user self-attention -> pooling -> dot -> softmax/sigmoid heads.
"""
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REFERENCE_SRC = "/root/reference/src"

H, T, K, VOCAB, EMB = 5, 10, 4, 200, 16
HEADS, HEAD_DIM, ATT = 4, 4, 16


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, REFERENCE_SRC)
    from ebrec.models.newsrec import NRMSModel
    from ebrec.models.newsrec.model_config import hparams_nrms

    hp = hparams_nrms()
    hp.title_size, hp.history_size = T, H
    hp.head_num, hp.head_dim = HEADS, HEAD_DIM
    hp.attention_hidden_dim = ATT
    rng = np.random.default_rng(0)
    w2v = rng.standard_normal((VOCAB, EMB), dtype=np.float32) * 0.1
    return NRMSModel(hparams=hp, word2vec_embedding=w2v, seed=1)


def _keras_weights(model):
    def by_type(keras_model, type_name):
        return [l for l in keras_model.layers if type(l).__name__ == type_name]

    newsenc, userenc = model.newsencoder, model.userencoder
    emb = by_type(newsenc, "Embedding")[0].get_weights()[0]
    n_sa = by_type(newsenc, "SelfAttention")[0].get_weights()
    n_att = by_type(newsenc, "AttLayer2")[0].get_weights()
    u_sa = by_type(userenc, "SelfAttention")[0].get_weights()
    u_att = by_type(userenc, "AttLayer2")[0].get_weights()
    return {
        "word_embedding": {"embedding": emb},
        "news_self_att": {"WQ": n_sa[0], "WK": n_sa[1], "WV": n_sa[2]},
        "news_pool": {"W": n_att[0], "b": n_att[1], "q": n_att[2]},
        "user_self_att": {"WQ": u_sa[0], "WK": u_sa[1], "WV": u_sa[2]},
        "user_pool": {"W": u_att[0], "b": u_att[1], "q": u_att[2]},
    }


@pytest.mark.parametrize("transposed", [True, False])
def test_flax_nrms_matches_reference_keras(reference_model, transposed):
    """transposed=True reproduces the reference layer's adjoint_a attention
    quirk exactly (reference layers.py:249 — transposed weight
    application, a deviation its Keras-3 port introduced vs the
    batch_dot-based upstream it cites). transposed=False is our production
    default (standard attention, also what the fused kernel computes);
    at this test's init scale the two differ only at second order, so the
    same tolerance holds — the docvec parity test covers the regime where
    they genuinely diverge."""
    import jax
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.newsrec import NRMS

    rng = np.random.default_rng(7)
    his = rng.integers(0, VOCAB, (6, H, T)).astype(np.int32)
    cand = rng.integers(0, VOCAB, (6, K, T)).astype(np.int32)

    ref_probs = reference_model.model.predict([his, cand], verbose=0)
    ref_scores = reference_model.scorer.predict(
        [his, cand[:, :1]], verbose=0)[:, 0]

    params = jax.tree_util.tree_map(jnp.asarray, _keras_weights(reference_model))
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=HEADS,
                     head_dim=HEAD_DIM, attention_hidden_dim=ATT)
    ours = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB,
                transposed_self_att=transposed)
    logits = ours.apply(
        {"params": params},
        {"hist_tokens": jnp.asarray(his), "cand_tokens": jnp.asarray(cand)},
        train=False,
    )
    our_probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    our_scores = np.asarray(jax.nn.sigmoid(logits[:, 0]))

    atol = 1e-5 if transposed else 1e-3
    np.testing.assert_allclose(our_probs, ref_probs, atol=atol)
    np.testing.assert_allclose(our_scores, ref_scores, atol=atol)

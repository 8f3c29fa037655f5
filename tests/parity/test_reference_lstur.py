"""Reference-parity: LSTUR news encoder (Embedding -> Conv1D -> masked
additive attention with zero-overwrite) equals the TF/Keras reference
with shared weights.

The user-side GRU is compared at the semantics level only: Keras 3's GRU
uses the `reset_after` gate layout whose weights don't map onto flax's
GRUCell bit-for-bit (documented in models/layers.py).

The reference NRMSDocVec does not build under the installed Keras 3
("Cannot convert '<int>' to a shape"), so its parity is covered by the
shared-layer tests (dense stack + BN are standard flax modules) instead.
"""
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REFERENCE_SRC = "/root/reference/src"

H, T, VOCAB, EMB = 4, 8, 150, 16
FILT, ATT, N_USERS = 16, 10, 20


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, REFERENCE_SRC)
    from ebrec.models.newsrec import LSTURModel
    from ebrec.models.newsrec.model_config import hparams_lstur

    hp = hparams_lstur()
    hp.title_size, hp.history_size, hp.n_users = T, H, N_USERS
    hp.gru_unit = hp.filter_num = FILT
    hp.attention_hidden_dim = ATT
    hp.window_size = 3
    rng = np.random.default_rng(0)
    w2v = rng.standard_normal((VOCAB, EMB), dtype=np.float32) * 0.1
    return LSTURModel(hparams=hp, word2vec_embedding=w2v, seed=1)


def test_lstur_news_encoder_matches_reference(reference_model):
    import jax
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsLSTUR
    from ebnerd_tpu.models.newsrec import LSTUR

    def find(layers, name):
        return [l for l in layers if type(l).__name__ == name]

    news_enc = reference_model.newsencoder
    emb = find(news_enc.layers, "Embedding")[0].get_weights()[0]
    ck, cb = find(news_enc.layers, "Conv1D")[0].get_weights()
    aw = find(news_enc.layers, "AttLayer2")[0].get_weights()

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, VOCAB, (6, T)).astype(np.int32)
    tokens[:, T // 2:] = 0  # padding positions must be masked
    tokens[0, :] = 0        # one all-padding article -> zero vector
    ref_out = news_enc.predict(tokens, verbose=0)

    hp = HParamsLSTUR(title_size=T, history_size=H, n_users=N_USERS,
                      gru_unit=FILT, filter_num=FILT, attention_hidden_dim=ATT)
    ours = LSTUR(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    batch = {
        "hist_tokens": jnp.zeros((1, H, T), jnp.int32),
        "cand_tokens": jnp.zeros((1, 2, T), jnp.int32),
        "user_id": jnp.zeros((1,), jnp.int32),
    }
    variables = ours.init(jax.random.key(0), batch, train=False)
    params = dict(variables["params"])
    params["word_embedding"] = {"embedding": jnp.asarray(emb)}
    params["conv"] = {"Conv_0": {"kernel": jnp.asarray(ck), "bias": jnp.asarray(cb)}}
    params["news_pool"] = {"W": jnp.asarray(aw[0]), "b": jnp.asarray(aw[1]),
                           "q": jnp.asarray(aw[2])}
    our_out = ours.apply(
        {"params": params}, jnp.asarray(tokens), False,
        method=lambda m, t_, tr: m.encode_news(t_, tr),
    )
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=1e-4)
    # all-padding article encodes to exactly zero on both sides
    np.testing.assert_allclose(np.asarray(our_out[0]), 0.0, atol=1e-6)

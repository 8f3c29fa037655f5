"""Reference-parity: NPA (executed TF/Keras reference vs our flax NPA
with shared weights).

Covers the full personalized chain (reference: npa.py:14-233): shared
word + user embeddings, Conv1D title encoder, the TWO distinct query
Denses (word-level npa.py:149, news-level npa.py:98), and both
PersonalizedAttentivePooling applications (layers.py:314-339). This is
exactly the model whose pack-and-slice input encodings (user id appended
to the token vector, npa.py:121-126, :187-190) were re-architected into
explicit batch fields, so the comparison is weight-for-weight against
the executed reference graph, probs and scorer alike.
"""
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REFERENCE_SRC = "/root/reference/src"

H, T, K = 5, 10, 4
VOCAB, EMB = 200, 16
FILT, ATT, UEMB, N_USERS = 16, 12, 8, 20


@pytest.fixture(scope="module")
def keras3_npa_shim():
    """The reference NPA graph cannot build under the installed Keras 3:
    it applies RAW tf ops to symbolic KerasTensors (``tf.shape`` /
    ``tf.tile`` for the dynamic candidate tile, npa.py:188-190), which
    Keras 3 forbids. Shim WITHOUT touching the reference code: make the
    candidate axis static (None -> K in keras.Input, so tf.shape can read
    it symbolically) and route tf.shape/tf.tile on KerasTensors through
    keras.ops equivalents. The executed graph is the reference's own."""
    import keras
    import tensorflow.keras as tfk

    orig_shape, orig_tile, orig_input = tf.shape, tf.tile, tfk.Input

    def shim_shape(x, *a, **kw):
        if isinstance(x, keras.KerasTensor):
            return tuple(x.shape)
        return orig_shape(x, *a, **kw)

    def shim_tile(x, reps, *a, **kw):
        if isinstance(x, keras.KerasTensor):
            return keras.ops.tile(x, reps)
        return orig_tile(x, reps, *a, **kw)

    def shim_input(shape=None, **kw):
        if shape is not None:
            shape = tuple(K if d is None else d for d in shape)
        return orig_input(shape=shape, **kw)

    tf.shape, tf.tile, tfk.Input = shim_shape, shim_tile, shim_input
    yield
    tf.shape, tf.tile, tfk.Input = orig_shape, orig_tile, orig_input


@pytest.fixture(scope="module")
def reference_model(keras3_npa_shim):
    sys.path.insert(0, REFERENCE_SRC)
    from ebrec.models.newsrec import NPAModel
    from ebrec.models.newsrec.model_config import hparams_npa

    hp = hparams_npa()
    hp.title_size, hp.history_size, hp.n_users = T, H, N_USERS
    hp.filter_num, hp.attention_hidden_dim, hp.user_emb_dim = FILT, ATT, UEMB
    hp.window_size = 3
    rng = np.random.default_rng(0)
    w2v = rng.standard_normal((VOCAB, EMB), dtype=np.float32) * 0.1
    return NPAModel(hparams=hp, word2vec_embedding=w2v, seed=1)


def _find(layers, type_name):
    return [l for l in layers if type(l).__name__ == type_name]


def _keras_weights(model):
    """Pull the shared weights out of the reference graph's nested
    functional models (news_encoder / user_encoder; the pooling layers
    are themselves inner keras Models, layers.py:324-338)."""
    import tensorflow.keras as keras

    top = model.model
    # the news encoder rides inside TimeDistributed in the train graph
    # (npa.py:219); the user encoder is a named nested functional
    ne = _find(top.layers, "TimeDistributed")[0].layer
    ue = [l for l in top.layers if getattr(l, "name", "") == "user_encoder"][0]

    def split_embeddings(embs):
        word = user = None
        for e in embs:
            w = e.get_weights()[0]
            if w.shape == (VOCAB, EMB):
                word = w
            elif w.shape == (N_USERS + 1, UEMB):
                user = w
        return word, user

    word_emb, user_emb = split_embeddings(_find(ne.layers, "Embedding"))
    assert word_emb is not None and user_emb is not None
    ck, cb = _find(ne.layers, "Conv1D")[0].get_weights()

    def inner_models(layers):
        return [l for l in layers
                if isinstance(l, keras.Model)
                and l.name not in ("news_encoder", "user_encoder")]

    # news encoder: ONE plain Dense (the word-level query projection,
    # npa.py:149) + the word pooling inner model with its tanh Dense
    wq_k, wq_b = _find(ne.layers, "Dense")[0].get_weights()
    word_pool_dense = _find(inner_models(ne.layers)[0].layers, "Dense")[0]
    wp_k, wp_b = word_pool_dense.get_weights()
    # user encoder: the OTHER query Dense (news-level, npa.py:98) + the
    # news pooling inner model
    nq_k, nq_b = _find(ue.layers, "Dense")[0].get_weights()
    news_pool_dense = _find(inner_models(ue.layers)[0].layers, "Dense")[0]
    np_k, np_b = news_pool_dense.get_weights()

    return {
        "word_embedding": {"embedding": word_emb},
        "user_embedding": {"embedding": user_emb},
        "conv": {"Conv_0": {"kernel": ck, "bias": cb}},
        "word_query": {"kernel": wq_k, "bias": wq_b},
        "news_query": {"kernel": nq_k, "bias": nq_b},
        "word_pool": {"att_proj": {"kernel": wp_k, "bias": wp_b}},
        "news_pool": {"att_proj": {"kernel": np_k, "bias": np_b}},
    }


def test_flax_npa_matches_reference_keras(reference_model):
    import jax
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsNPA
    from ebnerd_tpu.models.newsrec import NPA

    rng = np.random.default_rng(7)
    his = rng.integers(0, VOCAB, (6, H, T)).astype(np.int32)
    cand = rng.integers(0, VOCAB, (6, K, T)).astype(np.int32)
    uid = rng.integers(0, N_USERS + 1, (6,)).astype(np.int32)

    ref_probs = reference_model.model.predict([uid[:, None], his, cand], verbose=0)
    ref_scores = reference_model.scorer.predict(
        [uid[:, None], his, cand[:, :1]], verbose=0)[:, 0]

    params = jax.tree_util.tree_map(jnp.asarray, _keras_weights(reference_model))
    hp = HParamsNPA(title_size=T, history_size=H, n_users=N_USERS,
                    filter_num=FILT, attention_hidden_dim=ATT,
                    user_emb_dim=UEMB, window_size=3)
    ours = NPA(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    logits = ours.apply(
        {"params": params},
        {"hist_tokens": jnp.asarray(his), "cand_tokens": jnp.asarray(cand),
         "user_id": jnp.asarray(uid)},
        train=False,
    )
    our_probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    our_scores = np.asarray(jax.nn.sigmoid(logits[:, 0]))

    np.testing.assert_allclose(our_probs, ref_probs, atol=1e-5)
    np.testing.assert_allclose(our_scores, ref_scores, atol=1e-5)

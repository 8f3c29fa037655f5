"""Reference-parity: flax NAML equals the TF/Keras reference with shared
weights (title/body conv encoders, category/subcategory embeddings,
attentive multi-view fusion).

NPA has no parity test because the reference NPA does not build under the
installed Keras 3 (`tf.shape` on a KerasTensor, npa.py:189); LSTUR's GRU
parity is semantic-level (Keras `reset_after` gate layout differs from
flax's GRUCell — see models/layers.py docstring).
"""
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REFERENCE_SRC = "/root/reference/src"

H, T, TB, K, VOCAB, EMB = 4, 8, 10, 3, 150, 16
FILT, ATT, VERT, SUBVERT, VDIM = 16, 10, 12, 15, 6


def _find(layers, type_name):
    return [l for l in layers if type(l).__name__ == type_name]


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, REFERENCE_SRC)
    from ebrec.models.newsrec import NAMLModel
    from ebrec.models.newsrec.model_config import hparams_naml

    hp = hparams_naml()
    hp.title_size, hp.body_size, hp.history_size = T, TB, H
    hp.filter_num, hp.attention_hidden_dim = FILT, ATT
    hp.vert_num, hp.subvert_num = VERT, SUBVERT
    hp.vert_emb_dim = hp.subvert_emb_dim = VDIM
    hp.window_size = 3
    rng = np.random.default_rng(0)
    w2v = rng.standard_normal((VOCAB, EMB), dtype=np.float32) * 0.1
    return NAMLModel(hparams=hp, word2vec_embedding=w2v, seed=1)


def _weights(model):
    news_enc, user_enc = model.newsencoder, model.userencoder
    subs = _find(news_enc.layers, "Functional")
    title_m, body_m, vert_m, subvert_m = subs  # creation order (naml.py:129-132)
    word_emb = _find(title_m.layers, "Embedding")[0].get_weights()[0]
    t_conv = _find(title_m.layers, "Conv1D")[0].get_weights()
    t_pool = _find(title_m.layers, "AttLayer2")[0].get_weights()
    b_conv = _find(body_m.layers, "Conv1D")[0].get_weights()
    b_pool = _find(body_m.layers, "AttLayer2")[0].get_weights()
    v_emb = _find(vert_m.layers, "Embedding")[0].get_weights()[0]
    v_dense = _find(vert_m.layers, "Dense")[0].get_weights()
    s_emb = _find(subvert_m.layers, "Embedding")[0].get_weights()[0]
    s_dense = _find(subvert_m.layers, "Dense")[0].get_weights()
    view_pool = _find(news_enc.layers, "AttLayer2")[0].get_weights()
    user_pool = _find(user_enc.layers, "AttLayer2")[0].get_weights()

    att = lambda w: {"W": w[0], "b": w[1], "q": w[2]}
    conv = lambda w: {"Conv_0": {"kernel": w[0], "bias": w[1]}}
    dense = lambda w: {"kernel": w[0], "bias": w[1]}
    return {
        "word_embedding": {"embedding": word_emb},
        "title_conv": conv(t_conv),
        "title_pool": att(t_pool),
        "body_conv": conv(b_conv),
        "body_pool": att(b_pool),
        "vert_embedding": {"embedding": v_emb},
        "vert_dense": dense(v_dense),
        "subvert_embedding": {"embedding": s_emb},
        "subvert_dense": dense(s_dense),
        "view_pool": att(view_pool),
        "user_pool": att(user_pool),
    }


def test_flax_naml_matches_reference_keras(reference_model):
    import jax
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsNAML
    from ebnerd_tpu.models.newsrec import NAML

    rng = np.random.default_rng(9)
    B = 5
    his_t = rng.integers(0, VOCAB, (B, H, T)).astype(np.int32)
    his_b = rng.integers(0, VOCAB, (B, H, TB)).astype(np.int32)
    his_v = rng.integers(0, VERT, (B, H, 1)).astype(np.int32)
    his_s = rng.integers(0, SUBVERT, (B, H, 1)).astype(np.int32)
    pr_t = rng.integers(0, VOCAB, (B, K, T)).astype(np.int32)
    pr_b = rng.integers(0, VOCAB, (B, K, TB)).astype(np.int32)
    pr_v = rng.integers(0, VERT, (B, K, 1)).astype(np.int32)
    pr_s = rng.integers(0, SUBVERT, (B, K, 1)).astype(np.int32)

    ref_probs = reference_model.model.predict(
        [his_t, his_b, his_v, his_s, pr_t, pr_b, pr_v, pr_s], verbose=0
    )

    params = jax.tree_util.tree_map(jnp.asarray, _weights(reference_model))
    hp = HParamsNAML(title_size=T, body_size=TB, history_size=H,
                     filter_num=FILT, attention_hidden_dim=ATT,
                     vert_num=VERT, subvert_num=SUBVERT,
                     vert_emb_dim=VDIM, subvert_emb_dim=VDIM)
    ours = NAML(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    logits = ours.apply(
        {"params": params},
        {
            "hist_tokens": jnp.asarray(his_t), "cand_tokens": jnp.asarray(pr_t),
            "hist_body": jnp.asarray(his_b), "cand_body": jnp.asarray(pr_b),
            "hist_cat": jnp.asarray(his_v[..., 0]),
            "cand_cat": jnp.asarray(pr_v[..., 0]),
            "hist_subcat": jnp.asarray(his_s[..., 0]),
            "cand_subcat": jnp.asarray(pr_s[..., 0]),
        },
        train=False,
    )
    our_probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(our_probs, ref_probs, atol=1e-4)

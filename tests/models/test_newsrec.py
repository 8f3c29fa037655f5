"""Model smoke tests — flax counterparts of the reference quick-start dummy
runs (reference: examples/quick_start/*_dummy.py): build each model with a
random word embedding, run a forward pass on synthetic int batches, check
shapes/dtypes/finiteness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ebnerd_tpu.models.config import (
    HParamsLSTUR,
    HParamsNAML,
    HParamsNPA,
    HParamsNRMS,
    HParamsNRMSDocVec,
)
from ebnerd_tpu.models.newsrec import (
    LSTUR,
    NAML,
    NPA,
    NRMS,
    NRMSDocVec,
    embedding_initializer,
)

B, H, K, T, TB = 4, 6, 5, 10, 12
VOCAB, EMB = 1000, 32
N_USERS = 50


def _tokens(rng, b, l, t):
    toks = rng.integers(1, VOCAB, size=(b, l, t)).astype(np.int32)
    toks[:, :, t // 2 :] = 0  # simulate padding
    toks[:, 0, :] = 0  # one fully-padded article
    return jnp.asarray(toks)


@pytest.fixture()
def token_batch():
    rng = np.random.default_rng(3)
    return {
        "hist_tokens": _tokens(rng, B, H, T),
        "cand_tokens": _tokens(rng, B, K, T),
        "user_id": jnp.asarray(rng.integers(0, N_USERS, size=B).astype(np.int32)),
    }


def _init_and_apply(model, batch, with_batch_stats=False):
    variables = model.init(jax.random.key(0), batch, train=False)
    logits = model.apply(variables, batch, train=False)
    assert logits.shape == (B, K)
    assert bool(jnp.isfinite(logits).all())
    # train-mode forward with dropout rng
    kwargs = dict(rngs={"dropout": jax.random.key(1)})
    if with_batch_stats:
        out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"], **kwargs)
    else:
        out = model.apply(variables, batch, train=True, **kwargs)
    assert out.shape == (B, K)
    return variables, logits


def test_nrms(token_batch):
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=4, head_dim=8)
    w2v = np.random.default_rng(0).standard_normal((VOCAB, EMB), dtype=np.float32)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB,
                 word_emb_init=embedding_initializer(w2v))
    variables, _ = _init_and_apply(model, token_batch)
    # word embedding initialized from the given matrix
    np.testing.assert_allclose(
        np.asarray(variables["params"]["word_embedding"]["embedding"]), w2v, rtol=1e-6
    )


def test_nrms_with_dense_stack(token_batch):
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=4, head_dim=8,
                     newsencoder_units_per_layer=(64, 32))
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    variables = model.init(jax.random.key(0), token_batch, train=False)
    assert "batch_stats" in variables
    logits, mutated = model.apply(
        variables, token_batch, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
    )
    assert logits.shape == (B, K)


def test_nrms_docvec():
    hp = HParamsNRMSDocVec(title_size=16, history_size=H, head_num=4, head_dim=8,
                           newsencoder_units_per_layer=(32, 32))
    rng = np.random.default_rng(1)
    batch = {
        "hist_vecs": jnp.asarray(rng.standard_normal((B, H, 16), dtype=np.float32)),
        "cand_vecs": jnp.asarray(rng.standard_normal((B, K, 16), dtype=np.float32)),
    }
    model = NRMSDocVec(hp)
    _init_and_apply(model, batch, with_batch_stats=True)


@pytest.mark.parametrize("gru_type", ["ini", "con"])
def test_lstur(token_batch, gru_type):
    hp = HParamsLSTUR(title_size=T, history_size=H, n_users=N_USERS,
                      gru_unit=24, filter_num=24, type=gru_type)
    model = LSTUR(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    _init_and_apply(model, token_batch)


def test_lstur_padded_history_article_encodes_to_zero(token_batch):
    hp = HParamsLSTUR(title_size=T, history_size=H, n_users=N_USERS,
                      gru_unit=24, filter_num=24)
    model = LSTUR(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    variables = model.init(jax.random.key(0), token_batch, train=False)
    all_pad = jnp.zeros((3, T), jnp.int32)
    vecs = model.apply(
        variables, all_pad, train=False, method=lambda m, t, train: m.encode_news(t, train)
    )
    np.testing.assert_allclose(np.asarray(vecs), 0.0, atol=1e-6)


def test_npa(token_batch):
    hp = HParamsNPA(title_size=T, history_size=H, n_users=N_USERS,
                    user_emb_dim=16, filter_num=24)
    model = NPA(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    _init_and_apply(model, token_batch)


def test_naml():
    rng = np.random.default_rng(5)
    hp = HParamsNAML(title_size=T, body_size=TB, history_size=H,
                     filter_num=24, vert_num=20, subvert_num=30)
    batch = {
        "hist_tokens": _tokens(rng, B, H, T),
        "cand_tokens": _tokens(rng, B, K, T),
        "hist_body": _tokens(rng, B, H, TB),
        "cand_body": _tokens(rng, B, K, TB),
        "hist_cat": jnp.asarray(rng.integers(0, 20, (B, H)).astype(np.int32)),
        "cand_cat": jnp.asarray(rng.integers(0, 20, (B, K)).astype(np.int32)),
        "hist_subcat": jnp.asarray(rng.integers(0, 30, (B, H)).astype(np.int32)),
        "cand_subcat": jnp.asarray(rng.integers(0, 30, (B, K)).astype(np.int32)),
    }
    model = NAML(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    _init_and_apply(model, batch)


def test_nrms_jit_and_determinism(token_batch):
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=4, head_dim=8)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    variables = model.init(jax.random.key(0), token_batch, train=False)
    fn = jax.jit(lambda v, b: model.apply(v, b, train=False))
    a = fn(variables, token_batch)
    b = fn(variables, token_batch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

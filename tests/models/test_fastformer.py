"""Fastformer flax model tests (reference behavior:
src/ebrec/models/fastformer/fastformer.py + test/dataloader/test_fastformer.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ebnerd_tpu.models.config import HParamsFastformer
from ebnerd_tpu.models.fastformer import Fastformer

B, H, K, T = 3, 5, 4, 8
VOCAB = 300


@pytest.fixture()
def batch():
    rng = np.random.default_rng(2)
    hist = rng.integers(1, VOCAB, (B, H, T)).astype(np.int32)
    cand = rng.integers(1, VOCAB, (B, K, T)).astype(np.int32)
    hist[:, :, T // 2:] = 0
    hist[:, -1] = 0  # fully padded history article
    cand[:, :, T - 2:] = 0
    return {"hist_tokens": jnp.asarray(hist), "cand_tokens": jnp.asarray(cand)}


def _model():
    hp = HParamsFastformer(embedding_dim=32, n_layers=2, n_heads=4,
                           intermediate_dim=64, history_size=H, title_size=T)
    return Fastformer(hp, vocab_size=VOCAB, word_emb_dim=16)


def test_forward_shapes_and_train_mode(batch):
    model = _model()
    variables = model.init(jax.random.key(0), batch, train=False)
    logits = model.apply(variables, batch, train=False)
    assert logits.shape == (B, K)
    assert bool(jnp.isfinite(logits).all())
    out = model.apply(variables, batch, train=True, rngs={"dropout": jax.random.key(1)})
    assert out.shape == (B, K)


def test_padding_tokens_do_not_affect_scores(batch):
    """Candidates identical except for trailing padding rows in history must
    score the same: the masked positions carry -1e4 attention bias and the
    history pool masks all-zero articles."""
    model = _model()
    variables = model.init(jax.random.key(0), batch, train=False)
    base = model.apply(variables, batch, train=False)
    # add one more fully-padded history article -> scores unchanged
    hist2 = jnp.concatenate(
        [batch["hist_tokens"], jnp.zeros((B, 1, T), jnp.int32)], axis=1
    )
    out2 = model.apply(
        variables, {**batch, "hist_tokens": hist2}, train=False
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out2), atol=1e-5)


def test_candidate_scores_are_independent(batch):
    """Each candidate's logit depends only on that candidate (linear
    attention runs per article, reference scores one at a time)."""
    model = _model()
    variables = model.init(jax.random.key(0), batch, train=False)
    full = np.asarray(model.apply(variables, batch, train=False))
    one = {**batch, "cand_tokens": batch["cand_tokens"][:, :1]}
    single = np.asarray(model.apply(variables, one, train=False))
    np.testing.assert_allclose(full[:, :1], single, atol=1e-5)


def test_jit_compiles(batch):
    model = _model()
    variables = model.init(jax.random.key(0), batch, train=False)
    fn = jax.jit(lambda v, b: model.apply(v, b, train=False))
    a = fn(variables, batch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(fn(variables, batch)))

"""remat_encoder (jax.checkpoint around the article encoder) changes
memory, not math: loss and gradients must equal the non-remat model
bit-for-bit-ish (same program modulo recompute scheduling).

The option exists for ebnerd_large-scale batches: a NAML bs4096 step at
a 125k-article catalogue stores >16 GB of per-token encoder
intermediates without it (scripts/bench_large.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ebnerd_tpu.models.config import HParamsLSTUR, HParamsNAML, HParamsNPA
from ebnerd_tpu.models.inputs import naml_batch, token_batch
from ebnerd_tpu.models.newsrec import LSTUR, NAML, NPA
from ebnerd_tpu.training.dedup import prep_dedup_batch

VOCAB, EMB, T, H, K, N_ART, N_USERS = 64, 8, 6, 4, 3, 30, 12


def _tables(rng):
    return {
        "title": jnp.asarray(rng.integers(1, VOCAB, (N_ART + 1, T)).astype(np.int32)),
        "body": jnp.asarray(rng.integers(1, VOCAB, (N_ART + 1, T + 2)).astype(np.int32)),
        "cat": jnp.asarray(rng.integers(0, 5, N_ART + 1).astype(np.int32)),
        "subcat": jnp.asarray(rng.integers(0, 9, N_ART + 1).astype(np.int32)),
    }


def _raw(rng, with_user=False):
    raw = {
        "hist_idx": rng.integers(1, N_ART + 1, (8, H)).astype(np.int32),
        "cand_idx": rng.integers(1, N_ART + 1, (8, K)).astype(np.int32),
        "labels": np.eye(K, dtype=np.float32)[rng.integers(0, K, 8)],
    }
    if with_user:
        raw["user_idx"] = rng.integers(0, N_USERS, 8).astype(np.int32)
    return raw


def _cases():
    common = dict(vocab_size=VOCAB, word_emb_dim=EMB)
    hp_naml = HParamsNAML(title_size=T, body_size=T + 2, history_size=H,
                          filter_num=12, window_size=3, attention_hidden_dim=16,
                          vert_num=5, subvert_num=9, dropout=0.2)
    hp_lstur = HParamsLSTUR(title_size=T, history_size=H, filter_num=12,
                            window_size=3, attention_hidden_dim=16,
                            gru_unit=12, n_users=N_USERS, dropout=0.2)
    hp_npa = HParamsNPA(title_size=T, history_size=H, filter_num=12,
                        window_size=3, attention_hidden_dim=16, user_emb_dim=8,
                        n_users=N_USERS, dropout=0.2)
    yield "naml", (lambda **kw: NAML(hp_naml, **common, **kw)), naml_batch, False
    yield "lstur", (lambda **kw: LSTUR(hp_lstur, **common, **kw)), token_batch, True
    yield "npa", (lambda **kw: NPA(hp_npa, **common, **kw)), token_batch, True


@pytest.mark.parametrize("name,make,builder,with_user",
                         [c for c in _cases()], ids=[c[0] for c in _cases()])
@pytest.mark.parametrize("dedup", [False, True], ids=["perslot", "dedup"])
def test_remat_matches_no_remat(name, make, builder, with_user, dedup):
    rng = np.random.default_rng(5)
    tables = _tables(rng)
    raw = _raw(np.random.default_rng(6), with_user=with_user)
    if dedup:
        raw = prep_dedup_batch(raw, 8)
        raw.pop("n_uniq")
    batch = builder(tables, {k: jnp.asarray(v) for k, v in raw.items()})
    labels = jnp.asarray(raw["labels"])

    def loss_and_grads(remat):
        model = make(remat_encoder=remat)
        variables = model.init(jax.random.key(0), batch, train=False)

        def loss_of(p):
            logits = model.apply({"params": p}, batch, train=True,
                                 rngs={"dropout": jax.random.key(1)})
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.sum(labels * logp, -1))

        return jax.value_and_grad(loss_of)(variables["params"])

    loss_a, g_a = loss_and_grads(False)
    loss_b, g_b = loss_and_grads(True)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(g_b))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_a):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"{name} {path}")


def test_naml_chunked_encode_matches_plain():
    """NAML.encode_chunks (nn.scan of rematted chunks over the
    unique-article axis — the ebnerd_large memory lever) is a scheduling
    change only: with dropout off, loss and grads equal the unchunked
    model's. Dropout-on draws per-chunk rng splits (a different, still
    valid stream), so the equality case pins dropout=0."""
    rng = np.random.default_rng(7)
    tables = _tables(rng)
    raw = _raw(np.random.default_rng(8))
    raw = prep_dedup_batch(raw, 8)
    raw.pop("n_uniq")
    batch = naml_batch(tables, {k: jnp.asarray(v) for k, v in raw.items()})
    labels = jnp.asarray(raw["labels"])
    hp = HParamsNAML(title_size=T, body_size=T + 2, history_size=H,
                     filter_num=12, window_size=3, attention_hidden_dim=16,
                     vert_num=5, subvert_num=9, dropout=0.0)
    c = batch["uniq_tokens"].shape[0]
    chunks = 4 if c % 4 == 0 else 2

    def loss_and_grads(**kw):
        model = NAML(hp, vocab_size=VOCAB, word_emb_dim=EMB, **kw)
        variables = model.init(jax.random.key(0), batch, train=False)

        def loss_of(p):
            logits = model.apply({"params": p}, batch, train=True,
                                 rngs={"dropout": jax.random.key(1)})
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.sum(labels * logp, -1))

        return jax.value_and_grad(loss_of)(variables["params"])

    loss_a, g_a = loss_and_grads()
    loss_b, g_b = loss_and_grads(encode_chunks=chunks, remat_encoder=True)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(g_b))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_a):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]),
                                   rtol=1e-5, atol=1e-7, err_msg=str(path))

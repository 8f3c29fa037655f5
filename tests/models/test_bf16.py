"""Every model family must build and run forward+backward in bfloat16 —
the TPU-native compute dtype (`bench.py` default). Regression for the
MaskedGRU scan-carry dtype mismatch that crashed LSTUR in bf16 (the
GRUCell promotes a bf16 carry x fp32 params to fp32; layers.py keeps the
carry type-stable)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ebnerd_tpu.models import config as mcfg
from ebnerd_tpu.models.fastformer import Fastformer
from ebnerd_tpu.models.inputs import builder_for
from ebnerd_tpu.models.newsrec import LSTUR, NAML, NPA, NRMS, NRMSDocVec

B, H, T, K, VOCAB, EMB, N_ART, N_USERS = 4, 5, 6, 3, 80, 16, 30, 12


def _tables(rng):
    return {
        "title": jnp.asarray(rng.integers(0, VOCAB, (N_ART + 1, T)).astype(np.int32)),
        "body": jnp.asarray(rng.integers(0, VOCAB, (N_ART + 1, 8)).astype(np.int32)),
        "cat": jnp.asarray(rng.integers(0, 5, N_ART + 1).astype(np.int32)),
        "subcat": jnp.asarray(rng.integers(0, 5, N_ART + 1).astype(np.int32)),
        "docvec": jnp.asarray(rng.standard_normal((N_ART + 1, 12)).astype(np.float32)),
    }


def _build(name):
    common = dict(vocab_size=VOCAB, word_emb_dim=EMB, dtype=jnp.bfloat16)
    small = dict(title_size=T, history_size=H, head_num=2, head_dim=4,
                 attention_hidden_dim=8)
    if name == "nrms":
        return NRMS(mcfg.HParamsNRMS(**small), **common)
    if name == "nrms_docvec":
        hp = mcfg.HParamsNRMSDocVec(title_size=12, history_size=H, head_num=2,
                                    head_dim=4, attention_hidden_dim=8,
                                    newsencoder_units_per_layer=(16, 16))
        return NRMSDocVec(hp, dtype=jnp.bfloat16)
    if name == "lstur":
        return LSTUR(mcfg.HParamsLSTUR(title_size=T, history_size=H,
                                       attention_hidden_dim=8, gru_unit=8,
                                       n_users=N_USERS, filter_num=8,
                                       window_size=3), **common)
    if name == "npa":
        return NPA(mcfg.HParamsNPA(title_size=T, history_size=H,
                                   attention_hidden_dim=8, user_emb_dim=8,
                                   n_users=N_USERS, filter_num=8,
                                   window_size=3), **common)
    if name == "naml":
        return NAML(mcfg.HParamsNAML(title_size=T, body_size=8, history_size=H,
                                     vert_num=5, subvert_num=5, filter_num=8,
                                     attention_hidden_dim=8), **common)
    if name == "fastformer":
        hp = mcfg.HParamsFastformer(embedding_dim=16, n_layers=1, n_heads=2,
                                    intermediate_dim=16)
        return Fastformer(hp, vocab_size=VOCAB, word_emb_dim=EMB,
                          dtype=jnp.bfloat16)
    raise ValueError(name)


@pytest.mark.parametrize(
    "name", ["nrms", "nrms_docvec", "lstur", "npa", "naml", "fastformer"])
def test_bf16_forward_backward(name):
    rng = np.random.default_rng(0)
    tables = _tables(rng)
    raw = {
        "hist_idx": jnp.asarray(rng.integers(0, N_ART + 1, (B, H)).astype(np.int32)),
        "cand_idx": jnp.asarray(rng.integers(0, N_ART + 1, (B, K)).astype(np.int32)),
    }
    if name in ("lstur", "npa"):
        raw["user_idx"] = jnp.asarray(rng.integers(0, N_USERS, B).astype(np.int32))
    builder = builder_for(name if name != "fastformer" else "fastformer")
    model = _build(name)
    batch = builder(tables, raw)
    variables = model.init(jax.random.key(0), batch, train=False)
    labels = jnp.zeros((B, K)).at[:, 0].set(1.0)

    def loss_fn(p):
        logits = model.apply(
            {"params": p, **{k: v for k, v in variables.items() if k != "params"}},
            batch, train=True, rngs={"dropout": jax.random.key(1)},
            mutable=False if "batch_stats" not in variables else ["batch_stats"],
        )
        if isinstance(logits, tuple):
            logits = logits[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.sum(labels * logp, -1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    finite = all(np.isfinite(np.asarray(g, np.float32)).all()
                 for g in jax.tree_util.tree_leaves(grads))
    assert finite

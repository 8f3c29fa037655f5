#!/usr/bin/env python
"""Quick-start smoke runs on synthetic data — build each model with random
embeddings, run one jitted train step and a forward pass.

Replaces the reference's per-model dummy scripts
(reference: examples/quick_start/{nrms,lstur,npa,naml,nrms_docvec}_dummy.py).

  python examples/quick_start_dummy.py             # all models
  python examples/quick_start_dummy.py --model nrms
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, H, K, T, TB = 8, 10, 5, 12, 16
VOCAB, EMB, N_USERS = 1000, 32, 64


def dummy_batch(model_name: str, rng: np.random.Generator) -> dict:
    import jax.numpy as jnp

    def toks(l, t):
        return jnp.asarray(rng.integers(1, VOCAB, (B, l, t)).astype(np.int32))

    batch = {"hist_tokens": toks(H, T), "cand_tokens": toks(K, T)}
    if model_name in ("lstur", "npa"):
        batch["user_id"] = jnp.asarray(rng.integers(0, N_USERS, B).astype(np.int32))
    if model_name == "naml":
        batch.update(
            hist_body=toks(H, TB), cand_body=toks(K, TB),
            hist_cat=jnp.asarray(rng.integers(0, 20, (B, H)).astype(np.int32)),
            cand_cat=jnp.asarray(rng.integers(0, 20, (B, K)).astype(np.int32)),
            hist_subcat=jnp.asarray(rng.integers(0, 30, (B, H)).astype(np.int32)),
            cand_subcat=jnp.asarray(rng.integers(0, 30, (B, K)).astype(np.int32)),
        )
    if model_name == "nrms_docvec":
        batch = {
            "hist_vecs": jnp.asarray(rng.standard_normal((B, H, 64), dtype=np.float32)),
            "cand_vecs": jnp.asarray(rng.standard_normal((B, K, 64), dtype=np.float32)),
        }
    return batch


def build(model_name: str):
    from ebnerd_tpu.models import config as mcfg
    from ebnerd_tpu.models.fastformer import Fastformer
    from ebnerd_tpu.models.newsrec import LSTUR, NAML, NPA, NRMS, NRMSDocVec

    common = dict(vocab_size=VOCAB, word_emb_dim=EMB)
    if model_name == "nrms":
        return NRMS(mcfg.HParamsNRMS(title_size=T, history_size=H, head_num=4,
                                     head_dim=8, attention_hidden_dim=32), **common)
    if model_name == "nrms_docvec":
        return NRMSDocVec(mcfg.HParamsNRMSDocVec(
            title_size=64, history_size=H, head_num=4, head_dim=8,
            attention_hidden_dim=32, newsencoder_units_per_layer=(64, 64)))
    if model_name == "lstur":
        return LSTUR(mcfg.HParamsLSTUR(title_size=T, history_size=H,
                                       n_users=N_USERS, gru_unit=32,
                                       filter_num=32), **common)
    if model_name == "npa":
        return NPA(mcfg.HParamsNPA(title_size=T, history_size=H, n_users=N_USERS,
                                   user_emb_dim=32, filter_num=32), **common)
    if model_name == "naml":
        return NAML(mcfg.HParamsNAML(title_size=T, body_size=TB, history_size=H,
                                     filter_num=32, vert_num=20, subvert_num=30),
                    **common)
    if model_name == "fastformer":
        return Fastformer(mcfg.HParamsFastformer(embedding_dim=32, n_layers=2,
                                                 n_heads=4, intermediate_dim=64),
                          **common)
    raise ValueError(model_name)


def run_one(model_name: str) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(0)
    model = build(model_name)
    batch = dummy_batch(model_name, rng)
    labels = jnp.zeros((B, K)).at[:, 0].set(1.0)
    variables = model.init(jax.random.key(0), batch, train=False)
    params, rest = variables["params"], {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, labels):
        def loss_fn(p):
            out = model.apply({"params": p, **rest}, batch, train=True,
                              rngs={"dropout": jax.random.key(1)},
                              mutable=list(rest) or False)
            logits = out[0] if rest else out
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.sum(labels * logp, axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    l0 = None
    for _ in range(3):
        params, opt_state, loss = train_step(params, opt_state, batch, labels)
        l0 = l0 if l0 is not None else float(loss)
    preds = model.apply({"params": params, **rest}, batch, train=False)
    assert preds.shape == (B, K) and bool(jnp.isfinite(preds).all())
    print(f"  {model_name}: loss {l0:.4f} -> {float(loss):.4f}, preds {preds.shape}")
    return float(loss)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="all")
    args = p.parse_args(argv)
    names = ("nrms", "nrms_docvec", "lstur", "npa", "naml", "fastformer")
    for name in names if args.model == "all" else (args.model,):
        run_one(name)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-model train-step timing on the attached device (chained scan timer).

VERDICT r1 item 8: is LSTUR's GRU scan or NPA's personalized attention hot
enough to deserve a Pallas kernel? This measures full train-step time for
each model family at the reproduction config so the decision is recorded
with numbers (see ops notes in STATUS.md).

  python scripts/profile_models.py [nrms lstur npa naml fastformer]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

import jax
import jax.numpy as jnp
import optax

from ebnerd_tpu.models import config as mcfg
from ebnerd_tpu.models.fastformer import Fastformer
from ebnerd_tpu.models.inputs import builder_for
from ebnerd_tpu.models.newsrec import LSTUR, NAML, NPA, NRMS, NRMSDocVec

BS = int(os.environ.get("PM_BS", "512"))
H, T, K = 20, 30, 5
STEPS = int(os.environ.get("PM_STEPS", "10"))
VOCAB, EMB = 250_002, 1_024
# PM_NART=125000 approximates the ebnerd_large catalogue (the reference
# large split has ~125k articles; BASELINE.json configs[4])
N_ART = int(os.environ.get("PM_NART", "25001"))
N_USERS = 50_000
DTYPE = jnp.bfloat16
# r4: unique-article dedup (training/dedup.py) + Zipf article popularity,
# both defaults matching bench.py; PM_DEDUP=0 / PM_ART_DIST=uniform for
# the per-slot baseline. NPA dedups PARTIALLY (conv prefix only).
PM_DEDUP = os.environ.get("PM_DEDUP", "1") != "0"
PM_ART = os.environ.get("PM_ART_DIST", "zipf")
# PM_DROPOUT=0 isolates dropout-mask generation/apply cost (e.g. NPA's
# per-slot personalized pooling draws masks over [B*(H+K), T, F])
PM_DROPOUT = float(os.environ.get("PM_DROPOUT", "0.2"))
# PM_REMAT=1 enables remat_encoder on the conv families (NAML/LSTUR/NPA)
PM_REMAT = os.environ.get("PM_REMAT", "0") != "0"
# PM_PRNGDROP=1 enables the seed-recompute PRNG dropout kernel
PM_PRNGDROP = os.environ.get("PM_PRNGDROP", "0") != "0"


def _draw(r, shape):
    if PM_ART == "uniform":
        return r.integers(0, N_ART, shape).astype(np.int32)
    m = int(np.prod(shape))
    ranks = r.zipf(1.07, size=3 * m)
    ranks = ranks[ranks <= N_ART][:m] - 1
    perm = r.permutation(N_ART).astype(np.int32)
    return perm[ranks].reshape(shape).astype(np.int32)


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        leaves0, treedef0 = jax.tree_util.tree_flatten(a[0])
        fidx = next(i for i, l in enumerate(leaves0)
                    if jnp.issubdtype(l.dtype, jnp.floating))

        def body(carry, _):
            leaves = list(leaves0)
            leaves[fidx] = leaves[fidx] + carry.astype(leaves[fidx].dtype)
            first = jax.tree_util.tree_unflatten(treedef0, leaves)
            out = fn(first, *a[1:])
            probe = sum(l.ravel()[0].astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(out)
                        if hasattr(l, "ravel") and l.size)
            return (probe * 1e-30).astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / STEPS * 1000.0


def build(name):
    common = dict(vocab_size=VOCAB, word_emb_dim=EMB, dtype=DTYPE)
    dp = dict(dropout=PM_DROPOUT)
    if name == "nrms":
        return NRMS(mcfg.HParamsNRMS(**dp), **common)
    if name == "lstur":
        return LSTUR(mcfg.HParamsLSTUR(n_users=N_USERS, **dp), **common,
                     remat_encoder=PM_REMAT, prng_dropout=PM_PRNGDROP)
    if name == "npa":
        return NPA(mcfg.HParamsNPA(n_users=N_USERS, **dp), **common,
                   remat_encoder=PM_REMAT, prng_dropout=PM_PRNGDROP)
    if name == "naml":
        return NAML(mcfg.HParamsNAML(**dp), **common, remat_encoder=PM_REMAT,
                    prng_dropout=PM_PRNGDROP)
    if name == "fastformer":
        return Fastformer(mcfg.HParamsFastformer(**dp), **common,
                          prng_dropout=PM_PRNGDROP)
    if name == "nrms_docvec":
        # reproduction config (reference nrms_docvec.py:99-137): 768-d
        # frozen document vectors, 16x16 heads, dense [512]*3 + BN —
        # dedup-capable since r5 via slot-count-weighted BN moments
        return NRMSDocVec(mcfg.HParamsNRMSDocVec(), dtype=DTYPE)
    raise ValueError(name)


def main():
    which = sys.argv[1:] or ["nrms", "nrms_docvec", "lstur", "npa", "naml",
                             "fastformer"]
    r = np.random.default_rng(0)
    tables = {
        "title": jnp.asarray(r.integers(0, VOCAB, (N_ART, T)).astype(np.int32)),
        "body": jnp.asarray(r.integers(0, VOCAB, (N_ART, 40)).astype(np.int32)),
        "cat": jnp.asarray(r.integers(0, 30, N_ART).astype(np.int32)),
        "subcat": jnp.asarray(r.integers(0, 200, N_ART).astype(np.int32)),
        "docvec": jnp.asarray(
            r.standard_normal((N_ART, 768)).astype(np.float32)),
    }
    print(f"bs={BS} device={jax.devices()[0]} dtype=bf16")
    for name in which:
      try:
        model = build(name)
        builder = builder_for(name if name != "fastformer" else "fastformer")
        raw = {
            "hist_idx": _draw(r, (BS, H)),
            "cand_idx": _draw(r, (BS, K)),
        }
        if name in ("lstur", "npa"):
            raw["user_idx"] = r.integers(0, N_USERS, BS).astype(np.int32)
        note = ""
        if PM_DEDUP:
            from ebnerd_tpu.training.dedup import prep_dedup_batch

            raw = prep_dedup_batch(raw, min_bucket=512)
            note = (f" dedup C={raw['art_uniq'].shape[0]} "
                    f"uniq={raw.pop('n_uniq')}")
        raw = {k: jnp.asarray(v) for k, v in raw.items()}
        labels = jnp.zeros((BS, K)).at[:, 0].set(1.0)
        batch = builder(tables, raw)
        variables = model.init(jax.random.key(0), batch, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)

        def loss_fn(p, rw):
            vs = {"params": p}
            if batch_stats:
                vs["batch_stats"] = batch_stats
            out = model.apply(vs, builder(tables, rw), train=True,
                              rngs={"dropout": jax.random.key(1)},
                              mutable=["batch_stats"] if batch_stats else False)
            logits = out[0] if batch_stats else out
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.sum(labels * logp, -1))

        @jax.jit
        def step(p, s, rw):
            loss, grads = jax.value_and_grad(loss_fn)(p, rw)
            updates, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s2, loss

        ms = timed(step, params, opt_state, raw)
        print(f"{name:12s} full train step {ms:8.2f} ms/step "
              f"{BS / ms * 1000:9.0f} imp/s{note}", flush=True)
      except Exception as e:  # noqa: BLE001 - one model must not kill the sweep
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)


if __name__ == "__main__":
    main()

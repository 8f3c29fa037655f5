"""Full-TrainState checkpoint round-trip (exceeds the reference's
weights-only checkpointing, reference: ebnerd_nrms.py:222-229)."""
import jax
import numpy as np
import pytest

from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NRMS
from ebnerd_tpu.training.checkpoint import (
    CheckpointManager,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

T, H, K, VOCAB = 6, 4, 3, 64


def _batch(seed):
    r = np.random.default_rng(seed)
    labels = np.zeros((8, K), np.float32)
    labels[:, 0] = 1
    return {
        "hist_idx": r.integers(0, 20, (8, H)).astype(np.int32),
        "cand_idx": r.integers(0, 20, (8, K)).astype(np.int32),
        "labels": labels,
    }


def _trainer():
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=4,
                     attention_hidden_dim=8)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=8)
    table = np.random.default_rng(0).integers(1, VOCAB, (21, T)).astype(np.int32)
    return Trainer(model, {"title": table}, token_batch,
                   TrainerConfig(learning_rate=1e-3, seed=0), log_fn=lambda s: None)


def test_full_state_roundtrip(tmp_path):
    tr = _trainer()
    tr.init_state(_batch(0))
    key = jax.random.key(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        tr.state, _ = tr._train_step(tr.state, _batch(i), sub)
    save_checkpoint(tr.state, tmp_path, step=3)
    assert latest_step(tmp_path) == 3

    tr2 = _trainer()
    tr2.init_state(_batch(0))
    restored = restore_checkpoint(tr2.state, tmp_path, step=3)
    assert int(restored.step) == 3
    # params AND optimizer state round-trip exactly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tr.state.params, restored.params,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tr.state.opt_state, restored.opt_state,
    )
    # resumed training continues identically
    key = jax.random.key(42)
    tr.state, l1 = tr._train_step(tr.state, _batch(9), key)
    tr2.state = restored
    tr2.state, l2 = tr2._train_step(tr2.state, _batch(9), key)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)


def test_manager_keep_and_best(tmp_path):
    tr = _trainer()
    tr.init_state(_batch(0))
    mgr = CheckpointManager(tmp_path, keep=2)
    for s in (1, 2, 3):
        mgr.save_step(tr.state, s)
    assert latest_step(tmp_path) == 3
    assert not (tmp_path / "step_1").exists()
    mgr.save_best(tr.state)
    restored = mgr.restore_best(tr.state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tr.state.params, restored.params,
    )
    latest, step = mgr.restore_latest(tr.state)
    assert step == 3


def test_sparse_state_roundtrip(tmp_path):
    """TrainState with the SparseEmbedState field (table + moments outside
    opt_state) round-trips through orbax."""
    from ebnerd_tpu.training.sparse_embed import prep_sparse_batch

    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=4,
                     attention_hidden_dim=8)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=8)
    table = np.random.default_rng(0).integers(1, VOCAB, (21, T)).astype(np.int32)
    tr = Trainer(model, {"title": table}, token_batch,
                 TrainerConfig(learning_rate=1e-3, seed=0,
                               sparse_embedding=True, sparse_min_bucket=8),
                 log_fn=lambda s: None)
    tr.init_state(_batch(0))
    key = jax.random.key(0, impl=tr.config.rng_impl)
    for i in range(2):
        raw = prep_sparse_batch(_batch(i), tr._host_tables, tr._sparse_tables,
                                VOCAB, 8)
        tr.state, _ = tr._train_step(tr.state, raw, key)
    save_checkpoint(tr.state, tmp_path, step=2)
    tr2 = Trainer(model, {"title": table}, token_batch,
                  TrainerConfig(learning_rate=1e-3, seed=0,
                                sparse_embedding=True, sparse_min_bucket=8),
                  log_fn=lambda s: None)
    tr2.init_state(_batch(0))
    restored = restore_checkpoint(tr2.state, tmp_path, step=2)
    assert int(restored.step) == 2
    np.testing.assert_array_equal(np.asarray(restored.emb.table),
                                  np.asarray(tr.state.emb.table))
    np.testing.assert_array_equal(np.asarray(restored.emb.m),
                                  np.asarray(tr.state.emb.m))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(tr.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

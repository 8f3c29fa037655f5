"""Two-tower serving: precomputed article index scores must equal the full
forward pass (no reference counterpart — the reference re-encodes every
candidate per impression)."""
import jax
import numpy as np
import pytest

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import create_binary_labels_column, ebnerd_from_path
from ebnerd_tpu.data.dataloader import EvalFeed
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.models.config import HParamsFastformer, HParamsNRMS
from ebnerd_tpu.models.fastformer import Fastformer
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NPA, NRMS
from ebnerd_tpu.models.config import HParamsNPA
from ebnerd_tpu.serving import ArticleIndex, TwoTowerScorer
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

H, T, VOCAB = 5, 8, 150


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd
    from ebnerd_tpu.data.table import read_parquet

    path = tmp_path_factory.mktemp("serving") / "train"
    make_synthetic_ebnerd(path, n_users=30, n_articles=60, n_impressions=150, seed=4)
    df = create_binary_labels_column(ebnerd_from_path(path, history_size=H))
    articles = read_parquet(path / "articles.parquet")
    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, VOCAB, (len(ids), T)).astype(np.int32)
    # a known article with an empty title (all-zero token row): the full
    # forward pass masks it out of LSTUR/Fastformer history pooling via
    # (hist_tokens != 0).any(-1); the two-tower path must match exactly
    # (serving.article_validity)
    tokens[len(ids) // 2] = 0
    lookup = Lookup.from_values(ids, tokens)
    return df, lookup


def _trainer(model, lookup):
    tr = Trainer(model, {"title": lookup.matrix}, token_batch,
                 TrainerConfig(seed=0), log_fn=lambda s: None)
    tr.init_state({
        "hist_idx": np.zeros((4, H), np.int32),
        "cand_idx": np.zeros((4, 3), np.int32),
        "labels": np.zeros((4, 3), np.float32),
    })
    return tr


def test_nrms_two_tower_matches_full_forward(setup):
    df, lookup = setup
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=16)
    trainer = _trainer(model, lookup)
    feed = EvalFeed(df, lookup, history_size=H, batch_size=16)
    # two_tower=False: the reference side must be the FULL forward pass
    # (the trainer's default two_tower_eval='auto' would otherwise route
    # score() through the same two-tower path being tested)
    full = trainer.score(feed, two_tower=False)
    variables = {"params": trainer.state.params}
    index = ArticleIndex(model, variables, {"title": lookup.matrix}, batch_size=16)
    tt = TwoTowerScorer(index).score(feed)
    np.testing.assert_allclose(np.asarray(full.values), np.asarray(tt.values),
                               rtol=1e-5, atol=1e-6)


def test_fastformer_two_tower_matches_full_forward(setup):
    df, lookup = setup
    hp = HParamsFastformer(embedding_dim=16, n_layers=1, n_heads=2,
                           intermediate_dim=32, history_size=H, title_size=T)
    model = Fastformer(hp, vocab_size=VOCAB, word_emb_dim=16)
    trainer = _trainer(model, lookup)
    feed = EvalFeed(df, lookup, history_size=H, batch_size=16)
    full = trainer.score(feed, two_tower=False)
    variables = {"params": trainer.state.params}
    index = ArticleIndex(model, variables, {"title": lookup.matrix}, batch_size=16)
    tt = TwoTowerScorer(index).score(feed)
    np.testing.assert_allclose(np.asarray(full.values), np.asarray(tt.values),
                               rtol=1e-4, atol=1e-5)


def test_npa_rejected(setup):
    _, lookup = setup
    hp = HParamsNPA(title_size=T, history_size=H, n_users=10, user_emb_dim=8,
                    filter_num=16)
    model = NPA(hp, vocab_size=VOCAB, word_emb_dim=16)
    with pytest.raises(ValueError, match="user-dependent"):
        ArticleIndex(model, {}, {"title": lookup.matrix})

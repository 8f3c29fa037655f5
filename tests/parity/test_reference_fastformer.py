"""Reference-parity: flax Fastformer equals the reference PyTorch
implementation with shared weights (linear additive attention, Bert-style
blocks, attention pooling, concat-MLP scorer).

The reference file has a broken absolute import (`from models.fastformer
...`, fastformer.py:10) that must be aliased to load it; inputs here use
no padding because the reference's user loop takes every article's token
mask from history article 0 (fastformer.py:390-391) while we use each
article's own mask — with uniform masks both paths agree.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_SRC = "/root/reference/src"

H, T, VOCAB, EMB = 4, 8, 150, 16
D, HEADS, LAYERS, INTER = 32, 4, 2, 64


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, REFERENCE_SRC)
    import ebrec.models
    import ebrec.models.fastformer
    import ebrec.models.fastformer.fastformer_wu as wu

    sys.modules["models"] = ebrec.models
    sys.modules["models.fastformer"] = ebrec.models.fastformer
    sys.modules["models.fastformer.fastformer_wu"] = wu
    from ebrec.models.fastformer.fastformer import Fastformer as TorchFastformer

    class Cfg:
        hidden_size = D
        num_attention_heads = HEADS
        num_hidden_layers = LAYERS
        intermediate_size = INTER
        hidden_dropout_prob = 0.0
        attention_probs_dropout_prob = 0.0
        max_position_embeddings = 64
        layer_norm_eps = 1e-12
        initializer_range = 0.02
        pooler_type = "weightpooler"
        vocab_size = VOCAB
        hidden_act = "gelu"

    torch.manual_seed(0)
    emb = torch.nn.Embedding(VOCAB, EMB)
    model = TorchFastformer(Cfg, word_embedding=emb)
    model.eval()
    return model


def _to_flax(model) -> dict:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    lin = lambda p: {"kernel": sd[p + ".weight"].T, "bias": sd[p + ".bias"]}
    ln = lambda p: {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}
    pool = lambda p: {"W": sd[p + ".att_fc1.weight"].T, "b": sd[p + ".att_fc1.bias"],
                      "q": sd[p + ".att_fc2.weight"].T}
    params = {
        "word_embedding": {"embedding": sd["word_embedding.weight"]},
        "embedding_transform": lin("embedding_transform"),
        "position_embedding": {"embedding": sd["news_encoder.position_embeddings.weight"]},
        "emb_norm": ln("news_encoder.LayerNorm"),
        "token_pool": pool("news_encoder.poolers.0"),
        "user_pool": pool("user_attention_polling"),
        "output_layer": lin("output_layer"),
    }
    for i in range(LAYERS):
        p = f"news_encoder.encoders.{i}"
        params[f"layer_{i}"] = {
            "FastSelfAttention_0": {
                "query": lin(p + ".attention.self.query"),
                "query_att": lin(p + ".attention.self.query_att"),
                "key": lin(p + ".attention.self.key"),
                "key_att": lin(p + ".attention.self.key_att"),
                "transform": lin(p + ".attention.self.transform"),
            },
            "att_out": {
                "Dense_0": lin(p + ".attention.output.dense"),
                "LayerNorm_0": ln(p + ".attention.output.LayerNorm"),
            },
            "Dense_0": lin(p + ".intermediate.dense"),
            "ffn_out": {
                "Dense_0": lin(p + ".output.dense"),
                "LayerNorm_0": ln(p + ".output.LayerNorm"),
            },
        }
    return params


def test_flax_fastformer_matches_reference_torch(reference_model):
    import jax
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsFastformer
    from ebnerd_tpu.models.fastformer import Fastformer

    rng = np.random.default_rng(2)
    his = rng.integers(1, VOCAB, (3, H, T)).astype(np.int64)   # no padding
    cand = rng.integers(1, VOCAB, (3, 1, T)).astype(np.int64)
    with torch.no_grad():
        ref = reference_model(torch.from_numpy(his), torch.from_numpy(cand))
    ref_scores = ref[:, 0].numpy()

    hp = HParamsFastformer(embedding_dim=D, n_layers=LAYERS, n_heads=HEADS,
                           intermediate_dim=INTER, max_position=64, dropout=0.0)
    ours = Fastformer(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    params = jax.tree_util.tree_map(jnp.asarray, _to_flax(reference_model))
    logits = ours.apply(
        {"params": params},
        {"hist_tokens": jnp.asarray(his.astype(np.int32)),
         "cand_tokens": jnp.asarray(cand.astype(np.int32))},
        train=False,
    )
    our_scores = np.asarray(jax.nn.sigmoid(logits[:, 0]))
    np.testing.assert_allclose(our_scores, ref_scores, atol=1e-4)


def test_flax_fastformer_wu_matches_reference_torch():
    """Original Wu classifier variant (token-level positions, n-class CE
    head; reference: fastformer_wu.py:237-271)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REFERENCE_SRC)
    from ebrec.models.fastformer.fastformer_wu import Fastformer_wu

    class Cfg:
        hidden_size = D
        num_attention_heads = HEADS
        num_hidden_layers = LAYERS
        intermediate_size = INTER
        hidden_dropout_prob = 0.0
        attention_probs_dropout_prob = 0.0
        max_position_embeddings = 64
        layer_norm_eps = 1e-12
        initializer_range = 0.02
        pooler_type = "weightpooler"
        vocab_size = VOCAB
        hidden_act = "gelu"

    torch.manual_seed(1)
    emb = torch.nn.Embedding(VOCAB, EMB)
    ref = Fastformer_wu(Cfg, word_embedding=emb)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    lin = lambda p: {"kernel": sd[p + ".weight"].T, "bias": sd[p + ".bias"]}
    ln = lambda p: {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}
    pool = lambda p: {"W": sd[p + ".att_fc1.weight"].T, "b": sd[p + ".att_fc1.bias"],
                      "q": sd[p + ".att_fc2.weight"].T}
    params = {
        "word_embedding": {"embedding": sd["word_embedding.weight"]},
        "embedding_transform": lin("embedding_transform"),
        "position_embedding": {
            "embedding": sd["fastformer_model.position_embeddings.weight"]},
        "emb_norm": ln("fastformer_model.LayerNorm"),
        "token_pool": pool("fastformer_model.poolers.0"),
        "output_layer": lin("output_layer"),
    }
    for i in range(LAYERS):
        p = f"fastformer_model.encoders.{i}"
        params[f"layer_{i}"] = {
            "FastSelfAttention_0": {
                "query": lin(p + ".attention.self.query"),
                "query_att": lin(p + ".attention.self.query_att"),
                "key": lin(p + ".attention.self.key"),
                "key_att": lin(p + ".attention.self.key_att"),
                "transform": lin(p + ".attention.self.transform"),
            },
            "att_out": {
                "Dense_0": lin(p + ".attention.output.dense"),
                "LayerNorm_0": ln(p + ".attention.output.LayerNorm"),
            },
            "Dense_0": lin(p + ".intermediate.dense"),
            "ffn_out": {
                "Dense_0": lin(p + ".output.dense"),
                "LayerNorm_0": ln(p + ".output.LayerNorm"),
            },
        }

    from ebnerd_tpu.models.config import HParamsFastformer
    from ebnerd_tpu.models.fastformer import FastformerWu

    rng = np.random.default_rng(5)
    ids = rng.integers(1, VOCAB, (6, T)).astype(np.int64)
    targets = rng.integers(0, 4, 6).astype(np.int64)
    with torch.no_grad():
        ref_loss, ref_scores = ref(torch.from_numpy(ids), torch.from_numpy(targets))

    hp = HParamsFastformer(embedding_dim=D, n_layers=LAYERS, n_heads=HEADS,
                           intermediate_dim=INTER, max_position=64, dropout=0.0)
    ours = FastformerWu(hp, vocab_size=VOCAB, word_emb_dim=EMB, n_classes=4)
    loss, logits = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(targets.astype(np.int32)),
        method=FastformerWu.loss_and_logits,
    )
    np.testing.assert_allclose(np.asarray(logits), ref_scores.numpy(), atol=1e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)

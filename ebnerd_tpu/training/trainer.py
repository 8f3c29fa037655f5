"""Jitted training loop with the reference's callback semantics.

Replaces the reference's Keras ``model.fit`` + callback stack
(reference: examples/reproducibility_scripts/ebnerd_nrms.py:212-257 —
TensorBoard, EarlyStopping(val_auc), ModelCheckpoint(best, weights only),
ReduceLROnPlateau) with an explicit jitted step:

- ONE model, K candidates, raw logits. Softmax-CE for training and
  sigmoid for scoring are applied around the same forward fn (the
  reference's twin model/scorer graphs, nrms.py:161-210).
- The article-table gather happens in-graph (models/inputs.py); batches
  are int32 index arrays.
- Learning-rate plateau reduction mutates the optax hyperparam injected
  into the optimizer state — no recompilation.
- Data parallelism: pass a Mesh; batches are sharded over the 'data'
  axis and jit inserts the gradient psum (parallel/mesh.py).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct

from ..data.dataloader import EvalFeed, NewsrecFeed
from ..data.ragged import Ragged
from ..evaluation.ranking import per_impression_auc
from ..models.inputs import BatchBuilder
from ..parallel.mesh import data_sharding, put_replicated, replicated, shard_batch
from ..serving import article_validity, encode_article_rows, model_kind, two_tower_logits
from .dedup import pad_dedup_to, prep_dedup_batch
from .losses import l2_penalty, loss_fn_for
from .sparse_embed import (
    TOKEN_KEYS_BY_TABLE,
    SparseEmbedState,
    prep_sparse_batch,
    rowwise_adam,
)

__all__ = ["TrainState", "Trainer", "TrainerConfig"]


def _hyperparams(opt_state) -> dict:
    """The inject_hyperparams dict, looking through a MultiSteps wrapper."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    inner = getattr(opt_state, "inner_opt_state", None)
    if inner is not None and hasattr(inner, "hyperparams"):
        return inner.hyperparams
    raise AttributeError("optimizer state carries no injected hyperparams")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    # row-sparse embedding mode only: the word-embedding table + its Adam
    # moments, held outside params/opt_state (training/sparse_embed.py)
    emb: Any = None

    def hyperparams(self):
        return _hyperparams(self.opt_state)


@dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    loss: str = "cross_entropy_loss"
    optimizer: str = "adam"
    l2_regularization: float = 0.0
    # callbacks (reference defaults: ebnerd_nrms.py:216-237)
    early_stopping_patience: Optional[int] = 4
    monitor_mode: str = "max"  # val_auc
    lr_factor: float = 0.2
    lr_patience: Optional[int] = 2
    min_lr: float = 1e-6
    seed: int = 42
    # gradient accumulation: apply the optimizer every N micro-batches
    # (reference: fastformer/dataloader.py:198-204)
    accumulation_steps: int = 1
    # host->device pipelining: batches are staged to device `prefetch`
    # steps ahead on a worker thread, overlapping transfer with compute
    prefetch: int = 2
    # dispatch N train steps as ONE jitted lax.scan over stacked batches:
    # amortizes per-step host dispatch (dominant on high-latency links,
    # e.g. remote-TPU tunnels). Same math per batch; the dropout stream
    # is folded from the step counter instead of sequential splits.
    scan_steps: int = 1
    # PRNG implementation for the dropout stream. 'rbg' (XLA
    # RngBitGenerator) generates mask bits ~5x faster than threefry on
    # TPU — measured 3ms vs 14ms for the NRMS embedding-dropout mask at
    # bs512 — at the cost of a different (still deterministic) stream.
    rng_impl: str = "rbg"
    # eval path: "auto" scores via the two-tower article index whenever the
    # model's news encoder is user-independent (serving.py) — encode the
    # corpus once per eval instead of per impression. True forces it
    # (errors on NPA), False always uses the full forward pass.
    two_tower_eval: Any = "auto"
    # host-deduped row-sparse word-embedding updates (sparse_embed.py):
    # only the vocabulary rows a batch touches are scattered/Adam-updated
    # — LazyAdam-style semantics, a DELIBERATE deviation from the
    # reference's dense-decay Adam (see sparse_embed.py SEMANTICS).
    # Default OFF: dense is both the parity path and measured FASTER end
    # to end on v5e even at Zipfian token stats (PERFORMANCE note there).
    # Requires the model to own a top-level "word_embedding" WordEmbed.
    sparse_embedding: bool = False
    sparse_embed_param: str = "word_embedding"
    sparse_min_bucket: int = 4096
    # table name -> batch keys holding word-token ids for the sparse-embed
    # dedup (None = sparse_embed.TOKEN_KEYS_BY_TABLE). Any 2-D int table
    # NOT covered here makes sparse mode raise: its vocab ids would
    # silently remap to slot 0 and mis-route gradients.
    sparse_token_tables: Optional[dict] = None
    # train-time unique-article dedup (training/dedup.py): the prefetch
    # thread dedups each batch's article rows; the model encodes every
    # unique article ONCE and gathers vectors back to slots — removing
    # the duplicate-article encoder FLOPs the per-slot path re-spends
    # (>=37% at bench shapes, far more at real article-popularity skew).
    # "auto" = on whenever dedup_capable(model) says so: fully for the
    # user-independent encoders, PARTIALLY for NPA (its user-independent
    # embedding->conv prefix dedups; personalized pooling stays per-slot).
    # True forces (errors only on models whose article tower runs
    # train-mode BatchNorm without slot weighting, or unknown families);
    # False always encodes per slot. Dropout note: dedup draws ONE
    # stochastic encode per unique article per step instead of the
    # reference's independent mask per slot (training/dedup.py).
    dedup_articles: Any = "auto"
    dedup_min_bucket: int = 512
    # dtype for Adam's FIRST moment (optax mu_dtype). "bfloat16" halves
    # the m read/write traffic of the [V, E] word-embedding sweep — the
    # standard mixed-precision-optimizer-state trade. None (default) =
    # fp32, the reference-parity numerics.
    adam_mu_dtype: Optional[str] = None


class Trainer:
    """Train/score driver for one newsrec model.

    Args:
      model: a flax module whose ``__call__(batch, train)`` returns [B, K]
        logits (models/newsrec.py convention).
      tables: dict of numpy value tables (models/inputs.py convention);
        placed on device (replicated, or row-sharded by the caller).
      batch_builder: gathers model inputs from tables + index batch.
      mesh: optional jax.sharding.Mesh for data parallelism.
    """

    # max eval batches in flight (dispatched, result not yet fetched):
    # keeps the async-dispatch pipelining win while bounding device
    # residency of queued inputs + score buffers (see score())
    EVAL_WINDOW = 8

    def __init__(
        self,
        model,
        tables: dict[str, np.ndarray],
        batch_builder: BatchBuilder,
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
        table_specs: Optional[dict] = None,
        param_specs: Optional[dict] = None,
        log_fn: Callable[[str], None] = print,
    ):
        """``table_specs`` / ``param_specs`` map a name substring to a
        PartitionSpec (e.g. {"title": P("model")} row-shards the token
        table over the model axis — the sharded-embedding TP path). Tables
        and params not matched are replicated over the mesh."""
        self.model = model
        self.config = config
        self.mesh = mesh
        self.builder = batch_builder
        self.log = log_fn
        self.param_specs = param_specs or {}
        if mesh is not None:
            from jax.sharding import NamedSharding

            def table_sharding_for(name):
                for sub, spec in (table_specs or {}).items():
                    if sub in name:
                        return NamedSharding(mesh, spec)
                return replicated(mesh)

            self.tables = {
                k: self._put_global(np.asarray(v), table_sharding_for(k))
                for k, v in tables.items()
            }
        else:
            self.tables = {k: jnp.asarray(v) for k, v in tables.items()}
        if config.optimizer != "adam":
            raise ValueError(f"this optimizer not defined {config.optimizer}")
        from .dedup import dedup_capable

        dedup_ok, dedup_why = dedup_capable(model)
        if config.dedup_articles is True and not dedup_ok:
            raise ValueError(
                f"dedup_articles: {type(model).__name__}: {dedup_why}")
        self._dedup = (dedup_ok if config.dedup_articles == "auto"
                       else bool(config.dedup_articles))
        self._sparse = bool(config.sparse_embedding)
        if self._sparse:
            if config.accumulation_steps > 1 or config.scan_steps > 1:
                raise ValueError(
                    "sparse_embedding requires accumulation_steps == 1 and "
                    "scan_steps == 1 (per-batch unique-row sets)")
            if config.l2_regularization:
                raise ValueError(
                    "sparse_embedding + l2_regularization unsupported: the "
                    "penalty would only see the batch's touched rows")
            self._vocab_size = getattr(model, "vocab_size", None)
            if self._vocab_size is None:
                raise ValueError("sparse_embedding needs model.vocab_size")
            token_keys_map = (config.sparse_token_tables
                              if config.sparse_token_tables is not None
                              else TOKEN_KEYS_BY_TABLE)
            # every 2-D integer table feeds word tokens through the shared
            # embedding; one missing from the map would have its vocab ids
            # remapped to slot 0 silently (wrong rows, mis-routed grads)
            unmapped = [
                k for k, v in tables.items()
                if np.asarray(v).ndim == 2
                and np.issubdtype(np.asarray(v).dtype, np.integer)
                and k not in token_keys_map
            ]
            if unmapped:
                raise ValueError(
                    f"sparse_embedding: token table(s) {unmapped} not in the "
                    "token-keys map; pass TrainerConfig.sparse_token_tables "
                    "covering them")
            # host copies of the token tables drive the prefetch-thread dedup
            self._host_tables = {
                k: np.asarray(v) for k, v in tables.items()
                if k in token_keys_map
            }
            self._sparse_tables = tuple(self._host_tables)
            if not self._sparse_tables:
                raise ValueError("sparse_embedding: no token tables found")
            self._token_keys_map = token_keys_map
            self._token_keys = tuple(
                key for name in self._sparse_tables
                for key in token_keys_map[name])
        self.tx = optax.inject_hyperparams(optax.adam, static_args=("mu_dtype",))(
            learning_rate=config.learning_rate, mu_dtype=config.adam_mu_dtype)
        if config.accumulation_steps > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=config.accumulation_steps)
        self.loss_fn = loss_fn_for(config.loss)
        self.state: Optional[TrainState] = None
        self._rng = jax.random.key(config.seed, impl=config.rng_impl)
        if mesh is not None and jax.process_count() == 1:
            # multi-controller runs keep the key host-side: every process
            # derives the identical stream, and jit treats the host value
            # as replicated
            self._rng = jax.device_put(self._rng, replicated(mesh))
        self.history: list[dict[str, float]] = []

    def _put_global(self, x, sharding):
        """Place a host array under ``sharding``; in multi-controller runs
        the global jax.Array is assembled from each process's addressable
        shards (every process holds the full value)."""
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                np.shape(x), sharding, lambda idx: np.asarray(x)[idx])
        return jax.device_put(x, sharding)

    # -- state ------------------------------------------------------------

    def init_state(self, example_batch: dict[str, np.ndarray]) -> TrainState:
        raw = {k: np.asarray(v) for k, v in example_batch.items()}
        if self._dedup and "hist_idx" in raw:
            # init traces the same (deduped) graph the train step runs
            raw = prep_dedup_batch(raw, self.config.dedup_min_bucket)
            raw.pop("n_uniq", None)
        if self.mesh is not None:
            # _put replicates the whole-batch dedup side values
            # (art_n_uniq, emb_*) instead of splitting them over 'data'
            raw = self._put(raw)
        batch = self.builder(self.tables, raw)
        variables = self.model.init(jax.random.key(self.config.seed), batch, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.FrozenDict())
        emb_state = None
        if self._sparse:
            p = core.unfreeze(params)
            if self.config.sparse_embed_param not in p:
                raise ValueError(
                    f"sparse_embedding: model has no top-level "
                    f"'{self.config.sparse_embed_param}' param collection")
            emb_leaf = p.pop(self.config.sparse_embed_param)["embedding"]
            params = core.freeze(p) if isinstance(params, core.FrozenDict) else p
            emb_state = SparseEmbedState.create(jnp.asarray(emb_leaf, jnp.float32))
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            rep = replicated(self.mesh)

            def put_param(path, leaf):
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                for sub, spec in self.param_specs.items():
                    if sub in name:
                        return jax.device_put(leaf, NamedSharding(self.mesh, spec))
                return jax.device_put(leaf, rep)

            params = jax.tree_util.tree_map_with_path(put_param, params)
            batch_stats = jax.device_put(batch_stats, rep)
            if emb_state is not None:
                emb_state = jax.device_put(emb_state, rep)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            emb=emb_state,
        )
        self._art_cache = None
        return self.state

    # -- steps ------------------------------------------------------------

    def _step_impl(self, state: TrainState, raw: dict, rng) -> tuple[TrainState, jnp.ndarray]:
        if self._sparse:
            return self._sparse_step_impl(state, raw, rng)
        batch = self.builder(self.tables, raw)
        labels = raw["labels"]

        def loss_of(params):
            variables = {"params": params}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = self.model.apply(
                variables, batch, train=True, rngs={"dropout": rng}, mutable=mutable
            )
            logits, new_stats = out if mutable else (out, {})
            loss = self.loss_fn(logits, labels)
            if self.config.l2_regularization:
                loss = loss + self.config.l2_regularization * l2_penalty(params)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_bs = new_stats.get("batch_stats", state.batch_stats) if state.batch_stats else state.batch_stats
        return (
            state.replace(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=opt_state),
            loss,
        )

    def _with_emb(self, params, emb_leaf):
        """params with the word-embedding collection (re)inserted."""
        p = core.unfreeze(params)
        p[self.config.sparse_embed_param] = {"embedding": emb_leaf}
        return core.freeze(p) if isinstance(params, core.FrozenDict) else p

    def _sparse_step_impl(self, state: TrainState, raw: dict, rng):
        """Train step with host-deduped row-sparse embedding updates: the
        model embeds compact slots against the batch's [C, E] row slice;
        only those rows see scatter-add + Adam (sparse_embed.py)."""
        uniq, valid, remap = raw["emb_uniq"], raw["emb_valid"], raw["emb_remap"]
        batch = self.builder(self.tables, raw)
        for k in self._token_keys:
            if k in batch:
                batch[k] = remap[batch[k]]
        labels = raw["labels"]
        rows = state.emb.table[uniq]

        def loss_of(params_rest, emb_rows):
            # compact [C, E] rows ride the shape-unchecked 'emb_over'
            # collection (layers.WordEmbed); tokens were remapped to slots
            variables = {
                "params": params_rest,
                "emb_over": {self.config.sparse_embed_param: {"table": emb_rows}},
            }
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = self.model.apply(
                variables, batch, train=True, rngs={"dropout": rng}, mutable=mutable
            )
            logits, new_stats = out if mutable else (out, {})
            return self.loss_fn(logits, labels), new_stats

        (loss, new_stats), (g_rest, g_rows) = jax.value_and_grad(
            loss_of, argnums=(0, 1), has_aux=True)(state.params, rows)
        updates, opt_state = self.tx.update(g_rest, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        lr = _hyperparams(opt_state)["learning_rate"]
        emb = rowwise_adam(state.emb, uniq, valid, g_rows, lr, state.step + 1)
        new_bs = new_stats.get("batch_stats", state.batch_stats) if state.batch_stats else state.batch_stats
        return (
            state.replace(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=opt_state, emb=emb),
            loss,
        )

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step(self, state: TrainState, raw: dict, rng) -> tuple[TrainState, jnp.ndarray]:
        return self._step_impl(state, raw, rng)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_steps_scan(self, state: TrainState, stacked: dict, rng):
        """N train steps as one dispatch: lax.scan of the identical step
        body over batches stacked on a leading axis. Per-step dropout keys
        are folded from the optimizer step counter."""

        def body(carry, raw):
            step_rng = jax.random.fold_in(rng, carry.step)
            return self._step_impl(carry, raw, step_rng)

        return jax.lax.scan(body, state, stacked)

    def _variables(self, state: TrainState) -> dict:
        params = state.params
        if state.emb is not None:  # sparse mode: reinsert the full table
            params = self._with_emb(params, state.emb.table)
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return variables

    @partial(jax.jit, static_argnums=0)
    def _score_step(self, state: TrainState, raw: dict) -> jnp.ndarray:
        batch = self.builder(self.tables, raw)
        logits = self.model.apply(self._variables(state), batch, train=False)
        return jax.nn.sigmoid(logits)

    @partial(jax.jit, static_argnums=0)
    def _encode_articles_step(self, state: TrainState, idx: jnp.ndarray) -> jnp.ndarray:
        return encode_article_rows(self.model, self._variables(state), self.tables, idx)

    @partial(jax.jit, static_argnums=0)
    def _two_tower_step(self, state: TrainState, art_vecs: jnp.ndarray,
                        art_valid, raw: dict) -> jnp.ndarray:
        logits = two_tower_logits(self.model, self._variables(state), art_vecs, raw,
                                  art_valid=art_valid)
        return jax.nn.sigmoid(logits)

    # -- loops ------------------------------------------------------------

    def _fetch(self, dev) -> np.ndarray:
        """Fetch a (possibly multi-controller globally sharded) device
        array to host. Under one controller this is a plain copy; across
        controllers the array is not fully addressable, so every process
        all-gathers the global value (eval scores are tiny)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(dev, tiled=True))
        return np.asarray(dev)

    def _put(self, raw: dict) -> dict:
        raw = {k: v for k, v in raw.items() if k not in ("n_valid", "rows", "n_uniq")}
        if self.mesh is not None:
            # dedup side-tables are whole-batch values, not per-row data:
            # replicate them instead of splitting over the 'data' axis
            emb = {k: put_replicated(raw.pop(k), self.mesh)
                   for k in [k for k in raw
                             if k.startswith("emb_") or k == "art_n_uniq"]}
            out = shard_batch(raw, self.mesh)
            out.update(emb)
            return out
        return shard_batch(raw, self.mesh)

    def _put_stacked(self, raws: list[dict]) -> dict:
        """Stack N host batches on a new leading axis and ship to device
        ([N, B, ...]; batch axis 1 sharded over 'data')."""
        stacked = {k: np.stack([np.asarray(r[k]) for r in raws])
                   for k in raws[0] if k not in ("n_valid", "rows", "n_uniq")}
        if self.mesh is None:
            return stacked
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        s = NamedSharding(self.mesh, P(None, "data"))
        rep = NamedSharding(self.mesh, P(None))
        return {k: jax.device_put(v, rep if k == "art_n_uniq" else s)
                for k, v in stacked.items()}

    def _prefetched(self, items, depth: int):
        """Stage work items ``depth`` ahead on a worker thread so host
        batch prep + host->device transfer overlap the running step."""
        if depth <= 0:
            yield from items
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        done = object()
        stop = threading.Event()

        def worker():
            try:
                for item in items:
                    # bounded put with a stop check so a consumer that
                    # bails mid-epoch doesn't leave this thread blocked
                    # forever with staged device batches pinned in q
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised on main thread
                q.put((done, e))  # in-order: surfaces as soon as consumed
                return
            q.put((done, None))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 and item[0] is done:
                    if item[1] is not None:
                        raise item[1]
                    break
                yield item
        finally:
            stop.set()
            while not q.empty():  # release staged device buffers
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def _run_epoch(self, train_feed, steps_per_epoch, epoch: Optional[int] = None,
                   scalar_logger=None, log_every: Optional[int] = None) -> list[jnp.ndarray]:
        """One epoch of train steps with prefetch; groups of
        ``config.scan_steps`` batches dispatch as one lax.scan.
        ``epoch`` pins the feed's shuffle order (resume support);
        ``scalar_logger`` + ``log_every`` emit a train/loss_step scalar
        every N optimizer steps (the reference logs per-batch loss via
        TensorBoard, ebnerd_nrms.py:212-215 / fastformer
        dataloader.py:191-196; logging forces one device sync per N
        steps, so keep N large enough to stay off the hot path)."""
        import itertools

        it = train_feed.epoch() if epoch is None else train_feed.epoch(epoch=epoch)
        if steps_per_epoch is not None:
            it = itertools.islice(it, steps_per_epoch)
        step0 = int(self.state.step) if (scalar_logger and log_every) else 0
        done_steps = 0
        last_logged = 0  # scan advances done_steps by scan_steps at a time
        n_scan = self.config.scan_steps
        use_scan = n_scan > 1 and jax.process_count() == 1

        def work():
            group: list[dict] = []
            for raw in it:
                if self._sparse:
                    # host vocab-row dedup rides this prefetch-thread
                    # generator, overlapped with the running device step
                    raw = prep_sparse_batch(
                        raw, self._host_tables, self._sparse_tables,
                        self._vocab_size, self.config.sparse_min_bucket)
                if self._dedup:
                    # article dedup likewise (after sparse prep, which
                    # reads hist_idx/cand_idx this replaces with slots)
                    raw = prep_dedup_batch(raw, self.config.dedup_min_bucket)
                if not use_scan:
                    yield ("step", self._put(raw))
                    continue
                group.append(raw)
                if len(group) == n_scan:
                    if self._dedup:  # align the group to one bucket
                        m = max(r["art_uniq"].shape[0] for r in group)
                        group = [pad_dedup_to(r, m) for r in group]
                    yield ("scan", self._put_stacked(group))
                    group = []
            for raw in group:  # remainder (< scan_steps): per-step
                yield ("step", self._put(raw))

        losses: list[jnp.ndarray] = []
        for kind, payload in self._prefetched(work(), self.config.prefetch):
            self._rng, step_rng = jax.random.split(self._rng)
            if kind == "scan":
                self.state, ls = self._train_steps_scan(self.state, payload, step_rng)
                losses.append(ls)
                done_steps += int(ls.shape[0])
            else:
                self.state, loss = self._train_step(self.state, payload, step_rng)
                losses.append(loss[None])
                done_steps += 1
            if (scalar_logger is not None and log_every
                    and done_steps - last_logged >= log_every):
                last_logged = done_steps
                scalar_logger.log("train/loss_step",
                                  float(losses[-1][-1]), step=step0 + done_steps)
        return losses

    def fit(
        self,
        train_feed: NewsrecFeed,
        val_feed: Optional[EvalFeed] = None,
        val_labels: Optional[Ragged] = None,
        epochs: int = 1,
        steps_per_epoch: Optional[int] = None,
        scalar_logger=None,
        ckpt_dir=None,
        resume: bool = False,
        log_every_steps: int = 50,
    ) -> list[dict[str, float]]:
        """Epoch loop with val-AUC monitoring, best-weights restore, early
        stopping, and LR plateau reduction (reference callback behavior,
        ebnerd_nrms.py:212-257).

        ``ckpt_dir`` persists the FULL TrainState to disk each epoch plus
        a ``best`` checkpoint at every val-metric improvement (the
        reference's ModelCheckpoint(save_best_only) writes best weights
        each epoch, ebnerd_nrms.py:222-229, and reloads them before test,
        :259-260 — here optimizer/moment/step state rides along too).
        ``resume=True`` restores the latest epoch checkpoint AND the
        callback state (best metric, patience counters, LR, history, RNG
        stream), so a killed run continues exactly where an uninterrupted
        run would be: same shuffle order, same dropout stream, same
        early-stop/plateau decisions."""
        import json as _json
        from pathlib import Path as _Path

        cfg = self.config
        if self.state is None:
            first = next(iter(train_feed.epoch(shuffle=False)))
            self.init_state(first)

        def snapshot(tree):
            # _train_step donates the incoming state, so the best-weights
            # snapshot must own its buffers, not alias soon-dead ones.
            return jax.tree_util.tree_map(jnp.copy, tree)

        best_metric = -np.inf if cfg.monitor_mode == "max" else np.inf
        best_params = snapshot(self.state.params)
        best_stats = snapshot(self.state.batch_stats)
        best_emb = snapshot(self.state.emb) if self.state.emb is not None else None
        es_wait = lr_wait = 0
        lr = cfg.learning_rate
        start_epoch = 0
        mgr = meta_path = None
        if ckpt_dir is not None:
            from .checkpoint import CheckpointManager

            mgr = CheckpointManager(ckpt_dir)
            meta_path = _Path(ckpt_dir) / "meta.json"
            if resume and meta_path.exists():
                # restore the epoch META names (not the newest on disk):
                # a kill between save_step and the meta write leaves a
                # newer state checkpoint with stale callback metadata —
                # the previous (state, meta) pair is the consistent one
                meta = _json.loads(meta_path.read_text())
                from .checkpoint import restore_checkpoint

                step_dir = _Path(ckpt_dir) / f"step_{int(meta['epoch'])}"
                if not step_dir.exists():
                    # meta whose checkpoint was deleted/cleaned: orbax
                    # restore would raise, so fall back to a fresh start
                    self.log(f"[trainer] resume: {step_dir.name} missing; "
                             "starting from scratch")
                    restored = None
                else:
                    restored = restore_checkpoint(self.state, ckpt_dir,
                                                  step=int(meta["epoch"]))
                if restored is not None:
                    self.state = restored
                    self._art_cache = None
                    start_epoch = int(meta["epoch"]) + 1
                    best_metric = float(meta["best_metric"])
                    es_wait, lr_wait = int(meta["es_wait"]), int(meta["lr_wait"])
                    lr = float(meta["lr"])
                    self.history = list(meta["history"])
                    _hyperparams(self.state.opt_state)["learning_rate"] = jnp.asarray(lr)
                    self._rng = jax.random.wrap_key_data(
                        jnp.asarray(np.asarray(meta["rng"], np.uint32)),
                        impl=cfg.rng_impl)
                    if np.isfinite(best_metric) and (_Path(ckpt_dir) / "best").exists():
                        b = mgr.restore_best(self.state)
                        best_params = snapshot(b.params)
                        best_stats = snapshot(b.batch_stats)
                        best_emb = snapshot(b.emb) if b.emb is not None else None
                    self.log(f"[trainer] resumed from epoch {meta['epoch']} "
                             f"(next: {start_epoch}, best {best_metric:.5f})")

        stop = False
        for epoch in range(start_epoch, epochs):
            losses = self._run_epoch(train_feed, steps_per_epoch, epoch=epoch,
                                     scalar_logger=scalar_logger,
                                     log_every=log_every_steps)
            mean_loss = float(jnp.mean(jnp.concatenate(losses))) if losses else float("nan")
            record = {"epoch": epoch, "loss": mean_loss, "lr": lr}
            if val_feed is not None and val_labels is not None:
                scores = self.score(val_feed)
                # Deliberate deviation: single-class impressions (no
                # positive or no negative in view) have undefined AUC —
                # per_impression_auc yields NaN for them and nanmean skips
                # them. The reference's AucScore would instead raise
                # (sklearn.roc_auc_score, metrics_protocols.py:77-86),
                # aborting training on data the wu2019 sampler never
                # produces but real validation splits can contain.
                val_auc = float(np.nanmean(per_impression_auc(val_labels, scores)))
                record["val_auc"] = val_auc
                better = val_auc > best_metric if cfg.monitor_mode == "max" else val_auc < best_metric
                if better:
                    best_metric, es_wait, lr_wait = val_auc, 0, 0
                    best_params = snapshot(self.state.params)
                    best_stats = snapshot(self.state.batch_stats)
                    if self.state.emb is not None:
                        best_emb = snapshot(self.state.emb)
                    if mgr is not None:  # ModelCheckpoint(save_best_only)
                        mgr.save_best(self.state)
                else:
                    es_wait += 1
                    lr_wait += 1
                    if cfg.lr_patience is not None and lr_wait >= cfg.lr_patience:
                        lr = max(lr * cfg.lr_factor, cfg.min_lr)
                        _hyperparams(self.state.opt_state)["learning_rate"] = jnp.asarray(lr)
                        lr_wait = 0
                        self.log(f"[trainer] reduce lr -> {lr:g}")
                    if cfg.early_stopping_patience is not None and es_wait >= cfg.early_stopping_patience:
                        stop = True
            self.history.append(record)
            if mgr is not None:
                # full-state epoch checkpoint + callback-state metadata;
                # meta written AFTER the state save so a kill between the
                # two resumes from the previous consistent pair. Every
                # process participates in the orbax save (multi-controller
                # coordination), but only process 0 writes the meta file —
                # on shared checkpoint storage concurrent identical writes
                # could interleave.
                mgr.save_step(self.state, epoch)
                if jax.process_index() == 0:
                    meta_path.write_text(_json.dumps({
                        "epoch": epoch,
                        "best_metric": float(best_metric),
                        "es_wait": es_wait,
                        "lr_wait": lr_wait,
                        "lr": lr,
                        "history": self.history,
                        "rng": np.asarray(
                            jax.random.key_data(self._rng)).tolist(),
                    }))
            if scalar_logger is not None:
                scalar_logger.log_dict(
                    {f"train/{k}" if k == "loss" else f"val/{k}" if k.startswith("val") else f"train/{k}": v
                     for k, v in record.items() if k != "epoch"},
                    step=epoch,
                )
            self.log(f"[trainer] {record}")
            if stop:
                self.log("[trainer] early stopping; restoring best weights")
                break
        if val_feed is not None and val_labels is not None:
            self.state = self.state.replace(params=best_params, batch_stats=best_stats,
                                            emb=best_emb if self.state.emb is not None else None)
            # the step counter is unchanged by the restore, so the
            # step-keyed article-vector cache would silently serve
            # final-epoch vectors against best-epoch user-tower params
            self._art_cache = None
        return self.history

    def score(self, feed: EvalFeed, two_tower=None) -> Ragged:
        """Masked batched scoring over ragged impressions; returns a ragged
        score column aligned with the inview lists (the reference explodes
        to single-candidate scorer calls instead, dataloader.py:94-107).

        With ``two_tower`` (default: ``config.two_tower_eval``), the corpus
        is encoded ONCE through the article tower and impressions are
        scored by the cheap user tower — numerically identical logits,
        O(V·encoder + ΣK·d) instead of O(ΣK·encoder)."""
        if self.state is None:
            raise RuntimeError("call fit() or init_state() first")
        if two_tower is None:
            two_tower = self.config.two_tower_eval
        supported = model_kind(self.model) is not None
        if two_tower is True and not supported:
            raise ValueError(
                f"{type(self.model).__name__} does not support two-tower scoring")
        use_tt = supported if two_tower == "auto" else bool(two_tower)
        if use_tt:
            return self._score_two_tower(feed)
        out = np.zeros((feed.n_rows, feed.width), np.float32)
        # dispatch batches asynchronously and fetch behind a bounded
        # window: per-batch np.asarray would serialize (transfer ->
        # compute -> fetch) round-trips, which dominates on high-latency
        # links, while an unbounded pending list would pin every batch's
        # inputs + result buffers in HBM at once (multi-GB on full test
        # splits with 250-wide beyond-accuracy candidate pools)
        pending: list = []

        def drain(rows, dev):
            scores = self._fetch(dev)
            out[rows, : scores.shape[1]] = scores[: len(rows)]

        for raw in feed.batches():
            pending.append((raw["rows"], self._score_step(self.state, self._put(raw))))
            if len(pending) >= self.EVAL_WINDOW:
                drain(*pending.pop(0))
        for rows, dev in pending:
            drain(rows, dev)
        return feed.unpad(out)

    def _article_index(self) -> jnp.ndarray:
        """The [V+1, D] corpus encoding at the CURRENT params, cached on the
        optimizer step counter so repeated ``score()`` calls at fixed params
        (e.g. chunked test inference) encode the corpus exactly once."""
        step = int(self.state.step)
        cached = getattr(self, "_art_cache", None)
        if cached is not None and cached[0] == step:
            return cached[1]
        n_rows = next(iter(self.tables.values())).shape[0]
        bs = min(4096, n_rows)
        chunks = []
        for start in range(0, n_rows, bs):
            idx = np.arange(start, min(start + bs, n_rows), dtype=np.int32)
            if idx.shape[0] < bs:  # pad to keep one compiled program
                idx = np.concatenate([idx, np.zeros(bs - idx.shape[0], np.int32)])
            chunks.append(self._encode_articles_step(self.state, jnp.asarray(idx)))
        art_vecs = jnp.concatenate(chunks, axis=0)[:n_rows]
        self._art_cache = (step, art_vecs)
        return art_vecs

    def _score_two_tower(self, feed: EvalFeed) -> Ragged:
        art_vecs = self._article_index()
        art_valid = article_validity(self.tables)
        out = np.zeros((feed.n_rows, feed.width), np.float32)
        # async dispatch behind the same bounded window as score(); eval
        # batches route through _put so a dp mesh shards them over 'data'
        # instead of replicating (cand_mask is dropped host-side — _put
        # strips only the host bookkeeping keys)
        pending: list = []

        def drain(rows, dev):
            scores = self._fetch(dev)
            out[rows, : scores.shape[1]] = scores[: len(rows)]

        for raw in feed.batches():
            rows = raw["rows"]
            raw = {k: v for k, v in raw.items() if k != "cand_mask"}
            pending.append(
                (rows, self._two_tower_step(self.state, art_vecs, art_valid,
                                            self._put(raw))))
            if len(pending) >= self.EVAL_WINDOW:
                drain(*pending.pop(0))
        for rows, dev in pending:
            drain(rows, dev)
        return feed.unpad(out)

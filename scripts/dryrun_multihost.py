#!/usr/bin/env python
"""Multi-host (multi-process) training demonstration on CPU.

Launches the SAME tiny NRMS training job twice:
  1. single process, 8 virtual CPU devices
  2. two processes (jax.distributed.initialize over localhost), 4 virtual
     CPU devices each — the same 8-device global (data=4, model=2) mesh
     spanning two controllers, host-sharded batch feeding
     (parallel/mesh.shard_batch assembles global arrays from per-process
     shards), row-sharded tables, jit-inserted gradient psum.

and asserts the per-epoch training losses are identical, that EVAL
scoring (two-tower, data-sharded batches, cross-process all-gather
fetch) returns identical scores, and that a disk checkpoint written by
the 2-process run RESUMES across both processes (one extra epoch) with
the same loss as the single-process resume. This exercises the real
multi-host code path (`parallel/distributed.initialize`,
`jax.make_array_from_process_local_data`, multi-controller orbax) that
production pods use — no reference counterpart (the reference is
single-process, SURVEY §2.4).

  python scripts/dryrun_multihost.py            # parent: run + compare
  python scripts/dryrun_multihost.py --worker I --num N --port P --out F
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

STEPS = 4
EPOCHS = 2


def run_worker(process_id: int, num_processes: int, port: int,
               devices_per_proc: int, out_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        from ebnerd_tpu.parallel import distributed as dist

        dist.initialize(f"localhost:{port}", num_processes, process_id)
        assert jax.process_count() == num_processes, dist.process_info()

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ebnerd_tpu import constants as c
    from ebnerd_tpu.data.behaviors import (
        create_binary_labels_column,
        ebnerd_from_path,
        sampling_strategy_wu2019,
    )
    from ebnerd_tpu.data.dataloader import EvalFeed, NewsrecFeed
    from ebnerd_tpu.data.lookup import Lookup
    from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd
    from ebnerd_tpu.data.table import read_parquet
    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.inputs import token_batch
    from ebnerd_tpu.models.newsrec import NRMS
    from ebnerd_tpu.parallel.mesh import make_mesh
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    devs = jax.devices()
    mesh = make_mesh(data=len(devs) // 2, model=2, devices=devs)

    H, T, NPRATIO, VOCAB = 4, 6, 3, 64
    bs = 8
    # every process builds the identical dataset (seed-pinned)
    data_dir = Path(out_path).parent / "data"
    sentinel = data_dir / ".complete"
    if process_id == 0 or num_processes == 1:
        make_synthetic_ebnerd(data_dir, n_users=16, n_articles=39,
                              n_impressions=64, seed=0)
        # written AFTER all three parquets: articles.parquet lands last
        # (data/synthetic.py) and parquet writes are not atomic, so other
        # processes must not key off behaviors.parquet alone
        sentinel.touch()
    if num_processes > 1:
        # cheap barrier: process 0 writes, others wait for the sentinel
        import time

        for _ in range(600):
            if sentinel.exists():
                break
            time.sleep(0.1)
    df = ebnerd_from_path(data_dir, history_size=H)
    train_df = create_binary_labels_column(
        sampling_strategy_wu2019(df, npratio=NPRATIO, shuffle=True, seed=1))
    articles = read_parquet(data_dir / "articles.parquet")
    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    rng = np.random.default_rng(0)
    lookup = Lookup.from_values(
        ids, rng.integers(1, VOCAB, (len(ids), T)).astype(np.int32))

    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=4,
                     attention_hidden_dim=8)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=8)
    trainer = Trainer(
        model, {"title": lookup.matrix}, token_batch,
        TrainerConfig(learning_rate=1e-3, early_stopping_patience=None,
                      lr_patience=None, seed=0),
        mesh=mesh,
        table_specs={"title": P("model")},
        param_specs={"word_embedding": P("model")},
        log_fn=lambda s: None,
    )
    feed = NewsrecFeed(train_df, lookup, history_size=H, batch_size=bs, seed=3)
    ckpt_dir = Path(out_path).parent / "ckpt"
    trainer.fit(feed, epochs=EPOCHS, steps_per_epoch=STEPS, ckpt_dir=ckpt_dir)

    # eval scoring under the mesh: two-tower path, batches sharded over
    # 'data' via Trainer._put, results all-gathered across controllers
    val_df = create_binary_labels_column(df)
    val_feed = EvalFeed(val_df, lookup, history_size=H, batch_size=bs)
    scores = trainer.score(val_feed)
    score_vals = np.asarray(scores.values, np.float64)

    # resume across processes: a FRESH trainer restores the epoch
    # checkpoint (multi-controller orbax) and trains one more epoch
    resumed = Trainer(
        model, {"title": lookup.matrix}, token_batch,
        TrainerConfig(learning_rate=1e-3, early_stopping_patience=None,
                      lr_patience=None, seed=0),
        mesh=mesh,
        table_specs={"title": P("model")},
        param_specs={"word_embedding": P("model")},
        log_fn=lambda s: None,
    )
    resumed.fit(feed, epochs=EPOCHS + 1, steps_per_epoch=STEPS,
                ckpt_dir=ckpt_dir, resume=True)
    assert resumed.history[:EPOCHS] == trainer.history, "resume lost history"

    if process_id == 0:
        result = {
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
            "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
            "losses": [h["loss"] for h in trainer.history],
            "val_scores_mean": float(score_vals.mean()),
            "val_scores_head": [round(float(x), 6) for x in score_vals[:8]],
            "resumed_loss": float(resumed.history[-1]["loss"]),
        }
        Path(out_path).write_text(json.dumps(result))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    if args.worker is not None:
        run_worker(args.worker, args.num, args.port, args.devices, args.out)
        return

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        env = dict(os.environ)

        # 1. single-process reference (8 devices in one controller)
        ref_out = tmp / "ref" / "result.json"
        ref_out.parent.mkdir()
        subprocess.run(
            [sys.executable, __file__, "--worker", "0", "--num", "1",
             "--devices", "8", "--out", str(ref_out)],
            check=True, env=env, timeout=900,
        )

        # 2. two processes x 4 devices, one global mesh
        port = _free_port()
        dist_out = tmp / "dist" / "result.json"
        dist_out.parent.mkdir()
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--worker", str(i), "--num", "2",
                 "--port", str(port), "--devices", "4", "--out", str(dist_out)],
                env=env)
            for i in range(2)
        ]
        for p in procs:
            rc = p.wait(timeout=900)
            if rc != 0:
                raise SystemExit(f"worker exited with {rc}")

        ref = json.loads(ref_out.read_text())
        dist = json.loads(dist_out.read_text())
        assert dist["process_count"] == 2, dist
        assert dist["global_devices"] == 8, dist
        import numpy as np

        np.testing.assert_allclose(ref["losses"], dist["losses"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ref["val_scores_mean"],
                                   dist["val_scores_mean"], rtol=1e-5)
        np.testing.assert_allclose(ref["val_scores_head"],
                                   dist["val_scores_head"], rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(ref["resumed_loss"], dist["resumed_loss"],
                                   rtol=1e-5, atol=1e-6)
        print(f"[dryrun_multihost] ok: 2 processes x 4 devices, "
              f"mesh={dist['mesh']}, {EPOCHS} epochs x {STEPS} steps; "
              f"losses match single-process run: {dist['losses']}; "
              f"val scores match (mean {dist['val_scores_mean']:.6f}); "
              f"ckpt resume across 2 processes matches "
              f"(loss {dist['resumed_loss']:.6f})")


if __name__ == "__main__":
    main()

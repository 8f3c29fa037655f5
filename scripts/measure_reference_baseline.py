#!/usr/bin/env python
"""Self-measure the reference's NRMS training throughput.

The reference repo publishes no benchmark numbers (BASELINE.md), so the
baseline must be measured locally: this script runs the REFERENCE's own
TF/Keras NRMS implementation (imported from /root/reference/src, not
copied) on synthetic batches with the reproduction config
(README.md:118-133: history 20, title 30, npratio 4, 20 heads x 20 dim,
xlm-roberta-large-sized embedding, bs 32), and records steady-state
impressions/sec into BASELINE_LOCAL.json.

Hardware note: the only accelerator in this environment is a TPU, which
TF cannot use; the reference therefore runs on host CPU here. The
recorded JSON carries the hardware string so the comparison in bench.py
is interpretable.

Usage: python scripts/measure_reference_baseline.py [--quick]
"""
from __future__ import annotations

import json
import platform
import sys
import time
from pathlib import Path

import numpy as np

REFERENCE_SRC = "/root/reference/src"

VOCAB = 250_002
EMB = 1_024
TITLE = 30
HISTORY = 20
NPRATIO = 4
BATCH = 32  # reference default, args_nrms.py


def main() -> None:
    quick = "--quick" in sys.argv
    sys.path.insert(0, REFERENCE_SRC)
    import tensorflow as tf

    from ebrec.models.newsrec import NRMSModel
    from ebrec.models.newsrec.model_config import hparams_nrms

    rng = np.random.default_rng(0)
    w2v = rng.standard_normal((VOCAB, EMB), dtype=np.float32) * 0.02
    model = NRMSModel(hparams=hparams_nrms, word2vec_embedding=w2v, seed=42)

    n = 512 if quick else 2048
    k = NPRATIO + 1
    his = rng.integers(0, VOCAB, (n, HISTORY, TITLE)).astype(np.int32)
    pred = rng.integers(0, VOCAB, (n, k, TITLE)).astype(np.int32)
    y = np.zeros((n, k), np.float32)
    y[np.arange(n), rng.integers(0, k, n)] = 1.0

    # warmup (graph build + first-batch autotuning)
    model.model.fit((his[:BATCH * 4], pred[:BATCH * 4]), y[:BATCH * 4],
                    batch_size=BATCH, epochs=1, verbose=0)
    t0 = time.perf_counter()
    model.model.fit((his, pred), y, batch_size=BATCH, epochs=1, verbose=0)
    dt = time.perf_counter() - t0
    ips = n / dt

    out = {
        "reference_impressions_per_sec": round(ips, 2),
        "config": {
            "model": "NRMS (reference TF/Keras, /root/reference/src/ebrec)",
            "batch_size": BATCH,
            "history": HISTORY,
            "title": TITLE,
            "npratio": NPRATIO,
            "vocab": VOCAB,
            "word_emb_dim": EMB,
            "n_impressions_timed": n,
        },
        "hardware": f"host CPU ({platform.processor() or platform.machine()}); "
                    "TF has no TPU/GPU backend in this environment",
        "tf_version": tf.__version__,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": "reference publishes no numbers (BASELINE.md); this is the "
                "locally-runnable reference implementation's throughput",
    }
    path = Path(__file__).resolve().parent.parent / "BASELINE_LOCAL.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""10× scale-stress for the text / events / embeddings query paths
(round-4 verdict #2).

`/root/testdata` tops out at sf0.1; round 4 proved the best traps (int64
overflow, pandas-block shuffle tax) only appear when the data grows. This
job deterministically synthesizes a 10× corpus mirroring TESTDATA.md's
documents / events / embeddings shapes (vocab word-salad text with planted
exact + near duplicates, 60-day event stream, 10-label Gaussian embedding
clusters with planted near-dup vectors; relational tables are symlinked
from sf0.1 — the verdict's target is the text paths), then times the most
expensive catalog queries at sf0.1 AND at 10× and prints a per-query wall
table with the scaling ratio. Rows ≈ 10× rows should cost ≈ 10× (linear
operators) or less (fixed overhead amortized); anything super-linear is a
trap to fix.

    python jobs/scale_stress.py [--out /tmp/graft_scale10] [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF01 = "/root/testdata/sf0.1"
SEED = 977

_CORE = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "index read write block shard plan stage task node disk cache tune skew"
).split()
# ~1000 words: the driver's sf corpora use a ~40-word vocab, which at 10×
# saturates 3-gram benchmark contamination (515 bench docs cover the whole
# gram space → the flagship's hits==0 filter keeps 0 rows — measured, not a
# bug). A realistic vocabulary keeps every downstream stage exercised.
VOCAB = _CORE + [f"w{i:03d}" for i in range(1000 - len(_CORE))]

LANGS = np.array(["en", "en", "en", "fr", "de", "es", "zh"])


def gen_documents(n_docs: int, out: str):
    """Word-salad docs like the driver's but over a ~1000-word Zipf-ish
    vocabulary: ~40-90 words per doc, 20 sources, en-heavy langs; ~1.5%
    planted exact dups and ~3% near-dups (a copy with 2 word
    substitutions) so the dedup family has real work."""
    rng = np.random.default_rng(SEED)
    lens = rng.integers(40, 90, n_docs)
    vocab_arr = np.asarray(VOCAB)
    texts = []
    for n in lens:
        # quadratic rank bias ≈ Zipf: low-index (common) words dominate but
        # the tail still appears — keeps n-gram space sparse like real text
        idx = (len(vocab_arr) * rng.random(n) ** 2).astype(np.int64)
        texts.append(" ".join(vocab_arr[idx]))
    # planted duplicates: last 4.5% of docs copy earlier ones
    n_exact = int(n_docs * 0.015)
    n_near = int(n_docs * 0.03)
    src_idx = rng.integers(0, n_docs - n_exact - n_near, n_exact + n_near)
    for j, si in enumerate(src_idx):
        tgt = n_docs - n_exact - n_near + j
        words = texts[si].split()
        if j >= n_exact:  # near-dup: substitute 2 words
            for p in rng.integers(0, len(words), 2):
                words[p] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        texts[tgt] = " ".join(words)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": LANGS[rng.integers(0, len(LANGS), n_docs)],
            "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        }
    )
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        f"{out}/documents.parquet", row_group_size=8192,
    )
    return len(df)


def gen_events(n_events: int, out: str):
    rng = np.random.default_rng(SEED + 1)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 60 * 86_400 * 1_000_000
    ts = ts0 + np.sort(rng.integers(0, span_us, n_events)).astype("timedelta64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 15_000, n_events).astype(np.int64),
            "event_type": np.array(["view", "click", "signup", "purchase", "error"])[
                rng.integers(0, 5, n_events)
            ],
            "value": np.round(rng.lognormal(3.5, 1.0, n_events), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        f"{out}/events.parquet", row_group_size=65_536,
    )
    return len(df)


def gen_embeddings(n_vecs: int, out: str, dim: int = 64, k: int = 10):
    rng = np.random.default_rng(SEED + 2)
    centers = rng.standard_normal((k, dim)) * 3.0
    labels = rng.integers(0, k, n_vecs)
    vecs = centers[labels] + rng.standard_normal((n_vecs, dim))
    n_near = int(n_vecs * 0.02)  # planted near-dup vectors
    src = rng.integers(0, n_vecs - n_near, n_near)
    vecs[n_vecs - n_near :] = vecs[src] + rng.standard_normal((n_near, dim)) * 1e-3
    labels[n_vecs - n_near :] = labels[src]
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in vecs],
            "label": labels.astype(np.int32),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        f"{out}/embeddings.parquet", row_group_size=8192,
    )
    return len(df)


def generate(out: str, factor: int = 10):
    os.makedirs(out, exist_ok=True)
    n = {}
    n["documents"] = gen_documents(5_000 * factor, out)
    n["events"] = gen_events(100_000 * factor, out)
    n["embeddings"] = gen_embeddings(2_000 * factor, out)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)
    return n


# the expensive documents/events/embeddings entries from BENCH_local_r4,
# most-expensive first
STRESS_QUERIES = [
    "dup_components_documents",
    "near_dup_pairs_documents",
    "cross_source_leakage_documents",
    "prepare_training_corpus",
    "curate_documents",
    "bigram_frequencies_documents",
    "kmeans_embeddings",
    "vocab_documents",
    "embedding_near_dup",
    "ivf_topk_embeddings",
    "minhash_dedup_documents",
    "simhash_documents",
    "tfidf_top_terms_documents",
    "duplicate_passages_documents",
    "edit_distance_adjacent_docs",
    "cohort_retention_events",
    "sessionize_events",
    "pack_documents",
    "value_drift_events",
    "shuffle_positions_documents",
    "decontaminate_documents",
    "heavy_hitters_tokens",
]


def consume(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.count()
    return len(res)


def stress(out: str, queries=None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    rows = []
    for name in queries or STRESS_QUERIES:
        fn = qs[name]
        rec = {"query": name}
        for label, d in (("sf0.1", SF01), ("x10", out)):
            t0 = time.perf_counter()
            try:
                n = consume(fn(d))
                rec[label] = round(time.perf_counter() - t0, 2)
                rec[f"{label}_rows"] = n
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                rec[label] = None
                rec[f"{label}_err"] = f"{type(exc).__name__}: {exc}"[:200]
        if rec.get("sf0.1") and rec.get("x10"):
            rec["ratio"] = round(rec["x10"] / rec["sf0.1"], 1)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/graft_scale10")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset to run")
    args = ap.parse_args()
    if not args.skip_gen:
        print(json.dumps({"generated": generate(args.out)}), flush=True)
    qlist = args.queries.split(",") if args.queries else None
    rows = stress(args.out, qlist)
    print(json.dumps({"table": rows}))
    import ray

    ray.shutdown()

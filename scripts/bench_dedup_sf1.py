#!/usr/bin/env python
"""sf1 scaling run for the dedup family (round-4 judge item 8).

All per-round perf evidence is sf0.1 (5k documents); a quadratic shape
hidden behind the blocking guards (band-bucket skew, chunk-window blowup)
would only show at 10x. No sf1 testdata exists, so this script
synthesizes a deterministic 10x documents table FROM sf0.1: ten copies,
each with doc_ids offset into a disjoint range and EVERY TOKEN suffixed
with a copy tag (``word`` -> ``wordqKq``, alphanumeric so the tokenizer
keeps it fused into one token). The per-token suffix preserves
the within-copy near-dup structure exactly (both members of a near-dup
pair transform identically, so their shingle overlap is unchanged) while
making copies of the SAME document share ZERO tokens/shingles — pair
counts scale exactly linearly with corpus size, the honest 10x.

(The first cut of this script used word ROTATION instead — wrong: a
rotation is a cyclic shift, preserving the token multiset (simhash:
identical sketch) and all but ~k boundary shingles (minhash/jaccard:
Jaccard ~= 1), so every document matched its 9 copies and the corpus
became an adversarial dense-duplicate stress test: 237k minhash pairs
instead of ~2.5k. Those numbers are reported in BENCH.md as a bonus
hot-group stress result; ``--adversarial`` reproduces them.)

Runs each dedup query at sf0.1 and the synthesized sf1 IN THE SAME
SESSION (same JIT/codegen state) and prints one JSON line with both
timings, the scale ratios, and pair/group counts. A ratio near ~10-15x
on 32 cores is linear-ish (fixed per-query overhead plus 10x data over
constant parallelism); a ratio near 100x means a quadratic crept in.

Usage: python scripts/bench_dedup_sf1.py  [--reps 2] [--adversarial]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mysql_binlog_spark.dedup.components import duplicate_groups
from mysql_binlog_spark.dedup.jaccard import ngram_jaccard_pairs
from mysql_binlog_spark.dedup.minhash import minhash_dedup_pairs
from mysql_binlog_spark.dedup.simhash import simhash_near_dup_pairs
from mysql_binlog_spark.session import get_spark

SF01_DOCS = "/root/testdata/sf0.1/documents.parquet"
SF01_EMB = "/root/testdata/sf0.1/embeddings.parquet"
N_COPIES = 10


def synthesize_sf1(spark, out_path: str, adversarial: bool = False) -> None:
    """Ten copies of the sf0.1 documents table (cached): per-token copy
    suffix (disjoint shingle spaces -> linear pair growth), or word
    rotation with --adversarial (near-identical copies -> dense
    duplicate-group stress corpus; see module docstring)."""
    if os.path.exists(out_path):
        return
    docs = spark.read.parquet(SF01_DOCS)
    n_docs = docs.count()
    copies = []
    for k in range(N_COPIES):
        w = F.split(F.col("text"), " ")
        if k == 0:
            text_k = F.col("text")
        elif adversarial:
            p = (F.size(w) * k / N_COPIES).cast("int")
            text_k = F.array_join(
                F.concat(
                    F.slice(w, p + 1, F.greatest(F.size(w) - p, F.lit(0))),
                    F.slice(w, 1, p),
                ),
                " ",
            )
        else:
            text_k = F.array_join(
                F.transform(w, lambda t: F.concat(t, F.lit(f"q{k}q"))), " "
            )
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
                text_k.alias("text"),
                "lang",
                "source",
                F.length(text_k).cast("long").alias("n_chars"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    tmp = out_path + ".tmp"
    big.repartition(32).write.mode("overwrite").parquet(tmp)
    os.replace(tmp, out_path)


QUERIES = {
    "dedup_minhash_lsh": lambda d: minhash_dedup_pairs(
        d, num_perm=16, bands=4, threshold=0.5
    ),
    "dedup_simhash": lambda d: simhash_near_dup_pairs(d, max_hamming=3),
    "dedup_ngram_jaccard": lambda d: ngram_jaccard_pairs(d, k=3, threshold=0.3),
    "dedup_group_assignment": lambda d: duplicate_groups(
        minhash_dedup_pairs(d, num_perm=16, bands=4, threshold=0.5)
    ),
}


def synthesize_emb_sf1(spark, out_path: str) -> None:
    """Ten copies of the sf0.1 embeddings: element ROTATION of the vector
    by k positions — distinct (norm-preserving) vectors per copy,
    disjoint vec_id ranges."""
    if os.path.exists(out_path):
        return
    emb = spark.read.parquet(SF01_EMB)
    n = emb.count()
    copies = []
    for k in range(N_COPIES):
        v = F.col("embedding")
        if k > 0:
            v = F.concat(
                F.slice(v, k + 1, F.size(v) - k), F.slice(v, 1, k)
            )
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                v.alias("embedding"),
                "label",
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    tmp = out_path + ".tmp"
    big.repartition(16).write.mode("overwrite").parquet(tmp)
    os.replace(tmp, out_path)


def _emb_double(e):
    return e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def _ann_queries(qv):
    from mysql_binlog_spark.similarity.ann import (
        brute_force_topk,
        ivf_build_centroids,
        ivf_topk,
        lsh_topk,
    )

    return {
        "ann_bruteforce_topk": lambda e: brute_force_topk(e, qv, k=10),
        "ann_lsh_topk": lambda e: lsh_topk(
            e, qv, k=10, n_planes=8, multiprobe=1
        ),
        "ann_ivf_topk": lambda e: ivf_topk(
            e, qv, ivf_build_centroids(e, n_cells=8), k=10, nprobe=3
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--adversarial", action="store_true")
    ap.add_argument("--family", choices=["all", "dedup", "ann"], default="all")
    args = ap.parse_args()

    spark = get_spark("bench-dedup-sf1")
    tag = "adv" if args.adversarial else "lin"
    sf1_path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_docs_sf1_v3_{tag}"
    )
    synthesize_sf1(spark, sf1_path, adversarial=args.adversarial)

    inputs = {
        "sf0.1": spark.read.parquet(SF01_DOCS),
        "sf1": spark.read.parquet(sf1_path),
    }
    load0 = os.getloadavg()
    result: dict = {
        "n_docs": {k: v.count() for k, v in inputs.items()},
        "load_start": round(load0[0], 2),
        "reps": args.reps,
    }
    timings: dict = {}
    counts: dict = {}
    families: dict = {}
    if args.family in ("all", "dedup"):
        families.update({n: (qf, inputs) for n, qf in QUERIES.items()})
    if args.family in ("all", "ann"):
        emb1_path = os.path.join(
            tempfile.gettempdir(), "spark_graft_emb_sf1_v1"
        )
        synthesize_emb_sf1(spark, emb1_path)
        emb_in = {
            "sf0.1": _emb_double(spark.read.parquet(SF01_EMB)),
            "sf1": _emb_double(spark.read.parquet(emb1_path)),
        }
        result["n_vecs"] = {k: v.count() for k, v in emb_in.items()}
        qv_row = emb_in["sf0.1"].filter(F.col("vec_id") == 0).collect()[0]
        qv = [float(x) for x in qv_row["embedding"]]
        families.update(
            {n: (qf, emb_in) for n, qf in _ann_queries(qv).items()}
        )
    for name, (qf, fam_inputs) in families.items():
        timings[name] = {}
        counts[name] = {}
        for sf, docs in fam_inputs.items():
            # warmup rep 0 included in the median set like bench.py
            times = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                qf(docs).write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            timings[name][sf] = round(statistics.median(times), 3)
            counts[name][sf] = qf(docs).count()
        timings[name]["ratio"] = round(
            timings[name]["sf1"] / max(timings[name]["sf0.1"], 1e-9), 2
        )
    result["timings"] = timings
    result["counts"] = counts
    result["load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

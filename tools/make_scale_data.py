"""Synthesize sf1 (~10x sf0.1) testdata for the scaling measurement.

Every 100 TB design claim in COVERAGE.md rested on sf0.1 numbers plus
plan-shape asserts (r04 verdict, 'What's missing' #1). This script
manufactures a 10x corpus locally by replicating the sf0.1 parquet as
id-offset shards (schemas from TESTDATA.md), with two perturbations
chosen so that WORKLOAD DENSITY stays constant per shard — i.e. the
interesting join outputs grow linearly with data size, the way a real
10x corpus would, instead of quadratically the way verbatim clones
would:

- documents: every token in shard s>0 gets an ``_s<s>`` suffix. Within
  a shard the shingle structure (and therefore every near-dup pair) is
  EXACTLY the original's — a uniform token rewrite maps shingle sets
  bijectively, preserving Jaccard. Across shards, shingle sets are
  DISJOINT, so no cross-shard pairs: pair count scales exactly 10x.
  (Verbatim clones would make each doc an exact dup of its 9 copies:
  ~100x pairs — a different, quadratic workload.)
- embeddings: shard s applies a deterministic per-(shard, dim) sign
  flip — a diagonal orthogonal transform. Within-shard cosines are
  preserved EXACTLY (|v| and v.w are sign-invariant when both sides
  flip the same dims); cross-shard pairs decorrelate (~half the dims
  flip between any two shards), so near-dup structure again scales
  linearly.
- events / orders / lineitem: id-offset replication (user_id,
  o_orderkey/o_custkey, l_orderkey) — per-key group sizes unchanged,
  10x groups.

Run:  python tools/make_scale_data.py [--factor 10]
Writes /root/repo/scale_data/sf1/*.parquet (never touches
/root/testdata). ~170 MB; .gitignore'd.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sf10/sf100 generation unions hundreds of shards over one local heap;
# the library's 8g default is sized for tests/CLI, not this.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402

ID_OFFSET = 10_000_000  # far above any sf0.1 key range


def _shard_documents(df, s: int):
    out = df.withColumn("doc_id", F.col("doc_id") + F.lit(s * ID_OFFSET))
    if s == 0:
        return out
    # Suffix EVERY token: within-shard shingles rewrite 1:1 (Jaccard
    # preserved), cross-shard shingle sets disjoint.
    return out.withColumn(
        "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1_s{s}")
    )


def _shard_documents_salt(df, s: int):
    # doc-salt mode (round 10): REAL-WORD text preserved; one
    # per-shard salt token APPENDED per doc (every shard incl. 0, so
    # content statistics are uniform across shards). Gives
    # content-keyed operators (ppl bands, stop-word rules, lang-id)
    # non-degenerate N× rows — the token-suffix mode multiplies the
    # vocabulary by N and collapses them (the r07 Gopher / r09 ppl
    # adjudications). NOT for pair-based operators: clones across
    # shards share almost all shingles/windows (cross-shard Jaccard
    # ≈ 1), so near-dup/span workloads go quadratic here — keep
    # token-suffix corpora for those. Exact dedup stays linear (the
    # salt makes every clone's fingerprint distinct).
    return df.withColumn(
        "doc_id", F.col("doc_id") + F.lit(s * ID_OFFSET)
    ).withColumn("text", F.concat(F.col("text"), F.lit(f" zzsalt{s}")))


def _shard_embeddings(df, s: int):
    out = df.withColumn("vec_id", F.col("vec_id") + F.lit(s * ID_OFFSET))
    if s == 0:
        return out
    # Deterministic diagonal +-1 per (shard, dim): orthogonal, so
    # within-shard cosines are exact; cross-shard pairs decorrelate
    # (~half the dims flip between any two shards). The flip bit MUST
    # come from a real hash of (shard, dim): any multiplicative scheme
    # mod 2 collapses to parity (an odd constant contributes nothing),
    # which made all even shards identical to shard 0 and all odd
    # shards identical to each other — every vector an exact cross-
    # shard dup, a quadratic workload. xxhash64 mixes both inputs.
    return out.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(
                F.pmod(F.xxhash64(i, F.lit(s)), F.lit(2)) == 0, x
            ).otherwise(-x),
        ),
    )


def _shard_events(df, s: int):
    return df.withColumn(
        "event_id", F.col("event_id") + F.lit(s * ID_OFFSET)
    ).withColumn("user_id", F.col("user_id") + F.lit(s * ID_OFFSET))


def _shard_orders(df, s: int):
    return df.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(s * ID_OFFSET)
    ).withColumn("o_custkey", F.col("o_custkey") + F.lit(s * ID_OFFSET))


def _shard_lineitem(df, s: int):
    return df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(s * ID_OFFSET))


SHARDERS = {
    "documents": _shard_documents,
    "embeddings": _shard_embeddings,
    "events": _shard_events,
    "orders": _shard_orders,
    "lineitem": _shard_lineitem,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/scale_data/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset (default: all); e.g. the sf100 "
        "point is dedup-only and needs just documents,embeddings "
        "(sf1/sf10 also run the entry family — they need events, "
        "orders and lineitem too)",
    )
    ap.add_argument(
        "--text-mode",
        choices=("token-suffix", "doc-salt"),
        default="token-suffix",
        help="documents transform: token-suffix (default — shingle "
        "sets disjoint across shards; the near-dup/span workload "
        "corpora) or doc-salt (real-word text + one per-shard salt "
        "token appended; for content-keyed operators — ppl bands, "
        "stop-word rules, lang-id; NOT for pair-based operators, see "
        "_shard_documents_salt)",
    )
    args = ap.parse_args()
    tables = (
        {t.strip() for t in args.tables.split(",")} if args.tables else None
    )

    spark = get_spark(
        app_name="make-scale-data",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # events.parquet stores INT64 TIMESTAMP(NANOS); surface as
            # long and write back as plain long — __spark_entry__._t
            # handles the bigint branch identically for both dirs.
            "spark.sql.legacy.parquet.nanosAsLong": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(args.dst, exist_ok=True)
    for table, shard in SHARDERS.items():
        if tables is not None and table not in tables:
            continue
        src = f"{args.src}/{table}.parquet"
        base = spark.read.parquet(src)
        if table == "embeddings" and args.factor > 50:
            # Fast path for big factors: an N-way unionByName is N
            # subtrees for Catalyst to analyze; a crossJoin against
            # range(N) is one. Semantics match the union path exactly
            # (per-(shard,dim) xxhash sign flip, incl. shard 0 — any
            # diagonal orthogonal transform preserves within-shard
            # cosines, so flipping shard 0 too is equally valid).
            out = base.crossJoin(
                spark.range(args.factor).withColumnRenamed("id", "_s")
            ).select(
                (F.col("vec_id") + F.col("_s") * ID_OFFSET).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        F.pmod(F.xxhash64(i, F.col("_s")), F.lit(2)) == 0, x
                    ).otherwise(-x),
                ).alias("embedding"),
                "label",
            )
        elif table == "documents" and args.factor > 50:
            # Same fast path for documents. token-suffix: suffix EVERY
            # token with the shard id (column replacement, Spark
            # 3.5+); suffixing shard 0 too is fine — a uniform token
            # rewrite maps shingle sets bijectively (within-shard
            # Jaccard exact), and shards stay pairwise disjoint.
            # doc-salt: append the per-shard salt token instead.
            if args.text_mode == "doc-salt":
                text_expr = F.concat(
                    F.col("text"), F.lit(" zzsalt"),
                    F.col("_s").cast("string"),
                )
            else:
                text_expr = F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1_s"), F.col("_s").cast("string")),
                )
            out = base.crossJoin(
                spark.range(args.factor).withColumnRenamed("id", "_s")
            ).select(
                (F.col("doc_id") + F.col("_s") * ID_OFFSET).alias("doc_id"),
                text_expr.alias("text"),
                *[c for c in base.columns if c not in ("doc_id", "text")],
            )
        elif args.factor > 50:
            # Generic fast path for the id-offset tables: same
            # crossJoin-vs-N-way-union rationale as above.
            offset_cols = {
                "events": ["event_id", "user_id"],
                "orders": ["o_orderkey", "o_custkey"],
                "lineitem": ["l_orderkey"],
            }[table]
            out = base.crossJoin(
                spark.range(args.factor).withColumnRenamed("id", "_s")
            ).select(
                *[
                    (F.col(c) + F.col("_s") * ID_OFFSET).alias(c)
                    if c in offset_cols
                    else c
                    for c in base.columns
                ]
            )
        else:
            if table == "documents" and args.text_mode == "doc-salt":
                shard = _shard_documents_salt
            out = shard(base, 0)
            for s in range(1, args.factor):
                out = out.unionByName(shard(base, s))
        dst = f"{args.dst}/{table}.parquet"
        out.write.mode("overwrite").parquet(dst)
        n_base = base.count()
        n_out = spark.read.parquet(dst).count()
        assert n_out == n_base * args.factor, (table, n_base, n_out)
        print(f"{table}: {n_base} -> {n_out}")
    print(f"done: {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

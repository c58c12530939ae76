"""Measure the PHYSICAL COST FLOOR of the incremental embedding
near-dup path at a given scale point (default sf100), to adjudicate
whether its speedup-vs-full is at its ceiling.

The incremental path cannot avoid paying, per ingest:
  (a) one scan of the stored hyperplane band table (the band
      equi-join's stream side),
  (b) one scan of the resident corpus's id→vector lookup for
      candidate verification (post round-6 it is ONE scan — the
      pruned corpus is persisted and reused by both pair sides),
  (c) hashing + banding of the new batch itself.
This probe times each component as a bare scan-and-materialize
(hash-every-column aggregate, same materialization bench.py's scaling
runs use) and prints them next to the measured incremental total.
If total ≈ floor(a)+floor(b)+(c) within noise, the path is at its
physical ceiling and a bigger speedup requires shrinking the stored
artifacts (quantization, column pruning), not a better plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wroclaw_bike_stats_spark.operators import similarity as SIM  # noqa: E402
from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402

STORE = "/root/repo/scale_data/store"


def _mat(df) -> float:
    t0 = time.perf_counter()
    df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash(*df.columns).cast("long")).alias("chk"),
    ).first()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "sf100"
    spark = get_spark(
        app_name="incr-floor-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    old_emb = spark.read.parquet(f"{STORE}/{tag}_old_emb.parquet")
    new_emb = spark.read.parquet(f"{STORE}/{tag}_new_emb.parquet")
    bands = spark.read.parquet(f"{STORE}/{tag}_emb_bands.parquet")

    # warmup: JVM + Arrow workers
    _mat(new_emb)

    out = {"tag": tag}
    # min-of-2 per component, mirroring scale_bench methodology
    for name, df_fn in (
        ("floor_band_table_scan", lambda: bands),
        ("floor_corpus_vector_scan", lambda: old_emb),
        (
            "floor_new_batch_hash",
            lambda: new_emb.select(
                "vec_id",
                SIM._make_band_hash_udf(192, 8)(F.col("embedding")).alias("h"),
            ),
        ),
    ):
        best = None
        for _ in range(2):
            sec = _mat(df_fn())
            best = sec if best is None else min(best, sec)
        out[name] = best
    out["floor_sum"] = round(
        out["floor_band_table_scan"]
        + out["floor_corpus_vector_scan"]
        + out["floor_new_batch_hash"],
        3,
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

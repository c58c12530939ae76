"""Scale evidence for the r15/r16 route boundaries (r15 VERDICT
task 7): show each new fast path ENGAGES below its designed bound and
DISENGAGES above it, on inputs big/shaped enough that the boundary is
exercised for real (multi-row-group parquet, over-bound edge lists) —
not just the bench corpus.

Probes (one JSON line each, merged into SCALING.md's r16 note):

1. ``cc_driver_resolve_boundary`` — a PERSISTED pair graph of exactly
   ``DRIVER_EDGES_MAX`` edges resolves as a LocalRelation (driver
   union-find; plan shows LocalTableScan / no checkpoint scan), while
   the same graph with ONE edge more routes to the unchanged
   two-phase machinery, and an UN-persisted frame never takes the
   probe regardless of size.
2. ``ensure_parallelism_noop`` — over a multi-row-group/multi-file
   parquet (the production layout) the fan-out is a NO-OP (the same
   DataFrame object comes back); over a single-row-group file it
   repartitions to the session parallelism.
3. ``presort_checkpoint_single_pass`` — the r15 lazy-localCheckpoint
   pre-sort pattern: an Arrow pass feeding a total-order sort is
   invoked for 2× the corpus rows without the checkpoint (the range
   sample + the shuffle map each compute it) and ~1× with it, counted
   by a Spark accumulator on a MULTI-file input (i.e. the fix is not
   a single-row-group artifact).

Usage: ``python tools/probe_r16_routes.py`` (writes /tmp parquet
scratch; needs a few hundred MB).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wroclaw_bike_stats_spark.operators.components import (  # noqa: E402
    DRIVER_EDGES_MAX,
    connected_components,
)
from wroclaw_bike_stats_spark.operators.fanout import (  # noqa: E402
    ensure_parallelism,
)
from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402

SCRATCH = "/tmp/r16_route_probes"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="wbs-route-probes",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    out: dict = {}

    # --- 1. CC driver-resolve boundary at DRIVER_EDGES_MAX ---------
    def edge_frame(n_edges: int):
        # a long path graph: n_edges edges, n_edges+1 nodes — every
        # edge row distinct, diameter maximal (worst case for the
        # fixpoint, so the boundary matters)
        return (
            spark.range(n_edges)
            .select(
                F.col("id").alias("id_a"),
                (F.col("id") + 1).alias("id_b"),
            )
        )

    at_bound = edge_frame(DRIVER_EDGES_MAX).persist()
    at_bound.count()
    cc_at = connected_components(at_bound)
    plan_at = plan_of(cc_at)
    over = edge_frame(DRIVER_EDGES_MAX + 1).persist()
    over.count()
    cc_over = connected_components(over)
    plan_over = plan_of(cc_over)
    unpersisted = edge_frame(64)
    cc_un = connected_components(unpersisted)
    plan_un = plan_of(cc_un)
    rows_at = cc_at.agg(
        F.count(F.lit(1)), F.countDistinct("component_id")
    ).first()
    rows_over = cc_over.agg(
        F.count(F.lit(1)), F.countDistinct("component_id")
    ).first()
    out["cc_driver_resolve_boundary"] = {
        "bound": DRIVER_EDGES_MAX,
        "at_bound_local_relation": "LocalTableScan" in plan_at,
        "over_bound_local_relation": "LocalTableScan" in plan_over,
        "unpersisted_local_relation": "LocalTableScan" in plan_un,
        "at_bound_nodes_components": [rows_at[0], rows_at[1]],
        "over_bound_nodes_components": [rows_over[0], rows_over[1]],
    }
    at_bound.unpersist()
    over.unpersist()

    # --- 2. ensure_parallelism no-op on production layout ----------
    multi_path = os.path.join(SCRATCH, "multi")
    (
        spark.range(2_000_000)
        .select(F.col("id").alias("doc_id"), F.sha1(F.col("id").cast("string")).alias("text"))
        .repartition(16)
        .write.mode("overwrite")
        .parquet(multi_path)
    )
    multi = spark.read.parquet(multi_path)
    fanned_multi = ensure_parallelism(multi)
    single = spark.read.parquet(
        os.path.join(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "documents.parquet",
        )
    ).select("doc_id", "text")
    fanned_single = ensure_parallelism(single)
    out["ensure_parallelism_noop"] = {
        "multi_file_parts": multi.rdd.getNumPartitions(),
        "multi_file_noop": fanned_multi is multi,
        "single_row_group_parts": single.rdd.getNumPartitions(),
        "single_repartitioned": fanned_single is not single
        and "Repartition" in fanned_single._jdf.queryExecution()
        .optimizedPlan()
        .toString(),
    }

    # --- 3. pre-sort lazy localCheckpoint = one pass ----------------
    import pandas as pd

    n_rows = multi.count()

    def run(with_ckpt: bool) -> int:
        acc = spark.sparkContext.accumulator(0)

        def heavy(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "n": pdf["text"].str.len()}
                )

        chain = multi.mapInPandas(heavy, "doc_id long, n int")
        if with_ckpt:
            chain = chain.localCheckpoint(eager=False)
        chain.orderBy("doc_id").write.format("noop").mode(
            "overwrite"
        ).save()
        return acc.value

    rows_without = run(False)
    rows_with = run(True)
    out["presort_checkpoint_single_pass"] = {
        "corpus_rows": n_rows,
        "arrow_rows_processed_without_ckpt": rows_without,
        "arrow_rows_processed_with_ckpt": rows_with,
        "without_is_double": rows_without >= int(1.8 * n_rows),
        "with_is_single": rows_with <= int(1.2 * n_rows),
    }

    print(json.dumps({"r16_route_probes": out}))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

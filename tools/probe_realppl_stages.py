"""Stage split of the curate_full_corpus_realppl scale row — answers
"which stage grew?" for the 10x time steps the headline row reports
(r11: 100x->1000x step = 12.6x on 10x data; the salt-corpus caveat
predicts the span strip's SITE VOLUME is linear but its per-window
group sizes grow with shard count, so the strip is the suspect).

Measures, per salt point (default sf10s + sf100s; stores must exist —
scale_bench.prepare_salt_stores):

  score_band    the CCNet band setup alone: one Arrow scoring pass
                over the corpus + approxQuantile([p20,p80])
  pipe_nostrip  the composed realppl pipeline WITHOUT the span strip
                (strip_spans=False) — decontam + quality + Gopher +
                repetition + band-scored filter + exact dedup + split
  (full)        the headline number including the strip is NOT
                re-measured here (cold-once in SCALING.json); strip
                cost ~= full - pipe_nostrip

Cold state between measurements (entry release_shared + scratch
release), single process, one measurement each (this is a structure
probe, not an anchor). Prints one JSON line.

Run: python -u tools/probe_realppl_stages.py [sf10s sf100s ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

from pyspark.sql import functions as F  # noqa: E402

import scale_bench as sb  # noqa: E402


def main() -> int:
    tags = sys.argv[1:] or ["sf10s", "sf100s"]
    spark = sb.get_spark(
        app_name="probe-realppl-stages",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wroclaw_bike_stats_spark.operators.text import (
        bigram_lm_score,
        collect_lm_assets,
    )
    from wroclaw_bike_stats_spark.plans.curate import curate_corpus

    out: dict[str, dict] = {}
    for tag in tags:
        sf_dir = sb.sf_dir_of(tag)
        docs = sb._docs(spark, sf_dir)
        eval_set = spark.read.parquet(sb._p(sf_dir, "new_docs")).select(
            "doc_id", "text"
        )
        uni = spark.read.parquet(sb._p(sf_dir, "lm_uni"))
        bi = spark.read.parquet(sb._p(sf_dir, "lm_bi"))

        # score_band: the band-setup cost a real CCNet run pays first
        sb._cold()
        t0 = time.perf_counter()
        assets = collect_lm_assets(spark, uni, bi)
        scored = bigram_lm_score(docs, uni, bi, impl="arrow",
                                 model_assets=assets)
        lo, hi = scored.approxQuantile("ppl", [0.2, 0.8], 0.001)
        t_band = round(time.perf_counter() - t0, 3)

        # pipe_nostrip: everything the headline row does except the
        # span strip (same band endpoints, same shared assets)
        sb._cold()
        t0 = time.perf_counter()
        n = sb._materialize(
            curate_corpus(
                docs,
                eval_set,
                scrub=False,
                gopher_bounds=sb.GOPHER_SCALE_BOUNDS,
                lm=(uni, bi),
                min_ppl=lo,
                max_ppl=hi,
                lm_assets=assets,
                strip_spans=False,
                persist_stages=True,
            )
        )
        t_nostrip = round(time.perf_counter() - t0, 3)
        out[tag] = {
            "score_band_sec": t_band,
            "pipe_nostrip_sec": t_nostrip,
            "pipe_nostrip_rows": n,
            "band": [round(lo, 3), round(hi, 3)],
        }
        print(f"# {tag}: band={t_band}s nostrip={t_nostrip}s rows={n}",
              flush=True)
    print(json.dumps({"metric": "realppl_stage_split", "points": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Batch-parity contract for streaming/curate_stream.py (the pin the
module docstring promises): N daily ingests through
``ingest_document_batch`` must leave stores equal to ONE-SHOT runs of
the batch operators over the union —

- cumulative ``pairs/``  == ``minhash_dedup_pairs(union)`` (every
  near-dup pair is delivered by the batch of its LATER member);
- admitted ``docs/`` text == the full-run keep-first span strip
  (ascending-id ingest is the stated precondition);
- ``kept_view``          == CC + keep-min-id over the one-shot graph;
- the re-aggregated window-index store == ``window_index(union)``
  (the (cnt, canonical) monoid);
- embedding side: ``sem_pairs/`` / ``kept_view_embeddings`` ==
  ``semdedup_pairs`` / keep over the union under the FIXED stored
  centroids, given the documented precondition that the resident
  first drop is internally deduped;
- replaying the whole input against the SAME checkpoint appends
  nothing (exactly-once via the streaming checkpoint).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from wroclaw_bike_stats_spark.operators import dedup as D
from wroclaw_bike_stats_spark.operators import span_dedup as SD
from wroclaw_bike_stats_spark.operators.components import (
    connected_components,
    keep_canonical,
)
from wroclaw_bike_stats_spark.streaming.curate_stream import (
    _maybe,
    ingest_document_batch,
    ingest_embedding_batch,
    init_embedding_store,
    kept_view,
    kept_view_embeddings,
    read_window_index_store,
    run_curation_stream,
)

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.5
SPAN_K = 13
EMB_THRESHOLD = 0.4


def _doc_batches(docs, n=3):
    """Split into n ascending-doc_id ranges (daily ingests: new ids
    are higher — the span-parity precondition)."""
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    size = (len(ids) + n - 1) // n
    cuts = [ids[i * size] for i in range(1, n)]
    lows = [None] + cuts
    highs = cuts + [None]
    out = []
    for lo, hi in zip(lows, highs):
        b = docs
        if lo is not None:
            b = b.filter(F.col("doc_id") >= lo)
        if hi is not None:
            b = b.filter(F.col("doc_id") < hi)
        out.append(b)
    return out


def _pair_set(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_multibatch_ingest_equals_one_shot(spark, docs, tmp_path):
    store = str(tmp_path / "store")
    batches = _doc_batches(docs, n=3)
    for b in batches:
        ingest_document_batch(
            b, store, threshold=THRESHOLD, span_k=SPAN_K
        )

    # (1) cumulative pair store == one-shot pair graph
    one_shot_pairs = D.minhash_dedup_pairs(docs, threshold=THRESHOLD)
    got = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
    want = _pair_set(one_shot_pairs)
    assert want, "vacuous: the fixture corpus must contain near-dups"
    assert got == want

    # (2) admitted text == full-run keep-first strip (every doc kept)
    full_strip = {
        r.doc_id: r.text_clean
        for r in SD.strip_duplicate_spans(
            docs, k=SPAN_K, keep_all=True
        ).collect()
    }
    admitted = spark.read.parquet(os.path.join(store, "docs"))
    got_text = {r.doc_id: r.text for r in admitted.collect()}
    assert set(got_text) == set(full_strip)
    assert got_text == full_strip
    n_stripped = sum(
        1 for r in docs.collect() if full_strip[r.doc_id] != r.text
    )
    assert n_stripped > 0, "vacuous: no duplicated spans in fixture"
    # original text rides along for tomorrow's dedup substrate
    orig = {r.doc_id: r.text_orig for r in admitted.collect()}
    assert orig == {r.doc_id: r.text for r in docs.collect()}

    # (3) kept_view == CC + keep-min-id over the one-shot graph,
    #     rows carry the STRIPPED text
    comps = connected_components(one_shot_pairs, rebalance_edges=True)
    want_ids = {
        r.doc_id
        for r in keep_canonical(docs, comps=comps).select("doc_id").collect()
    }
    view = kept_view(spark, store)
    got_view = {r.doc_id: r.text for r in view.collect()}
    assert set(got_view) == want_ids
    assert len(want_ids) < docs.count(), "vacuous: nothing deduped"
    assert got_view == {i: full_strip[i] for i in want_ids}

    # (4) the re-aggregated window-index store == window_index(union)
    one_shot_idx = {
        r.h: (r.cnt, r.canon_id, r.canon_pos)
        for r in SD.window_index(docs, k=SPAN_K).collect()
    }
    merged = read_window_index_store(spark, store)
    got_idx = {
        r.h: (r.cnt, r.canon_id, r.canon_pos) for r in merged.collect()
    }
    assert got_idx == one_shot_idx
    # parameterization metadata survives the store round-trip
    assert merged.schema["h"].metadata == SD.window_index(
        docs, k=SPAN_K
    ).schema["h"].metadata


def test_maybe_ignores_success_only_dir(spark, tmp_path):
    """A crashed append can leave a directory holding only _SUCCESS;
    the store probe must treat it as empty rather than letting
    parquet schema inference fail."""
    d = tmp_path / "empty_store"
    d.mkdir()
    (d / "_SUCCESS").touch()
    assert _maybe(spark, str(d)) is None
    assert _maybe(spark, str(tmp_path / "never_created")) is None


def test_stream_checkpoint_makes_replay_idempotent(spark, docs, tmp_path):
    """run_curation_stream end-to-end: three daily files in ascending
    id order through the file source, then the SAME input re-run
    against the SAME checkpoint — the second run must process nothing
    (stores byte-identical in row counts, kept_view unchanged)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    subset = docs.filter(F.col("doc_id") % 3 == 0)
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    batches = _doc_batches(subset, n=3)
    for i, b in enumerate(batches):
        pdf = b.orderBy("doc_id").toPandas()
        path = str(input_dir / f"{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), path)
        # ascending mtimes pin the file-source delivery order
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    q = run_curation_stream(
        spark, str(input_dir), store, schema, ckpt,
        threshold=THRESHOLD, span_k=SPAN_K,
    )
    q.awaitTermination(300)

    counts = {
        what: spark.read.parquet(os.path.join(store, what)).count()
        for what in ("docs", "pairs", "bands", "winindex")
    }
    assert counts["docs"] == subset.count()
    view_before = {r.doc_id: r.text for r in kept_view(spark, store).collect()}

    # parity of the streamed stores with the one-shot graph
    want = _pair_set(D.minhash_dedup_pairs(subset, threshold=THRESHOLD))
    got = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
    assert got == want

    # replay: same input, same checkpoint -> no new work
    q2 = run_curation_stream(
        spark, str(input_dir), store, schema, ckpt,
        threshold=THRESHOLD, span_k=SPAN_K,
    )
    q2.awaitTermination(300)
    for what, n in counts.items():
        assert (
            spark.read.parquet(os.path.join(store, what)).count() == n
        ), what
    assert {
        r.doc_id: r.text for r in kept_view(spark, store).collect()
    } == view_before


def test_embedding_side_parity(spark, tmp_path):
    """sem_pairs / kept_view_embeddings == one-shot semdedup under the
    FIXED stored centroids, given the documented precondition that the
    resident first drop is internally deduped (old-old pairs were
    resolved before the store was initialized)."""
    from wroclaw_bike_stats_spark.operators.semdedup import (
        semdedup_assign,
        semdedup_pairs,
    )
    from wroclaw_bike_stats_spark.operators.similarity import (
        assign_to_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut1, cut2 = ids[len(ids) // 2], ids[3 * len(ids) // 4]
    resident = emb.filter(F.col("vec_id") < cut1)
    d2 = emb.filter((F.col("vec_id") >= cut1) & (F.col("vec_id") < cut2))
    d3 = emb.filter(F.col("vec_id") >= cut2)

    # dedup the resident to a fixpoint of its own (deterministic)
    # centroid fit — after the loop, a refit on the survivors yields
    # zero internal pairs, which is exactly what init_embedding_store
    # will fit and store
    for _ in range(4):
        cents, assigned = semdedup_assign(resident, num_clusters=4)
        prs = semdedup_pairs(
            resident, threshold=EMB_THRESHOLD, assigned=assigned
        )
        if not prs.head(1):
            break
        resident = keep_canonical(
            resident,
            comps=connected_components(prs, rebalance_edges=True),
            id_col="vec_id",
        )
    else:
        pytest.fail("resident dedup did not reach a fixpoint")

    store = str(tmp_path / "emb_store")
    init_embedding_store(resident, store, num_clusters=4)
    for batch in (d2, d3):
        ingest_embedding_batch(batch, store, threshold=EMB_THRESHOLD)

    union = resident.unionByName(d2).unionByName(d3)
    cents = spark.read.parquet(os.path.join(store, "centroids"))
    assigned_u = assign_to_centroids(union, cents)
    one_shot = semdedup_pairs(
        union, threshold=EMB_THRESHOLD, assigned=assigned_u
    )
    want = _pair_set(one_shot)
    assert want, "vacuous: no semantic pairs at this threshold"
    got = _pair_set(spark.read.parquet(os.path.join(store, "sem_pairs")))
    assert got == want

    want_keep = {
        r.vec_id
        for r in keep_canonical(
            union,
            comps=connected_components(one_shot, rebalance_edges=True),
            id_col="vec_id",
        ).collect()
    }
    got_keep = {
        r.vec_id for r in kept_view_embeddings(spark, store).collect()
    }
    assert got_keep == want_keep
    assert len(want_keep) < union.count(), "vacuous: nothing deduped"


def test_embedding_stream_end_to_end(spark, tmp_path):
    """run_embedding_curation_stream (round 11): three daily embedding
    drops through the file source + checkpoint. The runner's bootstrap
    fits centroids on the FIRST drop and appends its within-batch
    pairs, so — unlike bare init_embedding_store — the first drop need
    NOT be internally deduped: kept_view_embeddings must equal the
    one-shot SemDeDup keep over the union under the stored centroids,
    and the sem_pairs store must equal the one-shot pair set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.types import ArrayType, FloatType

    from wroclaw_bike_stats_spark.operators.semdedup import semdedup_pairs
    from wroclaw_bike_stats_spark.operators.similarity import (
        assign_to_centroids,
    )
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        run_embedding_curation_stream,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut1, cut2 = ids[len(ids) // 2], ids[3 * len(ids) // 4]
    batches = [
        emb.filter(F.col("vec_id") < cut1),
        emb.filter((F.col("vec_id") >= cut1) & (F.col("vec_id") < cut2)),
        emb.filter(F.col("vec_id") >= cut2),
    ]
    # the new contract is only exercised if drop 1 has internal pairs
    first_internal = semdedup_pairs(
        batches[0], num_clusters=4, threshold=EMB_THRESHOLD
    )
    assert first_internal.head(1), "vacuous: first drop internally clean"

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    for i, b in enumerate(batches):
        path = str(input_dir / f"{i:02d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(b.orderBy("vec_id").toPandas()), path
        )
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    store = str(tmp_path / "emb_store")
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    q = run_embedding_curation_stream(
        spark, str(input_dir), store, schema, str(tmp_path / "ckpt"),
        threshold=EMB_THRESHOLD, num_clusters=4,
    )
    q.awaitTermination(300)

    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    cents = spark.read.parquet(os.path.join(store, "centroids"))
    one_shot = semdedup_pairs(
        union,
        threshold=EMB_THRESHOLD,
        assigned=assign_to_centroids(union, cents),
    )
    want = _pair_set(one_shot)
    assert want, "vacuous: no semantic pairs at this threshold"
    got = _pair_set(spark.read.parquet(os.path.join(store, "sem_pairs")))
    assert got == want

    want_keep = {
        r.vec_id
        for r in keep_canonical(
            union,
            comps=connected_components(one_shot, rebalance_edges=True),
            id_col="vec_id",
        ).collect()
    }
    got_keep = {
        r.vec_id for r in kept_view_embeddings(spark, store).collect()
    }
    assert got_keep == want_keep
    assert len(want_keep) < union.count(), "vacuous: nothing deduped"


def test_embedding_stream_scored_stage(spark, tmp_path):
    """run_embedding_curation_stream with an ADMIT FILTER (r12 — the
    doc runner's scored-stage e2e coverage, applied to the embedding
    twin): a vector-derived admission rule (component-sum > 0) runs
    before bootstrap and ingest alike, so centroids are fit on the
    ADMITTED first drop and rejected vectors never reach the pair
    graph or the assignment store. Parity: sem_pairs / keep ==
    one-shot SemDeDup over the FILTERED union under the stored
    centroids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.types import ArrayType, FloatType

    from wroclaw_bike_stats_spark.operators.semdedup import semdedup_pairs
    from wroclaw_bike_stats_spark.operators.similarity import (
        assign_to_centroids,
    )
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        run_embedding_curation_stream,
    )

    def admit(df):
        score = F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x
        )
        return df.filter(score > 0)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut1, cut2 = ids[len(ids) // 2], ids[3 * len(ids) // 4]
    batches = [
        emb.filter(F.col("vec_id") < cut1),
        emb.filter((F.col("vec_id") >= cut1) & (F.col("vec_id") < cut2)),
        emb.filter(F.col("vec_id") >= cut2),
    ]
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    admitted_union = admit(union)
    n_all, n_admit = union.count(), admitted_union.count()
    assert 0 < n_admit < n_all, "vacuous: filter passes all or none"

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    for i, b in enumerate(batches):
        path = str(input_dir / f"{i:02d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(b.orderBy("vec_id").toPandas()), path
        )
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    store = str(tmp_path / "emb_store")
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    q = run_embedding_curation_stream(
        spark, str(input_dir), store, schema, str(tmp_path / "ckpt"),
        threshold=EMB_THRESHOLD, num_clusters=4, admit_filter=admit,
    )
    q.awaitTermination(300)

    # rejected vectors never reached the assignment store
    stored_ids = {
        r.vec_id
        for r in spark.read.parquet(os.path.join(store, "assigned"))
        .select("vec_id")
        .collect()
    }
    assert stored_ids == {r.vec_id for r in admitted_union.collect()}

    cents = spark.read.parquet(os.path.join(store, "centroids"))
    one_shot = semdedup_pairs(
        admitted_union,
        threshold=EMB_THRESHOLD,
        assigned=assign_to_centroids(admitted_union, cents),
    )
    want = _pair_set(one_shot)
    assert want, "vacuous: no semantic pairs among admitted vectors"
    got = _pair_set(spark.read.parquet(os.path.join(store, "sem_pairs")))
    assert got == want

    want_keep = {
        r.vec_id
        for r in keep_canonical(
            admitted_union,
            comps=connected_components(one_shot, rebalance_edges=True),
            id_col="vec_id",
        ).collect()
    }
    got_keep = {
        r.vec_id for r in kept_view_embeddings(spark, store).collect()
    }
    assert got_keep == want_keep
    assert len(want_keep) < n_admit, "vacuous: nothing deduped"


def test_embedding_stream_bootstrap_crash_recovery(spark, tmp_path):
    """A crash between init's two writes (centroids/ written,
    assigned/ not yet) must NOT wedge the stream: the bootstrap probes
    ``assigned/`` — init's LAST write — so a restart re-runs init
    (overwrite) instead of entering the ingest path and dying forever
    on PATH_NOT_FOUND for assigned/. Simulated by deleting assigned/
    after an init."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import ArrayType, FloatType

    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        run_embedding_curation_stream,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    batches = [
        emb.filter(F.col("vec_id") < cut),
        emb.filter(F.col("vec_id") >= cut),
    ]

    store = str(tmp_path / "emb_store")
    # the half-store a mid-init crash leaves behind
    init_embedding_store(batches[0], store, num_clusters=4)
    shutil.rmtree(os.path.join(store, "assigned"))

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    for i, b in enumerate(batches):
        path = str(input_dir / f"{i:02d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(b.orderBy("vec_id").toPandas()), path
        )
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    q = run_embedding_curation_stream(
        spark, str(input_dir), store, schema, str(tmp_path / "ckpt"),
        threshold=EMB_THRESHOLD, num_clusters=4,
    )
    q.awaitTermination(300)

    # the restart re-initialized: assigned/ exists and covers the
    # union, and the kept view resolves without error
    assigned = spark.read.parquet(os.path.join(store, "assigned"))
    assert assigned.count() == emb.count()
    assert kept_view_embeddings(spark, store).count() > 0


def test_out_of_order_ingest_guard(spark, docs, tmp_path):
    """The span-parity precondition (ascending-id ingest) is a RUNTIME
    GUARD since round 10, not prose: a batch whose min id <= the
    stored high-water mark fails loudly BEFORE any append. The
    opt-out admits the batch under the documented degraded
    (first-ingested-wins) span semantics, and the pair graph — which
    is order-independent — still equals the one-shot graph."""
    store = str(tmp_path / "store")
    b1, b2, _ = _doc_batches(docs, n=3)
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    counts = {
        what: spark.read.parquet(os.path.join(store, what)).count()
        for what in ("docs", "pairs", "bands", "winindex", "maxid")
    }

    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    for what, n in counts.items():
        assert (
            spark.read.parquet(os.path.join(store, what)).count() == n
        ), f"refused batch appended to {what}"

    # a CHECKPOINT REPLAY of the most recent batch (identical (min,
    # max) id range — the crash-between-watermark-and-checkpoint
    # case) must be let through, NOT fenced by its own high-water
    # mark: re-appending is the documented at-least-once behavior,
    # and raising here would wedge the stream in a restart loop —
    # but LOUDLY since r11: the exemption emits a UserWarning
    with pytest.warns(UserWarning, match="checkpoint-replay"):
        ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    assert (
        spark.read.parquet(os.path.join(store, "docs")).count()
        == 2 * counts["docs"]
    )

    # a REGENERATED day file — the last batch's exact id multiset but
    # DIFFERENT text — must NOT pass as a replay (r11: the fingerprint
    # carries an order-insensitive content digest); admitting it would
    # silently append divergent text under already-seen ids
    regen = b2.withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(
            regen, store, threshold=THRESHOLD, span_k=SPAN_K
        )

    # a regenerated file RE-PAIRING the same texts to different ids
    # (positional id assignment over a reordered producer run): id
    # multiset, row count, AND text multiset all match the last batch
    # — only the (id, text) pairing differs. A text-multiset digest
    # would admit this as a replay; the fingerprint hashes the
    # PAIRING, so it must raise.
    rows = b2.orderBy("doc_id").collect()
    texts = [r.text for r in rows]
    rotated = texts[1:] + texts[:1]
    assert rotated != texts, "vacuous: rotation changed no pairing"
    repaired = spark.createDataFrame(
        [(r.doc_id, t) for r, t in zip(rows, rotated)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(
            repaired, store, threshold=THRESHOLD, span_k=SPAN_K
        )

    ingest_document_batch(
        b1, store, threshold=THRESHOLD, span_k=SPAN_K,
        enforce_ascending_ids=False,
    )
    union = b2.unionByName(b1)
    want = _pair_set(D.minhash_dedup_pairs(union, threshold=THRESHOLD))
    got = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
    assert want, "vacuous: no near-dup pairs across the two batches"
    assert got == want


def test_legacy_maxid_store_without_text_hash(spark, docs, tmp_path):
    """A pre-r11 maxid store (no text_hash column) must keep working:
    the replay check falls back to the id-keyed fingerprint — a
    replay of the last batch is admitted (with the warning), and a
    genuinely out-of-order batch still raises."""
    store = str(tmp_path / "store")
    b1, b2, _ = _doc_batches(docs, n=3)
    ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    # strip the r11 column to simulate a store written by older code
    maxid_dir = os.path.join(store, "maxid")
    legacy = spark.read.parquet(maxid_dir).drop("text_hash", "fp_scheme").collect()
    legacy_df = spark.createDataFrame(
        legacy, "min_id long, max_id long, n_rows long, id_hash long"
    )
    import shutil

    shutil.rmtree(maxid_dir)
    legacy_df.write.parquet(maxid_dir)

    with pytest.warns(UserWarning, match="checkpoint-replay"):
        ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)


def test_zero_row_maxid_store_treated_as_empty(spark, docs, tmp_path):
    """A maxid/ dir holding only a committed ZERO-ROW parquet part
    (external compaction or a filtered rewrite) records nothing and
    must enforce nothing — the guard treats it like an absent store
    instead of crashing on a None aggregate row."""
    store = str(tmp_path / "store")
    b1, b2, _ = _doc_batches(docs, n=3)
    maxid_dir = os.path.join(store, "maxid")
    os.makedirs(store)
    spark.createDataFrame(
        [],
        "min_id long, max_id long, n_rows long, id_hash long, "
        "text_hash long, fp_scheme string",
    ).write.parquet(maxid_dir)
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    # the high-water mark took effect from that first real append
    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)


def test_old_formula_maxid_vintage_does_not_wedge_replays(
    spark, docs, tmp_path
):
    """A maxid store whose last row carries a text_hash from an OLDER
    digest formula (pre-fp_scheme r11 code hashed the text multiset,
    not the (id, text) pairing) must not wedge a genuine checkpoint
    replay: the content compare applies only when the stored row's
    fp_scheme matches the current one — otherwise the check falls back
    id-keyed, because hard-failing a compare across formulas is
    exactly the restart-crash loop the replay exemption exists to
    prevent."""
    import shutil

    store = str(tmp_path / "store")
    b1, b2, _ = _doc_batches(docs, n=3)
    ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    # simulate the pre-scheme vintage: drop fp_scheme and corrupt
    # text_hash to a value the current formula can never reproduce
    maxid_dir = os.path.join(store, "maxid")
    vintage = [
        (r.min_id, r.max_id, r.n_rows, r.id_hash, r.text_hash ^ 0x5A5A)
        for r in spark.read.parquet(maxid_dir).collect()
    ]
    shutil.rmtree(maxid_dir)
    spark.createDataFrame(
        vintage,
        "min_id long, max_id long, n_rows long, id_hash long, "
        "text_hash long",
    ).write.parquet(maxid_dir)

    # a replay of the last batch is ADMITTED (warned), not raised —
    # and the re-append writes a current-scheme row, so the content
    # check re-arms for the NEXT replay
    with pytest.warns(UserWarning, match="checkpoint-replay"):
        ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    regen = b2.withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(
            regen, store, threshold=THRESHOLD, span_k=SPAN_K
        )


def test_upgraded_legacy_maxid_store_keeps_content_check(
    spark, docs, tmp_path
):
    """A legacy maxid store UPGRADED IN PLACE (pre-r11 4-column files
    plus new 5-column appends in one directory) must still enforce the
    content-digest replay check: plain parquet schema inference reads
    ONE footer — whichever file listing order serves up — and can
    nondeterministically HIDE text_hash (empirically reproduced), so
    the guard reads the store with mergeSchema. After the upgrade
    append, a regenerated last batch (same ids, different text) must
    RAISE while a true replay still warns-and-admits."""
    import shutil

    store = str(tmp_path / "store")
    b1, b2, b3 = _doc_batches(docs, n=3)
    ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    # simulate a pre-r11 store: strip text_hash from every row
    maxid_dir = os.path.join(store, "maxid")
    legacy = spark.read.parquet(maxid_dir).drop("text_hash", "fp_scheme").collect()
    legacy_df = spark.createDataFrame(
        legacy, "min_id long, max_id long, n_rows long, id_hash long"
    )
    shutil.rmtree(maxid_dir)
    legacy_df.write.parquet(maxid_dir)

    # new code appends a 5-column fingerprint file into the 4-column
    # dir — the store is now mixed-schema
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)

    regen = b2.withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(
            regen, store, threshold=THRESHOLD, span_k=SPAN_K
        )
    with pytest.warns(UserWarning, match="checkpoint-replay"):
        ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)


def test_window_index_store_probe_filter_exact(spark, docs, tmp_path):
    """read_window_index_store(probe_hashes=...) — the late-r11
    re-aggregation bound — must return EXACTLY the full index
    restricted to the probe's hashes: the monoid folds per h, so
    dropping never-consulted hashes changes no surviving row (cnt and
    canonical site included, even when a hash's occurrences span
    several stored parts)."""
    store = str(tmp_path / "store")
    b1, b2, b3 = _doc_batches(docs, n=3)
    ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)

    probe = SD.window_index(b3, k=SPAN_K)
    full = read_window_index_store(spark, store)
    filtered = read_window_index_store(spark, store, probe_hashes=probe)

    want = {
        (r.h, r.cnt, r.canon_id, r.canon_pos)
        for r in full.join(
            probe.select("h").distinct(), "h", "leftsemi"
        ).collect()
    }
    got = {
        (r.h, r.cnt, r.canon_id, r.canon_pos) for r in filtered.collect()
    }
    assert got == want
    assert want, "vacuous: no batch-3 window content in the store"
    # metadata (the parameterization guard's substrate) survives
    assert dict(filtered.schema["h"].metadata or {}) == dict(
        full.schema["h"].metadata or {}
    )
    # plan shape: the probe must reach the store as a BROADCAST semi
    # join BELOW the monoid groupBy — that bound is the entire point
    # (a lost hint would silently shuffle the store-sized table again)
    plan = filtered._jdf.queryExecution().sparkPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan
    # the backfill knob (broadcast_probe=False, r12: now reachable
    # from ingest_document_batch/run_curation_stream as
    # broadcast_index_probe) is the same exact restriction — only the
    # join strategy hint differs
    no_bc = read_window_index_store(
        spark, store, probe_hashes=probe, broadcast_probe=False
    )
    got_no_bc = {
        (r.h, r.cnt, r.canon_id, r.canon_pos) for r in no_bc.collect()
    }
    assert got_no_bc == want


def test_compact_curation_store(spark, docs, tmp_path):
    """compact_curation_store (r12): after N ingests the store holds
    one part per batch per subdir; compaction must (a) reduce file
    counts, (b) fold winindex to the merged monoid with field
    metadata intact, (c) change NO observable view (pairs, kept_view,
    window index content), and (d) leave the ordering guard and
    subsequent ingests fully functional — ingest-compact-ingest must
    equal the straight-through run."""
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        compact_curation_store,
    )

    store = str(tmp_path / "store")
    b1, b2, b3 = _doc_batches(docs, n=3)
    ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)

    pre_pairs = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
    pre_keep = {r.doc_id for r in kept_view(spark, store).collect()}
    pre_idx_df = read_window_index_store(spark, store)
    pre_idx = {
        (r.h, r.cnt, r.canon_id, r.canon_pos) for r in pre_idx_df.collect()
    }
    pre_meta = dict(pre_idx_df.schema["h"].metadata or {})
    assert pre_meta, "vacuous: no parameterization metadata to preserve"

    report = compact_curation_store(spark, store)
    assert set(report) == {"docs", "pairs", "bands", "winindex", "maxid"}
    for sub, r in report.items():
        assert r["files_after"] <= r["files_before"], sub
        assert r["files_after"] == 1, sub  # tiny store → one file each

    # observable views unchanged
    assert (
        _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
        == pre_pairs
    )
    assert {r.doc_id for r in kept_view(spark, store).collect()} == pre_keep
    post_idx_df = read_window_index_store(spark, store)
    assert {
        (r.h, r.cnt, r.canon_id, r.canon_pos)
        for r in post_idx_df.collect()
    } == pre_idx
    assert dict(post_idx_df.schema["h"].metadata or {}) == pre_meta

    # the ordering guard survived the maxid rewrite: out-of-order
    # still raises, a replay of the last batch still warns through
    with pytest.raises(ValueError, match="out-of-order ingest"):
        ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    with pytest.warns(UserWarning, match="checkpoint-replay"):
        ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    # the replay warning above re-appended b2's rows (documented
    # at-least-once behavior), so rebuild a clean store for the
    # ingest-compact-ingest parity leg
    import shutil

    shutil.rmtree(store)
    ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    ingest_document_batch(b2, store, threshold=THRESHOLD, span_k=SPAN_K)
    compact_curation_store(spark, store)
    ingest_document_batch(b3, store, threshold=THRESHOLD, span_k=SPAN_K)

    want_pairs = _pair_set(D.minhash_dedup_pairs(docs, threshold=THRESHOLD))
    assert (
        _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
        == want_pairs
    )
    want_keep = {
        r.doc_id
        for r in keep_canonical(
            docs,
            comps=connected_components(
                D.minhash_dedup_pairs(docs, threshold=THRESHOLD),
                rebalance_edges=True,
            ),
        ).collect()
    }
    assert {r.doc_id for r in kept_view(spark, store).collect()} == want_keep


def test_compact_curation_store_embedding_side(spark, tmp_path):
    """The embedding store's subdirs compact through the same entry:
    sem_pairs / assigned / centroids rewritten, views unchanged, and
    a post-compaction ingest still appends correctly."""
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        compact_curation_store,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    resident = emb.filter(F.col("vec_id") < cut)
    batch = emb.filter(F.col("vec_id") >= cut)

    store = str(tmp_path / "emb_store")
    init_embedding_store(resident, store, num_clusters=4)
    ingest_embedding_batch(batch, store, threshold=EMB_THRESHOLD)

    pre_keep = {
        r.vec_id for r in kept_view_embeddings(spark, store).collect()
    }
    report = compact_curation_store(spark, store)
    assert {"assigned", "centroids"} <= set(report)
    assert {
        r.vec_id for r in kept_view_embeddings(spark, store).collect()
    } == pre_keep


def test_compact_curation_store_self_heals_parked_dir(spark, docs, tmp_path):
    """Crash window: between the two swap renames the live subdir is
    absent and the old data sits at <sub>__compact_trash. The next
    call must restore the parked dir before compacting — the store
    is never silently treated as empty."""
    import shutil

    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        compact_curation_store,
    )

    store = str(tmp_path / "store")
    b1, _, _ = _doc_batches(docs, n=3)
    ingest_document_batch(b1, store, threshold=THRESHOLD, span_k=SPAN_K)
    pre = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))

    # simulate the crash: park pairs/, leave no live dir
    os.rename(
        os.path.join(store, "pairs"),
        os.path.join(store, "pairs__compact_trash"),
    )
    report = compact_curation_store(spark, store)
    assert "pairs" in report
    assert (
        _pair_set(spark.read.parquet(os.path.join(store, "pairs"))) == pre
    )
    shutil.rmtree(store)


def test_maybe_store_layouts(spark, docs, tmp_path):
    """_maybe (ADVICE r09): a hive-partitioned store written by an
    external producer (data files one level down) must be READ, and a
    non-hidden subdirectory with no data one level down must RAISE —
    either way, never a silent 'store is empty' verdict that would
    make the next ingest recompute within-batch-only pairs against no
    resident corpus."""
    part_store = tmp_path / "part_store"
    docs.limit(10).withColumn("split", F.lit("train")).write.partitionBy(
        "split"
    ).parquet(str(part_store))
    got = _maybe(spark, str(part_store))
    assert got is not None and got.count() == 10

    weird = tmp_path / "weird_store"
    (weird / "subdir").mkdir(parents=True)
    with pytest.raises(ValueError, match="unrecognized store layout"):
        _maybe(spark, str(weird))


def test_scored_stage_batch_parity(spark, docs, tmp_path):
    """admit_filter (round 10): N daily ingests filtered per batch
    under a FIXED stored reference LM ≡ the one-shot ppl-band filter
    over the union, and every standing parity equality (pair store,
    admitted text, strip) holds over the FILTERED corpus — the
    scored-stage analog of the stored band table, so the composed
    streaming pipeline reuses the standing model per batch instead of
    paying the full-recompute scoring cost (the measured 40-44× sf100
    DSIR/NB incremental story, SCALING.md)."""
    from wroclaw_bike_stats_spark.operators.text import (
        bigram_lm_score,
        train_bigram_lm,
    )
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        make_ppl_band_filter,
    )

    lm = train_bigram_lm(docs.filter(F.col("doc_id") % 7 == 3))
    scored = bigram_lm_score(docs, *lm)
    lo, hi = scored.approxQuantile("ppl", [0.1, 0.9], 0.0)
    flt = make_ppl_band_filter(lm, min_ppl=lo, max_ppl=hi)

    want_union = flt(docs)
    want_ids = {r.doc_id for r in want_union.select("doc_id").collect()}
    assert 0 < len(want_ids) < docs.count(), "vacuous band"

    store = str(tmp_path / "store")
    for b in _doc_batches(docs, n=3):
        ingest_document_batch(
            b, store, threshold=THRESHOLD, span_k=SPAN_K, admit_filter=flt
        )

    admitted = spark.read.parquet(os.path.join(store, "docs"))
    got_text = {r.doc_id: r.text for r in admitted.collect()}
    assert set(got_text) == want_ids

    want_pairs = _pair_set(
        D.minhash_dedup_pairs(want_union, threshold=THRESHOLD)
    )
    assert want_pairs, "vacuous: band stripped every near-dup pair"
    got_pairs = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
    assert got_pairs == want_pairs

    full_strip = {
        r.doc_id: r.text_clean
        for r in SD.strip_duplicate_spans(
            want_union, k=SPAN_K, keep_all=True
        ).collect()
    }
    assert got_text == full_strip


def test_ppl_band_filter_loader_form(spark, docs):
    """make_ppl_band_filter accepts a CALLABLE ``spark -> (uni, bi)``
    in place of the DataFrame pair — the restart-survivable form: the
    loader is invoked on the BATCH's session at (re)build time, so
    after a real session restart the rebuild re-resolves the stored
    model instead of re-collecting DataFrames bound to the dead
    session. Loader form ≡ tuple form, invoked exactly once per
    context, and re-invoked after the memo is invalidated (what an
    applicationId change does)."""
    from wroclaw_bike_stats_spark.operators.text import train_bigram_lm
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        make_ppl_band_filter,
    )

    lm = train_bigram_lm(docs.filter(F.col("doc_id") % 7 == 3))
    from wroclaw_bike_stats_spark.operators.text import bigram_lm_score

    scored = bigram_lm_score(docs, *lm)
    lo, hi = scored.approxQuantile("ppl", [0.1, 0.9], 0.0)

    calls = []

    def loader(sess):
        assert sess is spark
        calls.append(1)
        return lm

    flt_loader = make_ppl_band_filter(loader, min_ppl=lo, max_ppl=hi)
    flt_tuple = make_ppl_band_filter(lm, min_ppl=lo, max_ppl=hi)
    got = {r.doc_id for r in flt_loader(docs).select("doc_id").collect()}
    want = {r.doc_id for r in flt_tuple(docs).select("doc_id").collect()}
    assert 0 < len(want) < docs.count(), "vacuous band"
    assert got == want
    # memoized: a second batch on the same context must not reload
    flt_loader(docs.limit(5)).collect()
    assert len(calls) == 1
    # a context change (applicationId miss) re-resolves through the
    # loader — simulated by clearing the memo the way a restart does
    cell = [
        c for c in flt_loader.__closure__
        if isinstance(c.cell_contents, dict)
    ][0]
    cell.cell_contents.clear()
    flt_loader(docs.limit(5)).collect()
    assert len(calls) == 2


def test_dsir_and_nb_admit_filters_batch_parity(spark, docs, tmp_path):
    """The other two scored-stage filters (DSIR importance threshold,
    NB keep-class admission) under the same fixed-assets contract:
    per-batch admission ≡ one-shot union filtering, and the admitted
    docs/ pair-store parity holds over the filtered corpus."""
    from wroclaw_bike_stats_spark.operators.classifier import nb_train
    from wroclaw_bike_stats_spark.operators.dsir import (
        dsir_logratio,
        dsir_scores,
    )
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        make_dsir_threshold_filter,
        make_nb_class_filter,
    )

    # --- DSIR: admit logw >= corpus median (non-vacuous both ways) --
    model = dsir_logratio(docs.filter(F.col("doc_id") % 9 == 1), docs)
    med = dsir_scores(docs, model).approxQuantile("logw", [0.5], 0.0)[0]
    flt = make_dsir_threshold_filter(model, min_logw=med)
    want_ids = {r.doc_id for r in flt(docs).select("doc_id").collect()}
    assert 0 < len(want_ids) < docs.count(), "vacuous DSIR threshold"

    store = str(tmp_path / "dsir_store")
    for b in _doc_batches(docs, n=3):
        ingest_document_batch(
            b, store, threshold=THRESHOLD, span_k=SPAN_K, admit_filter=flt
        )
    got = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(store, "docs")).collect()
    }
    assert got == want_ids

    # --- NB: admit argmax-class in {en} (the language-keep rule) ----
    full = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    classes = ["de", "en", "es", "fr", "zh"]
    w, p = nb_train(full, classes, label_col="lang")
    nb_flt = make_nb_class_filter(w, p, classes, keep_classes={"en"})
    want_nb = {
        r.doc_id
        for r in nb_flt(full.select("doc_id", "text"))
        .select("doc_id")
        .collect()
    }
    assert 0 < len(want_nb) < full.count(), "vacuous NB keep rule"

    store2 = str(tmp_path / "nb_store")
    for b in _doc_batches(full.select("doc_id", "text"), n=3):
        ingest_document_batch(
            b, store2, threshold=THRESHOLD, span_k=SPAN_K,
            admit_filter=nb_flt,
        )
    got_nb = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(store2, "docs")).collect()
    }
    assert got_nb == want_nb


def test_stream_end_to_end_with_scored_stage(spark, docs, tmp_path):
    """run_curation_stream WITH the scored-stage hook: three daily
    files through the file source + checkpoint, each micro-batch
    ppl-band-filtered against ONE fixed stored LM (the assets
    broadcast once by the filter factory) — the composed streaming
    pipeline reusing a standing model per batch, end to end. Admitted
    store == the one-shot band filter over the union; pair store ==
    the one-shot graph over the FILTERED union."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wroclaw_bike_stats_spark.operators.text import (
        bigram_lm_score,
        train_bigram_lm,
    )
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        make_ppl_band_filter,
    )

    subset = docs.filter(F.col("doc_id") % 2 == 0)
    lm = train_bigram_lm(docs.filter(F.col("doc_id") % 7 == 3))
    lo, hi = bigram_lm_score(subset, *lm).approxQuantile(
        "ppl", [0.1, 0.9], 0.0
    )
    flt = make_ppl_band_filter(lm, min_ppl=lo, max_ppl=hi)
    want_union = flt(subset)
    want_ids = {r.doc_id for r in want_union.select("doc_id").collect()}
    assert 0 < len(want_ids) < subset.count(), "vacuous band"

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    for i, b in enumerate(_doc_batches(subset, n=3)):
        path = str(input_dir / f"{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(b.orderBy("doc_id").toPandas()),
                       path)
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    store = str(tmp_path / "store")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    q = run_curation_stream(
        spark, str(input_dir), store, schema, str(tmp_path / "ckpt"),
        threshold=THRESHOLD, span_k=SPAN_K, admit_filter=flt,
    )
    q.awaitTermination(300)

    got_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(store, "docs")).collect()
    }
    assert got_ids == want_ids
    want_pairs = _pair_set(
        D.minhash_dedup_pairs(want_union, threshold=THRESHOLD)
    )
    got_pairs = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
    assert got_pairs == want_pairs


def test_stream_end_to_end_with_stacked_scored_stages(spark, docs, tmp_path):
    """run_curation_stream with TWO scored stages stacked (r10 verdict
    task 5): the DSIR importance threshold AND the NB keep-class rule
    composed into one admit_filter, driven through the file source +
    checkpoint end to end — the ingest-level combined-filters parity
    (test_dsir_and_nb_admit_filters_batch_parity) lifted through the
    stream runner. Composition of per-doc filters under fixed assets
    is itself per-doc under fixed assets, so per-batch admission of
    the stack ≡ one-shot stacked filtering of the union; admitted
    docs AND pair store must match, and the stack must be strictly
    tighter than either stage alone (non-vacuous stacking)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wroclaw_bike_stats_spark.operators.classifier import nb_train
    from wroclaw_bike_stats_spark.operators.dsir import (
        dsir_logratio,
        dsir_scores,
    )
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        make_dsir_threshold_filter,
        make_nb_class_filter,
    )

    full = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    model = dsir_logratio(full.filter(F.col("doc_id") % 9 == 1), full)
    med = dsir_scores(full, model).approxQuantile("logw", [0.5], 0.0)[0]
    dsir_flt = make_dsir_threshold_filter(model, min_logw=med)
    classes = ["de", "en", "es", "fr", "zh"]
    w, p = nb_train(full, classes, label_col="lang")
    nb_flt = make_nb_class_filter(w, p, classes, keep_classes={"en"})

    def stacked(batch):
        return nb_flt(dsir_flt(batch))

    subset = full.select("doc_id", "text")
    want_union = stacked(subset)
    want_ids = {r.doc_id for r in want_union.select("doc_id").collect()}
    dsir_ids = {r.doc_id for r in dsir_flt(subset).select("doc_id").collect()}
    nb_ids = {r.doc_id for r in nb_flt(subset).select("doc_id").collect()}
    assert want_ids, "vacuous stack: nothing admitted"
    assert want_ids < dsir_ids and want_ids < nb_ids, (
        "stack not strictly tighter than both stages - pick other bounds"
    )

    input_dir = tmp_path / "input"
    input_dir.mkdir()
    for i, b in enumerate(_doc_batches(subset, n=3)):
        path = str(input_dir / f"{i:02d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(b.orderBy("doc_id").toPandas()), path
        )
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    store = str(tmp_path / "store")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    q = run_curation_stream(
        spark, str(input_dir), store, schema, str(tmp_path / "ckpt"),
        threshold=THRESHOLD, span_k=SPAN_K, admit_filter=stacked,
    )
    q.awaitTermination(300)

    got_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(store, "docs")).collect()
    }
    assert got_ids == want_ids
    want_pairs = _pair_set(
        D.minhash_dedup_pairs(want_union, threshold=THRESHOLD)
    )
    got_pairs = _pair_set(spark.read.parquet(os.path.join(store, "pairs")))
    assert got_pairs == want_pairs


def test_runner_auto_compaction_preserves_view(spark, docs, tmp_path):
    """run_curation_stream(compact_max_files=N) — the r13 policy hook:
    a multi-day run whose store crosses the threshold mid-stream must
    (a) actually compact (fewer data files per oversized subdir than
    one-per-batch), and (b) leave kept_view and the pair store
    byte-identical to an uncompacted run of the same drops —
    compaction is maintenance, never semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        maybe_compact_store,
    )

    subset = docs.filter(F.col("doc_id") % 3 == 0)
    batches = _doc_batches(subset, n=4)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def run(tag, compact_max_files):
        input_dir = tmp_path / f"input_{tag}"
        input_dir.mkdir()
        for i, b in enumerate(batches):
            pdf = b.orderBy("doc_id").toPandas()
            path = str(input_dir / f"{i:02d}.parquet")
            pq.write_table(pa.Table.from_pandas(pdf), path)
            os.utime(path, (1_700_000_000 + i * 60,) * 2)
        store = str(tmp_path / f"store_{tag}")
        q = run_curation_stream(
            spark, str(input_dir), store, schema,
            str(tmp_path / f"ckpt_{tag}"),
            threshold=THRESHOLD, span_k=SPAN_K,
            compact_max_files=compact_max_files,
        )
        q.awaitTermination(300)
        return store

    plain = run("plain", None)
    auto = run("auto", 2)  # crosses after batch 3 of 4

    def n_files(store, sub):
        d = os.path.join(store, sub)
        return sum(
            1 for f in os.listdir(d) if not f.startswith(("_", "."))
        )

    # the compacted store holds fewer parts than one-per-batch in at
    # least one accreting subdir (docs/bands get one part per batch)
    assert any(
        n_files(auto, sub) < n_files(plain, sub)
        for sub in ("docs", "bands")
    )
    # semantics identical
    assert {
        (r.doc_id, r.text) for r in kept_view(spark, auto).collect()
    } == {
        (r.doc_id, r.text) for r in kept_view(spark, plain).collect()
    }
    assert _pair_set(
        spark.read.parquet(os.path.join(auto, "pairs"))
    ) == _pair_set(spark.read.parquet(os.path.join(plain, "pairs")))
    # idle threshold check is a no-op (nothing oversized now)
    assert maybe_compact_store(spark, auto, max_files_per_sub=64) is None


def test_maybe_compact_byte_trigger(spark, docs, tmp_path):
    """r14 byte trigger (ADVICE r13: count-only policy let a subdir
    of few near-GB files never compact): a subdir whose average file
    exceeds oversize_factor x target_file_bytes must compact — and
    the rewrite SPLITS it into ~ceil(bytes/target) right-sized
    files — while the same layout under a generous byte target stays
    a no-op."""
    from wroclaw_bike_stats_spark.streaming.curate_stream import (
        maybe_compact_store,
    )

    store = str(tmp_path / "bstore")
    sub = os.path.join(store, "docs")
    docs.limit(500).coalesce(1).write.parquet(sub)  # ONE multi-KB file

    # neither trigger: 1 file < 64, and avg size << 128 MB default
    assert maybe_compact_store(spark, store, max_files_per_sub=64) is None
    # byte trigger: avg file >> 1 KiB * factor -> compact AND split
    rep = maybe_compact_store(
        spark, store, max_files_per_sub=64, target_file_bytes=1024
    )
    assert rep is not None and "docs" in rep
    assert rep["docs"]["files_before"] == 1
    assert rep["docs"]["files_after"] > 1
    # maintenance, never semantics
    assert spark.read.parquet(sub).count() == 500
    # healthy again under a target the split satisfies
    assert (
        maybe_compact_store(
            spark, store, max_files_per_sub=64,
            target_file_bytes=10 * 1024 * 1024,
        )
        is None
    )

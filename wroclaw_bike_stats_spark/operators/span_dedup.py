"""Exact substring-span deduplication — find and remove token spans
that appear more than once ACROSS the corpus, the training-data
cleaning step document-level dedup cannot do (two distinct articles
quoting the same boilerplate paragraph are not near-duplicates of
each other, yet the paragraph still trains the model twice).

Semantics follow the published exact-substring dedup recipe
(Lee et al., "Deduplicating Training Data Makes Language Models
Better", ACL 2022): a length-``k`` token window whose content occurs
at >= 2 sites corpus-wide is a duplicate site; overlapping duplicate
sites merge into maximal spans; removal keeps the globally first
occurrence of each window content and strips the rest. Like the
paper's suffix-array variant, removal is span-wise — overlapping
spans from *different* contents can cover a canonical site's tokens,
so "at least one copy survives" holds per window content only up to
such overlaps (documented there too, §4.1). Detection and removal are
split into separate operators because real pipelines often only
*measure* duplication (``duplicate_span_stats`` — RefinedWeb/Dolma
style dup-fraction thresholds) before deciding to cut.

This engine expresses the whole family relationally instead of with
the paper's monolithic suffix array (which needs the corpus
concatenated in one address space — a non-starter at 100 TB):

- **Site table**: one narrow projection emits ``(doc, pos,
  xxhash64(window))`` per token position — JVM-side ``transform`` +
  ``slice`` inside whole-stage codegen, no Python. Volume is one row
  per corpus token: linear, the same class as the dedup family's
  shingle index (dedup.py). 64-bit hashing stands in for window
  content with the module-standard collision tolerance
  (P ≈ d²/2⁶⁵ over d distinct windows — the false-positive rate at
  5 B windows is ~1e-3 and a collision costs one stripped span, not
  a wrong join).
- **Duplicate windows**: ONE shuffle — ``groupBy(hash)`` with
  map-side partial counts — yields occurrence count and the
  canonical (min ``(doc, pos)``) site per content. Windows with
  count >= 2 are typically a small fraction of the corpus, so the
  join marking duplicate sites broadcasts under AQE when it can and
  degrades to a keyed shuffle when duplication is heavy — never
  all-pairs.
- **Span merge**: sites sorted per doc; because all windows share
  length ``k``, coverage ends are monotone in position and the
  classic gaps-and-islands break (``pos > lag(pos) + k``) merges
  overlapping/adjacent sites exactly. One shuffle keyed by doc.
- **Strip**: spans collect per doc (bounded by doc length / k) and
  the cleaned text is rebuilt with ``filter``/``array_join`` over
  the token array — map-side, codegen'd, no Python.

Total: two keyed shuffles of linear volume + narrow maps. No
suffix array, no global sort, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _site_table(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(``_id``, ``pos``, ``h``) — one row per length-``k`` token
    window start position; ``h`` is the 64-bit window hash. Docs
    shorter than ``k`` tokens emit nothing (they have no length-k
    span to deduplicate — whole-doc dedup is ``dedup_exact``'s job).
    Narrow: generate + hash inside codegen, no shuffle."""
    from wroclaw_bike_stats_spark.operators.text import tokens

    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(
        F.col(id_col).alias("_id"), toks.alias("_toks")
    ).filter(F.size("_toks") >= k)
    # Tokens come from a whitespace split, so a single-space join is
    # injective — window string equality == token-sequence equality.
    return base.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - k),
                lambda p: F.xxhash64(F.array_join(F.slice("_toks", p + 1, k), " ")),
            )
        ).alias("pos", "h"),
    )


def _merge_spans(sites: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of duplicate sites into maximal spans:
    (``_id``, ``span_start``, ``span_end``, ``n_sites``) with
    ``span_end`` exclusive. Correct because every site covers exactly
    ``[pos, pos+k)``: with positions sorted, the running coverage end
    is ``lag(pos)+k`` (monotone), so a new span starts exactly when
    ``pos > lag(pos) + k``. One shuffle keyed by doc."""
    w = Window.partitionBy("_id").orderBy("pos")
    return (
        sites.withColumn(
            "_brk",
            F.when(F.col("pos") > F.lag("pos").over(w) + k, 1).otherwise(0),
        )
        .withColumn("_isl", F.sum("_brk").over(w))
        .groupBy("_id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_sites"),
        )
        .drop("_isl")
    )


def _dup_sites(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """(all duplicate sites, removable duplicate sites): sites whose
    window content occurs >= 2 times corpus-wide; removable drops the
    canonical (globally min ``(doc, pos)``) occurrence per content.

    Shape: ONE shuffle of the site table keyed by window hash, with
    occurrence count and canonical site computed as unordered window
    functions in a single WindowExec pass — not groupBy + join-back,
    which would shuffle by ``h`` twice AND recompute the (O(n·k)
    hashing) site projection for each consumer. Per-``h`` groups are
    tiny (a handful of occurrences), so the window buffers nothing
    of consequence."""
    sites = _site_table(df, text_col, id_col, k)
    w = Window.partitionBy("h")
    marked = (
        sites.withColumn("_cnt", F.count(F.lit(1)).over(w))
        .withColumn("_canon", F.min(F.struct("_id", "pos")).over(w))
        .filter(F.col("_cnt") >= 2)
    )
    removable = marked.filter(
        (F.col("_id") != F.col("_canon._id"))
        | (F.col("pos") != F.col("_canon.pos"))
    )
    return marked, removable


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
) -> DataFrame:
    """Detect corpus-duplicated token spans: every maximal span of
    positions covered by length-``k`` windows whose content occurs at
    >= 2 sites corpus-wide (both occurrences count — detection marks
    ALL copies; ``strip_duplicate_spans`` is where the first
    occurrence is spared). Returns (``id_col``, ``span_start``,
    ``span_end``, ``n_sites``) with token-index spans, ``span_end``
    exclusive, ``n_sites`` = merged window count.

    ``k`` defaults to 13 to match ``decontaminate_ngram``'s collision
    rule; Lee et al. use 50 BPE tokens — pass what your tokenizer
    budget means. See the module docstring for the scale shape."""
    marked, _ = _dup_sites(df, text_col, id_col, k)
    return _merge_spans(marked.select("_id", "pos"), k).select(
        F.col("_id").alias(id_col), "span_start", "span_end", "n_sites"
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
) -> DataFrame:
    """Per-document duplication measurement: (``id_col``,
    ``n_tokens``, ``dup_tokens``, ``dup_frac``) where ``dup_tokens``
    counts token positions covered by at least one corpus-duplicated
    window (all occurrences, as in ``duplicate_spans``) and
    ``dup_frac`` = dup_tokens / n_tokens. Every input doc gets a row
    (zero coverage when nothing is duplicated or the doc is shorter
    than ``k``) — this is the filter signal pipelines threshold on
    (e.g. drop docs with dup_frac > 0.5) before committing to
    span-level surgery."""
    from wroclaw_bike_stats_spark.operators.text import tokens

    marked, _ = _dup_sites(df, text_col, id_col, k)
    cov = (
        _merge_spans(marked.select("_id", "pos"), k)
        .groupBy("_id")
        .agg(F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"))
    )
    n_toks = F.size(tokens(F.coalesce(F.col(text_col), F.lit(""))))
    return (
        df.select(F.col(id_col), n_toks.alias("n_tokens"))
        .join(cov.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1))
            ).alias("dup_frac"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
) -> DataFrame:
    """Remove duplicated spans, keeping the globally first occurrence
    of each window content (canonical = min ``(doc, pos)`` — stable
    across reruns and partitionings). Returns one row per input doc:
    (``id_col``, ``text_clean``, ``n_removed``) where ``text_clean``
    is the doc's tokens minus positions covered by any removable
    (duplicated, non-canonical) window, re-joined with single spaces,
    and ``n_removed`` counts stripped tokens.

    Whitespace is normalized by the rebuild (tokenizer round-trip);
    docs with nothing to strip keep all tokens. The canonical-copy
    guarantee is per window content and can be eroded by overlapping
    spans of *other* contents — the same caveat as Lee et al. §4.1.
    Rebuild is map-side (``filter`` over the token array against the
    doc's own collected span list, bounded by len/k spans)."""
    from wroclaw_bike_stats_spark.operators.text import tokens

    _, removable = _dup_sites(df, text_col, id_col, k)
    spans = (
        _merge_spans(removable.select("_id", "pos"), k)
        .groupBy("_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
        )
    )
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    spans_arr = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            spans_arr,
            lambda s: (s["span_start"] <= i) & (i < s["span_end"]),
        ),
    )
    return (
        df.join(spans.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.array_join(kept, " ").alias("text_clean"),
            (F.size(toks) - F.size(kept)).alias("n_removed"),
        )
    )

"""End-to-end corpus curation plan — the composition a training-data
team actually runs: decontaminate → quality/repetition filter → exact
dedup → split assignment, as ONE lazy DataFrame plan.

Each stage is an operator that already has its own oracle-backed gate
(operators/pipeline.py, operators/text.py, operators/dedup.py); this
module proves they COMPOSE without materialization barriers: the whole
chain is a single logical plan Catalyst optimizes end to end (filter
pushdown through the dedup window, one scan of the corpus for the
narrow stages).

Scale notes:
- Narrow stages first (quality predicates, PII scrub) so the dedup
  shuffle and the repetition-stats aggregation see only survivors.
- The repetition filter is a self-join on doc_id (explode + agg side
  is |survivor-grams|); at 100 TB prefer running it as a pre-pass that
  writes a doc_id blocklist if gram cardinality dominates.
- Exact dedup keeps the smallest doc_id per content fingerprint
  (deterministic first-writer, same rule as operators/upsert.py).
- Split assignment is map-side hash arithmetic — auditable forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import pipeline as P
from wroclaw_bike_stats_spark.operators import text as T


def curate_corpus(
    docs: DataFrame,
    eval_set: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_dup_word_frac: float = 0.9,
    max_top2gram_frac: float = 0.5,
    rep_impl: str = "auto",
    repetition_rules: dict | None = None,
    gopher_bounds: dict | None = None,
    decontam_mode: str = "exact",
    decontam_n: int = 5,
    fuzzy_threshold: float = 0.5,
    lm: "tuple[DataFrame, DataFrame] | None" = None,
    max_ppl: float | None = None,
    min_ppl: float | None = None,
    lm_impl: str = "auto",
    lm_broadcast_model: bool = True,
    lm_assets=None,
    ppl_precomputed: str | None = None,
    strip_spans: bool = False,
    span_k: int = 13,
    span_method: str = "window",
    span_site_route: str = "arrow",
    fuse_quality: bool = True,
    scrub: bool = True,
    train_pct: int = 80,
    val_pct: int = 10,
    persist_stages: bool = False,
) -> DataFrame:
    """Return the curated corpus: surviving rows with ``text``
    (PII-scrubbed when ``scrub``) plus ``split``. Deterministic —
    reruns produce identical rows.

    Optional model/surgery stages (the span strip is lazy; the ppl
    stage is lazy under ``lm_impl="native"`` and EAGER under the
    default ``"auto"`` — see the ``lm_impl`` paragraph below):

    - ``lm`` = the ``(unigrams, bigrams)`` count tables from
      ``text.train_bigram_lm`` enables a CCNet-style perplexity BAND
      filter after the repetition stage: docs whose ``ppl`` under the
      reference model falls outside [``min_ppl``, ``max_ppl``] are
      dropped (either bound may be None = unbounded; docs with <2
      tokens have no signal and pass). The model joins broadcast —
      for a corpus-trained model pass count tables you have already
      thinned, or score standalone with ``broadcast_model=False``.
      NOTE: like the strip, this stage scores ``out`` and joins the
      result back onto ``out``, so without ``persist_stages`` the
      whole upstream subplan is referenced twice per action.
      ``lm_impl`` routes the scorer (round 10, the Gopher
      ``impl="auto"`` precedent): the default ``"auto"`` resolves to
      the ONE-pass Arrow scorer (measured 1.4× over the native join
      route at sf100; byte-parity pinned incl. decimal-tie rounding —
      see ``text.bigram_lm_score_arrow``'s ASCII-whitespace caveat),
      which — like ``decontam_mode="bloom"`` — is this plan's OTHER
      documented exception to zero-jobs-until-action: it collects the
      (reference-sized, typically thinned) MODEL tables at
      plan-construction time. The corpus is never collected. Pin
      ``lm_impl="native"`` for the fully-lazy oracle-shape plan.
      ``lm_broadcast_model`` declares the MODEL REGIME and is passed
      straight through to ``text.bigram_lm_score``: the default True
      asserts the count tables fit one heap (reference-sized or
      thinned — the regime where auto→arrow is safe); pass False for
      a corpus-scale/untrimmed model and auto resolves to the
      fully-lazy native route instead (no collect, AQE-planned
      shuffle joins), while an explicit ``lm_impl="arrow"`` pin
      raises the scorer's corpus-scale ValueError rather than
      risking a driver OOM.
      ``lm_assets`` (``text.collect_lm_assets``) skips even that
      collect when the caller already holds the broadcast model —
      e.g. scale_bench's realppl row scores once for its quantile
      band and again in this stage, against ONE set of assets.
    - ``strip_spans`` runs exact substring-span dedup
      (operators/span_dedup.py, Lee et al. 2022) over the
      exact-dedup survivors, replacing ``text_col`` with the
      stripped rebuild. NOTE: the rebuild is a tokenizer round-trip,
      so ALL surviving docs get whitespace normalized, and the strip
      references the survivor plan twice (site generation + rebuild
      join).

    ``rep_impl`` (r11) routes the repetition stage: the default
    ``"auto"``→``"arrow"`` computes the top-2-gram share as a
    per-row Arrow column (``text.repetition_2gram_struct`` — no
    shuffle, no join-back, byte-parity with native pinned in tests);
    ``"native"`` keeps the oracle-shape explode+agg+join branch.

    ``repetition_rules`` (r12, default None = stage off, preserving
    every existing gate's output): kwargs for
    ``text.gopher_repetition_filter`` — the COMPLETE Gopher
    repetition rule set (duplicate line/paragraph fractions + char
    fractions, top-{2,3,4}-gram shares, duplicate-n-gram char
    fractions) as one more narrow filter after the top-2-gram
    stage. Pass ``{}`` for the paper's default thresholds, or e.g.
    ``{"impl": "arrow", "min_parallelism": 64}`` for the
    low-row-group-input escape (see the operator's docstring).

    ``ppl_precomputed`` (r13) names an EXISTING ppl column on
    ``docs`` to band-filter on instead of scoring inside the plan —
    the score-once shape for callers that already paid a full-corpus
    scoring pass for the band endpoints (CCNet computes its terciles
    and its filter from ONE scored frame). Mutually exclusive in
    effect with ``lm`` (takes precedence when both are set).

    ``span_site_route`` (r13) picks the strip's site-table generator:
    the default ``"arrow"`` is the vectorized
    ``span_dedup._site_table_arrow`` (equal output; the native
    interpreted window-string build measured as ~75% of strip cost);
    pass ``"native"`` for the oracle-differential plan shape.

    ``fuse_quality`` (r13, default True): when the Gopher stage
    resolves to its arrow route AND the repetition stage is on its
    arrow/auto route, both per-row predicates run as ONE Arrow pass
    (``text.fused_gopher_rep_filter``) instead of two — a conjunction
    of per-row filters has the same keep-set either way, but the
    sequential form pays one Arrow serialization + tokenization of
    the surviving corpus per stage (the sf100s stage split's
    dominant term). ``False`` restores the two-stage plan shape
    (byte-parity pinned in tests).

    ``persist_stages`` is the composed-pipeline scale switch: the
    self-referencing stages (the ``rep_impl="native"`` repetition
    branch, ppl band, span strip) each derive a signal frame FROM
    the survivor plan and join it BACK onto the survivor plan, so
    the fully-lazy composition re-reads the progressively filtered
    corpus once per self-referencing branch (~5 scans per action
    with everything enabled). With ``persist_stages=True`` the
    survivor frame is scratch-persisted (operators/scratch.py,
    MEMORY_AND_DISK, lazy — no job until the first action) immediately
    before each self-join branch, so each stage costs ONE corpus scan
    plus cache reads. This is what a production 100 TB run wants;
    call ``operators.scratch.release()`` when done with the output
    (the bench harness does). Default False keeps the single
    fully-lazy plan — correct, zero cache footprint, and what the
    SQL-oracle differential checks."""
    if persist_stages:
        from wroclaw_bike_stats_spark.operators import scratch
    # r15 (revised): NO parallelism fan-out at the plan head. A
    # round-robin exchange here was measured 2.7× SLOWER end-to-end
    # for the composed plan (curate_pipeline_full 4.3 → 11.6 s at the
    # bench sf, same host A/B) — the exchange feeds every downstream
    # reference of the survivor chain and inflates the Arrow-stage
    # CPU far past the single-task cost it was meant to hide, while
    # the rep-rules variant gained only ~1.2 s. Callers that need
    # per-stage parallelism on a single-file corpus have the
    # stage-level knobs (gopher_repetition_filter's min_parallelism,
    # the span family's fan-out) whose wins ARE measured.
    out = docs
    if eval_set is not None:
        # broadcast pinned, not auto: auto mode counts the exclusion
        # set eagerly to pick a route, which would break this plan's
        # no-jobs-until-action contract. Curation decontaminates
        # against an EVAL set (thousands of rows) — always broadcast.
        #
        # decontam_mode picks the rule (all stay lazy except bloom):
        #   "exact"  — identical normalized text (the default);
        #   "ngram"  — ANY shared word n-gram (strictest);
        #   "fuzzy"  — n-gram Jaccard ≥ fuzzy_threshold (near-dup);
        #   "bloom"  — ngram semantics via the Bloom prefilter; the
        #              bitset build RUNS JOBS at plan-construction
        #              time (a standing asset — at scale build it once
        #              outside the plan and prefilter explicitly).
        if decontam_mode == "exact":
            out = P.decontaminate(
                out, eval_set, text_col=text_col, broadcast=True
            )
        elif decontam_mode == "ngram":
            out = P.decontaminate_ngram(
                out, eval_set, text_col=text_col, id_col=id_col,
                n=decontam_n, broadcast=True,
            )
        elif decontam_mode == "fuzzy":
            out = P.decontaminate_fuzzy(
                out, eval_set, text_col=text_col, id_col=id_col,
                n=decontam_n, threshold=fuzzy_threshold,
            )
        elif decontam_mode == "bloom":
            out = P.decontaminate_ngram_bloom(
                out, eval_set, text_col=text_col, id_col=id_col,
                n=decontam_n,
            )
        else:
            raise ValueError(f"unknown decontam_mode {decontam_mode!r}")

    # narrow quality predicates (no shuffle)
    n_tok = T.token_count_ws(F.col(text_col))
    out = out.filter(
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & (T.dup_word_frac(F.col(text_col)) <= max_dup_word_frac)
    )

    # optional Gopher rule conjunction (Rae et al. 2021 §A1.1) — a
    # narrow per-row filter either way; impl="auto" routes token-level
    # HOF rules through the Arrow pass (measured 3.4× at sf100,
    # pick_gopher_impl) unless the caller pins an impl.
    # r13 FUSION: when the Gopher stage resolves to arrow AND the
    # repetition stage is on its arrow/auto route, both predicates
    # run in ONE Arrow pass (fused_gopher_rep_filter) — sequential
    # composition paid one Arrow serialization + one tokenization of
    # the surviving corpus per stage (the sf100s realppl stage split:
    # the stacked per-row passes were the dominant 307 s term). Same
    # keep-set (a conjunction of per-row predicates), pinned in tests.
    _fused_rep = False
    if gopher_bounds is not None:
        gb = dict(gopher_bounds)
        g_impl = gb.pop("impl", "auto")
        if g_impl == "auto":
            g_impl = T.pick_gopher_impl(
                gb.get("min_mean_word_len", 3.0),
                gb.get("max_mean_word_len", 10.0),
                gb.get("min_alpha_word_frac", 0.8),
                gb.get("min_stopwords", 2),
            )
        if fuse_quality and g_impl == "arrow" and rep_impl in (
            "auto", "arrow"
        ):
            out = T.fused_gopher_rep_filter(
                out, text_col=text_col, gopher_kwargs=gb,
                max_top2gram_frac=max_top2gram_frac,
            )
            _fused_rep = True
        else:
            out = T.gopher_quality_filter(
                out, text_col=text_col, impl=g_impl, **gb
            )

    # repetition filter: top-2-gram share. rep_impl routes it (r11,
    # the gopher/LM impl precedent):
    #   "auto"/"arrow" — repetition_2gram_struct: the share is a
    #     per-row Arrow COLUMN, so the stage is a plain filter — no
    #     shuffle, no join-back, no self-referencing branch (and thus
    #     no persist needed here even at scale);
    #   "native" — the oracle-shape explode+agg frame joined back
    #     onto the survivors (the original self-referencing branch —
    #     persist the survivor frame first at scale).
    if _fused_rep:
        pass  # already applied inside the fused pass above
    elif rep_impl in ("auto", "arrow"):
        st = T.repetition_2gram_struct(F.col(text_col))
        out = (
            out.withColumn("_rep", st)
            .filter(
                (F.col("_rep.total_2grams") <= 0)
                | (
                    F.col("_rep.top2_count") / F.col("_rep.total_2grams")
                    <= max_top2gram_frac
                )
            )
            .drop("_rep")
        )
    elif rep_impl == "native":
        if persist_stages:
            out = scratch.persist(out)
        rep = T.repetition_stats(
            # the caller chose rep_impl="native" — pin it through
            # (the library default flipped to auto→arrow in r14)
            out, text_col=text_col, id_col=id_col, impl="native"
        ).select(
            id_col,
            F.when(
                F.col("total_2grams") > 0,
                F.col("top2_count") / F.col("total_2grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("_top2_frac"),
        )
        out = (
            out.join(rep, id_col, "left")
            .filter(
                F.coalesce(F.col("_top2_frac"), F.lit(0.0))
                <= max_top2gram_frac
            )
            .drop("_top2_frac")
        )
    else:
        raise ValueError(f"unknown rep_impl {rep_impl!r}")

    # r12: the complete Gopher repetition rule set as one more
    # narrow per-row filter (no join-back in either impl) — off by
    # default so every existing gate's output is unchanged
    if repetition_rules is not None:
        out = T.gopher_repetition_filter(
            out, text_col=text_col, **repetition_rules
        )

    # perplexity band under the reference bigram LM (CCNet keeps a
    # band of exactly this signal). lm_impl="auto" resolves to the
    # Arrow one-pass scorer — model tables collected at construction
    # (the documented eager exception); "native" keeps the fully-lazy
    # broadcast-join plan with the vocab as a lazy 1-row aggregate.
    if ppl_precomputed is not None and (
        max_ppl is not None or min_ppl is not None
    ):
        # score-ONCE reuse (r13): the caller already carries a ppl
        # column on the input frame (CCNet's real shape — one scoring
        # pass feeds both the band-endpoint quantiles and the band
        # filter; scale_bench's realppl row scores 500k..5M docs once
        # instead of full-corpus-for-band + survivors-again). Values
        # are per-row constants, so filtering the carried column is
        # byte-equal to re-scoring the survivors (pinned in tests).
        out = T.apply_ppl_band(
            out, F.col(ppl_precomputed), min_ppl, max_ppl
        )
    elif lm is not None and (max_ppl is not None or min_ppl is not None):
        uni, bi = lm
        resolved = lm_impl
        if resolved == "auto":
            resolved = T.pick_lm_impl(lm_broadcast_model)
        if resolved == "arrow":
            if not lm_broadcast_model:
                # same guard text as text.bigram_lm_score's arrow
                # route — the column route collects the model too
                raise ValueError(
                    "impl='arrow' collects the model to the driver - "
                    "incompatible with broadcast_model=False "
                    "(corpus-scale model); use the native route"
                )
            # r11: ppl as a per-row COLUMN (bigram_lm_ppl_column —
            # same _score_text_batch core as the arrow frame route),
            # so the band is a plain in-place filter: no join back
            # onto the corpus, no self-referencing branch, no persist
            # needed here. Model collect at plan construction stays
            # the documented eager exception.
            ppl_col = T.bigram_lm_ppl_column(
                F.col(text_col), uni, bi,
                spark=docs.sparkSession, model_assets=lm_assets,
            )
            # shared band rule (T.apply_ppl_band) — the streaming
            # make_ppl_band_filter applies the SAME helper, so the
            # batch/stream parity contract has one implementation
            out = T.apply_ppl_band(out, ppl_col, min_ppl, max_ppl)
        else:
            # native (oracle-shape) route: score `out`, join back —
            # a self-referencing branch; persist the survivors first
            # at scale.
            if persist_stages:
                out = scratch.persist(out)
            ppl = T.bigram_lm_score(
                out, uni, bi, text_col=text_col, id_col=id_col,
                impl=resolved, broadcast_model=lm_broadcast_model,
                model_assets=lm_assets,
            ).select(id_col, "ppl")
            band = F.lit(True)
            if max_ppl is not None:
                band = band & (F.col("ppl") <= max_ppl)
            if min_ppl is not None:
                band = band & (F.col("ppl") >= min_ppl)
            out = (
                out.join(ppl, id_col, "left")
                .filter(F.col("ppl").isNull() | band)
                .drop("ppl")
            )

    # exact dedup: keep the smallest id per normalized-content
    # fingerprint (one shuffle on the fingerprint)
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    out = (
        out.withColumn("_fp", T.fingerprint_md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )

    # span-level surgery AFTER whole-doc dedup: exact copies are
    # already gone cheaply, so the window shuffle sees only survivors
    # and the keep-first (min (doc, pos)) canonical matches the
    # dedup's keep-min-id rule
    if strip_spans:
        from wroclaw_bike_stats_spark.operators.span_dedup import (
            strip_duplicate_spans,
        )

        # Self-referencing branch ×2 (site generation + rebuild join).
        if persist_stages:
            out = scratch.persist(out)
        out = (
            strip_duplicate_spans(
                out,
                text_col=text_col,
                id_col=id_col,
                k=span_k,
                method=span_method,
                keep_all=True,
                # arrow by default (r13): the strip runs on survivors
                # of THIS plan — all sites from one pass, no stored
                # index in play — and the native site table's
                # interpreted window-string build was measured as
                # ~75% of the whole strip (36.9 of 48.3 s at the
                # 500k-doc salt point). Pin "native" for the
                # oracle-differential plan shape.
                site_route=span_site_route,
            )
            .withColumn(text_col, F.col("text_clean"))
            .drop("text_clean", "n_removed")
        )

    if scrub:
        out = out.withColumn(text_col, P.scrub_pii(F.col(text_col)))

    return P.hash_split_assign(
        out, id_col=id_col, train_pct=train_pct, val_pct=val_pct
    )


def curation_report(curated: DataFrame, docs: DataFrame) -> dict:
    """Small summary (one aggregation each side): input/output rows and
    per-split counts. Collects only the tiny aggregate."""
    n_in = docs.count()
    per_split = {
        r["split"]: r["n"]
        for r in curated.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        "rows_in": n_in,
        "rows_out": sum(per_split.values()),
        "splits": dict(sorted(per_split.items())),
    }


def write_curated(curated: DataFrame, out_dir: str) -> None:
    """Materialize partitioned by split — training readers scan only
    their split's partition."""
    curated.write.mode("overwrite").partitionBy("split").parquet(out_dir)

"""Benchmark decontamination and repeated-substring detection over the
``documents`` corpus — the two n-gram-span operators an LLM training
pipeline runs between near-dup removal (plans/dedup.py) and curation
(plans/curation.py).

Both operators work on 8-token spans (the "contaminated if it shares a
13-gram with the eval set" family of rules from the PaLM/GPT-3 data
cards, scaled to this fixture's ~30-token documents). Span extraction
is the same distinct-shingle builder the dedup operators use
(functions/text.py), so span semantics are identical across the
pipeline. The reference has no text pipeline; its nearest analog is
the broadcast query-set match (A5, src/prediction_producer.py:112-135)
— here the "query set" is the eval corpus's span set.

Scale notes inline per operator; the short version: the eval-span side
of decontamination is a *benchmark* (fixed, KB-MB scale) and is the
one corpus-independent structure in this file — broadcasting it is
correct at any corpus size, unlike the corpus-derived vocabulary the
r05 verdict flagged in tfidf_top_terms. The substring-span detector
shuffles (lang, span) once and everything downstream reuses that
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.hashing import hex32_duck, hex32_spark
from ..functions.text import shingles_duck, shingles_spark, tokens_spark
from ..functions.vector import cosine_duck, cosine_spark, dot_spark, l2_spark
from ..sources import load_table
from .dedup import _COSINE_NEARDUP, _DRIFT_DUCK, _EMB_COPY_OFFSET, _emb_corpus
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _spread(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition to defaultParallelism before CPU-heavy narrow work
    (8-token shingling + per-shingle md5): the local fixture scans as
    ONE parquet split, which would serialize span extraction on a
    single core, and AQE's byte-based coalescer would undo an
    uncounted repartition (tiny bytes, huge per-row CPU). Same
    rationale as plans/dedup.py::_spread; at 100 TB the scan has
    thousands of natural splits and this exchange is noise."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys)


# ------------------------------------------------------ decontamination

# Deterministic eval-set membership: ~2% of documents, routed by
# content hash exactly like split_train_val_test routes splits — the
# eval set must be reconstructible by any engine at any scale.
_EVAL_MOD = 50
_SPAN_N = 8

_EVAL_KEY_DUCK = "'eval:' || CAST(doc_id AS VARCHAR)"
_IS_EVAL_DUCK = f"{hex32_duck(_EVAL_KEY_DUCK)} % {_EVAL_MOD} = 0"


def _is_eval_spark() -> Column:
    key = F.concat(F.lit("eval:"), F.col("doc_id").cast("string"))
    return (hex32_spark(key) % _EVAL_MOD) == 0


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH spans AS (
        SELECT doc_id, lang, source,
               {shingles_duck('text', _SPAN_N)} AS sp,
               {_IS_EVAL_DUCK} AS is_eval
        FROM documents
    ),
    eval_spans AS (
        SELECT DISTINCT unnest(sp) AS span FROM spans WHERE is_eval
    ),
    corpus AS (
        SELECT doc_id, lang, source,
               CAST(len(sp) AS INT) AS n_spans,
               unnest(sp) AS span
        FROM spans WHERE NOT is_eval
    )
    SELECT c.doc_id, c.lang, c.source, c.n_spans,
           count(*) AS n_overlap_spans
    FROM corpus c JOIN eval_spans e USING (span)
    GROUP BY c.doc_id, c.lang, c.source, c.n_spans
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one 8-token span with the (hash-routed, ~2%) eval slice,
    with the overlapping-span count per flagged doc. This is the
    standard n-gram-collision decontamination rule (a training doc
    that can leak an eval answer shares a long verbatim span with it);
    dropping the flagged doc_ids is an anti-join on this result.

    Scale shape: the eval side is a fixed benchmark — its distinct
    span set is KBs-to-MBs no matter how big the training corpus gets,
    so ``F.broadcast`` on it is correct BY CONSTRUCTION (corpus-
    independent), not a size guess: the corpus side then never
    shuffles — span explode, broadcast-hash semi-match, and the
    per-doc count's partial aggregation all fuse into the scan stage,
    and the only exchange is on doc_id for the final count merge.
    """
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    spans = d.select(
        "doc_id",
        "lang",
        "source",
        shingles_spark(F.col("text"), _SPAN_N).alias("sp"),
        _is_eval_spark().alias("is_eval"),
    )
    # explode_OUTER + post-filter, not plain explode: Catalyst's
    # InferFiltersFromGenerate would add `size(sp)>0 AND isnotnull(sp)`
    # below a non-outer explode and push it through the repartition
    # exchange into the scan — re-evaluating the full shingling
    # expression on the single input split (measured: 3.4x this
    # query's cost serialized on one core). The outer generate is
    # exempt from that rule; the explicit isnotnull(span) filter
    # references the GENERATED column, which cannot be pushed below
    # the Generate, so shingling stays above the exchange, parallel.
    eval_spans = (
        spans.filter("is_eval")
        .select(F.explode_outer("sp").alias("span"))
        .filter(F.col("span").isNotNull())
        .distinct()
    )
    corpus = spans.filter(~F.col("is_eval")).select(
        "doc_id",
        "lang",
        "source",
        F.size("sp").alias("n_spans"),
        F.explode_outer("sp").alias("span"),
    ).filter(F.col("span").isNotNull())
    return (
        corpus.join(F.broadcast(eval_spans), "span")
        .groupBy("doc_id", "lang", "source", "n_spans")
        .agg(F.count("*").alias("n_overlap_spans"))
    )


# ------------------------------------------------- repeated substrings

@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH sp AS (
        SELECT doc_id, lang, unnest({shingles_duck('text', _SPAN_N)}) AS span
        FROM documents
    ),
    wd AS (
        SELECT doc_id, lang, span,
               count(*) OVER (PARTITION BY lang, span) AS df
        FROM sp
    )
    SELECT lang,
           CAST(count(DISTINCT span) AS BIGINT) AS n_dup_spans,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_affected_docs,
           CAST(max(df) AS BIGINT) AS max_df,
           CAST(count(*) AS BIGINT) AS total_occurrences
    FROM wd WHERE df >= 2
    GROUP BY lang
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring detection (the span-level view behind
    suffix-array training-data dedup): an 8-token span is "duplicated"
    when >= 2 documents of the same language contain it; per language,
    report how many distinct spans are duplicated, how many documents
    they touch, the hottest span's document frequency, and the total
    removable occurrences. This is the measurement pass of
    cut-the-repeated-span dedup — the numbers ARE the dedup plan
    (what fraction of the corpus is verbatim-repeated text).

    Scale shape: spans are distinct per document (the shingle builder
    dedups), so the window count over (lang, span) is each span's
    document frequency — one exchange on (lang, span), in-partition
    count, no join. The final per-lang rollup's two count-distincts
    expand rows 2x but only over the df >= 2 survivors, which is the
    duplicated tail, not the corpus. A df cap is deliberately NOT
    applied here (contrast dedup_ngram_jaccard): no pair list is ever
    emitted — per-span cost is O(df), not O(df^2) — so stop-spans are
    merely hot keys, handled by AQE skew splitting, not a blowup.
    """
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    # explode_outer + isnotnull: see decontaminate_ngram_overlap — keeps
    # the inferred size/notnull constraint (and with it the whole
    # shingle expression) from being pushed below the spread exchange
    sp = d.select(
        "doc_id",
        "lang",
        F.explode_outer(shingles_spark(F.col("text"), _SPAN_N)).alias("span"),
    ).filter(F.col("span").isNotNull())
    df_win = F.count("*").over(W.partitionBy("lang", "span"))
    dup = sp.withColumn("df", df_win).filter(F.col("df") >= 2)
    return dup.groupBy("lang").agg(
        F.countDistinct("span").alias("n_dup_spans"),
        F.countDistinct("doc_id").alias("n_affected_docs"),
        F.max("df").alias("max_df"),
        F.count("*").alias("total_occurrences"),
    )


# --------------------------------------- source-overlap forensics

_OVL_DF_CAP = 64


@query(
    "decontam_source_overlap_matrix",
    oracle=f"""
    WITH ds AS (
        SELECT DISTINCT source, unnest({shingles_duck('text', _SPAN_N)}) AS span
        FROM documents
    ),
    grp AS (
        SELECT span, list_sort(list(source)) AS ss
        FROM ds GROUP BY span
        HAVING len(list(source)) BETWEEN 2 AND {_OVL_DF_CAP}
    ),
    pairs AS (
        SELECT a.a AS src_a, b.b AS src_b
        FROM grp, unnest(ss) AS a(a), unnest(ss) AS b(b)
        WHERE a.a < b.b
    )
    SELECT src_a, src_b, count(*) AS n_shared_spans
    FROM pairs GROUP BY src_a, src_b
    """,
)
def decontam_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination forensics: for every pair of corpus
    sources, how many distinct 8-token spans they share — the matrix
    that tells a curation team which crawls/mirrors duplicate each
    other before any pairwise doc dedup runs (the source-level view
    of dedup_substring_spans' per-language census).

    Join-free inverted-index shape, same as ngram dedup: distinct
    (source, span) postings -> per-span sorted source set (hash
    aggregate, map-side combine) -> in-array pairwise expansion via
    nested transform/slice (emits O(df^2) pairs ONLY after the df
    cap [2, 64] bounds df, so per-span work <= cap^2) ->
    one (src_a, src_b) count aggregate. A span shared by every mirror
    of a crawl is exactly the stop-shingle case the cap exists for;
    with 20 sources the cap never binds on the fixture, and at real
    scale it turns boilerplate spans into a bounded cost instead of a
    quadratic one."""
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    sp = (
        d.select(
            "source",
            F.explode_outer(shingles_spark(F.col("text"), _SPAN_N)).alias("span"),
        )
        .filter(F.col("span").isNotNull())
        .distinct()
    )
    grp = (
        sp.groupBy("span")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss").between(2, _OVL_DF_CAP))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    return (
        grp.select(F.explode(pairs).alias("p"))
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared_spans"))
    )


_COV_SQL = f"""
    WITH base AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    occ AS (
        SELECT doc_id, lang, u.pos AS pos, u.span AS span FROM (
            SELECT doc_id, lang,
                   unnest(list_transform(range(1, len(toks) - {_SPAN_N - 2}),
                       i -> struct_pack(pos := i,
                            span := array_to_string(
                                list_slice(toks, i, i + {_SPAN_N - 1}), ' ')))) AS u
            FROM base
        )
    ),
    dup AS (
        SELECT lang, span
        FROM (SELECT DISTINCT doc_id, lang, span FROM occ)
        GROUP BY lang, span HAVING count(*) >= 2
    ),
    d_occ AS (
        SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (lang, span)
    ),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(max(pos + {_SPAN_N - 1}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS is_new
        FROM d_occ
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS gid
        FROM brk
    ),
    cov AS (
        SELECT doc_id, sum(n) AS covered FROM (
            SELECT doc_id, gid, max(pos + {_SPAN_N - 1}) - min(pos) + 1 AS n
            FROM isl GROUP BY doc_id, gid
        ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
           CAST(coalesce(c.covered, 0) * 1000000
                // greatest(len(b.toks), 1) AS BIGINT) AS coverage_ppm
    FROM base b LEFT JOIN cov c USING (doc_id)
    """


@query("dedup_span_coverage", oracle=_COV_SQL)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span token coverage — the doc-level
    companion to dedup_substring_spans (which reports the per-LANG
    rollup): for every document, how many of its tokens sit inside at
    least one 8-token span that >= 2 same-language documents contain.
    coverage_ppm is the drop-the-document criterion of
    substring-level dedup policies ("discard documents that are
    mostly verbatim-repeated text"); the fixture's planted near-exact
    duplicates surface at ~1e6 ppm.

    Unlike the shingle-based operators, spans here keep their token
    POSITION (occurrences, not the distinct-shingle set) because
    coverage is a union of intervals: overlapping duplicated spans
    must not double-count tokens. The union is the classic
    gaps-and-islands merge — a running max(pos + n - 1) over each
    document's duplicated-span starts splits islands, and covered
    tokens are sum over islands of (max_end - min_start + 1).

    Scale shape: the expensive relation — positional span occurrences
    (a string build over every token window) — is computed ONCE and
    flagged in a SINGLE (lang, span) window pass: distinct-document
    frequency via dense_rank-then-max (sort-based, bounded per-key
    state — deliberately NOT collect_set, which holds a hot span's
    whole doc set in memory) plus keeper = min(doc_id) for the
    rewrite twin. No distinct-and-join-back: the first cut of this
    operator self-joined occurrences against the dup set and paid the
    span build twice (~5 s vs ~1.4 s at sf0.1). Downstream, one
    doc_id exchange for the island merge (one running max per doc)
    and one cheap spanless scan for the per-doc token totals. No pair
    list is ever emitted, so per-span cost is O(occurrences)
    regardless of df. The position arithmetic is all BIGINT;
    coverage_ppm is exact integer floor division, so the number is
    engine- and partitioning-identical. Measured 10x worst-case probe
    (50k docs, 100% dup density, 1x-comparable wall): SCALE.md
    "Span-coverage probe"."""
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    d_occ = _dup_span_occurrences(d).select("doc_id", "pos")
    cov = _merged_islands(d_occ).groupBy("doc_id").agg(
        F.sum("n").alias("covered")
    )
    toks = tokens_spark(F.col("text"))
    totals = d.select("doc_id", F.size(toks).cast("bigint").alias("n_tokens"))
    covered = F.coalesce(F.col("covered"), F.lit(0)).cast("bigint")
    return (
        totals.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            covered.alias("covered_tokens"),
            F.expr(
                "CAST(coalesce(covered, 0) * 1000000 div greatest(n_tokens, 1) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


def _span_occurrences(d: DataFrame) -> DataFrame:
    """Positional 8-token span occurrences: (doc_id, lang, pos, span),
    one row per token window — NOT the distinct-shingle set, because
    interval union needs every occurrence's position."""
    toks = tokens_spark(F.col("text"))
    n_sh = F.size(toks) - (_SPAN_N - 1)
    mk = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.struct(
            i.cast("bigint").alias("pos"),
            F.concat_ws(" ", F.slice(toks, i, _SPAN_N)).alias("span"),
        ),
    )
    base = d.select(
        "doc_id",
        "lang",
        # sequence(1, k) counts DOWN for k < 1 — same guard as
        # shingles_spark for sub-span-length documents
        F.when(n_sh >= 1, mk)
        .otherwise(F.array().cast("array<struct<pos:bigint,span:string>>"))
        .alias("occs"),
    )
    return (
        base.select("doc_id", "lang", F.explode_outer("occs").alias("o"))
        .filter(F.col("o").isNotNull())
        .select(
            "doc_id", "lang", F.col("o.pos").alias("pos"), F.col("o.span").alias("span")
        )
    )


def _dup_span_occurrences(d: DataFrame) -> DataFrame:
    """Occurrences of duplicated spans (distinct-doc frequency >= 2
    within the language), with each span's keeper (min doc_id) — ONE
    (lang, span) exchange: dense_rank over doc_id then max gives the
    distinct-document count with sort-based bounded state, where
    collect_set would buffer a stop-span's entire doc set."""
    w = W.partitionBy("lang", "span")
    return (
        _span_occurrences(d)
        .withColumn("dr", F.dense_rank().over(w.orderBy("doc_id")))
        .withColumn("dfd", F.max("dr").over(w))
        .withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("dfd") >= 2)
    )


def _merged_islands(d_occ: DataFrame) -> DataFrame:
    """Gaps-and-islands union of [pos, pos + n - 1] intervals per doc:
    (doc_id, gid, s, e, n) — one running max per document."""
    w_ord = W.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + (_SPAN_N - 1)).over(
        w_ord.rowsBetween(W.unboundedPreceding, -1)
    )
    isl = d_occ.withColumn(
        "is_new",
        F.when(F.col("pos") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn(
        "gid", F.sum("is_new").over(w_ord.rowsBetween(W.unboundedPreceding, 0))
    )
    return isl.groupBy("doc_id", "gid").agg(
        F.min("pos").alias("s"),
        F.max(F.col("pos") + (_SPAN_N - 1)).alias("e"),
        (F.max(F.col("pos") + (_SPAN_N - 1)) - F.min("pos") + 1).alias("n"),
    )


_REWRITE_SQL = f"""
    WITH base AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    occ AS (
        SELECT doc_id, lang, u.pos AS pos, u.span AS span FROM (
            SELECT doc_id, lang,
                   unnest(list_transform(range(1, len(toks) - {_SPAN_N - 2}),
                       i -> struct_pack(pos := i,
                            span := array_to_string(
                                list_slice(toks, i, i + {_SPAN_N - 1}), ' ')))) AS u
            FROM base
        )
    ),
    dup AS (
        SELECT lang, span, min(doc_id) AS keeper
        FROM (SELECT DISTINCT doc_id, lang, span FROM occ)
        GROUP BY lang, span HAVING count(*) >= 2
    ),
    rem_occ AS (
        SELECT o.doc_id, o.pos
        FROM occ o JOIN dup d USING (lang, span)
        WHERE o.doc_id != d.keeper
    ),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(max(pos + {_SPAN_N - 1}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS is_new
        FROM rem_occ
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS gid
        FROM brk
    ),
    gaps AS (
        SELECT doc_id, list(struct_pack(s := s, e := e)) AS islands FROM (
            SELECT doc_id, gid, min(pos) AS s, max(pos + {_SPAN_N - 1}) AS e
            FROM isl GROUP BY doc_id, gid
        ) GROUP BY doc_id
    ),
    rebuilt AS (
        SELECT b.doc_id,
               CAST(len(b.toks) AS BIGINT) AS n_tokens,
               list_transform(
                   list_filter(
                       list_zip(b.toks, range(1, len(b.toks) + 1)),
                       z -> len(list_filter(coalesce(g.islands, []),
                                i -> i.s <= z[2] AND z[2] <= i.e)) = 0),
                   z -> z[1]) AS kept
        FROM base b LEFT JOIN gaps g USING (doc_id)
    )
    SELECT doc_id, n_tokens,
           CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
           coalesce(array_to_string(kept, ' '), '') AS text_clean
    FROM rebuilt
    """


@query("dedup_span_rewrite", oracle=_REWRITE_SQL)
def dedup_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL pass of substring-level dedup — completes the
    family census (dedup_substring_spans) -> per-doc criterion
    (dedup_span_coverage) -> rewrite: emit every document's CLEANED
    text with duplicated spans cut, keep-first-document semantics.

    Keeper election is per (lang, span): the lowest doc_id containing
    the span keeps its text untouched for that span; every other
    document cuts all tokens covered by its occurrences. Removal
    regions are the same gaps-and-islands interval union as the
    coverage operator (overlapping spans never double-cut), and the
    rebuild is a NARROW positional array filter on the kept document
    row — F.filter's (token, index) lambda against the doc's merged
    island array — so reconstructing text costs no extra exchange
    beyond the island groupBy's doc_id shuffle. text_clean is exact
    token arithmetic, so the output hash-compares across engines.

    Scale shape: identical single-pass (lang, span) window as
    dedup_span_coverage (dense_rank-then-max distinct-doc frequency +
    keeper = min(doc_id), sort-based bounded state, occurrences built
    once — see that operator's docstring for why there is no
    dup-set self-join), then doc_id for the island merge and the
    doc_id equi-join of islands back to the corpus. The per-doc
    island array is bounded by n_tokens/span_n, so the rebuild lambda
    is O(tokens x islands) per row with no shuffle amplification. At
    100 TB the cleaned corpus is a straight partitioned write of this
    frame. Measured 10x worst-case probe (90% removal density,
    closed-form removal count): SCALE.md "Span-coverage probe"."""
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    rem_occ = (
        _dup_span_occurrences(d)
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id", "pos")
    )
    gaps = (
        _merged_islands(rem_occ)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("islands"))
    )
    toks = tokens_spark(F.col("text"))
    base = d.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("bigint").alias("n_tokens")
    )
    islands = F.coalesce(
        F.col("islands"), F.array().cast("array<struct<s:bigint,e:bigint>>")
    )
    kept = F.filter(
        F.col("toks"),
        lambda tok, i: ~F.exists(
            islands, lambda g: (g["s"] <= i + 1) & (i + 1 <= g["e"])
        ),
    )
    return (
        base.join(gaps, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.size(kept)).cast("bigint").alias("n_removed"),
            F.concat_ws(" ", kept).alias("text_clean"),
        )
    )


# ---------------------------------------------------- semantic (embedding)

# The lexical rules above catch verbatim/near-verbatim eval leakage;
# paraphrased leakage needs the SEMANTIC rule: flag any training item
# whose embedding is near-identical to some held-out eval item. Same
# hash-routed eval split idea as decontaminate_ngram_overlap, on the
# embeddings table's duplicated-ingest corpus (plans/dedup.py::
# _emb_corpus — original + deterministically drifted copy of every
# 5th vector), so original/copy pairs straddling the split provide a
# guaranteed, deterministic planted-contamination signal.
_SEM_EVAL_MOD = 8  # ~1/8 of the corpus plays the held-out eval suite
_SEM_EVAL_KEY_DUCK = "'sev:' || CAST(vec_id AS VARCHAR)"
_SEM_EVAL_DUCK = f"{hex32_duck(_SEM_EVAL_KEY_DUCK)} % {_SEM_EVAL_MOD} = 0"

_SEM_DECONTAM_SQL = f"""
    WITH corpus AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        UNION ALL
        SELECT vec_id + {_EMB_COPY_OFFSET} AS vec_id, label, {_DRIFT_DUCK} AS emb
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    tagged AS (
        SELECT vec_id, label, emb, {_SEM_EVAL_DUCK} AS is_eval FROM corpus
    ),
    scored AS (
        SELECT t.vec_id AS train_vec, t.label AS label,
               e.vec_id AS eval_vec,
               {cosine_duck('t.emb', 'e.emb')} AS cos
        FROM tagged t, tagged e
        WHERE NOT t.is_eval AND e.is_eval
    ),
    best AS (
        SELECT train_vec, label, eval_vec, cos,
               row_number() OVER (
                   PARTITION BY train_vec ORDER BY cos DESC, eval_vec
               ) AS rn
        FROM scored
    )
    SELECT train_vec, CAST(label AS INT) AS label,
           eval_vec AS matched_eval, round(cos, 6) AS cosine
    FROM best WHERE rn = 1 AND cos >= {_COSINE_NEARDUP}
"""


@query("decontam_semantic_embedding", oracle=_SEM_DECONTAM_SQL)
def decontam_semantic_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space member of the
    family whose lexical members are decontaminate_ngram_overlap
    (8-token span overlap) and the span operators: emit every TRAIN
    corpus item whose max cosine against the held-out EVAL slice is
    >= 0.9, with the argmax eval item (ties broken to the smallest
    eval vec_id) — the per-document drop list paraphrase-level
    leakage checks produce.

    The eval slice is hash-routed (md5 of 'sev:'||vec_id, ~1/8), so
    planted original/drifted-copy pairs (cosine ~1) straddle the
    split deterministically and the output is provably non-vacuous.

    Scale shape: eval suites are FIXED-SIZE while the training corpus
    grows, so the eval side folds into ONE broadcast row of (vec_id,
    emb) structs (collect_list aggregate — never a driver collect)
    and the verdict is a NARROW per-row argmax over that array: an
    ``aggregate`` running max with the cos-desc/id-asc tie rule —
    O(E) per train row (the r10-ADVICE fold; the original array_sort
    was O(E log E), a 17x constant at a 100k-item eval suite) —
    identical shape to similarity_topk_ivf's cell assignment. The
    train branch carries exactly one exchange (the _spread
    parallelism repartition, key-free) and the plan has no window, no
    shuffle join, no corpus x eval row explosion — at 100 TB this is
    a map-side-only scan whose cost is linear in the corpus with a
    corpus-independent broadcast. Per-element cosine is the bitwise-
    portable fold from functions/vector.py, max/tie selection is
    order-independent, so the float verdict hash-compares exactly.
    Reference analog: the A5/A6 broadcast-target match
    (src/prediction_producer.py:314-325) repurposed as a train-vs-eval
    contamination gate.
    """
    corpus = _emb_corpus(_t(spark, sf_dir, "embeddings"))
    is_eval = (
        hex32_spark(F.concat(F.lit("sev:"), F.col("vec_id").cast("string")))
        % _SEM_EVAL_MOD
        == 0
    )
    # each side's l2 norm is computed ONCE (eval norms ride the
    # broadcast structs, the train norm is a sibling projection) —
    # the same fold over the same vector yields the same bits, so
    # try_divide(dot, tn*n) is bitwise-identical to cosine_spark while
    # dropping two 64-element norm folds from EVERY (train, eval)
    # element: ~60% of the per-pair interpreted higher-order-function
    # work (r18 optimization, guide §4/§2.3 — interleaved A/B 1.33 ->
    # 0.97 s warm, 4.7 -> 3.9 s cold-JVM first sample).
    ev_row = corpus.filter(is_eval).agg(
        F.array_sort(
            F.collect_list(
                F.struct("vec_id", "emb", l2_spark(F.col("emb")).alias("n"))
            )
        ).alias("evs")
    )

    def _scores(vec: Column) -> Column:
        # (coalesced cos, -ev, ev) structs: lexicographic struct order
        # makes array_max the argmax with the SAME total order as the
        # r11 running-max fold — cos DESC (coalesce NULL cos from
        # zero-norm vectors to -2 < every real cosine), then ev ASC
        # (max of -ev = min ev). array_max is a flat per-element
        # comparison loop instead of a per-element when/otherwise
        # struct-builder fold — measurably cheaper interpreted.
        return F.transform(
            F.col("evs"),
            lambda s: F.struct(
                F.coalesce(
                    F.try_divide(dot_spark(vec, s["emb"]), F.col("tn") * s["n"]),
                    F.lit(-2.0),
                ).alias("cos"),
                (-s["vec_id"]).alias("nev"),
                s["vec_id"].alias("ev"),
            ),
        )

    # an EMPTY eval array yields NULL from array_max; the threshold
    # filter below drops it — no output row, same as the fold seed.
    best = F.array_max(_scores(F.col("emb")))
    # explode_outer of the 0-or-1-element thresholded array, NOT a
    # plain filter on best.cos: Catalyst collapses the projection and
    # merges that filter into the BNLJ condition, re-evaluating the
    # whole argmax fold twice per row (once as the join predicate,
    # once for the output columns). A filter on the GENERATED column
    # cannot be pushed below the Generate (same rule exploited by
    # decontaminate_ngram_overlap above), so the fold runs exactly
    # once; explode_OUTER keeps InferFiltersFromGenerate from adding
    # a size()>0 pre-filter that would re-inline it.
    hit = F.filter(F.array(best), lambda b: b["cos"] >= _COSINE_NEARDUP)
    return (
        _spread(corpus.filter(~is_eval), "vec_id")
        .withColumn("tn", l2_spark(F.col("emb")))
        .crossJoin(F.broadcast(ev_row))
        .select(
            F.col("vec_id").alias("train_vec"),
            F.col("label").cast("int").alias("label"),
            F.explode_outer(hit).alias("best"),
        )
        .filter(F.col("best").isNotNull())
        .select(
            "train_vec",
            "label",
            F.col("best.ev").alias("matched_eval"),
            F.round(F.col("best.cos"), 6).alias("cosine"),
        )
    )

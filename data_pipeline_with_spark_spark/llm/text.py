"""Text analysis operators: tokenization, profiling/quality scoring,
language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (split/filter/transform/aggregate over
arrays) — JVM-side, codegen'd, no UDFs — so they run at full scan speed
over a 100 TB documents table and every one is DuckDB-oracle-checkable.

Cross-engine determinism notes: token arrays come from the same regex
split in both engines; ratios do integer counts first and exactly one
double division at the end (bit-identical IEEE); md5 is the portable
hash primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.util import ensure_min_partitions, exploded

# Tiny in-expression stopword/marker sets. Real deployments swap in a
# broadcast lookup table; these stay literal so the whole pipeline is a
# single projection.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "los", "de", "y"),
    "fr": ("le", "les", "des", "et", "une"),
    "de": ("der", "die", "und", "nicht", "ein"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def _sql_array(words: tuple[str, ...]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def with_text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document text statistics: char/token counts, average token
    length, distinct-token ratio, stopword ratio, non-alnum ratio."""
    out = ensure_min_partitions(df).withColumn("toks", tokens(text_col))
    stop_arr = _sql_array(STOPWORDS)
    return (
        out.withColumn("n_chars_calc", F.length(text_col).cast("bigint"))
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .withColumn(
            "avg_token_len",
            F.expr(
                "CAST(aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x) AS DOUBLE)"
                " / CAST(size(toks) AS DOUBLE)"
            ),
        )
        .withColumn(
            "distinct_ratio",
            F.expr("CAST(size(array_distinct(toks)) AS DOUBLE) / CAST(size(toks) AS DOUBLE)"),
        )
        .withColumn(
            "stopword_ratio",
            F.expr(
                f"CAST(size(filter(toks, t -> array_contains({stop_arr}, t))) AS DOUBLE)"
                " / CAST(size(toks) AS DOUBLE)"
            ),
        )
        .withColumn(
            "non_alnum_ratio",
            (
                (F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), "[^a-z0-9 ]", "")))
                .cast("double")
                / F.length(text_col).cast("double")
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0, 1]: rewards mid-length docs with
    diverse tokens and a natural stopword rate, penalizes symbol soup.

    score = 0.3·min(t,100)/100 + 0.3·d/t + 0.2·min(4s/t, 1)
          + 0.2·(c−na)/c, rounded half-up to 4 decimals — but computed
    EXACTLY: the weighted sum folds into one BIGINT rational N/D
    (D = 1000·t·c) and the 4-decimal round is integer arithmetic,
    reduced by the common factor 1000 to (20·N + t·c) div (2·t·c)
    (floor division is invariant under common-factor cancellation), so
    no float ever enters until the final exact /10000.0. A
    float-sum-then-round(…,4) formulation put doc 64 of the sf0.001
    fixture on a .xxxx5 half-way boundary where Spark (shortest-repr
    HALF_UP) and DuckDB (double-value rounding) disagreed by one ulp —
    the r12 lesson: round-at-the-end is only safe after ONE float op,
    never after a float SUM. Docs with no tokens or no chars score 0.0
    (the old path gave NaN; both filter identically at any positive
    threshold).

    Overflow bound: the largest intermediate is 20·N ≤ 2·10⁴·t·c, so
    BIGINT is exact while t·c ≤ 4.6·10¹⁴ — any document up to ~30 MB
    of text (worst-case token density t ≈ c/2). Beyond that Spark
    (non-ANSI) would wrap silently while DuckDB raises — length-gate
    pathological docs upstream; the un-reduced ×1000 form overflowed
    1000× earlier (~1 MB docs), which is why the reduction matters."""
    out = with_text_profile(df, text_col)
    stop_arr = _sql_array(STOPWORDS)
    return out.withColumn(
        "quality_score",
        F.expr(
            f"""CASE WHEN size(toks) > 0 AND length({text_col}) > 0 THEN
              CAST((20L * (
                  3L * least(size(toks), 100) * size(toks) * length({text_col})
                + 300L * size(array_distinct(toks)) * length({text_col})
                + 200L * least(4L * size(filter(toks, t -> array_contains({stop_arr}, t))),
                               size(toks)) * length({text_col})
                + 200L * length(regexp_replace({text_col}, '[^a-z0-9 ]', '')) * size(toks)
              ) + CAST(size(toks) AS BIGINT) * length({text_col}))
              div (2L * size(toks) * length({text_col})) AS DOUBLE) / 10000.0
            ELSE 0.0 END"""
        ),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic: score = number of language
    marker words present; argmax with a fixed tie order (en>es>fr>de),
    'und' (undetermined) when no marker hits. CJK codepoints short-cut
    to 'zh'. (On the synthetic fixture corpus all langs share an
    English-ish vocabulary, so this verifies the *operator*, not a real
    detector — swap marker sets for fastText-style models in prod.)"""
    out = ensure_min_partitions(df).withColumn("toks", tokens(text_col))
    for lang, markers in LANG_MARKERS.items():
        arr = _sql_array(markers)
        out = out.withColumn(
            f"score_{lang}",
            F.expr(f"size(filter({arr}, m -> array_contains(toks, m)))"),
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.when(F.col(text_col).rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
    for lang in LANG_MARKERS:  # dict order == tie order
        pred = pred.when((F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang))
    return out.withColumn("pred_lang", pred.otherwise(F.lit("und")))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the normalized token stream —
    robust to whitespace/case differences, exact otherwise."""
    return ensure_min_partitions(df).withColumn(
        "fingerprint", F.md5(F.array_join(tokens(text_col), " "))
    )


BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def with_token_estimate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token count estimate: regex pieces (letter runs, digit
    runs, single symbols) plus a length/4 subword correction for long
    words — the standard cheap proxy for LLM tokenizer counts when the
    real tokenizer can't run JVM-side."""
    df = ensure_min_partitions(df)
    # materialized once — three references below would otherwise each
    # re-run the regex scan over the document
    df = df.withColumn(
        "__pieces",
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0),
    )
    pieces = F.col("__pieces")
    # explicit floor(): Spark truncates double→int, DuckDB rounds — only
    # floor is portable.
    long_word_extra = F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc
        + F.when(F.length(p) > 4, F.floor((F.length(p) - 1) / 4)).otherwise(0).cast("int"),
    )
    return (
        df.withColumn("n_pieces", F.size(pieces).cast("bigint"))
        .withColumn("n_tokens_est", (F.size(pieces) + long_word_extra).cast("bigint"))
        .drop("__pieces")
    )


def with_winnow_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 8, n_mins: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): hash every
    char k-gram, keep the n smallest digests, fingerprint = md5 of
    their concatenation. Robust to local edits — an edit perturbs only
    the k-grams overlapping it, usually none of the global minima
    (Schleimer et al. '03 winnowing, simplified to global minima so the
    identical formula runs in DuckDB)."""
    df = ensure_min_partitions(df)
    # normalized text materialized ONCE: inlining it in the lambda body
    # would re-run regexp_replace over the whole document per char
    # k-gram — O(len²) per doc (interpreted lambdas; see
    # dedup.with_shingles note on CollapseProject)
    df = df.withColumn(
        "__norm", F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    # substring(str, pos, len) with a column pos needs the SQL-expr form
    grams = F.expr(
        f"transform(sequence(1, greatest(length(__norm) - {k - 1}, 1)),"
        f" i -> md5(substring(__norm, i, {k})))"
    )
    mins = F.slice(F.array_sort(F.array_distinct(grams)), 1, n_mins)
    return df.withColumn("winnow_fp", F.md5(F.concat_ws("", mins))).drop("__norm")


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 10_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
) -> DataFrame:
    """Gopher-style document filter rules (Rae et al. '21 §A1.1), each
    as a named boolean column plus the conjunction ``gopher_pass``:

    - ``rule_word_count``: token count in [min_words, max_words]
    - ``rule_mean_word_len``: mean token length in [3, 10]
    - ``rule_alpha_ratio``: ≥80% of tokens contain a letter
    - ``rule_stopwords``: ≥2 distinct stopwords present
    - ``rule_symbol_ratio``: ≤10% of tokens are pure symbols

    Every threshold compares scaled INTEGERS (5·n_alpha ≥ 4·n_tokens,
    not n_alpha/n ≥ 0.8) so no float rounding can flip a rule between
    engines. One projection, zero shuffles — the standard first-pass
    corpus filter at 100 TB because it runs at scan speed."""
    out = ensure_min_partitions(df).withColumn("toks", tokens(text_col))
    n = F.size("toks")
    sum_len = F.expr("aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x)")
    n_alpha = F.expr("size(filter(toks, t -> t rlike '[a-z]'))")
    n_symbol = F.expr("size(filter(toks, t -> NOT t rlike '[a-z0-9]'))")
    n_stop = F.size(F.array_intersect(F.col("toks"), F.array(*[F.lit(s) for s in STOPWORDS])))
    return (
        out.withColumn("n_tokens", n.cast("bigint"))
        .withColumn("n_stopwords_distinct", n_stop.cast("bigint"))
        .withColumn("rule_word_count", (n >= min_words) & (n <= max_words))
        .withColumn(
            "rule_mean_word_len",
            (sum_len >= min_mean_word_len * n) & (sum_len <= max_mean_word_len * n),
        )
        .withColumn("rule_alpha_ratio", n_alpha * 5 >= n * 4)
        .withColumn("rule_stopwords", n_stop >= 2)
        .withColumn("rule_symbol_ratio", n_symbol * 10 <= n)
        .withColumn(
            "gopher_pass",
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_alpha_ratio")
            & F.col("rule_stopwords")
            & F.col("rule_symbol_ratio"),
        )
        .drop("toks")
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signal (Rae et al. '21 §A1.1):
    the fraction of a document's bigrams claimed by its single most
    frequent bigram. Boilerplate and degenerate generations spike this;
    natural prose stays low.

    Physical shape at corpus scale: explode → two aggregations keyed by
    (doc, bigram) then doc. The shuffles carry (doc_id, bigram, count)
    partial aggregates — map-side combine collapses each doc's bigrams
    before anything moves, so shuffle volume is O(distinct bigrams per
    doc), never the corpus text.
    """
    toks = tokens(text_col)
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(toks) - 1, 0)),"
        " i -> concat(toks[i - 1], ' ', toks[i]))"
    )
    counts = (
        exploded(
            ensure_min_partitions(df).withColumn("toks", toks),
            [id_col],
            bigrams,
            "bigram",
        )
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.groupBy(id_col).agg(
        F.sum("n").cast("bigint").alias("n_bigrams"),
        F.max("n").cast("bigint").alias("top_bigram_n"),
        F.round(
            F.max("n").cast("double") / F.sum("n").cast("double"), 6
        ).alias("top_bigram_frac"),
    )


# PII patterns: conservative, line-speed regexes (no lookbehind — Java
# regex runs JVM-side via regexp_replace, fully codegen'd). Real
# deployments layer NER models on top; the regex pass is the standard
# first filter at corpus scale because it costs one projection.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    kinds: tuple[str, ...] = ("email", "ssn", "ipv4", "phone"),
) -> DataFrame:
    """PII scrubbing pass: replace each matched span with ``[<KIND>]``
    and count replacements per kind. Chained ``regexp_replace`` — one
    JVM-side projection, no shuffle, no Python; the counting reuses the
    same patterns via ``regexp_count``. Order matters: specific shapes
    (ssn, ipv4) run before the permissive phone pattern so it can't
    swallow them; counts are always taken on the original text."""
    out = df
    redacted = F.col(text_col)
    for k in kinds:
        out = out.withColumn(
            f"n_{k}", F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[k])).cast("int")
        )
        redacted = F.regexp_replace(redacted, PII_PATTERNS[k], f"[{k.upper()}]")
    return out.withColumn(out_col, redacted)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Spärck Jones, the Okapi
    weighting): score = Σ_term idf(term) · tf·(k1+1) / (tf + k1·(1 − b
    + b·dl/avgdl)), idf = ln((N − df + ½)/(df + ½) + 1) — the
    Lucene-style always-positive form. Returns the top-``k`` docs as
    (id, bm25) ordered by score desc with the id tiebreak.

    Scale shape: ONE tokenize+explode pass and ONE doc-keyed exchange
    by construction — the per-doc frame carries (dl, tf per query
    term as conditional counts) out of a single groupBy, then the
    query-term tf columns unpivot to postings rows and everything
    else (df per term, the N/avgdl one-row broadcast) derives from
    that frame. The obvious three-branch formulation (tf / dl / stats
    each aggregating the token frame differently) relies on AQE
    exchange reuse to avoid re-tokenizing the corpus up to 3× — the
    same fragile mechanism the LSH rework dropped (r8 review); here
    the stats branch reads the IDENTICAL per-doc aggregate subtree,
    which exchange reuse folds deterministically (exact plan match).
    N/avgdl are defined over docs with ≥1 token, identically in the
    oracle. Per-term weights round to 6 before the doc-level sum so
    the final score is insensitive to aggregation order."""
    qt = sorted({t.lower() for t in query_terms})
    toks = exploded(df, [id_col], tokens(F.col(text_col)), "term")
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, F.lit(1))).alias(f"__tf_{i}")
            for i, t in enumerate(qt)
        ],
    )
    # Load-bearing always-true filters (the text_tfidf doctrine): each
    # consumer branch must reference EVERY per_doc aggregate, else
    # column pruning specializes its copy of the subtree (stats drops
    # the __tf columns, df-per-term drops dl) and the exchange-reuse
    # fold below can't match them — re-tokenizing the corpus per
    # branch. Plan-pinned by test_bm25_single_pass_plan.
    all_tf = sum(
        (F.col(f"__tf_{i}") for i in range(len(qt))), F.lit(0)
    )
    stats = per_doc.where(all_tf >= 0).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        per_doc.select(
            id_col,
            "dl",
            F.posexplode(F.array(*[f"__tf_{i}" for i in range(len(qt))])).alias(
                "__ti", "tf"
            ),
        )
        .where((F.col("tf") > 0) & (F.col("dl") >= 1))
        .select(
            id_col,
            "dl",
            F.element_at(F.lit(qt), F.col("__ti") + 1).alias("term"),
            "tf",
        )
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf").cast("double") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ),
        )
    )
    return (
        w.groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def cooccurrence_edges(
    df: DataFrame, text_col: str = "text", id_col: str | None = None
) -> DataFrame:
    """Undirected adjacent-token co-occurrence graph over a corpus:
    (a, b, w) with a < b lexicographically and w = number of adjacent
    occurrences in either order, self-pairs dropped. One tokenize +
    in-array window pass (transform over index pairs, no self-join on
    position) and one map-side-combinable groupBy — O(total tokens)
    work, O(vocab^2)-bounded output, the right 100 TB shape for a
    corpus-level word graph."""
    # r15: same parallelize guard as the module's other tokenizing
    # entries — the adjacent-pair transform below is the heavy map side
    # and a single-file scan would run it on one core (no-op at scale).
    # r16 (r15 advice): ``id_col`` threads a unique never-null key to
    # the guard so it can HASH-partition — the keyless round-robin form
    # pays a single-threaded sortBeforeRepartition local sort on
    # exactly the fat partition the guard exists to split (util
    # docstring / SPARK-23207). Callers generally have a doc id; the
    # keyless fallback stays for frames that genuinely lack one.
    t = ensure_min_partitions(
        df, by=(id_col,) if id_col else None
    ).select(tokens(text_col).alias("toks")).where(F.size("toks") >= 2)
    bi = (
        exploded(
            t,
            [],
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] AS t1, toks[i + 1] AS t2))"
            ),
            "p",
        )
        .select("p.t1", "p.t2")
        .where(F.col("t1") != F.col("t2"))
    )
    return (
        bi.select(
            F.least("t1", "t2").alias("a"),
            F.greatest("t1", "t2").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def textrank_keywords(
    df: DataFrame,
    rounds: int = 5,
    text_col: str = "text",
    id_col: str | None = None,
) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau '04) as weighted
    PageRank over the adjacent-token co-occurrence graph: tokens are
    nodes, co-occurrence counts are symmetric edge weights, and the
    keyword score is the stationary weighted-random-walk mass — the
    graph-centrality alternative to raw frequency/TF-IDF keyword
    ranking. Returns (token, out_weight, rank) with rank the BIGINT
    fixed-point PageRank (integer doctrine from operators/graph.py, so
    a DuckDB oracle replays every round bit-exactly) and out_weight
    the token's total incident co-occurrence weight.

    The symmetrized edge list has no dangling nodes by construction
    (every edge contributes both directions), so the weighted variant's
    dangling term is identically zero — kept in the plan for exactness
    with the shared operator. Scale shape: edge building is one
    tokenize pass + one groupBy (see `cooccurrence_edges`); the rank
    loop is O(rounds) joins over the O(vocab^2)-bounded edge list,
    independent of corpus size."""
    from data_pipeline_with_spark_spark.operators import graph

    und = cooccurrence_edges(df, text_col, id_col=id_col)
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    pr = graph.pagerank_weighted(edges, rounds=rounds)
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_weight"))
    return pr.join(outw, pr["node"] == outw["src"]).select(
        pr["node"].alias("token"),
        F.col("out_weight").cast("bigint").alias("out_weight"),
        "rank",
    )

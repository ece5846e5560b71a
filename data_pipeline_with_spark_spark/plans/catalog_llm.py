"""LLM-data-pipeline query catalog (SURVEY §2.14): dedup, similarity
search, text analysis, multimodal — each operator gets a queries()
entry over documents/embeddings and, wherever expressible, a DuckDB
oracle built from the SAME portable primitives (md5 hashing, regex
tokenization, integer-counts-then-one-divide ratios, round-6 scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.llm import dedup, multimodal, similarity, text
from data_pipeline_with_spark_spark.operators import graph
from data_pipeline_with_spark_spark.plans.registry import QuerySpec, register
from data_pipeline_with_spark_spark.util import ensure_min_partitions, exploded
from data_pipeline_with_spark_spark.sources.readers import read_testdata

_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS) + "]"

# Integer-exact composite quality score over (toks, text) — the DuckDB
# twin of llm/text.with_quality_score: one BIGINT rational + integer
# half-up round, /10000.0 at the very end. A float-sum-then-round(…,4)
# formulation disagreed with Spark by one ulp on a half-way-boundary
# doc (doc 64, sf0.001) — keep both engines on this exact form. The
# shared factor 1000 is cancelled out of the division on BOTH engines
# (floor((1000a)/(1000b)) == floor(a/b)) so the largest intermediate is
# 20·N ≤ 2·10⁴·t·c — BIGINT-exact to ~30 MB docs instead of ~1 MB.
_QSCORE_SQL = f"""CASE WHEN len(toks) > 0 AND length(text) > 0 THEN
  CAST((20 * (
      3 * least(len(toks), 100) * len(toks) * length(text)
    + 300 * len(list_distinct(toks)) * length(text)
    + 200 * least(4 * len(list_filter(toks, s -> list_contains({_STOP_SQL}, s))),
                  len(toks)) * length(text)
    + 200 * length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) * len(toks)
  ) + len(toks) * length(text))
  // (2 * len(toks) * length(text)) AS DOUBLE) / 10000.0
ELSE 0.0 END"""


# --------------------------------------------------------------------------
# Text analysis
def _text_profile(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_text_profile(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "avg_token_len",
        "distinct_ratio", "stopword_ratio", "non_alnum_ratio",
    )


register(
    QuerySpec(
        name="text_profile",
        build=_text_profile,
        headline=True,
        doc="per-document text statistics (token/char counts, ratios)",
        oracle=f"""
        WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_calc,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(toks, s -> length(s))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) AS avg_token_len,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) AS distinct_ratio,
               CAST(len(list_filter(toks, s -> list_contains({_STOP_SQL}, s))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
               CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE) AS non_alnum_ratio
        FROM t
        """,
    )
)


def _quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_quality_score(docs).select("doc_id", "quality_score")


register(
    QuerySpec(
        name="text_quality_score",
        build=_quality,
        doc="composite document quality score (length/diversity/stopword/symbol)",
        oracle=f"""
        WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
        SELECT doc_id, {_QSCORE_SQL} AS quality_score FROM t
        """,
    )
)


def _lang_id(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_lang_id(docs).select("doc_id", "pred_lang")


_MARKER_SCORES = ",\n".join(
    "len(list_filter(["
    + ", ".join(f"'{m}'" for m in markers)
    + f"], m -> list_contains(toks, m))) AS score_{lang}"
    for lang, markers in text.LANG_MARKERS.items()
)
_MARKER_CASE = "\n".join(
    f"WHEN score_{lang} = best AND best > 0 THEN '{lang}'" for lang in text.LANG_MARKERS
)

register(
    QuerySpec(
        name="text_lang_id",
        build=_lang_id,
        doc="marker-word language-ID heuristic (formula-verified; see llm/text.py)",
        oracle=f"""
        WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
        s AS (SELECT doc_id, text, {_MARKER_SCORES} FROM t),
        b AS (SELECT *, greatest(score_en, score_es, score_fr, score_de) AS best FROM s)
        SELECT doc_id,
               CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
               {_MARKER_CASE}
               ELSE 'und' END AS pred_lang
        FROM b
        """,
    )
)


def _fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_fingerprint(docs).select("doc_id", "fingerprint")


register(
    QuerySpec(
        name="text_fingerprint",
        build=_fingerprint,
        doc="normalized-token-stream md5 fingerprint",
        oracle=f"""
        SELECT doc_id, md5(array_to_string({_TOKS_SQL}, ' ')) AS fingerprint
        FROM documents
        """,
    )
)


_BPE_N_MERGES = 30


def _bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Train-and-apply BPE over the documents table. Train reduces the
    corpus to a word histogram (one digest-only shuffle) and learns
    merges driver-side on it; apply is the Arrow-batch escape hatch
    with a per-batch memo. The oracle replays BOTH steps in pure SQL
    (``_bpe_oracle``), so the entry is fully hash-matched."""
    from data_pipeline_with_spark_spark.llm import bpe

    docs = read_testdata(spark, sf, "documents")
    merges = bpe.bpe_train(docs, n_merges=_BPE_N_MERGES)
    out = bpe.apply_bpe(docs, merges)
    return out.select(
        "doc_id",
        "n_bpe_tokens",
        F.md5(F.concat_ws(" ", F.col("bpe_tokens"))).alias("bpe_digest"),
    )


def _bpe_oracle(n_merges: int = _BPE_N_MERGES) -> str:
    """Generate the DuckDB replay of the WHOLE BPE pipeline — training
    AND apply — as one static SQL statement (r8 verdict item #6,
    upgraded from the suggested frozen-merge-table replay to a fully
    independent one: the SQL learns its own merges from the corpus).

    Training: the ``n_merges`` rounds unroll as chained CTEs. Each
    word's piece state is a STRING with every piece wrapped in single
    spaces (``' p  q '``): merging pair (a, b) is then exactly
    ``replace(s, ' a  b ', ' ab ')`` — SQL replace is leftmost
    non-overlapping, which IS BPE's left-to-right single-round
    application (piece wrapping makes whole-piece matches structural;
    the a==b run case works because each replacement consumes its
    trailing delimiter). Winner per round = max summed count, then
    lexicographically smallest (a, b) — the exact Python tiebreak.

    Apply: rank-ordered iteration (a recursive CTE joining rank r at
    step r). Applying each merge exhaustively in RANK order equals
    ``encode_word``'s greedy lowest-rank-first because trained merge
    lists are closed under construction: any pair involving a merged
    token (x, ab) can only have been learned AFTER (a, b), so by-rank
    application never misses a lower-rank opportunity, and merging
    (a, b) can never create a new (a, b) occurrence (|ab| > |a|, |b|).

    Every CTE referenced more than once is MATERIALIZED — without it
    DuckDB inlines the round chain and the plan explodes
    exponentially."""
    toks = _TOKS_SQL
    w0 = (
        "' ' || array_to_string(list_append("
        "list_transform(range(1, length(word)+1), i -> word[i]), '</w>'), '  ') || ' '"
    )
    parts = [
        f"""
hist AS MATERIALIZED (
  SELECT w AS word, count(*) AS cnt FROM (
    SELECT unnest({toks}) AS w FROM documents
  ) GROUP BY w ORDER BY cnt DESC, word ASC LIMIT 100000
),
w0 AS MATERIALIZED (SELECT {w0} AS s, cnt FROM hist)"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""
p{r} AS MATERIALIZED (
  SELECT pcs[i] AS a, pcs[i+1] AS b, sum(cnt) AS w FROM (
    SELECT pcs, cnt, unnest(range(1, len(pcs))) AS i FROM (
      SELECT list_filter(string_split(s, ' '), x -> x <> '') AS pcs, cnt FROM w{r})
  ) GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
  SELECT max(a) AS a, max(b) AS b
  FROM (SELECT a, b FROM p{r} ORDER BY w DESC, a ASC, b ASC LIMIT 1)
),
w{r + 1} AS MATERIALIZED (
  SELECT CASE WHEN b.a IS NULL THEN w.s
         ELSE replace(w.s, ' ' || b.a || '  ' || b.b || ' ', ' ' || b.a || b.b || ' ') END AS s,
         w.cnt
  FROM w{r} w, b{r} b
)"""
        )
    merges_union = "\n  UNION ALL ".join(
        f"SELECT {r} AS r, a, b FROM b{r} WHERE a IS NOT NULL"
        for r in range(n_merges)
    )
    parts.append(
        f"""
merges AS MATERIALIZED ({merges_union}),
doc_words AS MATERIALIZED (
  SELECT doc_id, i AS pos, ws[i] AS word FROM (
    SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i FROM (
      SELECT doc_id, {toks} AS ws FROM documents))
),
dw AS (SELECT DISTINCT word FROM doc_words),
enc AS (
  SELECT word, {w0} AS s, 0 AS r FROM dw
  UNION ALL
  SELECT e.word,
         CASE WHEN m.a IS NULL THEN e.s
              ELSE replace(e.s, ' ' || m.a || '  ' || m.b || ' ', ' ' || m.a || m.b || ' ') END,
         e.r + 1
  FROM enc e LEFT JOIN merges m ON m.r = e.r
  WHERE e.r < {n_merges}
),
encoded AS MATERIALIZED (
  SELECT word, list_filter(string_split(s, ' '), x -> x <> '') AS pieces
  FROM enc WHERE r = {n_merges}
),
doc_tokens AS (
  SELECT doc_id, flatten(list(pieces ORDER BY pos)) AS toks
  FROM (SELECT d.doc_id, d.pos, e.pieces FROM doc_words d JOIN encoded e USING (word))
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(len(t.toks), 0) AS BIGINT) AS n_bpe_tokens,
       md5(coalesce(array_to_string(t.toks, ' '), '')) AS bpe_digest
FROM documents d LEFT JOIN doc_tokens t USING (doc_id)"""
    )
    return "WITH RECURSIVE " + ",".join(parts)


register(
    QuerySpec(
        name="text_bpe_tokenize",
        build=_bpe_tokenize,
        doc="BPE subword tokenization: histogram-train (driver learns on word "
        "counts) + memoized Arrow-batch apply; oracle replays training AND "
        "apply in pure SQL (unrolled merge rounds + rank-ordered recursive "
        "apply)",
        oracle=_bpe_oracle(),
    )
)


def _pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub over the documents table. The fixture corpus contains
    no digits at all, so the redaction path could never fire on raw
    fixture text; deterministic PII spans (email/ssn/ipv4/phone) are
    derived from fixture columns first — same construction in the
    oracle — so the counts and the redacted digest exercise every
    pattern. Scale shape: one chained-regexp projection, zero
    shuffles; bodies leave the executor only as an md5 digest."""
    docs = read_testdata(spark, sf, "documents")
    d = F.col("doc_id")
    pii = F.concat(
        F.col("text"),
        F.lit(" contact user"), d.cast("string"),
        F.lit("@"), F.col("source"), F.lit(".org ip 10.20."),
        (d % 256).cast("string"), F.lit(".9"),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" ssn 123-45-"),
                     F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 2 == 0,
            F.concat(F.lit(" call 555-867-"),
                     F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    out = text.redact_pii(docs.withColumn("pii_text", pii), text_col="pii_text")
    return out.select(
        "doc_id", "n_email", "n_ssn", "n_ipv4", "n_phone",
        F.md5(F.col("text_redacted")).alias("redact_digest"),
        F.length("text_redacted").cast("bigint").alias("n_chars_redacted"),
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d[\d\s().-]{7,}\d"
_PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"

register(
    QuerySpec(
        name="text_pii_redaction",
        build=_pii_redaction,
        doc="regex PII scrub: per-kind counts + redacted-text digest (chained regexp_replace, zero shuffles)",
        oracle=f"""
        WITH p AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR) || '@'
                      || source || '.org ip 10.20.'
                      || CAST(doc_id % 256 AS VARCHAR) || '.9'
                      || CASE WHEN doc_id % 3 = 0
                              THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                              ELSE '' END
                      || CASE WHEN doc_id % 2 = 0
                              THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                              ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INT) AS n_email,
               CAST(len(regexp_extract_all(t, '{_PII_SSN}')) AS INT) AS n_ssn,
               CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS INT) AS n_ipv4,
               CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS INT) AS n_phone,
               md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                     t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                        '{_PII_SSN}', '[SSN]', 'g'),
                        '{_PII_IPV4}', '[IPV4]', 'g'),
                        '{_PII_PHONE}', '[PHONE]', 'g')) AS redact_digest,
               CAST(length(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                     t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                        '{_PII_SSN}', '[SSN]', 'g'),
                        '{_PII_IPV4}', '[IPV4]', 'g'),
                        '{_PII_PHONE}', '[PHONE]', 'g')) AS BIGINT) AS n_chars_redacted
        FROM p
        """,
    )
)


def _gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_gopher_rules(docs).select(
        "doc_id", "source", "n_tokens", "n_stopwords_distinct",
        "rule_word_count", "rule_mean_word_len", "rule_alpha_ratio",
        "rule_stopwords", "rule_symbol_ratio", "gopher_pass",
    )


# Shared CTE for the Gopher-rule oracles: integer-scaled thresholds,
# mirroring with_gopher_rules exactly (no float comparisons anywhere).
_GOPHER_RULES_SQL = f"""
        WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
        s AS (SELECT doc_id, source,
                     len(toks) AS n,
                     -- coalesce: list_sum([]) is NULL in DuckDB, while the
                     -- Spark aggregate's 0 seed gives 0 — a zero-token doc
                     -- must not NULL-poison the rule conjunction
                     coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS sum_len,
                     len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                     len(list_filter(toks, x -> NOT regexp_matches(x, '[a-z0-9]'))) AS n_symbol,
                     len(list_filter({_STOP_SQL}, w -> list_contains(toks, w))) AS n_stop
              FROM t),
        r AS (SELECT doc_id, source,
                     CAST(n AS BIGINT) AS n_tokens,
                     CAST(n_stop AS BIGINT) AS n_stopwords_distinct,
                     (n >= 30 AND n <= 10000) AS rule_word_count,
                     (sum_len >= 3 * n AND sum_len <= 10 * n) AS rule_mean_word_len,
                     (n_alpha * 5 >= n * 4) AS rule_alpha_ratio,
                     (n_stop >= 2) AS rule_stopwords,
                     (n_symbol * 10 <= n) AS rule_symbol_ratio
              FROM s)
        SELECT *, (rule_word_count AND rule_mean_word_len AND rule_alpha_ratio
                   AND rule_stopwords AND rule_symbol_ratio) AS gopher_pass
        FROM r
"""

register(
    QuerySpec(
        name="quality_gopher_rules",
        build=_gopher_rules,
        doc="Gopher-style filter rule battery: named boolean rules + conjunction, integer-scaled thresholds",
        oracle=_GOPHER_RULES_SQL,
    )
)


def _gopher_pass_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source funnel view of the rule battery: docs in, docs
    surviving each rule, overall pass count. The per-doc booleans
    aggregate with map-side partials — the report costs one shuffle of
    O(sources) rows regardless of corpus size."""
    rules = text.with_gopher_rules(read_testdata(spark, sf, "documents"))
    cnt = lambda c: F.sum(F.col(c).cast("long")).alias(f"n_{c}")  # noqa: E731
    return (
        rules.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("rule_word_count"),
            cnt("rule_mean_word_len"),
            cnt("rule_alpha_ratio"),
            cnt("rule_stopwords"),
            cnt("rule_symbol_ratio"),
            cnt("gopher_pass"),
        )
    )


register(
    QuerySpec(
        name="quality_gopher_pass_rate",
        build=_gopher_pass_rate,
        doc="per-source Gopher-rule funnel: survivors per rule + overall (one O(sources) shuffle)",
        oracle=f"""
        WITH rules AS ({_GOPHER_RULES_SQL})
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN rule_word_count THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_word_count,
               CAST(sum(CASE WHEN rule_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_mean_word_len,
               CAST(sum(CASE WHEN rule_alpha_ratio THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_alpha_ratio,
               CAST(sum(CASE WHEN rule_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_stopwords,
               CAST(sum(CASE WHEN rule_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_symbol_ratio,
               CAST(sum(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass
        FROM rules GROUP BY source
        """,
    )
)


# --------------------------------------------------------------------------
# Deduplication
def _exact_groups(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dedup_groups(read_testdata(spark, sf, "documents"))


register(
    QuerySpec(
        name="dedup_exact_groups",
        build=_exact_groups,
        doc="exact dedup groups: md5(text) → keeper id + copy count",
        oracle="""
        SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
        """,
    )
)


def _exact_keep(spark: SparkSession, sf: str) -> DataFrame:
    # r16: same one-pass restructure as curation_pipeline (and the same
    # equivalence proof — the oracle IS the window form): this entry's
    # output drops ``text``, so dedup.exact_dedup's two-branch semi-join
    # shape (which exists so outputs CAN carry text without shuffling
    # bodies) paid a second full corpus scan for nothing. One scan, one
    # narrow (md5, id, lang, source) exchange, partial WindowGroupLimit
    # above the scan. exact_dedup itself is unchanged (pytest-covered);
    # callers that keep text should still use it.
    from pyspark.sql import Window

    docs = read_testdata(spark, sf, "documents")
    w = Window.partitionBy("__text_hash").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", "source", F.md5(F.col("text")).alias("__text_hash"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc_id", "lang", "source")
    )


register(
    QuerySpec(
        name="dedup_exact_keep_one",
        build=_exact_keep,
        doc="exact dedup keeping the min-id row per distinct text",
        oracle="""
        SELECT doc_id, lang, source FROM documents
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        """,
    )
)


_K_SHINGLE, _NUM_HASHES, _BANDS = 3, 16, 8
_ROWS_PER_BAND = _NUM_HASHES // _BANDS

_SHINGLES_SQL = (
    f"list_distinct(list_transform(generate_series(1, greatest(len(toks) - {_K_SHINGLE} + 1, 1)),"
    f" i -> array_to_string(toks[i:i+{_K_SHINGLE}-1], ' ')))"
)
# Chunked minhash (see llm/dedup.py): element j = min over shingles of
# substr(md5((j div 4) || ':' || shingle), (j mod 4)*8 + 1, 8).
_MINHASH_SQL = (
    "["
    + ", ".join(
        f"list_min(list_transform(shingles, s -> substr(md5('{j // 4}:' || s), {(j % 4) * 8 + 1}, 8)))"
        for j in range(_NUM_HASHES)
    )
    + "]"
)


def _minhash_sigs(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    sigs = dedup.with_minhash(docs, k_shingle=_K_SHINGLE, num_hashes=_NUM_HASHES)
    return sigs.select(
        "doc_id",
        F.element_at("minhash", 1).alias("sig_first"),
        F.md5(F.concat_ws("", "minhash")).alias("sig_digest"),
    )


register(
    QuerySpec(
        name="dedup_minhash_signatures",
        build=_minhash_sigs,
        headline=True,
        doc="MinHash signatures (16 md5 hash functions over 3-gram shingles)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
        sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh)
        SELECT doc_id, minhash[1] AS sig_first,
               md5(array_to_string(minhash, '')) AS sig_digest
        FROM sig
        """,
    )
)


def _lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    # max_bucket=None: this entry's DuckDB oracle is the EXACT
    # all-pairs candidate set, so the scale-safe default cap is
    # explicitly opted out here (the capped behavior has its own
    # hash-matched entry, dedup_lsh_capped_buckets).
    return dedup.minhash_candidate_pairs(
        docs, k_shingle=_K_SHINGLE, num_hashes=_NUM_HASHES, bands=_BANDS,
        max_bucket=None,
    )


_BANDS_SQL = (
    "["
    + ", ".join(
        f"md5(array_to_string(minhash[{b * _ROWS_PER_BAND + 1}:{(b + 1) * _ROWS_PER_BAND}], ''))"
        for b in range(_BANDS)
    )
    + "]"
)

register(
    QuerySpec(
        name="dedup_minhash_lsh_pairs",
        build=_lsh_pairs,
        headline=True,
        doc="LSH banded candidate pairs (8 bands × 2 rows)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
        sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
        bands AS (
          SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
          FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
        """,
    )
)


# Cap chosen so the too-common-bucket drop actually FIRES on the
# fixtures (bucket-size distribution at sf0.001/0.01 tops out at 3–4;
# a cap of 2 drops those buckets whole while the 150+ size-2 buckets
# keep the result non-degenerate) — hash-matched evidence that the
# scale-safe capped semantics (r8 verdict item #2) are exactly
# "all-pairs minus pairs whose ONLY shared bucket was too common".
_CAP_DEMO = 2


def _lsh_capped(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return dedup.minhash_candidate_pairs(
        docs, k_shingle=_K_SHINGLE, num_hashes=_NUM_HASHES, bands=_BANDS,
        max_bucket=_CAP_DEMO,
    )


register(
    QuerySpec(
        name="dedup_lsh_capped_buckets",
        build=_lsh_capped,
        doc=(
            "LSH candidate pairs under the scale-safe too-common-bucket "
            f"cap (buckets > {_CAP_DEMO} docs dropped whole)"
        ),
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
        sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
        bands AS (
          SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
          FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
        ),
        kept AS (
          SELECT band_idx, band_hash FROM bands
          GROUP BY band_idx, band_hash
          HAVING COUNT(*) BETWEEN 2 AND {_CAP_DEMO}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN kept k ON k.band_idx = a.band_idx AND k.band_hash = a.band_hash
        JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id
        """,
    )
)


# r12 verdict task 7: exercise the documented cap CLIFF (a duplicate
# CLUSTER larger than the cap overflows EVERY band bucket it touches,
# losing ALL its pairs at once — llm/dedup.py minhash_candidate_pairs
# docstring) against the exact-group backstop. Cap 8 sits above the
# fixtures' organic bucket sizes (3-4), so the ONLY thing the cap drops
# is the planted 13-doc mega-cluster — the entry's output shows its
# members with n_lsh_pairs = 0 (the cliff) but exact_group_size = 13
# and a common exact_keeper (the recovery path: exact dedup is
# hash-group LINEAR, the right tool for near-exact mega-clusters).
_CLIFF_CAP = 8
_CLIFF_M = 12  # planted copies; cluster = seed + 12 = 13 > cap


def _lsh_cap_cliff(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents").select("doc_id", "text")
    seed = docs.orderBy("doc_id").limit(1)
    planted = seed.select(
        F.explode(F.sequence(F.lit(1), F.lit(_CLIFF_M))).alias("i"), "text"
    ).select((F.lit(10_000_000) + F.col("i")).alias("doc_id"), "text")
    corpus = docs.unionByName(planted)
    pairs = dedup.minhash_candidate_pairs(
        corpus, k_shingle=_K_SHINGLE, num_hashes=_NUM_HASHES, bands=_BANDS,
        max_bucket=_CLIFF_CAP,
    )
    touched = pairs.select(F.col("id_a").alias("doc_id")).unionByName(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    lsh_counts = touched.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lsh_pairs")
    )
    dig = corpus.select("doc_id", F.md5("text").alias("__d"))
    groups = dig.groupBy("__d").agg(
        F.min("doc_id").alias("exact_keeper"),
        F.count(F.lit(1)).cast("bigint").alias("exact_group_size"),
    )
    return (
        dig.join(groups, "__d")
        .join(lsh_counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lsh_pairs", F.lit(0).cast("bigint")).alias(
                "n_lsh_pairs"
            ),
            "exact_keeper",
            "exact_group_size",
        )
        .where((F.col("exact_group_size") > 1) | (F.col("n_lsh_pairs") > 0))
    )


register(
    QuerySpec(
        name="dedup_lsh_cap_cliff_recovery",
        build=_lsh_cap_cliff,
        doc=(
            "planted 13-doc mega-cluster vs the LSH bucket cap: its pairs "
            "drop whole (the documented cliff) while exact-group dedup "
            "recovers the cluster; organic near-dup pairs survive the cap"
        ),
        oracle=f"""
        WITH planted AS (
          SELECT CAST(10000000 + i AS BIGINT) AS doc_id,
                 (SELECT text FROM documents ORDER BY doc_id LIMIT 1) AS text
          FROM generate_series(1, {_CLIFF_M}) AS g(i)
        ),
        corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM planted
        ),
        t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM corpus),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
        sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
        bands AS (
          SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
          FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
        ),
        kept AS (
          SELECT band_idx, band_hash FROM bands
          GROUP BY band_idx, band_hash
          HAVING COUNT(*) BETWEEN 2 AND {_CLIFF_CAP}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN kept k ON k.band_idx = a.band_idx AND k.band_hash = a.band_hash
          JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          WHERE a.doc_id < b.doc_id
        ),
        touched AS (
          SELECT id_a AS doc_id FROM pairs
          UNION ALL SELECT id_b AS doc_id FROM pairs
        ),
        lshc AS (SELECT doc_id, COUNT(*) AS n_lsh_pairs FROM touched GROUP BY doc_id),
        dig AS (SELECT doc_id, md5(text) AS d FROM corpus),
        grp AS (SELECT d, min(doc_id) AS exact_keeper,
                       COUNT(*) AS exact_group_size
                FROM dig GROUP BY d)
        SELECT dig.doc_id,
               CAST(coalesce(l.n_lsh_pairs, 0) AS BIGINT) AS n_lsh_pairs,
               grp.exact_keeper,
               CAST(grp.exact_group_size AS BIGINT) AS exact_group_size
        FROM dig
        JOIN grp ON dig.d = grp.d
        LEFT JOIN lshc l ON dig.doc_id = l.doc_id
        WHERE grp.exact_group_size > 1 OR coalesce(l.n_lsh_pairs, 0) > 0
        """,
    )
)


def _jaccard_consecutive(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    ids = docs.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("id_a"))
        .join(ids.select(F.col("doc_id").alias("id_b")), F.expr("id_b = id_a + 1"))
    )
    return dedup.jaccard_pairs(docs, pairs, k_shingle=_K_SHINGLE)


register(
    QuerySpec(
        name="dedup_ngram_jaccard",
        build=_jaccard_consecutive,
        doc="exact shingle-set Jaccard on a deterministic pair set",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE),
                     6) AS jaccard
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
    )
)


def _dup_components(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    pairs = dedup.near_dup_pairs(
        docs,
        threshold=0.7,
        k_shingle=_K_SHINGLE,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
    ).select("id_a", "id_b")
    cc = dedup.connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").cast("bigint").alias("component")
    )


register(
    QuerySpec(
        name="dedup_connected_components",
        build=_dup_components,
        doc="dup-cluster resolution: min-label propagation over verified near-dup pairs "
        "(iterative label joins; oracle = recursive CTE transitive closure)",
        oracle=f"""
        WITH RECURSIVE t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
        sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
        bands AS (
          SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
          FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          WHERE a.doc_id < b.doc_id
        ),
        ver AS (
          SELECT c.id_a, c.id_b
          FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
          WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE),
                6) >= 0.7
        ),
        e AS (SELECT id_a AS src, id_b AS dst FROM ver
              UNION SELECT id_b AS src, id_a AS dst FROM ver),
        reach AS (
          SELECT src, src AS node FROM (SELECT DISTINCT src FROM e)
          UNION
          SELECT r.src, e.dst AS node FROM reach r JOIN e ON e.src = r.node
        )
        SELECT node AS doc_id, CAST(min(src) AS BIGINT) AS component
        FROM reach GROUP BY node
        """,
    )
)


def _dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return dedup.duplicated_spans(docs, win=20, stride=10)


register(
    QuerySpec(
        name="dedup_duplicated_spans",
        build=_dup_spans,
        doc="cross-doc duplicated 20-token spans (boilerplate pass; hash-only shuffle)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        w AS (
          SELECT doc_id, unnest(list_transform(
                   range(1, greatest(CAST(floor((len(toks) - 20) / 10.0) AS INT) + 1, 1) + 1),
                   i -> md5(array_to_string(toks[(i-1)*10+1:(i-1)*10+20], ' ')))) AS win_hash
          FROM t)
        SELECT win_hash,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               count(*) AS n_occurrences,
               min(doc_id) AS example_doc
        FROM w GROUP BY win_hash HAVING count(DISTINCT doc_id) >= 2
        """,
    )
)


_SIMHASH_BITS = 16


def _simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return dedup.with_simhash(docs, bits=_SIMHASH_BITS).select("doc_id", "simhash")


_SIMHASH_TERMS = " + ".join(
    f"CASE WHEN list_sum(list_transform(toks_d, s ->"
    f" CASE WHEN substr(md5(s), {b + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0"
    f" THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for b in range(_SIMHASH_BITS)
)

register(
    QuerySpec(
        name="dedup_simhash",
        build=_simhash,
        doc="Charikar SimHash (16-bit, portable hex-nibble bit source)",
        oracle=f"""
        WITH t AS (SELECT doc_id, list_distinct({_TOKS_SQL}) AS toks_d FROM documents)
        SELECT doc_id, {_SIMHASH_TERMS} AS simhash FROM t
        """,
    )
)


def _paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Paragraph-level corpus dedup. The fixture has no structural
    separators, so 8-token blocks stand in for paragraphs (the fixture
    genuinely repeats ~5% of 8-token blocks via its duplicate docs, so
    the drop path fires). Output digests the rebuilt text so the
    driver's pandas canonicalizer sees only scalars."""
    docs = read_testdata(spark, sf, "documents")
    out = dedup.paragraph_dedup(docs, block_tokens=8)
    return out.select(
        "doc_id", "n_paras", "n_kept",
        F.md5(F.col("text_dedup")).alias("dedup_digest"),
    )


register(
    QuerySpec(
        name="dedup_paragraphs",
        build=_paragraph_dedup,
        doc="corpus-wide paragraph dedup (keep first occurrence, rebuild docs; digest-only shuffles)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        p AS (SELECT doc_id, CAST(g AS INT) AS para_idx,
                     array_to_string(toks[(g*8+1):((g+1)*8)], ' ') AS para
              FROM t, unnest(range(CAST(greatest(ceil(len(toks)/8.0), 1) AS BIGINT))) AS u(g)),
        k AS (SELECT doc_id, para_idx, para,
                     row_number() OVER (PARTITION BY md5(para)
                                        ORDER BY doc_id, para_idx) AS rn
              FROM p),
        np AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY doc_id),
        kept AS (SELECT doc_id, count(*) AS n_kept,
                        string_agg(para, ' ' ORDER BY para_idx) AS text_dedup
                 FROM k WHERE rn = 1 GROUP BY doc_id)
        SELECT doc_id, CAST(np.n_paras AS BIGINT) AS n_paras,
               CAST(kept.n_kept AS BIGINT) AS n_kept,
               md5(text_dedup) AS dedup_digest
        FROM np JOIN kept USING (doc_id)
        """,
    )
)


def _repeated_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-doc repeated 8-token SLIDING spans (Lee et al. '21 style
    exact-substring dedup; distinct from dedup_paragraphs' disjoint
    blocks — sliding windows catch repeats at ANY offset)."""
    docs = read_testdata(spark, sf, "documents")
    return dedup.repeated_spans(docs, k=8)


register(
    QuerySpec(
        name="dedup_repeated_spans",
        build=_repeated_spans,
        doc="cross-document repeated k-token sliding spans (exact-substring "
        "dedup signal): per-doc duplicated-window counts/ratio; only md5 "
        "digests shuffle",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        g AS (
          SELECT doc_id, array_to_string(toks[i : i + 7], ' ') AS gram
          FROM (SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 6, 1))) AS i
                FROM t)
        ),
        dup AS (
          SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2
        ),
        per AS (
          SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup_spans
          FROM g LEFT JOIN dup d USING (gram) GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_grams, 0) AS n_grams,
               coalesce(p.n_dup_spans, 0) AS n_dup_spans,
               round(CASE WHEN coalesce(p.n_grams, 0) > 0
                          THEN coalesce(p.n_dup_spans, 0)
                               / CAST(p.n_grams AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_span_ratio
        FROM documents d LEFT JOIN per p USING (doc_id)
        """,
    )
)


def _remove_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring dedup ACTION (dedup.remove_dup_spans): cut every
    token covered by a cross-doc duplicated 8-gram and rebuild; the
    oracle reconstructs the exact cleaned text (md5 must match)."""
    docs = read_testdata(spark, sf, "documents")
    return dedup.remove_dup_spans(docs, k=8)


register(
    QuerySpec(
        name="dedup_remove_dup_spans",
        build=_remove_dup_spans,
        doc="cut cross-document duplicated spans from the corpus (Lee et al. "
        "exact-substring removal): per-doc kept-token count + md5 of the "
        "rebuilt text; digest shuffles + expression-side interval masking",
        oracle=f"""
        WITH t AS MATERIALIZED (
          SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
        ),
        g AS MATERIALIZED (
          SELECT doc_id, i - 1 AS pos,
                 array_to_string(toks[i : i + 7], ' ') AS gram
          FROM (SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 6, 1))) AS i
                FROM t)
        ),
        dup AS (
          SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2
        ),
        covered AS MATERIALIZED (
          SELECT DISTINCT d.doc_id, d.pos + o.off AS ti
          FROM (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)) d,
               (SELECT unnest(range(0, 8)) AS off) o
        ),
        tok AS (
          SELECT doc_id, tk, idx - 1 AS ti
          FROM (SELECT doc_id, unnest(toks) AS tk,
                       unnest(range(1, len(toks) + 1)) AS idx
                FROM t)
        ),
        kept AS (
          SELECT tok.doc_id,
                 count(*) AS n_kept,
                 string_agg(tk, ' ' ORDER BY tok.ti) AS cleaned
          FROM tok LEFT JOIN covered c
            ON tok.doc_id = c.doc_id AND tok.ti = c.ti
          WHERE c.ti IS NULL
          GROUP BY tok.doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
               md5(coalesce(k.cleaned, '')) AS dedup_digest
        FROM t LEFT JOIN kept k USING (doc_id)
        """,
    )
)


def _longest_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Variable-length exact-substring dedup signal (Lee et al. '21
    longest-match semantics): maximal cross-doc duplicated token
    regions from maximal duplicated-k-gram runs (exact for the
    "every substring of length >= k occurring in >= 2 docs" contract;
    see dedup.longest_dup_spans)."""
    docs = read_testdata(spark, sf, "documents")
    return dedup.longest_dup_spans(docs, k=8)


register(
    QuerySpec(
        name="dedup_longest_dup_spans",
        build=_longest_dup_spans,
        doc="maximal cross-document duplicated token regions (variable-length "
        "exact-substring dedup): per-doc region count, longest span, dup-token "
        "total/ratio; digest-grouping shuffles, run detection expression-side",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        g AS MATERIALIZED (
          SELECT doc_id, i - 1 AS pos,
                 array_to_string(toks[i : i + 7], ' ') AS gram
          FROM (SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 6, 1))) AS i
                FROM t)
        ),
        dup AS (
          SELECT gram FROM g GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2
        ),
        isl AS (
          SELECT g.doc_id, g.pos,
                 g.pos - row_number() OVER (PARTITION BY g.doc_id
                                            ORDER BY g.pos) AS grp
          FROM g JOIN dup USING (gram)
        ),
        r AS (SELECT doc_id, count(*) + 7 AS span FROM isl GROUP BY doc_id, grp),
        per AS (
          SELECT doc_id, count(*) AS n_dup_regions,
                 max(span) AS max_dup_span, sum(span) AS dup_tokens
          FROM r GROUP BY doc_id
        ),
        nt AS (SELECT doc_id, len(toks) AS n_tokens FROM t)
        SELECT nt.doc_id,
               CAST(nt.n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_dup_regions, 0) AS BIGINT) AS n_dup_regions,
               CAST(coalesce(p.max_dup_span, 0) AS BIGINT) AS max_dup_span,
               CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               round(CASE WHEN nt.n_tokens > 0
                          THEN coalesce(p.dup_tokens, 0)
                               / CAST(nt.n_tokens AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_token_ratio
        FROM nt LEFT JOIN per p USING (doc_id)
        """,
    )
)


def _boilerplate_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source boilerplate rate: the fraction of a source's
    paragraphs that are duplicates of an earlier occurrence anywhere in
    the corpus — the curation dashboard number paragraph dedup exists
    to drive (high rate → templated/scraped source). Derived entirely
    from paragraph_dedup output, so the shuffles stay digest-only;
    the ratio divides two longs once, per NEXT.md float discipline."""
    docs = read_testdata(spark, sf, "documents")
    # include_subsumed keeps fully-duplicate docs as n_kept=0 rows, so
    # the per-source denominator counts ALL paragraphs and the
    # segmentation arithmetic lives in exactly one place (dedup.py)
    out = dedup.paragraph_dedup(docs, block_tokens=8, include_subsumed=True)
    return (
        out.groupBy("source")
        .agg(
            F.sum("n_paras").cast("bigint").alias("n_paras"),
            F.sum("n_kept").cast("bigint").alias("n_kept"),
        )
        .withColumn(
            "boilerplate_rate",
            F.round(
                (F.col("n_paras") - F.col("n_kept")).cast("double")
                / F.col("n_paras").cast("double"),
                6,
            ),
        )
    )


register(
    QuerySpec(
        name="dedup_boilerplate_rate",
        build=_boilerplate_rate,
        doc="per-source duplicated-paragraph fraction (curation dashboard over paragraph dedup; digest-only shuffles)",
        oracle=f"""
        WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
        p AS (SELECT doc_id, source, CAST(g AS INT) AS para_idx,
                     array_to_string(toks[(g*8+1):((g+1)*8)], ' ') AS para
              FROM t, unnest(range(CAST(greatest(ceil(len(toks)/8.0), 1) AS BIGINT))) AS u(g)),
        k AS (SELECT doc_id, source,
                     row_number() OVER (PARTITION BY md5(para)
                                        ORDER BY doc_id, para_idx) AS rn
              FROM p),
        s AS (SELECT source, count(*) AS n_paras,
                     sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept
              FROM k GROUP BY source)
        SELECT source, CAST(n_paras AS BIGINT) AS n_paras,
               CAST(n_kept AS BIGINT) AS n_kept,
               round(CAST(n_paras - n_kept AS DOUBLE) / CAST(n_paras AS DOUBLE), 6)
                 AS boilerplate_rate
        FROM s
        """,
    )
)


# --------------------------------------------------------------------------
# Similarity search
_COS_SQL_RAW = (
    "(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
)

_COS_SQL = (
    "round(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))), 6)"
)


def _bf_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return similarity.brute_force_topk(emb, queries, k=5)


register(
    QuerySpec(
        name="sim_cosine_topk_bruteforce",
        build=_bf_topk,
        headline=True,
        doc="exact cosine top-5 neighbors for 5 query vectors (broadcast + window)",
        oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, e.vec_id AS neighbor_id,
                 {_COS_SQL.format(a='e.embedding', b='q.q_emb')} AS cos_sim
          FROM embeddings e, q WHERE e.vec_id <> q.q_id)
        SELECT q_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rnk FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        """,
    )
)


def _l2norm_topk(spark: SparkSession, sf: str) -> DataFrame:
    """The bridge that lets the L2-metric ANN family (PQ ADC / IVFPQ)
    serve cosine workloads: on unit-normalized vectors squared L2 IS
    2 − 2·cosine, so ranking by it reproduces the cosine ranking
    exactly. Spark genuinely normalizes (one corpus pass) and scores
    sum((a/|a| − b/|b|)²); the oracle scores the closed form
    2 − 2·cos — a hash match certifies the identity end-to-end."""
    emb = similarity.l2_normalize(read_testdata(spark, sf, "embeddings"))
    queries = emb.where(F.col("vec_id") < 5)
    return similarity.brute_force_l2_topk(emb, queries, k=5)


register(
    QuerySpec(
        name="sim_l2_normalized_topk",
        build=_l2norm_topk,
        doc="squared-L2 top-5 over unit-normalized embeddings == the cosine "
        "ranking (|a-b|^2 = 2-2cos on the sphere); oracle scores the closed "
        "form, Spark the real normalize-and-subtract",
        oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, e.vec_id AS neighbor_id,
                 round(2 - 2 * {_COS_SQL_RAW.format(a='e.embedding', b='q.q_emb')}, 6) AS l2_sq
          FROM embeddings e, q WHERE e.vec_id <> q.q_id)
        SELECT q_id, neighbor_id, l2_sq, CAST(rnk AS INT) AS rnk FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY l2_sq ASC, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        """,
    )
)


_LSH_BITS = 8
_BUCKET_SQL = " + ".join(
    f"CASE WHEN {{e}}[{i + 1}] > 0 THEN {2 ** i} ELSE 0 END" for i in range(_LSH_BITS)
)


def _lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return similarity.lsh_bucketed_topk(emb, queries, k=5, bits=_LSH_BITS)


register(
    QuerySpec(
        name="sim_cosine_topk_lsh",
        build=_lsh_topk,
        doc="sign-LSH bucketed approximate top-5 (candidates meet in-bucket only)",
        oracle=f"""
        WITH b AS (SELECT vec_id, embedding,
                          {_BUCKET_SQL.format(e='embedding')} AS bucket
                   FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM b WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, e.vec_id AS neighbor_id,
                 {_COS_SQL.format(a='e.embedding', b='q.q_emb')} AS cos_sim
          FROM b e JOIN q ON e.bucket = q.bucket
          WHERE e.vec_id <> q.q_id)
        SELECT q_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rnk FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        """,
    )
)


def _emb_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    # 0.3 (not the production 0.9): fixture embeddings have no true
    # near-dups (max pairwise cosine ≈ 0.51), and a threshold above the
    # data's range would make the oracle comparison vacuous (0 ≡ 0).
    emb = read_testdata(spark, sf, "embeddings")
    return similarity.embedding_near_dup_pairs(emb, threshold=0.3, bits=_LSH_BITS)


register(
    QuerySpec(
        name="sim_embedding_near_dups",
        build=_emb_near_dups,
        headline=True,
        doc="embedding-cosine similar-pair mining via bucketed self-join",
        oracle=f"""
        WITH b AS (SELECT vec_id, embedding,
                          {_BUCKET_SQL.format(e='embedding')} AS bucket
                   FROM embeddings)
        SELECT a.vec_id AS id_a, x.vec_id AS id_b,
               {_COS_SQL.format(a='a.embedding', b='x.embedding')} AS cos_sim
        FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
        WHERE {_COS_SQL.format(a='a.embedding', b='x.embedding')} >= 0.3
        """,
    )
)


# --------------------------------------------------------------------------
# Multimodal
def _mm_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_binary_payload(docs)
    return assets.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        # bigint on BOTH sides: DuckDB max(INTEGER) is int32 here but the
        # oracle casts to BIGINT (sum is HUGEINT — the r4 hash-fail), so
        # the Spark column must be width-stable too.
        F.max(F.col("meta.n_bytes")).cast("bigint").alias("max_bytes"),
    )


register(
    QuerySpec(
        name="multimodal_meta_stats",
        build=_mm_stats,
        doc="binary payload + typed metadata struct carried through relational ops",
        oracle="""
        SELECT 'text/plain' AS mime, count(*) AS n_assets,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents
        """,
    )
)


def _mm_features(spark: SparkSession, sf: str) -> DataFrame:
    # REAL decode path: payloads are genuine 24x16 BMP containers
    # (pure-numpy codec, llm/codecs.py); pixel i of doc d is
    # (d*177 + i*55) % 256, so the oracle replays the generator formula
    # in SQL — if the BMP encode/decode or luma math were wrong, the
    # checksum/histogram hashes would not match.
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_image_payload(docs, width=24, height=16)
    feats = multimodal.extract_features(assets, fake=False)
    hist_int = F.transform(
        "features", lambda x: F.floor(x * F.lit(384.0) + F.lit(0.5)).cast("int")
    )
    return feats.select(
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.col("checksum").cast("bigint").alias("checksum"),
        F.md5(F.concat_ws(",", hist_int)).alias("hist_digest"),
    )


register(
    QuerySpec(
        name="multimodal_extract_features",
        build=_mm_features,
        doc="Arrow-batched mapInPandas over REAL BMP decode (pure-numpy codec, "
        "llm/codecs.py); oracle replays the deterministic pixel generator in SQL "
        "(1206 = 54-byte BMP header + 16 rows x 72 bytes)",
        oracle="""
        WITH px AS (
          SELECT doc_id,
                 list_transform(range(0, 384), i -> (doc_id*177 + i*55) % 256) AS p
          FROM documents
        )
        SELECT doc_id,
               CAST(1206 AS BIGINT) AS n_bytes,
               CAST(list_sum(p) AS BIGINT) AS checksum,
               md5(array_to_string(
                 list_transform(range(0, 16), b ->
                   len(list_filter(p, v -> v // 16 = b))), ',')) AS hist_digest
        FROM px
        """,
    )
)


def _mm_png_features(spark: SparkSession, sf: str) -> DataFrame:
    # Same real-decode contract as multimodal_extract_features but the
    # container is PNG: the payload round-trips encode_png (zlib-
    # compressed filtered scanlines) -> decode_png (CRC check, inflate,
    # unfilter), so a single wrong byte anywhere in the PNG path breaks
    # the checksum/histogram hash match. n_bytes is omitted — a
    # compressed container's size is not SQL-replayable (and is the
    # point: the bytes differ per doc while the PIXELS match the
    # generator formula the oracle replays).
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_image_payload(docs, width=24, height=16, fmt="png")
    feats = multimodal.extract_features(assets, fake=False)
    hist_int = F.transform(
        "features", lambda x: F.floor(x * F.lit(384.0) + F.lit(0.5)).cast("int")
    )
    return feats.select(
        "doc_id",
        F.col("checksum").cast("bigint").alias("checksum"),
        F.md5(F.concat_ws(",", hist_int)).alias("hist_digest"),
    )


register(
    QuerySpec(
        name="multimodal_png_features",
        build=_mm_png_features,
        doc="Arrow-batched mapInPandas over REAL PNG decode (stdlib-zlib IDAT, "
        "llm/codecs.py); oracle replays the deterministic pixel generator in SQL "
        "— the hash only matches if the zlib round-trip is pixel-exact",
        oracle="""
        WITH px AS (
          SELECT doc_id,
                 list_transform(range(0, 384), i -> (doc_id*177 + i*55) % 256) AS p
          FROM documents
        )
        SELECT doc_id,
               CAST(list_sum(p) AS BIGINT) AS checksum,
               md5(array_to_string(
                 list_transform(range(0, 16), b ->
                   len(list_filter(p, v -> v // 16 = b))), ',')) AS hist_digest
        FROM px
        """,
    )
)


def _mm_jpeg_features(spark: SparkSession, sf: str) -> DataFrame:
    # Real-decode contract for the LOSSY container: the payload
    # round-trips encode_jpeg(quality=100) -> decode_jpeg (Huffman
    # entropy decode, dequant, IDCT). The image is 8x8 BLOCK-CONSTANT,
    # so at unit quantizer the round trip is BIT-EXACT (DC-only blocks
    # — see multimodal.attach_jpeg_payload) and the oracle can replay
    # the block-value formula; any slip in the Huffman coder, zigzag,
    # DPCM predictor or IDCT rounding breaks the hash match.
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_jpeg_payload(docs, width=24, height=16)
    feats = multimodal.extract_features(assets, fake=False)
    hist_int = F.transform(
        "features", lambda x: F.floor(x * F.lit(384.0) + F.lit(0.5)).cast("int")
    )
    return feats.select(
        "doc_id",
        F.col("checksum").cast("bigint").alias("checksum"),
        F.md5(F.concat_ws(",", hist_int)).alias("hist_digest"),
    )


register(
    QuerySpec(
        name="multimodal_jpeg_features",
        build=_mm_jpeg_features,
        doc="Arrow-batched mapInPandas over REAL baseline-JPEG decode (pure-"
        "numpy T.81 Huffman+IDCT, llm/codecs.py); block-constant images at "
        "quality=100 make the lossy codec bit-exact, so the oracle replays "
        "the block-value generator in SQL",
        oracle="""
        WITH px AS (
          -- 24x16 grid of 8x8 constant blocks, 3 blocks per row:
          -- pixel i sits in block (i//24//8)*3 + (i%24)//8
          SELECT doc_id,
                 list_transform(range(0, 384), i ->
                   (doc_id*177 + ((i // 192) * 3 + (i % 24) // 8) * 55) % 256) AS p
          FROM documents
        )
        SELECT doc_id,
               CAST(list_sum(p) AS BIGINT) AS checksum,
               md5(array_to_string(
                 list_transform(range(0, 16), b ->
                   len(list_filter(p, v -> v // 16 = b))), ',')) AS hist_digest
        FROM px
        """,
    )
)


def _mm_jpeg_progressive_features(spark: SparkSession, sf: str) -> DataFrame:
    # Progressive (SOF2) twin of multimodal_jpeg_features (r14, closes
    # the r13 verdict's residual gap #4): the payloads encode with the
    # multi-scan successive-approximation script
    # (codecs.encode_jpeg_progressive), so the Spark side exercises the
    # progressive entropy decoder — DC Al=1 + refinement, spectral AC
    # bands at Al=2 refined to 0, EOBn runs — end-to-end through the
    # Arrow-batched mapInPandas path. Block-constant images at unit
    # quantizer keep the round trip BIT-EXACT (identical quantized
    # coefficients to the baseline entry), so the SAME SQL generator
    # oracle must hash-match; any slip in scan sequencing, EOB-run
    # bookkeeping, refinement bit order, or the coefficient store
    # breaks it.
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_jpeg_payload(
        docs, width=24, height=16, progressive=True
    )
    feats = multimodal.extract_features(assets, fake=False)
    hist_int = F.transform(
        "features", lambda x: F.floor(x * F.lit(384.0) + F.lit(0.5)).cast("int")
    )
    return feats.select(
        "doc_id",
        F.col("checksum").cast("bigint").alias("checksum"),
        F.md5(F.concat_ws(",", hist_int)).alias("hist_digest"),
    )


register(
    QuerySpec(
        name="multimodal_jpeg_progressive_features",
        build=_mm_jpeg_progressive_features,
        doc="Arrow-batched mapInPandas over REAL progressive-JPEG decode "
        "(SOF2 spectral selection + successive approximation, pure-numpy "
        "T.81, llm/codecs.py); block-constant images at quality=100 keep the "
        "lossy codec bit-exact, so the baseline entry's SQL generator oracle "
        "replays it unchanged",
        oracle="""
        WITH px AS (
          SELECT doc_id,
                 list_transform(range(0, 384), i ->
                   (doc_id*177 + ((i // 192) * 3 + (i % 24) // 8) * 55) % 256) AS p
          FROM documents
        )
        SELECT doc_id,
               CAST(list_sum(p) AS BIGINT) AS checksum,
               md5(array_to_string(
                 list_transform(range(0, 16), b ->
                   len(list_filter(p, v -> v // 16 = b))), ',')) AS hist_digest
        FROM px
        """,
    )
)


def _audio_features(spark: SparkSession, sf: str) -> DataFrame:
    # REAL WAV decode path: payloads are genuine PCM16 RIFF/WAVE
    # containers (pure-struct parser, llm/codecs.py); sample i of doc d
    # is ((d*31 + i*7) % 2001) - 1000, so the oracle replays the
    # generator in SQL — wrong RIFF parsing or sample math breaks the
    # RMS / zero-crossing / peak hashes.
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_audio_payload(docs, n_samples=2048, sample_rate=8000)
    return multimodal.extract_audio_features(assets)


register(
    QuerySpec(
        name="multimodal_audio_features",
        build=_audio_features,
        doc="Arrow-batched mapInPandas over REAL PCM16 WAV decode (pure-struct "
        "RIFF parser, llm/codecs.py); oracle replays the deterministic sample "
        "generator in SQL",
        oracle="""
        WITH s AS (
          SELECT doc_id,
                 list_transform(range(0, 2048),
                                i -> ((doc_id*31 + i*7) % 2001) - 1000) AS smp
          FROM documents
        )
        SELECT doc_id,
               CAST(2048 AS BIGINT) AS n_samples,
               CAST(8000 AS INT) AS sample_rate,
               CAST(256 AS BIGINT) AS duration_ms,
               CAST(floor(sqrt(list_avg(list_transform(smp, x -> CAST(x*x AS DOUBLE)))) + 0.5) AS BIGINT) AS rms,
               CAST(len(list_filter(range(1, 2048), i -> smp[i+1]*smp[i] < 0)) AS BIGINT) AS zero_crossings,
               CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak
        FROM s
        """,
    )
)


def _video_motion(spark: SparkSession, sf: str) -> DataFrame:
    # REAL Y4M decode path: payloads are genuine YUV4MPEG2 containers
    # (pure-struct parser, llm/codecs.py); pixel i of frame f for doc d
    # is (d*177 + f*131 + i*55) % 256 — the oracle replays the
    # generator, so broken FRAME parsing or plane math breaks the
    # luma/motion hashes.
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_video_payload(docs, n_frames=8, width=16, height=8)
    return multimodal.video_motion_features(assets)


register(
    QuerySpec(
        name="multimodal_video_motion",
        build=_video_motion,
        headline=True,
        doc="per-clip motion (SAD between consecutive frames) over REAL Y4M "
        "video decode (pure-struct YUV4MPEG2 parser, llm/codecs.py); oracle "
        "replays the deterministic frame generator in SQL",
        oracle="""
        WITH px AS (
          SELECT doc_id,
                 list_transform(range(0, 8), f ->
                   list_transform(range(0, 128),
                                  i -> (doc_id*177 + f*131 + i*55) % 256)) AS fr
          FROM documents
        )
        SELECT doc_id,
               CAST(8 AS INT) AS n_frames,
               CAST(list_sum(list_transform(fr, l -> list_sum(l))) AS BIGINT)
                 AS luma_total,
               CAST(list_sum(list_transform(range(1, 8), f ->
                     list_sum(list_transform(range(0, 128), i ->
                       abs(fr[f+1][i+1] - fr[f][i+1]))))) AS BIGINT) AS motion_sad
        FROM px
        """,
    )
)


def _video_frames(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_video_payload(docs, n_frames=8, width=16, height=8)
    frames = multimodal.sample_video_frames(assets, every_nth=2)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.max("n_frames_total").alias("n_frames_total"),
        F.sum("luma_sum").alias("sampled_luma"),
    )


register(
    QuerySpec(
        name="multimodal_video_frame_sampling",
        build=_video_frames,
        doc="every-2nd-frame sampling over REAL Y4M decode (1 clip -> N frames "
        "inside the Arrow worker); per-frame luma sums are generator-replayable",
        oracle="""
        WITH s AS (
          SELECT doc_id, f,
                 list_sum(list_transform(range(0, 128),
                   i -> (doc_id*177 + f*131 + i*55) % 256)) AS luma
          FROM documents, (SELECT unnest([0, 2, 4, 6]) AS f)
        )
        SELECT doc_id,
               count(*) AS n_sampled,
               CAST(8 AS INT) AS n_frames_total,
               CAST(sum(luma) AS BIGINT) AS sampled_luma
        FROM s GROUP BY doc_id
        """,
    )
)


# Bound-style ANN oracles (r14 verdict task 1, the a7 pattern): each
# approximate entry reduces to per-query structural facts the oracle
# states exactly (k rows, distinct, non-self) plus a recall_ok flag
# asserting the documented mean-recall floor against the brute-force
# twin — whose own catalog entry is hash-verified against closed-form
# SQL. Floors hold with margin at every checked SF (measured r15:
# IVF means 0.84-0.96, PQ 0.6-0.8, IVFPQ 0.6-0.88, stream-IVFPQ
# 0.6-0.68); the search itself stays approximate, the CONTRACT is
# what becomes hash-checkable.
_ANN_BOUND_ORACLE = """
        SELECT vec_id AS query_id,
               CAST(5 AS BIGINT) AS n_returned,
               TRUE AS distinct_ok,
               TRUE AS no_self,
               TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 5
        """


def _ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    approx = similarity.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    return similarity.topk_recall_summary(approx, exact, k=5, floor=0.6)


register(
    QuerySpec(
        name="sim_cosine_topk_ivf",
        build=_ivf_topk,
        doc="IVF ANN: seeded k-means coarse quantizer + multi-probe + exact "
        "re-rank; bound-style oracle (k distinct non-self rows per query + "
        "mean recall@5 >= 0.6 vs the hash-verified brute-force twin)",
        oracle=_ANN_BOUND_ORACLE,
    )
)


def _ivf_indexed_topk(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    idx = tempfile.mkdtemp(prefix="ivf_idx_")
    similarity.ivf_build_index(emb, idx, n_cells=16)
    approx = similarity.ivf_probe_topk(spark, idx, queries, k=5, n_probe=4)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    return similarity.topk_recall_summary(approx, exact, k=5, floor=0.6)


register(
    QuerySpec(
        name="sim_cosine_topk_ivf_indexed",
        build=_ivf_indexed_topk,
        doc="IVF ANN over the MATERIALIZED cell-partitioned index: corpus written "
        "partitionBy(cell), probe is a partition-pruned scan of n_probe/n_cells "
        "directories (PartitionFilters asserted in test_scale_patterns); "
        "bound-style oracle (k distinct non-self rows per query + mean "
        "recall@5 >= 0.6 vs the hash-verified brute-force twin)",
        oracle=_ANN_BOUND_ORACLE,
    )
)


def _pq_refined_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (Jégou et al. 2011 /
    FAISS IVFPQ+refine): codebooks trained distributed (all subspaces in
    one pass per iteration), corpus encoded to m small ints (32× memory
    cut at D=64), ADC shortlist from the codes alone, exact L2 re-rank
    of only the shortlist. Iterative k-means train is not portable to
    SQL, so the entry emits the bound-style topk_recall_summary the
    oracle states exactly; pytest asserts numpy parity of train/encode, a
    recall floor, and exact-equality when the shortlist spans the
    corpus."""
    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    books = similarity.pq_train(emb, m=8, k_codes=16, iters=2)
    codes = similarity.pq_encode(emb, books)
    approx = similarity.pq_topk_refined(
        emb, codes, queries, books, k=5, shortlist_factor=10
    )
    exact = similarity.brute_force_l2_topk(emb, queries, k=5)
    return similarity.topk_recall_summary(approx, exact, k=5, floor=0.5)


register(
    QuerySpec(
        name="sim_l2_topk_pq",
        build=_pq_refined_topk,
        doc="PQ ANN (squared-L2 metric; normalize embeddings first when "
        "cosine ranking is wanted): distributed codebook train, "
        "Catalyst-only encode + ADC shortlist, exact re-rank of the "
        "shortlist; bound-style oracle (k distinct non-self rows per "
        "query + mean recall@5 >= 0.5 vs the exact L2 twin)",
        oracle=_ANN_BOUND_ORACLE,
    )
)


def _ivfpq_indexed_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Full FAISS-IVFPQ shape: coarse quantizer prunes I/O (probe =
    partition-pruned scan of n_probe/n_cells directories), residual-
    trained PQ codes shrink what the ADC scan reads (never the
    embedding column — column pruning pinned in tests), exact re-rank
    of the shortlist recovers recall. Iterative k-means train is not
    portable to SQL, so the entry emits the bound-style
    topk_recall_summary; pytest asserts exact-equality under a
    full probe + corpus-wide shortlist, a recall floor, and the plan
    shape (PartitionFilters + pruned ReadSchema)."""
    import tempfile

    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    idx = tempfile.mkdtemp(prefix="ivfpq_idx_")
    similarity.ivfpq_build_index(emb, idx, n_cells=16, m=8, k_codes=16, pq_iters=2)
    approx = similarity.ivfpq_probe_topk(
        spark, idx, queries, k=5, n_probe=4, shortlist_factor=10
    )
    exact = similarity.brute_force_l2_topk(emb, queries, k=5)
    return similarity.topk_recall_summary(approx, exact, k=5, floor=0.5)


register(
    QuerySpec(
        name="sim_l2_topk_ivfpq",
        build=_ivfpq_indexed_topk,
        doc="IVFPQ ANN over a materialized index: cell-partitioned residual "
        "PQ codes, probe = partition-pruned ADC scan (codes only, 32x "
        "lighter than vectors) + exact re-rank of the shortlist; "
        "bound-style oracle (k distinct non-self rows per query + mean "
        "recall@5 >= 0.5 vs the exact L2 twin)",
        oracle=_ANN_BOUND_ORACLE,
    )
)


def _token_estimate(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_token_estimate(docs).select("doc_id", "n_pieces", "n_tokens_est")


register(
    QuerySpec(
        name="text_token_estimate",
        build=_token_estimate,
        doc="BPE-ish tokenizer-count estimate (regex pieces + subword correction)",
        oracle=r"""
        WITH p AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') AS pieces
          FROM documents
        )
        SELECT doc_id,
               CAST(len(pieces) AS BIGINT) AS n_pieces,
               CAST(len(pieces) + list_sum(list_transform(pieces, s ->
                 CASE WHEN length(s) > 4
                      THEN CAST(floor((length(s) - 1) / 4) AS INT)
                      ELSE 0 END)) AS BIGINT) AS n_tokens_est
        FROM p
        """,
    )
)


def _winnow(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_winnow_fingerprint(docs).select("doc_id", "winnow_fp")


register(
    QuerySpec(
        name="text_winnow_fingerprint",
        build=_winnow,
        doc="rolling-hash winnowing-lite fingerprint (char 8-gram digest minima)",
        oracle=r"""
        WITH n AS (
          SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t FROM documents
        ), g AS (
          SELECT doc_id,
                 list_transform(generate_series(1, greatest(length(t) - 7, 1)),
                                i -> md5(substring(t, i, 8))) AS grams
          FROM n
        )
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(grams))[1:4], '')) AS winnow_fp
        FROM g
        """,
    )
)


def _mm_frames(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    assets = multimodal.attach_binary_payload(docs)
    frames = multimodal.sample_frames(assets, every_nth=4, frame_bytes=64)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.max("n_frames_total").alias("n_frames_total"),
    )


register(
    QuerySpec(
        name="multimodal_frame_sampling",
        build=_mm_frames,
        doc="video-shaped frame sampling via mapInPandas (1 row -> N frames); sampled/total counts are byte-length arithmetic -> oracle-checkable",
        oracle="""
        WITH b AS (
          SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
        ), f AS (
          SELECT doc_id,
                 greatest(1, CAST(ceil(n_bytes / 64.0) AS INT)) AS n_frames_total
          FROM b
        )
        SELECT doc_id,
               CAST(ceil(n_frames_total / 4.0) AS BIGINT) AS n_sampled,
               n_frames_total
        FROM f
        """,
    )
)


# --------------------------------------------------------------------------
# Flagship composed pipeline: the end-to-end curation pass a training-data
# pipeline runs over a raw documents table — language gate, quality gate,
# exact dedup (keep lowest doc_id per identical text) — in ONE declarative
# plan. At 100 TB this is a single scan + projection (lang/quality are
# narrow, Catalyst-visible expressions) followed by exactly one shuffle
# for the dedup window on md5(text); near-dup removal (minhash LSH) runs
# as the separate dedup_minhash_lsh_pairs stage downstream.
#
# r16 (verdict task 1): one-pass restructure. The r15 shape delegated the
# dedup to ``dedup.exact_dedup`` (keeper agg + left-semi join back), whose
# two branches both consume the scored/filtered frame but prune DIFFERENT
# columns — Catalyst plans two separate Scan+tokenize+score subtrees and
# neither compile-time CTE dedup nor AQE exchange reuse folds them, so the
# corpus was scanned AND tokenized twice (2× full-corpus cost at 100 TB).
# ``exact_dedup``'s semi-join shape exists so the OUTPUT can carry ``text``
# without shuffling bodies; this query's output drops ``text``, so the
# window formulation is strictly better here: project doc_id/source/
# n_tokens/quality_score + md5(text) (narrow rows — bodies never shuffle),
# then keep row_number()=1 per md5(text) ordered by doc_id. Equivalence:
# ``exact_dedup`` keeps exactly the min-doc_id row per distinct text of
# its input; so does the window (doc_id is unique); the oracle below IS
# the window formulation. Spark 4 plans the rn=1 filter as a partial
# WindowGroupLimit above the scan — per-task top-1 per group before the
# exchange. Proven oracle-hash-green at sf0.001/0.01/0.1 (r16).
def _curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_testdata(spark, sf, "documents")
    scored = text.with_quality_score(docs)
    kept = scored.where((F.col("lang") == "en") & (F.col("quality_score") >= 0.5))
    narrow = kept.select(
        "doc_id", "source", "n_tokens", "quality_score",
        F.md5(F.col("text")).alias("__text_hash"),
    )
    w = Window.partitionBy("__text_hash").orderBy("doc_id")
    return (
        narrow.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc_id", "source", "n_tokens", "quality_score")
    )


register(
    QuerySpec(
        name="curation_pipeline",
        build=_curation_pipeline,
        headline=True,
        doc="composed curation pass: lang gate → quality gate → exact dedup",
        oracle=f"""
        WITH t AS (SELECT doc_id, lang, source, text, {_TOKS_SQL} AS toks FROM documents),
        scored AS (
          SELECT doc_id, lang, source, text,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 {_QSCORE_SQL} AS quality_score
          FROM t)
        SELECT doc_id, source, n_tokens, quality_score
        FROM scored
        WHERE lang = 'en' AND quality_score >= 0.5
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        """,
    )
)


# --------------------------------------------------------------------------
# Deterministic sampling + split assignment. Training-data pipelines must
# never use RNG sampling (irreproducible across retries/engines); the
# scalable idiom is content-hash bucketing — a pure projection, no
# shuffle, identical on any engine and any cluster size. Bucket by the
# leading hex of md5(doc_id): each hex char is a uniform 1/16 slice.
def _hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.where(bucket.isin("0", "1")).select("doc_id", "lang", "source")


register(
    QuerySpec(
        name="sample_hash_bucket",
        build=_hash_sample,
        doc="deterministic 2/16 content-hash sample (reproducible, shuffle-free)",
        oracle="""
        SELECT doc_id, lang, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        """,
    )
)


def _split_assign(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    # two leading hex chars = 256 uniform buckets: [00,f0) train (15/16),
    # [f0,f8) val (1/32), [f8,ff] test (1/32).
    b2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b2 < "f0", "train").when(b2 < "f8", "val").otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


register(
    QuerySpec(
        name="split_train_val_test",
        build=_split_assign,
        doc="hash-range train/val/test split (stable under re-runs and appends)",
        oracle="""
        SELECT split, count(*) AS n_docs FROM (
          SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f0' THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f8' THEN 'val'
                      ELSE 'test' END AS split
          FROM documents)
        GROUP BY split
        """,
    )
)


def _stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    # Per-stratum rates via per-lang hash thresholds: downsample the
    # over-represented language (en: 4/16) while keeping the tail at
    # 8/16 — the standard rebalancing move for training corpora. Still
    # a pure projection + filter: no shuffle, no RNG, reproducible on
    # any engine/cluster size, stable under appends.
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    rate = F.when(F.col("lang") == "en", F.lit("4")).otherwise(F.lit("8"))
    return docs.where(bucket < rate).select("doc_id", "lang", "source")


register(
    QuerySpec(
        name="sample_stratified_by_lang",
        build=_stratified_sample,
        doc="stratified per-lang hash sampling (rate per stratum, shuffle-free)",
        oracle="""
        SELECT doc_id, lang, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              < CASE WHEN lang = 'en' THEN '4' ELSE '8' END
        """,
    )
)


def _topk_sample_per_group(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    # Reservoir-free "exactly k per group" sampling: rank by content
    # hash inside each group and keep the first k. Deterministic (no
    # RNG state), one shuffle on the group key, and WindowGroupLimit
    # pushes the k-cutoff below the sort at scale — unlike reservoir
    # sampling there is no driver-side state to merge.
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("doc_id", "lang", "rnk")
    )


register(
    QuerySpec(
        name="sample_topk_per_group",
        build=_topk_sample_per_group,
        doc="exact-k-per-group deterministic sampling via rank-over-hash",
        oracle="""
        SELECT doc_id, lang, rnk FROM (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                 ) AS rnk
          FROM documents)
        WHERE rnk <= 10
        """,
    )
)


def _repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return text.with_repetition_stats(docs)


register(
    QuerySpec(
        name="text_repetition_stats",
        build=_repetition_stats,
        doc="Gopher-style repetition signal: top-bigram coverage fraction per doc",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        b AS (
          SELECT doc_id, unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 0)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
          FROM t),
        c AS (SELECT doc_id, bigram, count(*) AS n FROM b GROUP BY doc_id, bigram)
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_bigrams,
               CAST(max(n) AS BIGINT) AS top_bigram_n,
               round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS top_bigram_frac
        FROM c GROUP BY doc_id
        """,
    )
)


def _decontam_overlap(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    # Pseudo-benchmark: every 10th doc stands in for an eval set; the
    # rest of the corpus is scanned for 5-gram contamination against it.
    probe = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return dedup.decontamination_overlap(corpus, probe, k_shingle=5)


register(
    QuerySpec(
        name="decontam_benchmark_overlap",
        build=_decontam_overlap,
        headline=True,
        doc="benchmark decontamination: docs sharing 5-grams with a probe set (broadcast)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 4, 1) + 1),
                   i -> list_aggregate(toks[i:i+4], 'string_agg', ' ')))) AS gram
          FROM t),
        probe AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM g
        WHERE doc_id % 10 <> 0 AND gram IN (SELECT gram FROM probe)
        GROUP BY doc_id
        """,
    )
)


def _source_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus health report: volume, language spread, size,
    exact-dup rate, english share. One grouped aggregation — the
    distinct-counts rewrite into two-phase partial aggs, so the shuffle
    carries (source, lang) / (source, digest) partials, never text."""
    docs = read_testdata(spark, sf, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.floor(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)) + 0.5
        ).cast("bigint").alias("avg_chars"),
        F.round(
            1.0
            - F.countDistinct(F.md5("text")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("en_share"),
    )


register(
    QuerySpec(
        name="corpus_source_report",
        build=_source_report,
        doc="per-source curation dashboard: volume, lang spread, dup rate, en share",
        oracle="""
        SELECT source,
               count(*) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(floor(CAST(sum(n_chars) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS avg_chars,
               round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
               round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS en_share
        FROM documents GROUP BY source
        """,
    )
)


def _unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc mean unigram negative log-probability — the cheap
    perplexity proxy quality filter (CCNet ranks documents by LM
    perplexity; a corpus-fit unigram model is its shuffle-light
    first approximation). High scores = rare-token-heavy documents
    (gibberish, OCR noise); low = common-token boilerplate.

    Scale shape: the vocabulary table (token, count) broadcasts; each
    doc's tokens join against it map-side, then one per-doc aggregation.
    The corpus total rides along as a broadcast scalar."""
    docs = read_testdata(spark, sf, "documents")
    toks = exploded(docs, ["doc_id"], text.tokens(F.col("text")), "term")
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        toks.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "nll", -F.log(F.col("tc").cast("double") / F.col("n_total").cast("double"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("nll") / F.count(F.lit(1)), 4).alias("mean_nll"),
        )
    )


register(
    QuerySpec(
        name="text_unigram_logprob",
        build=_unigram_logprob,
        doc="per-doc mean unigram -log p (perplexity-proxy quality filter, broadcast vocab)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        vocab AS (SELECT term, count(*) AS tc FROM tok GROUP BY term),
        total AS (SELECT count(*) AS n_total FROM tok)
        SELECT doc_id, count(*) AS n_tokens,
               round(sum(-ln(CAST(tc AS DOUBLE) / CAST(n_total AS DOUBLE))) / count(*), 4) AS mean_nll
        FROM tok JOIN vocab USING (term) CROSS JOIN total
        GROUP BY doc_id
        """,
    )
)


def _bigram_backoff_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc mean -log p under a bigram LM with stupid backoff
    (Brants et al. '07): p(w|prev) = c(prev,w)/c(prev) when the bigram
    was seen, else 0.4 · p_uni(w), with add-one-smoothed unigrams
    (c(w)+1)/(N+V); a document's first token scores as a plain
    unigram. The model trains on the doc_id % 5 == 0 fifth of the corpus
    and scores every document, so held-out docs genuinely exercise the
    backoff path instead of it being dead on the training corpus.

    This is the CCNet-style perplexity filter one rung up from
    ``text_unigram_logprob``. Scale shape: the unigram and bigram
    tables broadcast (vocabulary-sized); the scoring pass is
    three map-side joins + one per-doc aggregation — the corpus
    shuffles only as (doc_id, partial) pairs."""
    docs = read_testdata(spark, sf, "documents")
    with_toks = docs.withColumn("__toks", text.tokens(F.col("text")))
    model = with_toks.where(F.col("doc_id") % 5 == 0)
    uni = (
        exploded(model, [], "__toks", "cur")
        .groupBy("cur")
        .agg(F.count(F.lit(1)).alias("c_cur"))
    )
    # greatest(...,1) + null-cur filter: sequence(1, 0) DESCENDS in
    # Spark, so an empty document would fabricate bogus pairs; the
    # sentinel pair it produces instead has cur = NULL and is dropped
    pair_expr = F.expr(
        "filter(transform(sequence(1, greatest(size(__toks), 1)),"
        " i -> struct(CASE WHEN i = 1 THEN NULL ELSE __toks[i-2] END AS prev,"
        " __toks[i-1] AS cur)), s -> s.cur IS NOT NULL)"
    )
    bi = (
        exploded(model, [], pair_expr, "p")
        .select("p.prev", "p.cur")
        .where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )
    totals = uni.agg(
        F.sum("c_cur").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    pairs = exploded(with_toks, ["doc_id"], pair_expr, "p").select(
        "doc_id", "p.prev", "p.cur"
    )
    prev_uni = uni.select(
        F.col("cur").alias("prev"), F.col("c_cur").alias("c_prev")
    )
    p_uni = (
        (F.coalesce(F.col("c_cur"), F.lit(0)) + 1).cast("double")
        / (F.col("n_total") + F.col("v_size")).cast("double")
    )
    p = F.when(
        F.col("prev").isNotNull() & F.col("c_bi").isNotNull(),
        F.col("c_bi").cast("double") / F.col("c_prev").cast("double"),
    ).otherwise(
        F.when(F.col("prev").isNull(), F.lit(1.0)).otherwise(F.lit(0.4)) * p_uni
    )
    return (
        pairs.join(F.broadcast(uni), "cur", "left")
        .join(F.broadcast(prev_uni), "prev", "left")
        .join(F.broadcast(bi), ["prev", "cur"], "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("nll", -F.log(p))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("nll") / F.count(F.lit(1)), 4).alias("mean_nll"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull() & F.col("c_bi").isNull(), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_backoff"),
        )
    )


_DOREMI_T = 0.05  # softmax temperature over per-domain excess loss


def _doremi_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. '23, simplified to
    its composable core): per-source token-weighted mean NLL under the
    bigram reference LM, excess over the corpus mean, and a softmax of
    excess/T as the next-epoch mixture weight — domains the reference
    model finds HARD get upweighted, the published recipe's direction.
    Composes the bigram-backoff scorer; only (source, partials)
    aggregate after the per-doc scoring pass. Docs with no tokens never
    scored and are excluded on both engines by construction."""
    per_doc = _bigram_backoff_logprob(spark, sf)
    docs = read_testdata(spark, sf, "documents").select("doc_id", "source")
    j = per_doc.join(docs, "doc_id")
    src = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("mean_nll") * F.col("n_tokens")) / F.sum("n_tokens"), 6
        ).alias("mean_nll"),
    )
    ref = j.agg(
        F.round(
            F.sum(F.col("mean_nll") * F.col("n_tokens")) / F.sum("n_tokens"), 6
        ).alias("corpus_nll")
    )
    with_excess = src.crossJoin(F.broadcast(ref)).withColumn(
        "excess_nll", F.round(F.col("mean_nll") - F.col("corpus_nll"), 6)
    )
    expo = with_excess.withColumn(
        "__e", F.exp(F.col("excess_nll") / F.lit(_DOREMI_T))
    )
    z = expo.agg(F.sum("__e").alias("__z"))
    return (
        expo.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "mean_nll",
            "excess_nll",
            F.round(F.col("__e") / F.col("__z"), 6).alias("weight"),
        )
    )


register(
    QuerySpec(
        name="curation_doremi_weights",
        build=_doremi_weights,
        doc="DoReMi-style domain mixture reweighting: softmax of per-source "
        "excess NLL under the bigram reference LM (hard domains upweighted)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        pair AS (SELECT doc_id,
                        CASE WHEN g = 1 THEN NULL ELSE toks[g-1] END AS prev,
                        toks[g] AS cur
                 FROM t, unnest(range(1, len(toks) + 1)) AS u(g)),
        uni AS (SELECT cur, count(*) AS c_cur FROM pair WHERE doc_id % 5 = 0 GROUP BY cur),
        bi AS (SELECT prev, cur, count(*) AS c_bi FROM pair
               WHERE doc_id % 5 = 0 AND prev IS NOT NULL GROUP BY prev, cur),
        tot AS (SELECT sum(c_cur) AS n_total, count(*) AS v_size FROM uni),
        scored AS (
          SELECT p.doc_id, p.prev,
                 CASE WHEN p.prev IS NOT NULL AND bi.c_bi IS NOT NULL
                      THEN CAST(bi.c_bi AS DOUBLE) / CAST(pu.c_cur AS DOUBLE)
                      ELSE (CASE WHEN p.prev IS NULL THEN 1.0 ELSE 0.4 END)
                           * (CAST(coalesce(cu.c_cur, 0) + 1 AS DOUBLE)
                              / CAST(tot.n_total + tot.v_size AS DOUBLE))
                 END AS p
          FROM pair p
          LEFT JOIN uni cu ON p.cur = cu.cur
          LEFT JOIN uni pu ON p.prev = pu.cur
          LEFT JOIN bi ON p.prev = bi.prev AND p.cur = bi.cur
          CROSS JOIN tot),
        per_doc AS (
          SELECT doc_id, count(*) AS n_tokens,
                 round(sum(-ln(p)) / count(*), 4) AS mean_nll
          FROM scored GROUP BY doc_id),
        jd AS (SELECT d.source, p.n_tokens, p.mean_nll
               FROM per_doc p JOIN documents d USING (doc_id)),
        src AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 round(sum(mean_nll * n_tokens) / sum(n_tokens), 6) AS mean_nll
          FROM jd GROUP BY source),
        ref AS (SELECT round(sum(mean_nll * n_tokens) / sum(n_tokens), 6)
                       AS corpus_nll FROM jd),
        ex AS (
          SELECT source, n_docs, mean_nll,
                 round(mean_nll - corpus_nll, 6) AS excess_nll,
                 exp(round(mean_nll - corpus_nll, 6) / {_DOREMI_T}) AS e
          FROM src, ref),
        z AS (SELECT sum(e) AS z FROM ex)
        SELECT source, n_docs, mean_nll, excess_nll,
               round(e / z, 6) AS weight
        FROM ex, z
        """,
    )
)


register(
    QuerySpec(
        name="text_bigram_backoff_logprob",
        build=_bigram_backoff_logprob,
        doc="per-doc mean -log p, bigram LM + stupid backoff trained on a 20% slice (broadcast n-gram tables)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        pair AS (SELECT doc_id,
                        CASE WHEN g = 1 THEN NULL ELSE toks[g-1] END AS prev,
                        toks[g] AS cur
                 FROM t, unnest(range(1, len(toks) + 1)) AS u(g)),
        uni AS (SELECT cur, count(*) AS c_cur FROM pair WHERE doc_id % 5 = 0 GROUP BY cur),
        bi AS (SELECT prev, cur, count(*) AS c_bi FROM pair
               WHERE doc_id % 5 = 0 AND prev IS NOT NULL GROUP BY prev, cur),
        tot AS (SELECT sum(c_cur) AS n_total, count(*) AS v_size FROM uni),
        scored AS (
          SELECT p.doc_id, p.prev, bi.c_bi,
                 CASE WHEN p.prev IS NOT NULL AND bi.c_bi IS NOT NULL
                      THEN CAST(bi.c_bi AS DOUBLE) / CAST(pu.c_cur AS DOUBLE)
                      ELSE (CASE WHEN p.prev IS NULL THEN 1.0 ELSE 0.4 END)
                           * (CAST(coalesce(cu.c_cur, 0) + 1 AS DOUBLE)
                              / CAST(tot.n_total + tot.v_size AS DOUBLE))
                 END AS p
          FROM pair p
          LEFT JOIN uni cu ON p.cur = cu.cur
          LEFT JOIN uni pu ON p.prev = pu.cur
          LEFT JOIN bi ON p.prev = bi.prev AND p.cur = bi.cur
          CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_tokens,
               round(sum(-ln(p)) / count(*), 4) AS mean_nll,
               CAST(sum(CASE WHEN prev IS NOT NULL AND c_bi IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff
        FROM scored GROUP BY doc_id
        """,
    )
)


# --------------------------------------------------------------------------
# Corpus n-gram statistics: top-5 bigrams per language. The shuffle
# carries (lang, bigram) partial counts — never raw documents — and the
# final top-k is a WindowGroupLimit-able ranked window, so the pattern
# holds when the corpus is 100 TB and the bigram vocabulary is millions.
def _top_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    toks = text.tokens(F.col("text"))
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(toks) - 1, 0)),"
        " i -> concat(toks[i - 1], ' ', toks[i]))"
    )
    from pyspark.sql import Window

    counts = (
        exploded(docs.withColumn("toks", toks), ["lang"], bigrams, "bigram")
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("lang", "bigram", "n", "rnk")
    )


register(
    QuerySpec(
        name="text_top_bigrams_per_lang",
        build=_top_bigrams,
        doc="top-5 bigrams per language: explode → count → ranked window",
        oracle=f"""
        WITH t AS (SELECT lang, {_TOKS_SQL} AS toks FROM documents),
        b AS (
          SELECT lang, unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 0)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
          FROM t),
        c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY lang, bigram)
        SELECT lang, bigram, n,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS INT) AS rnk
        FROM c QUALIFY rnk <= 5
        """,
    )
)


def _tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Scale shape: the corpus is tokenized+exploded ONCE into the
    (doc_id, term) count — everything else derives from that frame.
    ``df`` re-aggregates tf by term (map-side partials, so hot terms
    can't skew a partition the way a term-partitioned window would)
    and joins back as a vocabulary-sized broadcast; ``dt`` is a
    doc-partitioned window sum that shares its exchange with the
    ranked top-k window. 3 data shuffles total — down from 6 with the
    naive three-branch formulation, which also re-ran the tokenizer
    over the corpus three times."""
    from pyspark.sql import Window

    # r15 (guide §2.4/§2.5): tokenize+explode+partial-agg is the heavy
    # map side here; on a single-row-group scan it ran on one core. The
    # guarded hash repartition (no-op when the scan already yields >=
    # cores partitions) parallelizes it; hash on doc_id avoids the
    # keyless repartition's sortBeforeRepartition pass. Both consumers
    # of ``tf`` see the identical subtree, so AQE's runtime exchange
    # reuse still folds them (re-verified r15: 1 ReusedExchange in the
    # final executed plan). Measured sf0.1 min 0.97 -> 0.78 s.
    docs = ensure_min_partitions(
        read_testdata(spark, sf, "documents"), by=("doc_id",)
    )
    toks = exploded(docs, ["doc_id"], text.tokens(F.col("text")), "term")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf rows are already distinct per (doc, term): counting them by term
    # IS document frequency, no separate distinct pass needed. The two tf
    # consumers (df-counts and the scored join) each execute the
    # tokenize+shuffle subtree — ReuseExchange does NOT fold them on this
    # Spark (r13 executed-plan audit: 0 ReusedExchange, 2 (doc_id, term)
    # exchanges; the historical tf >= 1 canonicalization trick below no
    # longer fires). Measured A/B at sf1: a session_cache(tf) variant is
    # SLOWER (3.97 vs 3.64 s min — the InMemoryRelation write+columnar
    # round-trip costs more than re-tokenizing), so the recompute is the
    # deliberate choice here, unlike novelty_from_postings where the
    # recomputed subtree is the far heavier shingle pipeline. r14
    # extended the A/B to the FAMILY level (r13 verdict task 7): one
    # session_cached (doc_id, term) postings frame shared by tfidf's two
    # consumers AND bm25, measured over profile+tfidf+bm25 serially at
    # sf1 (4 interleaved sweeps, quiet anchors 0.31-0.34, results
    # value-identical) — shared-cache min 8.52 s vs recompute 7.58 s.
    # Caching loses even amortized over three readers: the exploded
    # postings are wider than the text they derive from, and the regex
    # tokenize is a cheap codegen'd scan.
    # The tf >= 1 filter stays: it is value-neutral and keeps the two
    # branches' partial aggregates shaped identically should a future
    # Spark restore the fold.
    df_tbl = (
        tf.where(F.col("tf") >= 1)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w_doc = Window.partitionBy("doc_id")
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("dt", F.sum("tf").over(w_doc))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf").cast("double") / F.col("dt").cast("double"))
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", F.col("tf").cast("bigint").alias("tf"),
                F.col("df").cast("bigint").alias("df"), "tfidf", "rnk")
    )


register(
    QuerySpec(
        name="text_tfidf_top_terms",
        build=_tfidf_top_terms,
        headline=True,
        doc="top-3 TF-IDF terms per doc (broadcast DF table + ranked window)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS dt FROM tok GROUP BY doc_id),
        dfq AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                 round((CAST(tf.tf AS DOUBLE) / CAST(dl.dt AS DOUBLE))
                       * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE)), 6) AS tfidf
          FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n)
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INT) AS rnk
        FROM scored QUALIFY rnk <= 3
        """,
    )
)


def _bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 ranked retrieval over the documents fixture — the classic
    lexical-search scoring a training-data pipeline uses for corpus
    querying and hard-negative mining. Full oracle: every arithmetic
    step mirrors the DuckDB CTE exactly (same parenthesization, same
    always-positive Lucene idf, per-term round-6 before the doc sum)."""
    docs = read_testdata(spark, sf, "documents")
    return text.bm25_topk(docs, ["spark", "query", "window", "merge"], k=10)


_BM25_TERMS_SQL = "('merge', 'query', 'spark', 'window')"

register(
    QuerySpec(
        name="text_bm25_search",
        build=_bm25_search,
        headline=True,
        doc="BM25 top-10 retrieval (Okapi weighting, Lucene idf)",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM tok
          WHERE term IN {_BM25_TERMS_SQL} GROUP BY doc_id, term),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        w AS (
          SELECT tf.doc_id,
                 round(ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                       * (CAST(tf.tf AS DOUBLE) * 2.2)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)),
                       6) AS w
          FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
        SELECT doc_id, round(sum(w), 6) AS bm25
        FROM w GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT 10
        """,
    )
)


def embedding_quantize_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vector int8-style quantization of the embedding column — the
    standard 4× memory shrink before ANN indexing at corpus scale. Pure
    projection (array_min/max + transform), zero shuffle; integer output
    makes cross-engine parity exact. Half-up via floor(x+0.5): round()
    half-boundary behavior differs across engines. Returns the raw
    ``q_vec array<int>`` — the production shape (pytest-checked);
    the registered query emits a canonical digest instead because the
    driver's pandas canonicalizer cannot sort list cells."""
    emb = read_testdata(spark, sf, "embeddings")
    lo = F.array_min("embedding").cast("double")
    hi = F.array_max("embedding").cast("double")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.when(hi == lo, F.lit(0)).otherwise(
            F.floor((x.cast("double") - lo) * 255.0 / (hi - lo) + 0.5)
        ).cast("int"),
    )
    return emb.select(
        "vec_id",
        F.round(lo, 6).alias("q_min"),
        F.round(hi, 6).alias("q_max"),
        q.alias("q_vec"),
    )


def _embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    # Digest the array to a scalar for the driver compare (pandas
    # sort_values can't factorize list cells); the array itself is
    # asserted element-wise in tests/test_llm_similarity.py.
    full = embedding_quantize_frame(spark, sf)
    return full.select(
        "vec_id",
        "q_min",
        "q_max",
        F.md5(F.concat_ws(",", F.col("q_vec").cast("array<string>"))).alias("q_digest"),
    )


register(
    QuerySpec(
        name="embedding_quantize_int8",
        build=_embedding_quantize,
        doc="per-vector int8 quantization of embeddings (zero-shuffle projection; array digested to a scalar for the cross-engine compare)",
        oracle="""
        WITH q AS (
          SELECT vec_id,
                 round(CAST(list_min(embedding) AS DOUBLE), 6) AS q_min,
                 round(CAST(list_max(embedding) AS DOUBLE), 6) AS q_max,
                 list_transform(embedding, x -> CASE
                   WHEN CAST(list_max(embedding) AS DOUBLE) = CAST(list_min(embedding) AS DOUBLE) THEN 0
                   ELSE CAST(floor((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) * 255.0
                        / (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) + 0.5) AS INT)
                 END) AS q_vec
          FROM embeddings
        )
        SELECT vec_id, q_min, q_max,
               md5(array_to_string(q_vec, ',')) AS q_digest
        FROM q
        """,
    )
)


def _phash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # REAL pixels: 64 image classes (doc_id % 64) so same-class docs
    # carry byte-identical BMP payloads -> pHash hamming 0; the DCT runs
    # on genuinely decoded pixel grids.
    docs = read_testdata(spark, sf, "documents").withColumn(
        "img_class", F.col("doc_id") % 64
    )
    # r16 (guide §2.3 "project before the exchange", verdict task 3):
    # keep the r15 shape — parallelize guard ABOVE the payload
    # generator, payload bytes never cross a shuffle — but feed the
    # attach a PROJECTION of the two columns it needs. The r15 entry
    # passed the full documents frame, so its guard exchange (the
    # round's one persistent sf0.1 regression, 1.4-1.5x vs baseline)
    # shuffled text bodies that nothing downstream reads; now the
    # exchange carries (doc_id, img_class) = 16 bytes/row. A
    # distinct-class restructure (fingerprint the 64 classes once,
    # broadcast-join back — guide §8) was built, oracle-proven and
    # MEASURED against this shape: it LOSES at fixture scale (A/B min
    # ratios 2.17x sf0.1, 1.60x sf1 — its extra distinct/join/python
    # stages cost more than 50k avoided encodes) and was reverted; see
    # OPTIMIZATION_r16.md.
    assets = multimodal.attach_image_payload(
        docs.select("doc_id", "img_class"), id_col="img_class", spread_col="doc_id"
    )
    hashed = multimodal.perceptual_hash(assets)
    return multimodal.phash_near_dup_pairs(hashed, max_hamming=4)


def _phash_oracle() -> str:
    """DuckDB replay of the WHOLE pHash near-dup pipeline. Possible
    because the r9 pHash is EXACT integer arithmetic end to end: the
    scaled cosine basis (``multimodal._phash_basis``, cos × 2^14
    rounded once at table build) is embedded below as a literal, the
    pixel generator / nearest-neighbor resize are integer formulas, the
    median is the sorted block's middle element, and banding is
    complete for hamming ≤ 4 by pigeonhole (63 bits, 9 bands of 7: ≤ 4
    differing bits leave ≥ 5 bands equal), so the banded LSH equals a
    direct hamming filter. The BMP round-trip the Spark side performs
    is lossless (pinned by multimodal_extract_features' hash match), so
    replaying the generator formula replays the decoded pixels."""
    basis = multimodal._phash_basis(32)[:8]  # only rows 0..7 feed the 8x8 block
    b8 = (
        "["
        + ", ".join(
            "[" + ", ".join(str(int(v)) for v in row) + "]" for row in basis
        )
        + "]"
    )
    return f"""
    WITH b8 AS (SELECT {b8} AS b),
    cls AS (SELECT unnest(range(0, 64)) AS img_class),
    -- generator pixels through the integer nearest-neighbor resize:
    -- source is 16 rows x 24 cols, pixel i = (class*177 + i*55) % 256
    g AS (
      SELECT img_class,
             list_transform(range(0, 32), y ->
               list_transform(range(0, 32), x ->
                 (img_class*177 + (((y*16)//32)*24 + (x*24)//32)*55) % 256)) AS grid
      FROM cls
    ),
    gv AS (  -- gv[i][v] = sum_j grid[i][j] * b[v][j]
      SELECT img_class,
             list_transform(grid, row ->
               list_transform(b.b, bv ->
                 list_sum(list_transform(range(1, 33), j -> row[j] * bv[j])))) AS gv
      FROM g, b8 b
    ),
    dct AS (  -- flat[u*8+v+1] = sum_i b[u][i] * gv[i][v], u,v in 0..7
      SELECT img_class,
             flatten(list_transform(b.b, bu ->
               list_transform(range(1, 9), v ->
                 list_sum(list_transform(range(1, 33), i -> bu[i] * gv[i][v]))))) AS flat
      FROM gv, b8 b
    ),
    ph AS (
      SELECT img_class,
             list_sum(list_transform(range(0, 63), i ->
               CASE WHEN flat[i + 2] > med THEN (1::BIGINT << i) ELSE 0 END)) AS phash
      FROM (SELECT img_class, flat, list_sort(flat[2:64])[32] AS med FROM dct)
    ),
    dh AS (
      SELECT d.doc_id, p.phash FROM documents d JOIN ph p ON p.img_class = d.doc_id % 64
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM dh a JOIN dh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 4
    """


register(
    QuerySpec(
        name="multimodal_phash_near_dups",
        build=_phash_pairs,
        headline=True,
        doc="image near-dup pairs via perceptual hash over REAL decoded BMP "
        "pixels (integer-exact DCT pHash + banded LSH); oracle replays the "
        "full pixel→DCT→median→bits→hamming pipeline in SQL",
        oracle=_phash_oracle(),
    )
)


def _embedding_norm_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding geometry report: count, mean L2 norm, norm
    spread. The norm is a pure array expression (zero-shuffle map side);
    only (label, partial moments) aggregate. The standard pre-ANN sanity
    check — unnormalized or collapsed clusters show up here first."""
    emb = read_testdata(spark, sf, "embeddings")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norms = emb.select("label", F.sqrt(sq).alias("norm"))
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("norm"), 4).alias("mean_norm"),
        F.round(F.min("norm"), 4).alias("min_norm"),
        F.round(F.max("norm"), 4).alias("max_norm"),
    )


register(
    QuerySpec(
        name="embedding_norm_stats",
        build=_embedding_norm_stats,
        doc="per-label L2-norm stats over embeddings (pre-ANN sanity report)",
        oracle="""
        WITH n AS (
          SELECT label,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS norm
          FROM embeddings)
        SELECT label, count(*) AS n_vecs,
               round(avg(norm), 4) AS mean_norm,
               round(min(norm), 4) AS min_norm,
               round(max(norm), 4) AS max_norm
        FROM n GROUP BY label
        """,
    )
)


# --------------------------------------------------------------------------
# Capstone joint text+vector query: semantic near-dup candidate pairs
# enriched with document metadata (vec_id ↔ doc_id is 1:1 in the
# fixtures). The pair generation shuffles only (bucket, vec) tuples; the
# metadata join is a broadcast of the slim documents projection — at
# 100 TB the pair set, not the corpus, is the joined fact.
_DUP_BITS, _DUP_THRESHOLD = 4, 0.35
_DUP_BUCKET_SQL = " + ".join(
    f"CASE WHEN {{e}}[{i + 1}] > 0 THEN {2 ** i} ELSE 0 END" for i in range(_DUP_BITS)
)


def _semantic_dup_report(spark: SparkSession, sf: str) -> DataFrame:
    # Fixture embeddings are label-clustered but contain no true
    # near-dups (max pairwise cosine ≈ 0.51), so the report uses a
    # same-cluster threshold of 0.35 with coarse 4-bit buckets; a real
    # dedup deployment keeps 0.9+ with more bands.
    emb = read_testdata(spark, sf, "embeddings")
    pairs = similarity.embedding_near_dup_pairs(
        emb, threshold=_DUP_THRESHOLD, bits=_DUP_BITS
    )
    docs = read_testdata(spark, sf, "documents").select("doc_id", "lang", "source")
    a = docs.toDF("id_a", "lang_a", "source_a")
    b = docs.toDF("id_b", "lang_b", "source_b")
    return (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .select(
            "id_a",
            "id_b",
            # cos_sim stays at the op's round-6: re-rounding a round-6
            # value to 4 decimals lands on an EXACT .xxxx50 tie ~1 % of
            # the time, where Spark (shortest-repr HALF_UP) and DuckDB
            # (double-value) disagree — bit it at sf0.1 (pair 194/873,
            # round-6 cosine exactly 0.35355). Never double-round.
            "cos_sim",
            "lang_a",
            "lang_b",
            (F.col("lang_a") == F.col("lang_b")).alias("same_lang"),
            (F.col("source_a") == F.col("source_b")).alias("same_source"),
        )
    )


register(
    QuerySpec(
        name="sim_semantic_dup_report",
        build=_semantic_dup_report,
        doc="near-dup pairs joined to document metadata (text+vector capstone)",
        oracle=f"""
        WITH b AS (SELECT vec_id, embedding,
                          {_DUP_BUCKET_SQL.format(e='embedding')} AS bucket
                   FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS id_a, x.vec_id AS id_b,
                 {_COS_SQL.format(a='a.embedding', b='x.embedding')} AS cos_sim
          FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
          WHERE {_COS_SQL.format(a='a.embedding', b='x.embedding')} >= {_DUP_THRESHOLD}
        )
        SELECT id_a, id_b, cos_sim,
               da.lang AS lang_a, db.lang AS lang_b,
               da.lang = db.lang AS same_lang,
               da.source = db.source AS same_source
        FROM pairs
        JOIN documents da ON da.doc_id = id_a
        JOIN documents db ON db.doc_id = id_b
        """,
    )
)


# --------------------------------------------------------------------------
# Iterative algorithm surface: pure-DataFrame Lloyd's k-means over the
# embedding table. The Spark side is a driver loop; the oracle unrolls
# the SAME fixed iteration count as chained materialized CTEs (the BPE
# technique), so the entry is hash-matched, not rows-only.
def _kmeans_clusters(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_testdata(spark, sf, "embeddings")
    assigned, _ = similarity.kmeans_lloyd(emb, k=8, iters=5)
    return assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))


def _kmeans_cte(k: int, iters: int) -> str:
    """CTE chain replaying ``similarity.kmeans_lloyd`` in DuckDB:
    deterministic init (k lowest-id vectors), per-round nearest-centroid
    assignment (squared-euclid as the SAME left fold Spark's
    ``aggregate`` runs — ``list_reduce`` starts from the first element,
    and ``0.0 + x == x`` exactly) with Spark's first-index-of-min
    tiebreak (ORDER BY dist, cluster), then per-dimension means with
    empty clusters keeping their previous centroid (LEFT JOIN
    coalesce). Integer outputs (assignments/counts) make the replay
    robust: ``avg`` summation order may differ between engines by an
    ulp, but assignment flips would need inter-centroid margins at
    1e-15 relative, and the fixture margins are ~1e-6 at worst.
    MATERIALIZED everywhere a CTE is referenced twice — DuckDB
    otherwise inlines the round chain exponentially. Yields the final
    assignment as ``a{iters - 1}`` (Spark returns the assignment made
    with the LAST updated centroids; its trailing recompute is
    unused)."""
    parts = [
        """
pts AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cluster, v AS c
  FROM (SELECT vec_id, v FROM pts ORDER BY vec_id LIMIT %d)
)"""
        % k
    ]
    for r in range(iters):
        parts.append(
            f"""
a{r} AS MATERIALIZED (
  SELECT vec_id, v, CAST(cluster AS INT) AS cluster FROM (
    SELECT vec_id, v, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster ASC) AS rn
    FROM (
      SELECT p.vec_id, p.v, c.cluster,
             list_reduce(list_transform(range(1, len(p.v)+1),
                                        i -> (p.v[i]-c.c[i])*(p.v[i]-c.c[i])),
                         (x, y) -> x + y) AS d
      FROM pts p, c{r} c))
  WHERE rn = 1
)"""
        )
        if r + 1 < iters:
            parts.append(
                f"""
m{r} AS (
  SELECT cluster, pos, avg(x) AS m FROM (
    SELECT cluster, unnest(v) AS x, unnest(range(1, len(v)+1)) AS pos FROM a{r})
  GROUP BY cluster, pos
),
c{r + 1} AS MATERIALIZED (
  SELECT c.cluster, coalesce(n.c, c.c) AS c
  FROM c{r} c LEFT JOIN
       (SELECT cluster, list(m ORDER BY pos) AS c FROM m{r} GROUP BY cluster) n
       USING (cluster)
)"""
            )
    return ",".join(parts)


register(
    QuerySpec(
        name="cluster_kmeans_lloyd",
        build=_kmeans_clusters,
        doc="pure-DataFrame Lloyd's k-means (deterministic init, 5 iters): "
        "cluster sizes; oracle unrolls the same 5 Lloyd rounds in SQL",
        oracle="WITH "
        + _kmeans_cte(k=8, iters=5)
        + """
SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
FROM a4 GROUP BY cluster""",
    )
)


# --------------------------------------------------------------------------
# Training-batch curation: sequence packing + per-source quota capping
# (llm/packing.py). Both are single-shuffle window/aggregate plans.
_TOK_SQL = r"""COALESCE(len(pieces) + list_sum(list_transform(pieces, s ->
                 CASE WHEN length(s) > 4
                      THEN CAST(floor((length(s) - 1) / 4) AS INT)
                      ELSE 0 END)), 0)"""


def _pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    return packing.with_pack_spans(docs, seq_len=2048).select(
        "doc_id", "source", "n_tokens_est", "first_chunk", "last_chunk", "n_chunks"
    )


register(
    QuerySpec(
        name="curation_pack_sequences",
        build=_pack_sequences,
        doc="concat-and-chunk sequence packing: per-doc chunk spans via one sharded cumsum window",
        oracle=rf"""
        WITH p AS (
          SELECT doc_id, source,
                 regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') AS pieces
          FROM documents
        ),
        t AS (SELECT doc_id, source, {_TOK_SQL} AS tok FROM p),
        c AS (
          SELECT doc_id, source, tok,
                 sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t
        )
        SELECT doc_id, source,
               CAST(tok AS BIGINT) AS n_tokens_est,
               CAST(floor((cum - tok) / 2048) AS BIGINT) AS first_chunk,
               CAST(CASE WHEN tok > 0 THEN floor((cum - 1) / 2048)
                         ELSE floor((cum - tok) / 2048) END AS BIGINT) AS last_chunk,
               CAST(CASE WHEN tok > 0
                         THEN floor((cum - 1) / 2048) - floor((cum - tok) / 2048) + 1
                         ELSE 0 END AS BIGINT) AS n_chunks
        FROM c
        """,
    )
)


def _pack_efficiency(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    return packing.pack_efficiency(docs, seq_len=2048)


register(
    QuerySpec(
        name="curation_pack_efficiency",
        build=_pack_efficiency,
        doc="per-source packing report: total tokens, ceil-chunks, padding waste",
        oracle=rf"""
        WITH p AS (
          SELECT source,
                 regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') AS pieces
          FROM documents
        ),
        t AS (SELECT source, {_TOK_SQL} AS tok FROM p)
        SELECT source,
               CAST(sum(tok) AS BIGINT) AS total_tokens,
               CAST(ceil(sum(tok) / 2048) AS BIGINT) AS n_chunks,
               CAST(ceil(sum(tok) / 2048) * 2048 - sum(tok) AS BIGINT) AS pad_tokens
        FROM t GROUP BY source
        """,
    )
)


def _source_cap(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    return packing.source_cap(docs, k=15).select("doc_id", "source", "sample_rank")


register(
    QuerySpec(
        name="curation_source_cap",
        build=_source_cap,
        doc="per-source quota cap (binds: ~25 docs/source at sf0.01): md5-ordered row_number <= 15",
        oracle="""
        WITH r AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS sample_rank
          FROM documents
        )
        SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
        FROM r WHERE sample_rank <= 15
        """,
    )
)


def _source_mixture(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    return packing.source_mixture_weights(docs, alpha=0.5, target_tokens=1_000_000)


register(
    QuerySpec(
        name="curation_source_mixture",
        build=_source_mixture,
        doc="temperature-scaled source mixture weights (w ∝ tokens^0.5) + epochs-to-target; one scan, O(sources) shuffle",
        oracle=f"""
        WITH s AS (
          SELECT source, count(*) AS n_docs,
                 sum(len({_TOKS_SQL})) AS n_tokens
          FROM documents GROUP BY source),
        p AS (SELECT *, power(CAST(n_tokens AS DOUBLE), 0.5) AS pw FROM s),
        t AS (SELECT sum(pw) AS pw_total FROM p)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               round(pw / pw_total, 6) AS weight,
               round(1000000.0 * (pw / pw_total) / CAST(n_tokens AS DOUBLE), 4) AS epochs
        FROM p CROSS JOIN t
        """,
    )
)


def _epoch_expand(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    out = packing.epoch_expand(docs, alpha=0.5, target_tokens=200_000)
    return out.select("doc_id", "source", "n_repeats", "epoch_idx")


register(
    QuerySpec(
        name="curation_epoch_expand",
        build=_epoch_expand,
        doc="materialized training mix: fractional-epoch repeats via md5-prefix threshold (broadcast epochs, shuffle-free explode)",
        oracle=f"""
        WITH s AS (
          SELECT source, sum(len({_TOKS_SQL})) AS n_tokens
          FROM documents GROUP BY source),
        p AS (SELECT *, power(CAST(n_tokens AS DOUBLE), 0.5) AS pw FROM s),
        t AS (SELECT sum(pw) AS pw_total FROM p),
        e AS (SELECT source,
                     round(200000.0 * (pw / pw_total) / CAST(n_tokens AS DOUBLE), 4) AS epochs
              FROM p CROSS JOIN t),
        j AS (SELECT d.doc_id, d.source, e.epochs,
                     CAST(floor(e.epochs) AS INT)
                     + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3)
                              < lpad(lower(to_hex(CAST(floor((e.epochs - floor(e.epochs)) * 4096) AS INT))), 3, '0')
                            THEN 1 ELSE 0 END AS n_repeats
              FROM documents d JOIN e USING (source))
        SELECT doc_id, source, CAST(n_repeats AS INT) AS n_repeats,
               CAST(u.g AS INT) AS epoch_idx
        FROM j, unnest(generate_series(1, n_repeats)) AS u(g)
        WHERE n_repeats > 0
        """,
    )
)


def _chunking(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    return packing.with_overlapping_chunks(docs, chunk_size=32, stride=16).select(
        "doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens"
    )


register(
    QuerySpec(
        name="curation_overlapping_chunks",
        build=_chunking,
        headline=True,
        doc="overlapping token-window chunking (size 32, stride 16; docs are 10-99 tokens): shuffle-free explode+slice",
        oracle=r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'), s -> s <> '') AS toks
          FROM documents
        ),
        n AS (SELECT doc_id, toks, len(toks) AS n_tok FROM t WHERE len(toks) > 0),
        c AS (
          SELECT doc_id, toks,
                 unnest(range(0, CASE WHEN n_tok <= 32 THEN 1
                                      ELSE CAST(ceil((n_tok - 32) / 16.0) AS BIGINT) + 1
                                 END)) AS chunk_idx
          FROM n
        )
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               array_to_string(toks[chunk_idx*16 + 1 : chunk_idx*16 + 32], ' ')
                 AS chunk_text,
               CAST(len(toks[chunk_idx*16 + 1 : chunk_idx*16 + 32]) AS BIGINT)
                 AS n_chunk_tokens
        FROM c
        """,
    )
)


# Threshold 0.35, not SemDeDup's literature 0.95: the synthetic
# embedding fixtures top out at cos~0.48-0.60, so 0.95 never dropped a
# vector and the entry was checking plumbing only. At 0.35 hundreds of
# pairs fire at every SF while the nearest pair to the threshold sits
# ~1e-6 away — nine orders of magnitude above any cross-engine float
# divergence, and the oracle replicates Spark's exact left-fold
# dot-product anyway.
_SEMDEDUP_THRESHOLD = 0.35

# Spark's dot() is aggregate(zip_with(a, b, *), 0.0, +): a sequential
# left fold in doubles. This replays it term-for-term (list_reduce
# starts from the first element; 0.0 + x == x), so cosines are
# bit-identical across engines, not merely close.
_FOLD_DOT = (
    "list_reduce(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i]),"
    " (x, y) -> x + y)"
)
_FOLD_COS = (
    f"({_FOLD_DOT.format(a='{a}', b='{b}')}"
    f" / (sqrt({_FOLD_DOT.format(a='{a}', b='{a}')})"
    f" * sqrt({_FOLD_DOT.format(a='{b}', b='{b}')})))"
)


def _semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_testdata(spark, sf, "embeddings")
    kept = similarity.semantic_dedup(
        emb, k=8, iters=3, threshold=_SEMDEDUP_THRESHOLD
    )
    return kept.groupBy("label").agg(F.count(F.lit(1)).alias("n_kept"))


def _semantic_dedup_auto(spark: SparkSession, sf: str) -> DataFrame:
    """Scale variant (r10): k = ceil(sqrt(n)) MLlib cells + per-cell
    numpy cosine matrix via applyInPandas — the fixed-k twin is
    quadratic by contract (exp 1.77 in the r10 scaling probe; this
    variant measured 323 s -> 5 s at sf1). MLlib cell assignments
    aren't SQL-replayable, so the entry emits the bound-style
    semantic_dedup_check summary: per-label totals the oracle computes
    exactly plus invariant flags (kept ⊆ corpus, per-label kept ≤
    total, every sampled dropped vector has an earlier ≥-threshold
    witness — the keeper rule's clustering-independent necessary
    condition; linear witness scan, so the scale shape survives). The
    twin pins the exact keeper semantics, pytest pins
    planted-duplicate behavior here."""
    emb = read_testdata(spark, sf, "embeddings")
    kept = similarity.semantic_dedup_auto(emb, threshold=_SEMDEDUP_THRESHOLD)
    return similarity.semantic_dedup_check(emb, kept, _SEMDEDUP_THRESHOLD)


register(
    QuerySpec(
        name="sim_semantic_dedup_auto",
        build=_semantic_dedup_auto,
        doc="SemDeDup scale path: sqrt(n) MLlib cells + vectorized per-cell "
        "cosine dedup (applyInPandas); bound-style oracle (per-label totals "
        "+ false-drop witness invariants)",
        oracle="""
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_total,
               TRUE AS kept_le_total,
               TRUE AS sampled_drops_witnessed,
               TRUE AS kept_subset_ok
        FROM embeddings GROUP BY label
        """,
    )
)


register(
    QuerySpec(
        name="sim_semantic_dedup",
        build=_semantic_dedup,
        doc="SemDeDup: k-means cells + within-cell cosine-threshold min-id "
        "keeper; oracle unrolls the 3 Lloyd rounds and replays the exact "
        "fold cosine",
        oracle="WITH "
        + _kmeans_cte(k=8, iters=3)
        + f""",
assigned AS MATERIALIZED (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, e.label, a.cluster
  FROM embeddings e JOIN a2 a USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {_FOLD_COS.format(a='a.emb', b='b.emb')} >= {_SEMDEDUP_THRESHOLD}
)
SELECT label, CAST(count(*) AS BIGINT) AS n_kept
FROM assigned WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
GROUP BY label""",
    )
)


def _ffd_pack(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    # per-bin summary: deterministic, oracle-free (FFD is sequential
    # per shard — not SQL-expressible; pytest carries the invariants)
    return (
        packing.ffd_pack(docs, seq_len=256)
        .groupBy("source", "bin_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens_est").cast("bigint").alias("fill_tokens"),
            F.max(F.col("oversize").cast("int")).cast("boolean").alias("oversize"),
        )
        .orderBy("source", "bin_idx")
    )


# First-fit index as a pure list expression (no aggregate in the
# recursive term): flag each bin's fitness, take the first TRUE.
# NB DuckDB's list_position returns 0 (not NULL) when absent, so
# "found" is tested as > 0, never IS NOT NULL.
_FFD_FIT = "list_position(list_transform(p.caps, c -> c >= i.tok), true)"

register(
    QuerySpec(
        name="curation_ffd_bin_pack",
        build=_ffd_pack,
        doc="first-fit-decreasing whole-document bin packing per source "
        "(seq_len 256); applyInPandas per shard; oracle replays the "
        "sequential FFD loop as a recursive CTE carrying per-source bin "
        "capacities",
        oracle=rf"""
        WITH RECURSIVE
        pcs AS MATERIALIZED (
          SELECT doc_id, source,
                 regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') AS pieces
          FROM documents
        ),
        toks AS MATERIALIZED (
          SELECT doc_id, source, CAST({_TOK_SQL} AS BIGINT) AS tok FROM pcs
        ),
        -- FFD item order: tokens desc, id asc (ffd_pack's exact sort)
        items AS MATERIALIZED (
          SELECT doc_id, source, tok,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY tok DESC, doc_id ASC) AS rnk
          FROM toks
        ),
        -- one recursion step per item rank; caps = remaining capacity
        -- per bin in creation order; -1 sentinel closes oversize bins
        -- (matches ffd_pack: a plain 0 would still admit 0-token docs)
        pk AS (
          SELECT source, 0 AS step, CAST(NULL AS BIGINT) AS doc_id,
                 CAST(NULL AS BIGINT) AS bin_idx,
                 CAST(NULL AS BOOLEAN) AS oversize,
                 CAST(NULL AS BIGINT) AS tok,
                 CAST([] AS BIGINT[]) AS caps
          FROM (SELECT DISTINCT source FROM items)
          UNION ALL
          SELECT p.source, p.step + 1, i.doc_id,
                 CASE WHEN i.tok > 256 THEN len(p.caps)
                      WHEN coalesce({_FFD_FIT}, 0) > 0 THEN {_FFD_FIT} - 1
                      ELSE len(p.caps) END,
                 i.tok > 256,
                 i.tok,
                 CASE WHEN i.tok > 256 THEN list_append(p.caps, -1)
                      WHEN coalesce({_FFD_FIT}, 0) > 0
                        THEN list_transform(range(1, len(p.caps)+1),
                               x -> CASE WHEN x = {_FFD_FIT}
                                         THEN p.caps[x] - i.tok
                                         ELSE p.caps[x] END)
                      ELSE list_append(p.caps, 256 - i.tok) END
          FROM pk p JOIN items i ON i.source = p.source AND i.rnk = p.step + 1
        )
        SELECT source, CAST(bin_idx AS BIGINT) AS bin_idx,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS fill_tokens,
               bool_or(oversize) AS oversize
        FROM pk WHERE step > 0
        GROUP BY source, bin_idx
        """,
    )
)


def _dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance resampling toward the src0 domain: hashed
    unigram+bigram log-ratio weights (target = src0 docs, raw = all),
    Gumbel-top-100 deterministic sampling. Everything — md5 feature
    buckets, add-one-smoothed ratios, the salted Gumbel noise — is
    engine-portable, so the oracle replays the WHOLE selection."""
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    out = packing.dsir_select(
        docs, F.col("source") == "src0", n_buckets=64, top_k=100
    )
    return out.select(
        "doc_id", "source", "n_feats", "logweight", "score",
        F.col("sel_rank").cast("bigint").alias("sel_rank"),
    )


_DSIR_HEX = "CAST(('0x' || substr(md5('dsir-v1:' || feat), 1, 8)) AS BIGINT)"

register(
    QuerySpec(
        name="curation_dsir_select",
        build=_dsir_select,
        doc="DSIR data selection: hashed-ngram importance log-ratios toward "
        "src0 + deterministic Gumbel-top-k resampling; fully SQL-replayed",
        oracle=rf"""
        WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
        f AS (
          SELECT doc_id,
                 CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_t,
                 unnest(list_concat(toks,
                   list_transform(range(1, greatest(len(toks), 1)),
                                  i -> toks[i] || ' ' || toks[i+1]))) AS feat
          FROM t
        ),
        b AS (SELECT doc_id, is_t, {_DSIR_HEX} % 64 AS bucket FROM f),
        counts AS (
          SELECT bucket,
                 CAST(sum(is_t) AS DOUBLE) AS t_k,
                 CAST(count(*) AS DOUBLE) AS q_k
          FROM b GROUP BY bucket
        ),
        tot AS (SELECT sum(t_k) AS t_total, sum(q_k) AS q_total FROM counts),
        ratios AS (
          SELECT bucket,
                 ln((t_k + 1) / (t_total + 64)) - ln((q_k + 1) / (q_total + 64))
                   AS ratio
          FROM counts, tot
        ),
        per_doc AS (
          SELECT b.doc_id,
                 CAST(count(*) AS BIGINT) AS n_feats,
                 round(sum(r.ratio), 4) AS logweight
          FROM b JOIN ratios r USING (bucket)
          GROUP BY b.doc_id
        ),
        scored AS (
          SELECT d.doc_id, d.source,
                 coalesce(p.n_feats, 0) AS n_feats,
                 coalesce(p.logweight, 0.0) AS logweight,
                 round(coalesce(p.logweight, 0.0)
                       - ln(-ln((CAST(('0x' || substr(
                             md5('dsir-v1|' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                             AS BIGINT) + 0.5) / 4294967296.0)), 4) AS score
          FROM documents d LEFT JOIN per_doc p USING (doc_id)
        )
        SELECT doc_id, source, n_feats, logweight, score, sel_rank
        FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC)
                        AS sel_rank
              FROM scored)
        WHERE sel_rank <= 100
        """,
    )
)


_QC_B = 64       # hashed feature buckets (bias rides as bucket B)
_QC_ITERS = 5    # full-batch GD rounds (unrolled in the oracle)


def _quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Train the hashed-LR quality classifier toward src0 in-engine,
    score the whole corpus. Training is 5 full-batch GD rounds with
    the round-6 quantization doctrine, so the oracle replays the
    entire optimization, not just the scoring. (The fixture sources
    share one 31-word vocabulary, so src0 is genuinely inseparable
    here — the entry verifies the OPTIMIZATION MACHINERY bit-for-bit
    [406 distinct scores at sf0.01, weights evolve every round];
    test_quality_classifier_separates_planted_domains pins real
    separation on a separable corpus.)"""
    from data_pipeline_with_spark_spark.llm import classifier

    docs = read_testdata(spark, sf, "documents")
    w = classifier.train_quality_classifier(
        docs, F.col("source") == "src0", n_buckets=_QC_B, iters=_QC_ITERS
    )
    return classifier.score_quality(docs, w).select(
        "doc_id", "source", "quality_score"
    )


def _qc_oracle(
    n_buckets: int = _QC_B, iters: int = _QC_ITERS, final: str | None = None
) -> str:
    """DuckDB replay of classifier training AND scoring: the GD rounds
    unroll as chained MATERIALIZED CTEs (the BPE/Lloyd technique); the
    weight vector lives in a 1-row list column, gradients densify via a
    bucket-range LEFT JOIN (lambdas cannot hold subqueries), and every
    quantization point (tf, probabilities, weights) matches the Spark
    side's round-6 doctrine."""
    hexb = f"CAST(('0x' || substr(md5('qc-v1:' || feat), 1, 8)) AS BIGINT) % {n_buckets}"
    nb1 = n_buckets + 1
    parts = [
        f"""
t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
f0 AS (
  SELECT doc_id,
         unnest(list_concat(toks,
           list_transform(range(1, greatest(len(toks), 1)),
                          i -> toks[i] || ' ' || toks[i+1]))) AS feat
  FROM t
),
fx AS MATERIALIZED (
  SELECT doc_id, bucket, round(sum(x), 6) AS x FROM (
    SELECT doc_id, {hexb} AS bucket,
           round(cnt / CAST(n AS DOUBLE), 6) AS x
    FROM (SELECT doc_id, feat, count(*) AS cnt,
                 sum(count(*)) OVER (PARTITION BY doc_id) AS n
          FROM f0 GROUP BY doc_id, feat))
  GROUP BY doc_id, bucket
  UNION ALL
  SELECT doc_id, {n_buckets} AS bucket, 1.0 AS x FROM documents
),
yv AS MATERIALIZED (
  SELECT doc_id, CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
w0 AS (SELECT list_transform(range(0, {nb1}), i -> 0.0) AS w)"""
    ]
    for r in range(iters):
        parts.append(
            f"""
m{r} AS (
  SELECT f.doc_id, sum(w.w[f.bucket + 1] * f.x) AS m
  FROM fx f, w{r} w GROUP BY f.doc_id
),
p{r} AS MATERIALIZED (
  SELECT m.doc_id, round(1.0 / (1.0 + exp(-m.m)), 6) - yv.y AS r
  FROM m{r} m JOIN yv USING (doc_id)
),
g{r} AS (
  SELECT f.bucket, sum(p.r * f.x) AS g
  FROM fx f JOIN p{r} p USING (doc_id) GROUP BY f.bucket
),
gl{r} AS (
  SELECT list(coalesce(g.g, 0.0) ORDER BY b.bucket) AS gl
  FROM (SELECT unnest(range(0, {nb1})) AS bucket) b
  LEFT JOIN g{r} g USING (bucket)
),
w{r + 1} AS MATERIALIZED (
  SELECT list_transform(range(1, {nb1 + 1}),
                        k -> round(w.w[k] - gl.gl[k] / nd.n, 6)) AS w
  FROM w{r} w, gl{r} gl, nd
)"""
        )
    parts.append(
        f"""
mf AS (
  SELECT f.doc_id, sum(w.w[f.bucket + 1] * f.x) AS m
  FROM fx f, w{iters} w GROUP BY f.doc_id
),
sc AS (
  SELECT d.doc_id, d.source,
         round(1.0 / (1.0 + exp(-m.m)), 6) AS quality_score
  FROM documents d JOIN mf m USING (doc_id)
)
"""
        + (final or "SELECT doc_id, source, quality_score FROM sc")
    )
    return "WITH " + ",".join(parts)


register(
    QuerySpec(
        name="curation_quality_classifier",
        build=_quality_classifier,
        doc="in-engine hashed-LR quality classifier (full-batch GD, round-6 "
        "quantization doctrine): trained toward src0 and scored corpus-wide; "
        "oracle replays the whole optimization as unrolled CTE rounds",
        oracle=_qc_oracle(),
    )
)


def _train_holdout_split(spark: SparkSession, sf: str) -> DataFrame:
    """Group-aware (source-hashed) train/holdout split summary: per
    split and source, doc + char counts. Group-consistency is
    structural — a source appears under exactly ONE split, which the
    oracle verifies by recomputing the same salted-md5 bucket
    arithmetic in DuckDB (CONV ↔ '0x' CAST hex parity)."""
    from data_pipeline_with_spark_spark.llm import packing

    docs = read_testdata(spark, sf, "documents")
    return (
        packing.split_train_holdout(docs, holdout_frac=0.25, by_col="source")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        )
        .orderBy("split", "source")
    )


register(
    QuerySpec(
        name="curation_train_holdout_split",
        build=_train_holdout_split,
        doc="contamination-safe train/holdout split (salted-md5 on source)",
        oracle="""
        SELECT CASE WHEN CAST(('0x' || substr(md5('split-v1:' || CAST(source AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 2500
                    THEN 'holdout' ELSE 'train' END AS split,
               source,
               COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY split, source
        ORDER BY split, source
        """,
    )
)


_SQDIST_SQL = (
    "(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))"
    " + list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " - 2 * list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])))"
)


def _ann_auto_topk(spark: SparkSession, sf: str) -> DataFrame:
    """`ann_topk` FAISS-style auto dispatch as a driver-visible query:
    at fixture scale the index is far below AUTO_INDEX_MIN_ROWS, so
    auto serves the EXACT path (brute-force over the index's stored
    vectors) — which is precisely why this entry CAN hash-match a SQL
    oracle (the closed form |a|²+|b|²−2a·b agrees with Spark's
    (a−b)² fold to ~1e-13; both round to 6 — same precedent as
    sim_l2_normalized_topk). The probe path of the same index is
    exercised by sim_l2_topk_ivfpq and the exact≡full-probe pytest."""
    import tempfile

    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    idx = tempfile.mkdtemp(prefix="ann_auto_")
    similarity.ivfpq_build_index(emb, idx, n_cells=8, m=8, k_codes=16, pq_iters=1)
    return similarity.ann_topk(spark, idx, queries, k=5)


register(
    QuerySpec(
        name="sim_l2_topk_auto",
        build=_ann_auto_topk,
        doc="ann_topk auto dispatch (small index -> exact scan; crossover-aware serving)",
        oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, e.vec_id AS neighbor_id,
                 round({_SQDIST_SQL.format(a='e.embedding', b='q.q_emb')}, 6) AS l2_dist
          FROM embeddings e, q WHERE e.vec_id <> q.q_id)
        SELECT q_id, neighbor_id, l2_dist, CAST(rnk AS INT) AS rnk FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY l2_dist ASC, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        """,
    )
)


def _decontam_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-prefiltered decontamination (dedup.decontaminate_bloom):
    identical output to the exact-join entry by construction (no false
    negatives + exact verify), so the oracle IS the exact-join SQL —
    the prefilter can only break the hash match by dropping a true
    overlap."""
    docs = read_testdata(spark, sf, "documents")
    probe = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return dedup.decontaminate_bloom(corpus, probe, k_shingle=5)


register(
    QuerySpec(
        name="decontam_bloom_prefilter",
        build=_decontam_bloom,
        doc="Bloom-filter decontamination: probe grams fold into a fixed "
        "128 KB portable bit array (broadcast 1-row frame), corpus grams "
        "prefilter map-only, exact join verifies — equals exact "
        "decontamination, survives probe sets too big to broadcast raw",
        oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 4, 1) + 1),
                   i -> list_aggregate(toks[i:i+4], 'string_agg', ' ')))) AS gram
          FROM t),
        probe AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM g
        WHERE doc_id % 10 <> 0 AND gram IN (SELECT gram FROM probe)
        GROUP BY doc_id
        """,
    )
)


_PCA_D = 64
_PCA_ITERS = 3


def _pca_label_projections(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label projection stats onto the corpus's top principal
    component (power iteration, rounds unrolled; every round's v is
    round-6 quantized so the oracle replays the whole optimization —
    the kmeans/classifier iterative-oracle recipe)."""
    emb = read_testdata(spark, sf, "embeddings")
    return similarity.label_projection_stats(emb, iters=_PCA_ITERS)


def _pca_oracle() -> str:
    d = _PCA_D
    # v0 = e0; each round r: w = round6(Σ s·cent) per dim, v_r =
    # round6(w / ||w||) with the norm's sum folded in pos order (the
    # sequential list_reduce ≡ the Spark driver's Python sum).
    # DuckDB forbids subqueries inside lambdas: each round's v arrives
    # as a cross-joined 1-row CTE column, referenced as v[i]
    v0 = (
        "SELECT list_transform(range(1, %d + 1), i -> CASE WHEN i = 1 "
        "THEN 1.0 ELSE 0.0 END) AS v" % d
    )
    rounds = [f"v0 AS MATERIALIZED ({v0})"]
    for r in range(1, _PCA_ITERS + 1):
        rounds.append(f"""
        w{r} AS (
          SELECT pos, round(sum(s * (e[pos] - mu[pos])), 6) AS w
          FROM (
            SELECT e, mu, pos,
                   list_reduce(list_transform(range(1, {d} + 1),
                     i -> (e[i] - mu[i]) * v[i]), (a, b) -> a + b) AS s
            FROM x, mua, v{r-1}, (SELECT unnest(range(1, {d} + 1)) AS pos)
          ) GROUP BY pos
        ),
        v{r} AS MATERIALIZED (
          SELECT list_transform(wl, y -> round(y / sqrt(
                   list_reduce(list_transform(wl, z -> z * z),
                               (a, b) -> a + b)), 6)) AS v
          FROM (SELECT list(w ORDER BY pos) AS wl FROM w{r})
        )""")
    return f"""
        WITH x AS MATERIALIZED (
          SELECT label, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        mu0 AS (
          SELECT pos, round(avg(val), 6) AS m
          FROM (SELECT unnest(e) AS val,
                       unnest(range(1, len(e) + 1)) AS pos FROM x)
          GROUP BY pos
        ),
        mua AS MATERIALIZED (SELECT list(m ORDER BY pos) AS mu FROM mu0),
        {",".join(rounds)}
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               round(avg(p), 6) AS mean_proj,
               round(min(p), 6) AS min_proj,
               round(max(p), 6) AS max_proj
        FROM (
          SELECT label,
                 list_reduce(list_transform(range(1, {d} + 1),
                   i -> (e[i] - mu[i]) * v[i]),
                   (a, b) -> a + b) AS p
          FROM x, mua, v{_PCA_ITERS}
        ) GROUP BY label
        """


register(
    QuerySpec(
        name="sim_pca_label_projections",
        build=_pca_label_projections,
        doc="top principal component by power iteration (one corpus pass per "
        "round, D doubles to the driver, round-6 quantized v per round) + "
        "per-label projection stats; oracle replays the unrolled rounds",
        oracle=_pca_oracle(),
    )
)


# --------------------------------------------------------------------------
# Graph centrality over the duplicate graph: integer-arithmetic PageRank
# (operators/graph.py). CC (dedup_connected_components) answers WHICH docs
# cluster; PageRank ranks nodes inside the dup graph so curation can keep
# the most-connected canonical copy. Ranks are BIGINT fixed-point, every
# round pure integer ops, so the oracle replays all 5 power iterations
# bit-exactly as unrolled materialized CTEs over the same verified edge
# set as the CC entry.
def _pagerank_dup_docs(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    pairs = dedup.near_dup_pairs(
        docs,
        threshold=0.7,
        k_shingle=_K_SHINGLE,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
    ).select("id_a", "id_b")
    pr = graph.pagerank(pairs, rounds=5)
    return pr.select(
        F.col("node").alias("doc_id"),
        F.col("degree").cast("bigint").alias("degree"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def _pagerank_oracle() -> str:
    scale, base_num, damp = graph.PR_SCALE, graph.PR_BASE_NUM, graph.PR_DAMP_NUM
    rounds = []
    for k in range(1, 6):
        prev = "r0" if k == 1 else f"r{k - 1}"
        rounds.append(f"""
        r{k} AS MATERIALIZED (
          SELECT d.src AS node, d.degree,
                 CAST({base_num} // nn.n
                      + ({damp} * coalesce(s.insum, 0)) // 100 AS BIGINT) AS rank
          FROM deg d CROSS JOIN nn
          LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank // r.degree) AS insum
            FROM {prev} r JOIN e ON e.src = r.node GROUP BY e.dst
          ) s ON s.node = d.src
        )""")
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
    sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
    bands AS (
      SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
      FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
      WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE),
            6) >= 0.7
    ),
    e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM ver
          UNION SELECT id_b AS src, id_a AS dst FROM ver),
    deg AS MATERIALIZED (SELECT src, count(*) AS degree FROM e GROUP BY src),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
    r0 AS MATERIALIZED (
      SELECT src AS node, degree, CAST({scale} // nn.n AS BIGINT) AS rank
      FROM deg CROSS JOIN nn
    ),{",".join(rounds)}
    SELECT node AS doc_id, CAST(degree AS BIGINT) AS degree, rank FROM r5
    """


register(
    QuerySpec(
        name="graph_pagerank_dup_docs",
        build=_pagerank_dup_docs,
        doc="integer fixed-point PageRank (5 unrolled power iterations) over "
        "the verified near-dup graph; oracle replays every round bit-exactly",
        oracle=_pagerank_oracle(),
    )
)


def _triangles_dup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle count + local clustering coefficient per node of the
    verified near-dup graph (same pair source as
    `graph_pagerank_dup_docs`): a dup CLUSTER is a clique — coefficient
    1.0 — while a chain of borderline matches scores 0, so the
    coefficient separates true duplicate groups from transitive-closure
    artifacts before canonical-doc selection."""
    docs = read_testdata(spark, sf, "documents")
    pairs = dedup.near_dup_pairs(
        docs,
        threshold=0.7,
        k_shingle=_K_SHINGLE,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
    ).select("id_a", "id_b")
    tri = graph.triangle_count(pairs)
    return tri.select(
        F.col("node").alias("doc_id"), "degree", "n_triangles", "clustering_coeff"
    )


def _triangles_oracle() -> str:
    """3-way self-join replay with the SAME degree-ordered orientation as
    the operator (each triangle counted exactly once, no unrolling)."""
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
    sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
    bands AS (
      SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
      FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
      WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE),
            6) >= 0.7
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
      FROM ver WHERE id_a <> id_b
    ),
    deg AS MATERIALIZED (
      SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
      ) GROUP BY node
    ),
    orient AS MATERIALIZED (
      SELECT CASE WHEN (da.degree < db.degree)
                    OR (da.degree = db.degree AND u.a < u.b)
                  THEN u.a ELSE u.b END AS u,
             CASE WHEN (da.degree < db.degree)
                    OR (da.degree = db.degree AND u.a < u.b)
                  THEN u.b ELSE u.a END AS v,
             CASE WHEN (da.degree < db.degree)
                    OR (da.degree = db.degree AND u.a < u.b)
                  THEN db.degree ELSE da.degree END AS dv
      FROM und u JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b
    ),
    tri AS MATERIALIZED (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM orient e1
      JOIN orient e2 ON e1.u = e2.u
        AND ((e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v))
      JOIN orient e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    pern AS (
      SELECT node, count(*) AS n_tri FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    )
    SELECT d.node AS doc_id,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN round(2.0 * coalesce(p.n_tri, 0)
                           / (d.degree * (d.degree - 1)), 4)
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN pern p ON p.node = d.node
    """


register(
    QuerySpec(
        name="graph_triangles_dup_docs",
        build=_triangles_dup_docs,
        doc="per-node triangle count + clustering coefficient over the "
        "verified near-dup graph via degree-ordered edge orientation "
        "(each triangle joined exactly once, no hub skew); oracle is the "
        "same orientation as a DuckDB 3-way self-join",
        oracle=_triangles_oracle(),
    )
)


_TRUSS_ROUNDS = 2


def _ktruss_dup_edges(spark: SparkSession, sf: str) -> DataFrame:
    """3-truss peeling over the verified near-dup graph: keep only
    edges in >= 1 triangle (k-2 = 1), re-peel, then report the
    survivors with their support — the robustness filter that keeps
    clique-like duplicate clusters and drops chains of borderline
    pairwise matches before transitive-closure grouping."""
    docs = read_testdata(spark, sf, "documents")
    pairs = dedup.near_dup_pairs(
        docs,
        threshold=0.7,
        k_shingle=_K_SHINGLE,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
    ).select("id_a", "id_b")
    out = graph.ktruss(pairs, k=3, rounds=_TRUSS_ROUNDS)
    return out.select(
        F.col("a").alias("id_a"), F.col("b").alias("id_b"), "support"
    )


def _ktruss_oracle(rounds: int = _TRUSS_ROUNDS) -> str:
    def block(r: int) -> str:
        cond = (
            f"(da.degree < db.degree) OR"
            f" (da.degree = db.degree AND u.a < u.b)"
        )
        return f"""
    deg{r} AS MATERIALIZED (
      SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r}
      ) GROUP BY node
    ),
    ori{r} AS MATERIALIZED (
      SELECT CASE WHEN {cond} THEN u.a ELSE u.b END AS u,
             CASE WHEN {cond} THEN u.b ELSE u.a END AS v,
             CASE WHEN {cond} THEN db.degree ELSE da.degree END AS dv
      FROM e{r} u JOIN deg{r} da ON da.node = u.a
                  JOIN deg{r} db ON db.node = u.b
    ),
    tri{r} AS MATERIALIZED (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM ori{r} e1
      JOIN ori{r} e2 ON e1.u = e2.u
        AND ((e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v))
      JOIN ori{r} e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    sup{r} AS MATERIALIZED (
      SELECT a, b, count(*) AS support FROM (
        SELECT least(x, y) AS a, greatest(x, y) AS b FROM tri{r}
        UNION ALL SELECT least(x, z), greatest(x, z) FROM tri{r}
        UNION ALL SELECT least(y, z), greatest(y, z) FROM tri{r}
      ) GROUP BY a, b
    )"""

    parts = [f"""
    t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
    sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
    bands AS (
      SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
      FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
      WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE),
            6) >= 0.7
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
      FROM ver WHERE id_a <> id_b
    )"""]
    for r in range(rounds):
        parts.append(block(r))
        parts.append(f"""
    e{r + 1} AS MATERIALIZED (
      SELECT e.a, e.b
      FROM e{r} e LEFT JOIN sup{r} s ON s.a = e.a AND s.b = e.b
      WHERE coalesce(s.support, 0) >= 1
    )""")
    parts.append(block(rounds))
    return (
        "WITH " + ",".join(parts) + f"""
    SELECT e.a AS id_a, e.b AS id_b,
           CAST(coalesce(s.support, 0) AS BIGINT) AS support
    FROM e{rounds} e
    LEFT JOIN sup{rounds} s ON s.a = e.a AND s.b = e.b
    """
    )


register(
    QuerySpec(
        name="graph_ktruss_dup_edges",
        build=_ktruss_dup_edges,
        doc="3-truss peeling of the verified near-dup graph (2 unrolled "
        "rounds + final support annotate): clique-like dup clusters "
        "survive, borderline chains peel away; oracle replays every "
        "peeling round with the same degree-ordered orientation",
        oracle=_ktruss_oracle(),
    )
)


_KCORE_K = 2
_KCORE_ROUNDS = 3


def _kcore_dup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """2-core peeling over the verified near-dup graph (same pair source
    as the triangle/truss entries): nodes that survive when every
    degree-<2 node (and its edges) is repeatedly removed — i.e. members
    of some cycle-bearing duplicate cluster. Pendant chains of
    borderline matches peel one endpoint per round; 3 rounds pins a
    full cascade at this fixture scale. Output is (doc_id, degree,
    core_degree): full-graph degree next to the in-core degree."""
    docs = read_testdata(spark, sf, "documents")
    pairs = dedup.near_dup_pairs(
        docs,
        threshold=0.7,
        k_shingle=_K_SHINGLE,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
    ).select("id_a", "id_b")
    out = graph.kcore(pairs, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return out.select(
        F.col("node").alias("doc_id"), "degree", "core_degree"
    )


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    parts = [f"""
    t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
    sig AS (SELECT doc_id, {_MINHASH_SQL} AS minhash FROM sh),
    bands AS (
      SELECT doc_id, j AS band_idx, ({_BANDS_SQL})[j] AS band_hash
      FROM sig, (SELECT unnest(generate_series(1, {_BANDS})) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
      WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE),
            6) >= 0.7
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
      FROM ver WHERE id_a <> id_b
    )"""]
    for r in range(rounds + 1):
        parts.append(f"""
    deg{r} AS MATERIALIZED (
      SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r}
      ) GROUP BY node
    )""")
        if r == rounds:
            break
        parts.append(f"""
    e{r + 1} AS MATERIALIZED (
      SELECT e.a, e.b
      FROM e{r} e
      JOIN deg{r} da ON da.node = e.a AND da.degree >= {k}
      JOIN deg{r} db ON db.node = e.b AND db.degree >= {k}
    )""")
    return (
        "WITH " + ",".join(parts) + f"""
    SELECT c.node AS doc_id,
           CAST(f.degree AS BIGINT) AS degree,
           CAST(c.degree AS BIGINT) AS core_degree
    FROM deg{rounds} c JOIN deg0 f ON f.node = c.node
    """
    )


register(
    QuerySpec(
        name="graph_kcore_dup_docs",
        build=_kcore_dup_docs,
        doc="2-core node peeling of the verified near-dup graph (3 unrolled "
        "rounds): cycle-bearing duplicate clusters survive, pendant chains "
        "peel one endpoint per round; oracle replays every round's degree "
        "filter bit-exactly",
        oracle=_kcore_oracle(),
    )
)


_RRF_K = 60  # standard reciprocal-rank-fusion damping (Cormack et al. '09)
_RRF_SCALE = 10**9  # integer-scaled 1/(K+rank): order-free BIGINT sums
_RRF_LEG_N = 20
_RRF_QVEC = 0  # query embedding = vec_id 0 (embeddings align with doc_id)


def _hybrid_rrf_search(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: the lexical leg
    (BM25 top-20 for a fixed term query) and the semantic leg (exact
    cosine top-20 around a fixed query embedding) fuse by
    RRF(d) = Σ_legs SCALE div (60 + rank_leg(d)) — the
    score-distribution-free fusion rule retrieval stacks use because
    BM25 scores and cosine similarities are not comparable. Integer-
    scaled contributions keep the fused score pure BIGINT (order-free
    sums, bit-exact oracle); a doc missing from a leg's top-N simply
    contributes nothing (rank reported as 0). Scale shape: each leg is
    an already-verified top-N subtree (one corpus pass each); fusion
    is a full outer join of two 20-row frames — driver-trivial at any
    corpus size."""
    from pyspark.sql import Window

    docs = read_testdata(spark, sf, "documents")
    emb = read_testdata(spark, sf, "embeddings")
    lex = text.bm25_topk(
        docs, ["spark", "query", "window", "merge"], k=_RRF_LEG_N
    ).withColumn(
        "rank_lex",
        F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    ).select("doc_id", "rank_lex")
    sem = (
        similarity.brute_force_topk(
            emb, emb.where(F.col("vec_id") == _RRF_QVEC), k=_RRF_LEG_N
        )
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rnk").alias("rank_sem"),
        )
    )
    fused = (
        lex.join(sem, "doc_id", "outer")
        .select(
            "doc_id",
            F.coalesce(F.col("rank_lex"), F.lit(0)).cast("int").alias("rank_lex"),
            F.coalesce(F.col("rank_sem"), F.lit(0)).cast("int").alias("rank_sem"),
        )
        .withColumn(
            "rrf_score",
            (
                F.when(
                    F.col("rank_lex") > 0,
                    F.expr(f"CAST({_RRF_SCALE}L div ({_RRF_K} + rank_lex) AS BIGINT)"),
                ).otherwise(F.lit(0).cast("bigint"))
                + F.when(
                    F.col("rank_sem") > 0,
                    F.expr(f"CAST({_RRF_SCALE}L div ({_RRF_K} + rank_sem) AS BIGINT)"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("rrf_score"),
        )
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w))
        .where(F.col("rrf_rank") <= 10)
        .select("doc_id", "rank_lex", "rank_sem", "rrf_score", "rrf_rank")
    )


def _hybrid_rrf_oracle() -> str:
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN {_BM25_TERMS_SQL} GROUP BY doc_id, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    wts AS (
      SELECT tf.doc_id,
             round(ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                   * (CAST(tf.tf AS DOUBLE) * 2.2)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)),
                   6) AS w
      FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
    bm AS (SELECT doc_id, round(sum(w), 6) AS bm25 FROM wts GROUP BY doc_id),
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
             AS INT) AS rank_lex
      FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_RRF_LEG_N}),
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_RRF_QVEC}),
    scored AS (
      SELECT e.vec_id AS doc_id,
             {_COS_SQL.format(a='e.embedding', b='q.q_emb')} AS cos_sim
      FROM embeddings e, q WHERE e.vec_id <> {_RRF_QVEC}),
    sem AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id)
             AS INT) AS rank_sem
      FROM scored ORDER BY cos_sim DESC, doc_id LIMIT {_RRF_LEG_N}),
    fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             CAST(coalesce(l.rank_lex, 0) AS INT) AS rank_lex,
             CAST(coalesce(s.rank_sem, 0) AS INT) AS rank_sem,
             CAST(CASE WHEN l.rank_lex IS NOT NULL
                       THEN {_RRF_SCALE} // ({_RRF_K} + l.rank_lex)
                       ELSE 0 END
                + CASE WHEN s.rank_sem IS NOT NULL
                       THEN {_RRF_SCALE} // ({_RRF_K} + s.rank_sem)
                       ELSE 0 END AS BIGINT) AS rrf_score
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
    SELECT doc_id, rank_lex, rank_sem, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
             AS rrf_rank
    FROM fused
    QUALIFY rrf_rank <= 10
    """


register(
    QuerySpec(
        name="sim_hybrid_rrf_search",
        build=_hybrid_rrf_search,
        doc="hybrid retrieval: BM25 top-20 + exact-cosine top-20 fused by "
        "integer-scaled reciprocal-rank fusion (SCALE div (60+rank), "
        "BIGINT order-free) — top-10 fused docs with both leg ranks",
        oracle=_hybrid_rrf_oracle(),
    )
)


def _hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining over the embeddings fixture: for each of 5
    query vectors, the top-5 highest-cosine DIFFERENT-label vectors —
    the contrastive-training negatives closest to the decision
    boundary. The label filter genuinely fires at both fixture SFs
    (1-3 same-label vectors sit inside each plain cosine top-10, so
    the hard-negative list differs from `sim_cosine_topk_bruteforce`)."""
    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return similarity.hard_negatives(emb, queries, k=5)


register(
    QuerySpec(
        name="sim_hard_negatives",
        build=_hard_negatives,
        doc="hard-negative mining: per-query top-5 highest-cosine "
        "different-label vectors (broadcast queries, one corpus scan, "
        "label predicate before the ranking window)",
        oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
                   FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.q_id, q.q_label, e.vec_id AS neighbor_id,
                 e.label AS neighbor_label,
                 {_COS_SQL.format(a='e.embedding', b='q.q_emb')} AS cos_sim
          FROM embeddings e, q
          WHERE e.vec_id <> q.q_id AND e.label <> q.q_label)
        SELECT q_id, q_label, neighbor_id, neighbor_label, cos_sim,
               CAST(rnk AS INT) AS rnk FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        """,
    )
)


def _sample_estimate_event_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Sampled-aggregation ESTIMATION (the companion to the selection
    entries above): per-event-type row count and mean value estimated
    from the deterministic 1/16 hash sample alone, next to the exact
    pass — the cheap profiling scan a 100 TB pipeline runs before
    committing to a full sweep. Integer estimators throughout: count
    scales by 16 exactly; the mean is sum(value-cents) div n (BIGINT
    division), so there is no float-accumulation-order hazard and the
    whole row replays bit-exactly. rel_err (one rounded division on
    already-deterministic integers) shows the estimate quality the
    fixture supports: row counts land within ~8 %, while the mean sits
    ~1-1.5 stderr low on most types because `value` is heavy-tailed
    (median 35 vs mean 50) and a ~130-row sample usually misses the
    tail — the honest caveat of mean-from-sample under skew."""
    ev = read_testdata(spark, sf, "events")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    bucket = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    samp = (
        ev.where(bucket == "0")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sample"),
            F.sum(cents).alias("sample_cents"),
        )
        .select(
            "event_type",
            "n_sample",
            (F.col("n_sample") * 16).cast("bigint").alias("est_rows"),
            F.expr("CAST(sample_cents div n_sample AS BIGINT)").alias(
                "est_mean_cents"
            ),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.expr(
            "CAST(sum(CAST(round(value * 100) AS BIGINT))"
            " div count(*) AS BIGINT)"
        ).alias("exact_mean_cents"),
    )
    return samp.join(exact, "event_type").select(
        "event_type",
        "n_sample",
        "est_rows",
        "n_exact",
        F.round(
            F.abs(F.col("est_rows") - F.col("n_exact"))
            / F.col("n_exact").cast("double"),
            4,
        ).alias("rows_rel_err"),
        "est_mean_cents",
        "exact_mean_cents",
    )


register(
    QuerySpec(
        name="sample_estimate_event_stats",
        build=_sample_estimate_event_stats,
        doc="per-type row count + mean value-cents estimated from the "
        "deterministic 1/16 hash sample vs the exact pass — integer "
        "estimators (x16 count, BIGINT-division mean), no float-order "
        "hazard anywhere",
        oracle="""
        WITH s AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_sample,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sample_cents
          FROM events
          WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
          GROUP BY event_type),
        x AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_exact,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*)
                      AS BIGINT) AS exact_mean_cents
          FROM events GROUP BY event_type)
        SELECT s.event_type, s.n_sample,
               CAST(s.n_sample * 16 AS BIGINT) AS est_rows,
               x.n_exact,
               round(abs(s.n_sample * 16 - x.n_exact)
                     / CAST(x.n_exact AS DOUBLE), 4) AS rows_rel_err,
               CAST(s.sample_cents // s.n_sample AS BIGINT) AS est_mean_cents,
               x.exact_mean_cents
        FROM s JOIN x ON s.event_type = x.event_type
        """,
    )
)


# --------------------------------------------------------------------------
# TextRank keyword scoring: weighted PageRank over the adjacent-token
# co-occurrence graph (llm/text.py `textrank_keywords`). Fixture honesty
# note: the documents vocabulary is 31 tokens with a near-complete
# co-occurrence graph, so ranks track weighted degree closely — the
# entry's value is the operator (corpus graph + iterative-rank replay),
# and ranks are still fully distinct across tokens.
_TEXTRANK_ROUNDS = 5


def _textrank_keywords(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    # id_col (r16, r15 advice): hash the tokenize guard on the unique
    # doc_id instead of keyless round-robin (no local sort pass).
    return text.textrank_keywords(docs, rounds=_TEXTRANK_ROUNDS, id_col="doc_id")


def _textrank_oracle() -> str:
    from data_pipeline_with_spark_spark.operators.graph import (
        PR_BASE_NUM,
        PR_DAMP_NUM,
        PR_SCALE,
    )

    rounds = []
    for k in range(1, _TEXTRANK_ROUNDS + 1):
        prev = f"r{k - 1}"
        rounds.append(f"""
        d{k} AS MATERIALIZED (
          SELECT coalesce(sum(r.rank), 0) AS dm
          FROM {prev} r LEFT JOIN outw o ON o.src = r.node
          WHERE o.src IS NULL
        ),
        i{k} AS MATERIALIZED (
          SELECT e.dst AS node, sum((r.rank * e.w) // o.outw) AS insum
          FROM {prev} r JOIN outw o ON o.src = r.node JOIN e ON e.src = r.node
          GROUP BY e.dst
        ),
        r{k} AS MATERIALIZED (
          SELECT nodes.node,
                 CAST({PR_BASE_NUM} // nn.n
                      + ({PR_DAMP_NUM} * (coalesce(i.insum, 0) + d{k}.dm // nn.n)) // 100
                   AS BIGINT) AS rank
          FROM nodes CROSS JOIN nn CROSS JOIN d{k}
          LEFT JOIN i{k} i ON i.node = nodes.node
        )""")
    return f"""
    WITH t AS (SELECT {_TOKS_SQL} AS toks FROM documents
               WHERE len({_TOKS_SQL}) >= 2),
    pos AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
    bi AS (SELECT toks[i] AS t1, toks[i + 1] AS t2 FROM pos
           WHERE toks[i] <> toks[i + 1]),
    und AS MATERIALIZED (
      SELECT least(t1, t2) AS a, greatest(t1, t2) AS b, count(*) AS w
      FROM bi GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
      SELECT a AS src, b AS dst, w FROM und
      UNION ALL SELECT b AS src, a AS dst, w FROM und
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
    outw AS MATERIALIZED (SELECT src, sum(w) AS outw FROM e GROUP BY src),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, CAST({PR_SCALE} // nn.n AS BIGINT) AS rank
      FROM nodes CROSS JOIN nn
    ),{",".join(rounds)}
    SELECT r.node AS token,
           CAST(o.outw AS BIGINT) AS out_weight,
           r.rank
    FROM r{_TEXTRANK_ROUNDS} r JOIN outw o ON o.src = r.node
    """


register(
    QuerySpec(
        name="text_textrank_keywords",
        build=_textrank_keywords,
        doc="TextRank keyword scores: weighted integer fixed-point PageRank "
        "over the adjacent-token co-occurrence graph (5 unrolled rounds, "
        "oracle replays edge building + every round bit-exactly)",
        oracle=_textrank_oracle(),
    )
)


# --------------------------------------------------------------------------
# First-occurrence novelty scoring (llm/dedup.py `novelty_scores`): the
# curation-order view of the dedup family — exact dups of an earlier doc
# score 0, originals 1, near-dups in between (their partner owns the
# shared shingles). Fixture: ~50 planted near-dup partners plus heavy
# 31-token-vocab shingle sharing give a full spread of ratios.
def _novelty_scores(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    return dedup.novelty_scores(docs, k=_K_SHINGLE)


# Shared with the streaming face (catalog_streaming
# `stream_novelty_ingest`): the drained ledgers reproduce this exact
# batch aggregate in any micro-batch order (ownership is a min-fold).
_NOVELTY_ORACLE = f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM t),
        post AS (
          SELECT doc_id, md5(s) AS sid
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
        ),
        owner AS (SELECT sid, min(doc_id) AS owner FROM post GROUP BY sid)
        SELECT p.doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN o.owner = p.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               round(CAST(sum(CASE WHEN o.owner = p.doc_id THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS novelty
        FROM post p JOIN owner o ON o.sid = p.sid
        GROUP BY p.doc_id
        """

register(
    QuerySpec(
        name="dedup_novelty_scores",
        build=_novelty_scores,
        doc="per-doc corpus novelty by first-occurrence shingle attribution "
        "(lowest doc id owns each distinct k-gram); digest-keyed shuffles "
        "only, O(docs) output",
        oracle=_NOVELTY_ORACLE,
    )
)


# --------------------------------------------------------------------------
# MMR diverse selection (llm/similarity.py `mmr_select`): the diversity-
# aware re-rank after retrieval. At this fixture the diversity term
# genuinely bites: 11 of 15 selected positions differ from the plain
# cosine top-5 for the same three queries.
_MMR_K, _MMR_POOL, _MMR_NQ = 5, 20, 3


def _mmr_select(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_testdata(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < _MMR_NQ)
    return similarity.mmr_select(emb, queries, k=_MMR_K, pool=_MMR_POOL)


def _mmr_oracle() -> str:
    cos = _COS_SQL
    parts = [f"""
    q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < {_MMR_NQ}),
    cand AS MATERIALIZED (
      SELECT q_id, neighbor_id, cos_sim, rnk FROM (
        SELECT q.q_id, e.vec_id AS neighbor_id,
               {cos.format(a='e.embedding', b='q.q_emb')} AS cos_sim,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY {cos.format(a='e.embedding', b='q.q_emb')} DESC,
                          e.vec_id) AS rnk
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id
      ) WHERE rnk <= {_MMR_POOL}
    ),
    pair AS MATERIALIZED (
      SELECT x.q_id, x.neighbor_id AS id_a, y.neighbor_id AS id_b,
             {cos.format(a='ea.embedding', b='eb.embedding')} AS sim
      FROM cand x JOIN cand y
        ON x.q_id = y.q_id AND x.neighbor_id <> y.neighbor_id
      JOIN embeddings ea ON ea.vec_id = x.neighbor_id
      JOIN embeddings eb ON eb.vec_id = y.neighbor_id
    ),
    sel1 AS (SELECT q_id, neighbor_id, cos_sim, 1 AS select_rank
             FROM cand WHERE rnk = 1)"""]
    for r in range(2, _MMR_K + 1):
        parts.append(f"""
    m{r} AS (SELECT p.q_id, p.id_a, max(p.sim) AS mx
             FROM pair p JOIN sel{r - 1} s
               ON s.q_id = p.q_id AND s.neighbor_id = p.id_b
             GROUP BY 1, 2),
    w{r} AS (SELECT c.q_id, c.neighbor_id, c.cos_sim,
                    row_number() OVER (PARTITION BY c.q_id
                      ORDER BY (c.cos_sim - m.mx) / 2 DESC,
                               c.neighbor_id) AS rn
             FROM cand c JOIN m{r} m
               ON m.q_id = c.q_id AND m.id_a = c.neighbor_id
             WHERE NOT EXISTS (SELECT 1 FROM sel{r - 1} s
                               WHERE s.q_id = c.q_id
                                 AND s.neighbor_id = c.neighbor_id)),
    sel{r} AS (SELECT * FROM sel{r - 1}
               UNION ALL
               SELECT q_id, neighbor_id, cos_sim, {r} FROM w{r} WHERE rn = 1)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
    SELECT q_id, neighbor_id, cos_sim, CAST(select_rank AS INT) AS select_rank
    FROM sel{_MMR_K}
    """
    )


register(
    QuerySpec(
        name="sim_mmr_select",
        build=_mmr_select,
        doc="maximal-marginal-relevance selection at exact λ=1/2 (top-20 "
        "pool, 5 greedy rounds unrolled; pairwise round-6 cosines, halving "
        "exact in IEEE) — oracle replays every round; rounds vectorized "
        "across queries",
        oracle=_mmr_oracle(),
    )
)


# --------------------------------------------------------------------------
# Retrieval evaluation harness (llm/similarity.py `retrieval_eval`):
# hits@10 / MRR / nDCG of exact cosine top-10 against label-match
# relevance — the closing eval loop for the ANN family. Fixture: labels
# cluster weakly (0–3 relevant per top-10 at sf0.01), so every metric
# path fires, including the zero-hit queries.
_EVAL_K, _EVAL_NQ = 10, 10


def _retrieval_eval(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_testdata(spark, sf, "embeddings")
    return similarity.retrieval_eval(
        emb, emb.where(F.col("vec_id") < _EVAL_NQ), k=_EVAL_K
    )


def _retrieval_eval_oracle() -> str:
    from data_pipeline_with_spark_spark.llm.similarity import (
        EVAL_SCALE,
        _ndcg_discounts,
    )

    D = _ndcg_discounts(_EVAL_K)
    P = [sum(D[:j]) for j in range(_EVAL_K + 1)]
    d_lit = "[" + ", ".join(str(d) for d in D) + "]"
    p_lit = "[" + ", ".join(str(p) for p in P[1:]) + "]"
    cos = _COS_SQL
    return f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
               FROM embeddings WHERE vec_id < {_EVAL_NQ}),
    cand AS (
      SELECT q_id, q_label, neighbor_id, rel, rnk FROM (
        SELECT q.q_id, q.q_label, e.vec_id AS neighbor_id,
               CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS rel,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY {cos.format(a='e.embedding', b='q.q_emb')} DESC,
                          e.vec_id) AS rnk
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id
      ) WHERE rnk <= {_EVAL_K}
    ),
    m AS (
      SELECT q_id, q_label,
             CAST(sum(rel) AS BIGINT) AS p_at_k_hits,
             CAST(coalesce(min(CASE WHEN rel = 1 THEN rnk END), 0) AS BIGINT)
               AS first_rel_rank,
             CAST(sum(rel * ({d_lit})[rnk]) AS BIGINT) AS dcg_scaled
      FROM cand GROUP BY q_id, q_label
    )
    SELECT q_id, q_label, p_at_k_hits, first_rel_rank,
           CAST(CASE WHEN first_rel_rank > 0
                     THEN {EVAL_SCALE} // first_rel_rank ELSE 0 END AS BIGINT)
             AS mrr_micros,
           dcg_scaled,
           CASE WHEN p_at_k_hits > 0
                THEN round(CAST(dcg_scaled AS DOUBLE)
                           / ({p_lit})[p_at_k_hits], 6)
                ELSE 0.0 END AS ndcg
    FROM m
    """


register(
    QuerySpec(
        name="sim_retrieval_eval",
        build=_retrieval_eval,
        doc="retrieval eval harness: hits@10 / first-relevant rank / integer-"
        "scaled MRR / DCG with frozen integer log2 discounts / nDCG (one "
        "final rounded division) against label-match relevance",
        oracle=_retrieval_eval_oracle(),
    )
)

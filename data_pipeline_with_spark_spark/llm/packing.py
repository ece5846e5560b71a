"""Training-batch curation operators: sequence packing and per-source
quota capping.

Packing is the concat-and-chunk scheme training pipelines use (concat
documents in a deterministic order, slice into fixed ``seq_len`` token
windows): each document maps to the span of chunk indices its tokens
land in. Expressed as one windowed cumulative sum per shard — pure
Catalyst, no UDFs, DuckDB-oracle-checkable.

Scale design: the running sum is partitioned by ``shard_col`` (default
``source``), never global — a global ORDER BY would serialize 100 TB
through one task. Real pipelines pack per shard/file anyway; chunk ids
are only meaningful within a shard. A skewed mega-source can be split
finer by pre-deriving a composite shard key (e.g. source + hash-bucket
of doc_id) before calling; the operator is agnostic to what the shard
column contains.

Per-source capping is the dataset-balancing step (cap any one domain's
share of the corpus): deterministic hash-ordered row_number per source,
keep ``k``. No ``rand()`` — md5-of-id ordering reproduces bit-identically
across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_with_spark_spark.llm.text import with_token_estimate


def with_pack_spans(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    shard_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing: within each shard, documents are laid
    end-to-end in ``order_col`` order and sliced into ``seq_len``-token
    chunks. Adds ``n_tokens_est`` (BPE-ish estimate), ``first_chunk`` /
    ``last_chunk`` (chunk-index span this document occupies in its
    shard) and ``n_chunks`` (how many chunks it touches; 0 for empty
    documents). One shuffle on the shard key; the cumsum window uses an
    explicit ROWS frame so ties can never widen it."""
    df = with_token_estimate(df, text_col)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col("n_tokens_est")
    cum = F.sum("n_tokens_est").over(w)
    start = cum - tok
    first = F.floor(start / seq_len)
    last = F.when(tok > 0, F.floor((cum - 1) / seq_len)).otherwise(first)
    return (
        df.withColumn("first_chunk", first.cast("bigint"))
        .withColumn("last_chunk", last.cast("bigint"))
        .withColumn(
            "n_chunks",
            F.when(tok > 0, last - first + 1).otherwise(F.lit(0)).cast("bigint"),
        )
    )


def pack_efficiency(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Per-shard packing report: total tokens, number of ``seq_len``
    chunks the shard fills (ceil), and the padding waste in the final
    partial chunk. Plain aggregation — no window needed."""
    df = with_token_estimate(df, text_col)
    total = F.sum("n_tokens_est")
    chunks = F.ceil(total / seq_len)
    return df.groupBy(shard_col).agg(
        total.cast("bigint").alias("total_tokens"),
        chunks.cast("bigint").alias("n_chunks"),
        (chunks * seq_len - total).cast("bigint").alias("pad_tokens"),
    )


def with_overlapping_chunks(
    df: DataFrame,
    chunk_size: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG / context-window
    counterpart of packing): each document yields chunks of
    ``chunk_size`` whitespace tokens starting every ``stride`` tokens —
    ``stride < chunk_size`` gives overlap. Chunk count is
    ``1`` when the document fits one window, else
    ``ceil((n_tok - chunk_size) / stride) + 1`` (no trailing chunk that
    adds nothing new). Empty documents yield no rows.

    Pure Catalyst: tokenize → per-row index ``sequence`` → ``explode``
    → ``slice``; embarrassingly parallel, zero shuffles — the plan is a
    single projection pipeline over the scan, so it runs at full scan
    speed on a 100 TB corpus."""
    from data_pipeline_with_spark_spark.llm.text import tokens
    from data_pipeline_with_spark_spark.util import ensure_min_partitions, exploded

    n_tok = F.col("__n_tok")
    n_chunks = F.when(n_tok <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n_tok - chunk_size) / stride) + 1
    )
    out = exploded(
        ensure_min_partitions(df)
        .withColumn("__toks", tokens(text_col))
        .withColumn("__n_tok", F.size("__toks")),
        ["*"],
        F.when(n_tok > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
        .otherwise(F.array().cast("array<int>")),
        "chunk_idx",
    )
    sliced = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_size
    )
    return (
        out.withColumn("chunk_idx", F.col("chunk_idx").cast("bigint"))
        .withColumn("chunk_text", F.array_join(sliced, " "))
        .withColumn("n_chunk_tokens", F.size(sliced).cast("bigint"))
        .drop("__toks", "__n_tok")
    )


def ffd_pack(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    shard_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Packing v2: first-fit-decreasing bin packing per shard.

    Concat-and-chunk (``with_pack_spans``) splits documents across
    chunk boundaries; FFD instead assigns each document WHOLE to a bin
    of capacity ``seq_len`` — the scheme used when documents must not
    be cut (instruction tuning, contrastive pairs). FFD is the
    classic 11/9·OPT + 6/9 approximation, so the bin count lands
    within ~22% of optimal while staying deterministic: items sort by
    (tokens desc, id asc) and bins are probed first-fit in creation
    order. Documents longer than ``seq_len`` get a bin of their own,
    flagged ``oversize`` (the caller chooses truncation policy).

    Bin packing is inherently sequential per shard, so this is the
    documented ``applyInPandas`` escape hatch (SURVEY §2.13 pattern):
    one shuffle on the shard key, then each shard packs independently
    in a single Arrow batch. Shards are the parallelism unit — at
    100 TB you sub-shard (source + hash bucket) to keep each group in
    executor memory, exactly as ``with_pack_spans`` documents; chunk
    ids are shard-local either way.

    Output: input columns + ``n_tokens_est`` + ``bin_idx`` (0-based
    within shard) + ``oversize``.
    """
    import pandas as pd

    df = with_token_estimate(df, text_col)
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields)
        + [
            T.StructField("bin_idx", T.LongType(), False),
            T.StructField("oversize", T.BooleanType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        order = sorted(
            range(len(pdf)),
            key=lambda i: (-int(pdf["n_tokens_est"].iat[i]), pdf[id_col].iat[i]),
        )
        remaining: list[int] = []  # capacity left per bin, creation order
        bin_idx = [0] * len(pdf)
        oversize = [False] * len(pdf)
        for i in order:
            tok = int(pdf["n_tokens_est"].iat[i])
            if tok > seq_len:
                bin_idx[i] = len(remaining)
                # -1 sentinel: nothing else joins this bin — a plain 0
                # would still admit zero-token documents (0 <= 0)
                remaining.append(-1)
                oversize[i] = True
                continue
            for b, cap in enumerate(remaining):
                if tok <= cap:
                    bin_idx[i] = b
                    remaining[b] = cap - tok
                    break
            else:
                bin_idx[i] = len(remaining)
                remaining.append(seq_len - tok)
        return pdf.assign(bin_idx=bin_idx, oversize=oversize)

    return df.groupBy(shard_col).applyInPandas(pack, schema=out_schema)


def source_mixture_weights(
    df: DataFrame,
    alpha: float = 0.5,
    target_tokens: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights per source: w_s ∝ tokens_s^α
    normalized over sources (α=1 → natural proportions, α→0 → uniform;
    the multinomial up/down-sampling rule used by multilingual and
    multi-corpus LLM training mixes), plus ``epochs`` — how many passes
    over a source fill its share of ``target_tokens``.

    Scale shape: one map-side-combined aggregation down to O(sources)
    rows, then the normalizing sum joins back as a broadcast scalar —
    the 100 TB corpus is scanned once and never shuffled."""
    from data_pipeline_with_spark_spark.llm.text import tokens
    from data_pipeline_with_spark_spark.util import ensure_min_partitions

    stats = (
        ensure_min_partitions(df)
        .withColumn("__n_tok", F.size(tokens(text_col)))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tok").alias("n_tokens"),
        )
    )
    powed = stats.withColumn(
        "__pw", F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    )
    total = powed.agg(F.sum("__pw").alias("__pw_total"))
    return (
        powed.crossJoin(F.broadcast(total))
        # zero-token guard (r5 ADVICE): a source of all-empty documents
        # has n_tokens=0 -> pw=0 and epochs would be 0/0 = NaN, which
        # propagates into epoch_expand's n_repeats as NULL and silently
        # drops the source. Weight/epochs pin to 0.0 instead (an empty
        # source contributes no tokens, so 0 passes is the true answer).
        .withColumn(
            "weight",
            F.when(
                F.col("__pw_total") > 0,
                F.round(F.col("__pw") / F.col("__pw_total"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "epochs",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.lit(float(target_tokens)) * (F.col("__pw") / F.col("__pw_total"))
                    / F.col("n_tokens").cast("double"),
                    4,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select(source_col, "n_docs", "n_tokens", "weight", "epochs")
    )


def epoch_expand(
    df: DataFrame,
    epochs_df: DataFrame | None = None,
    alpha: float = 0.5,
    target_tokens: int = 1_000_000,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize a temperature-sampled training mix: repeat each
    document ``floor(epochs_s)`` times, plus one extra repeat for a
    deterministic md5-fraction of documents so each source's EXPECTED
    token count hits ``target_tokens · w_s`` exactly — the standard
    fractional-epoch trick, made reproducible (no ``rand()``): a doc
    earns its extra pass iff its 3-hex-digit md5 prefix sorts below
    ``floor(frac·4096)`` rendered in hex (fixed-width lowercase hex
    compares lexicographically == numerically). Sources with
    ``epochs < 1`` are down-sampled by the same rule.

    Scale shape: the O(sources) epochs table broadcasts; repeats come
    from a shuffle-free ``explode(sequence)`` projection, so the output
    streams at scan speed and lands ≈``target_tokens`` of data."""
    if epochs_df is None:
        epochs_df = source_mixture_weights(
            df, alpha=alpha, target_tokens=target_tokens,
            source_col=source_col, text_col=text_col,
        )
    joined = df.join(
        F.broadcast(epochs_df.select(source_col, "epochs")), source_col
    )
    base = F.floor("epochs").cast("int")
    frac = F.col("epochs") - F.floor("epochs")
    thr = F.lpad(F.lower(F.hex(F.floor(frac * 4096).cast("int"))), 3, "0")
    h3 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 3)
    n_rep = (base + (h3 < thr).cast("int")).alias("n_repeats")
    return (
        joined.withColumn("n_repeats", n_rep)
        .where(F.col("n_repeats") > 0)  # sequence(1,0) would descend
        .withColumn("epoch_idx", F.explode(F.sequence(F.lit(1), F.col("n_repeats"))))
        .drop("epochs")
    )


def source_cap(
    df: DataFrame,
    k: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap any one source's contribution at ``k`` documents, chosen by
    deterministic hash order (md5 of the id, id tiebreak) — an unbiased,
    reproducible subsample with no ``rand()``. One shuffle on the source
    key; `WindowGroupLimit` pushes the rank filter map-side, so only
    ~k rows per source survive each partial before the exchange."""
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .withColumn("sample_rank", F.col("sample_rank").cast("bigint"))
    )


def split_train_holdout(
    df: DataFrame,
    holdout_frac: float = 0.1,
    salt: str = "split-v1",
    by_col: str = "source",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, contamination-safe train/holdout assignment.

    The split hashes the GROUP key (``by_col``, default ``source``),
    not the row id: near-duplicate documents overwhelmingly live
    within a source/domain, so hashing per-row would leak eval
    n-grams into training through a sibling copy — the standard
    leakage trap group-aware splitting exists to avoid. Every row of
    a group lands on the same side by construction.

    Assignment is salted-md5 bucketed (10k buckets); the salt
    versions the split — changing it reshuffles every group, keeping
    it fixed reproduces the split on any engine (md5 is
    cross-engine-identical, unlike xxhash64, which DuckDB lacks).
    Pure projection: no shuffle, no driver state, resharding-stable
    at any corpus size."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.lit(":"), F.col(by_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    cut = int(round(holdout_frac * 10000))
    return df.withColumn(
        out_col, F.when(bucket < cut, F.lit("holdout")).otherwise(F.lit("train"))
    )


def _md5_bucket(col, salt: str, n: int):
    """Salted-md5 bucket in [0, n) — the cross-engine hash primitive
    shared with split_train_holdout (md5 is engine-identical; xxhash64
    is not portable to the DuckDB oracle)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), col)), 1, 8),
            16,
            10,
        ).cast("bigint")
        % n
    )


def dsir_select(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 128,
    top_k: int | None = None,
    salt: str = "dsir-v1",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how target-like its hashed n-gram distribution is, then sample
    without replacement proportionally to the importance weights via
    Gumbel-top-k.

    - **Features**: unigrams + bigrams of the whitespace tokens, hashed
      into ``n_buckets`` buckets with the salted-md5 primitive (so the
      bag-of-hashed-ngrams model — DSIR's exact feature space — is
      engine-portable).
    - **Weights**: per bucket, add-one-smoothed log ratio
      ``ln((t_k+1)/(T+B)) − ln((q_k+1)/(Q+B))`` between the TARGET
      (rows matching ``target_pred``) and the RAW (all rows)
      distributions; a document's ``logweight`` is the sum of its
      features' ratios (rounded to 4, the cross-engine log-sum
      precedent from the bigram-LM entry).
    - **Resampling**: Gumbel-top-k — ``score = logweight + g`` where
      ``g = −ln(−ln(u))`` and ``u`` derives from a salted md5 of the
      id, so the "randomness" is deterministic, versioned by the salt,
      and replayable in SQL. Top-k by score IS sampling without
      replacement with probability ∝ softmax(logweight) (Gumbel-max);
      ``top_k=None`` returns everything with scores.

    Scale shape: the feature explode aggregates map-side into at most
    ``n_buckets`` partial rows per task (the ratio table is B rows,
    broadcast); the per-doc sum is ONE shuffle keyed by id; the
    selection window is a global top-k (WindowGroupLimit at rank≤k).
    Nothing row-scale crosses the driver."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = df.select(
        id_col,
        F.when(target_pred, F.lit(1)).otherwise(F.lit(0)).alias("__is_target"),
        F.explode_outer(F.concat(toks, bigrams)).alias("__feat"),
    ).withColumn("__bucket", _md5_bucket(F.col("__feat"), salt, n_buckets))
    counts = (
        feats.where(F.col("__feat").isNotNull())
        .groupBy("__bucket")
        .agg(
            F.sum("__is_target").cast("double").alias("t_k"),
            F.count(F.lit(1)).cast("double").alias("q_k"),
        )
    )
    tot = counts.agg(
        F.sum("t_k").alias("t_total"), F.sum("q_k").alias("q_total")
    )
    ratios = F.broadcast(
        counts.crossJoin(F.broadcast(tot)).select(
            "__bucket",
            (
                F.log((F.col("t_k") + 1) / (F.col("t_total") + n_buckets))
                - F.log((F.col("q_k") + 1) / (F.col("q_total") + n_buckets))
            ).alias("__ratio"),
        )
    )
    per_doc = (
        feats.join(ratios, on="__bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("__feat")).alias("n_feats"),
            F.round(F.coalesce(F.sum("__ratio"), F.lit(0.0)), 4).alias(
                "logweight"
            ),
        )
    )
    # deterministic Gumbel noise from the id hash: u in (0, 1) from the
    # first 8 md5 hex chars (+0.5 keeps u strictly inside the interval)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(2**32))
    scored = df.join(per_doc, on=id_col).withColumn(
        "score", F.round(F.col("logweight") - F.log(-F.log(u)), 4)
    )
    if top_k is None:
        return scored
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= top_k)
    )

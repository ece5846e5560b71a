"""In-engine quality classifier: hashed-ngram logistic regression.

The standard LLM curation quality filter (GPT-3's LR-against-WebText,
LLaMA's fasttext-style filters) reduced to its portable core: documents
featurize into hashed unigram+bigram term frequencies (the same
salted-md5 bucket primitive as DSIR / the train-holdout split), a
logistic regression trains by FULL-BATCH gradient descent — a driver
loop of ``iters`` rounds, each ONE distributed aggregate, exactly the
``kmeans_lloyd`` iterative shape — and every document scores in one
broadcast-join pass.

Determinism/portability doctrine: full-batch (no sampling), and every
cross-engine float hazard is quantized — per-doc tf values, per-round
probabilities, and the updated weights all round to 6 decimals — so
each round's INPUTS are identical on any engine and the DuckDB oracle
replays training bit-for-bit (``exp``/``ln`` are not IEEE-pinned across
libms, but a 1-ulp wobble cannot move a value across a 0.5e-6 rounding
boundary except adversarially).

Scale shape: the feature explode shuffles (id, bucket, x) triples with
map-side combine; per-round cost is one broadcast of B+1 weights out
and one B+1-row gradient aggregate back — the driver never sees a
row-scale structure. Scoring is a pure broadcast-join projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.util import ensure_min_partitions, session_cache

#: bias rides the feature frame as one extra bucket (x = 1.0) so the
#: gradient aggregate returns ALL parameters in one job.
_BIAS = "__bias__"


def _bucket_expr(col, salt: str, n: int):
    from data_pipeline_with_spark_spark.llm.packing import _md5_bucket

    return _md5_bucket(col, salt, n)


def featurize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    salt: str = "qc-v1",
) -> DataFrame:
    """(id, bucket, x) hashed-ngram tf rows + one bias row per doc
    (bucket = ``n_buckets``, x = 1). tf = count/n_feats rounded to 6 —
    the first quantization point of the portability doctrine."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    exploded = df.select(
        id_col, F.explode_outer(F.concat(toks, bigrams)).alias("__feat")
    )
    counts = (
        exploded.where(F.col("__feat").isNotNull())
        .groupBy(id_col, "__feat")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__n", F.sum("__c").over(Window.partitionBy(id_col)))
        .select(
            id_col,
            _bucket_expr(F.col("__feat"), salt, n_buckets).alias("bucket"),
            F.round(F.col("__c") / F.col("__n"), 6).alias("x"),
        )
        # same-bucket collisions fold: x values are already rounded, so
        # the sum of <= a few rounded terms is exact in both engines
        .groupBy(id_col, "bucket")
        .agg(F.round(F.sum("x"), 6).alias("x"))
    )
    bias = df.select(
        id_col, F.lit(n_buckets).cast("bigint").alias("bucket"), F.lit(1.0).alias("x")
    )
    return counts.unionByName(bias)


def train_quality_classifier(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    iters: int = 5,
    lr: float = 1.0,
    salt: str = "qc-v1",
) -> list[float]:
    """Full-batch logistic-regression weights (length ``n_buckets``+1,
    bias last) separating ``target_pred`` rows (y=1) from the rest.
    Each round: broadcast the weights into a margin projection, one
    aggregate returns every parameter's gradient, update + round —
    only B+1 doubles cross the driver per round."""
    from data_pipeline_with_spark_spark.llm.similarity import _double_lit

    feats = session_cache(
        featurize(
            ensure_min_partitions(df), text_col, id_col, n_buckets, salt
        ).join(
            df.select(
                id_col,
                F.when(target_pred, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
            ),
            on=id_col,
        )
    )
    n_docs = feats.where(F.col("bucket") == n_buckets).count()
    w = [0.0] * (n_buckets + 1)
    for _ in range(iters):
        wlit = _double_lit(w)
        margin = feats.groupBy(id_col, "y").agg(
            F.sum(F.element_at(wlit, (F.col("bucket") + 1).cast("int")) * F.col("x")).alias("m")
        )
        resid = margin.select(
            id_col,
            (
                F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), 6)
                - F.col("y")
            ).alias("r"),
        )
        grads = (
            feats.join(resid, on=id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("r") * F.col("x")).alias("g"))
            .collect()
        )
        gmap = {int(r.bucket): float(r.g) for r in grads}
        w = [
            round(w[k] - lr * gmap.get(k, 0.0) / n_docs, 6)
            for k in range(n_buckets + 1)
        ]
    return w


def score_quality(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "qc-v1",
) -> DataFrame:
    """Attach ``quality_score`` = round(sigmoid(w·x + b), 6): one
    broadcast of B+1 doubles, one id-keyed aggregate, no UDFs."""
    from data_pipeline_with_spark_spark.llm.similarity import _double_lit

    n_buckets = len(weights) - 1
    feats = featurize(df, text_col, id_col, n_buckets, salt)
    wlit = _double_lit(weights)
    margin = feats.groupBy(id_col).agg(
        F.sum(F.element_at(wlit, (F.col("bucket") + 1).cast("int")) * F.col("x")).alias("m")
    )
    scored = margin.select(
        id_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), 6).alias(
            "quality_score"
        ),
    )
    return df.join(scored, on=id_col)

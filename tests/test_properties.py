"""Property-based tests (hypothesis): operator invariants on generated
inputs, plus pandas as an independent as-of-join oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.operators import (
    asof_join,
    melt,
    pivot_wide,
    top_k_per_group,
    union_by_name,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.sampled_from(["a", "b", "c"])
years = st.sampled_from([2000, 2001, 2002])
vals = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(lambda v: round(v, 2))


@given(rows=st.lists(st.tuples(keys, years, vals), min_size=1, max_size=30))
@_settings
def test_melt_inverts_pivot(spark, rows):
    # sum-pivot then melt == direct two-key sum aggregate
    df = spark.createDataFrame(rows, ["k", "year", "v"])
    wide = pivot_wide(df, ["k"], "year", "v", agg="sum", pivot_values=[2000, 2001, 2002])
    long = melt(wide, ["k"], ["2000", "2001", "2002"], "year", "v", var_cast="int")
    long = long.where(F.col("v").isNotNull())
    direct = df.groupBy("k", "year").agg(F.sum("v").alias("v"))
    got = {(r.k, r.year): round(r.v, 6) for r in long.collect()}
    want = {(r.k, r.year): round(r.v, 6) for r in direct.collect()}
    assert got == want


@given(rows=st.lists(st.tuples(keys, vals), min_size=1, max_size=20))
@_settings
@pytest.mark.slow
def test_union_by_name_column_order_invariant(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    swapped = df.select("v", "k")
    u = union_by_name([df, swapped])
    assert u.count() == 2 * len(rows)
    assert sorted((r.k, r.v) for r in u.collect()) == sorted(
        (r.k, r.v) for r in df.collect()
    ) * 2 or u.count() == 2 * len(rows)


@given(
    rows=st.lists(
        st.tuples(keys, vals, st.integers(min_value=0, max_value=10**6)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[2],
    ),
    k=st.integers(min_value=1, max_value=5),
)
@_settings
def test_top_k_returns_true_top_k(spark, rows, k):
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    out = top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], k=k).collect()
    by_group: dict[str, list] = {}
    for g, v, i in rows:
        by_group.setdefault(g, []).append((-v, i))
    for g, items in by_group.items():
        want_ids = [i for _, i in sorted(items)[:k]]
        got_ids = sorted(r.id for r in out if r.g == g)
        assert got_ids == sorted(want_ids), g


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000), vals),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@_settings
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, float(t)) for k, t in left], ["key", "ts"]
    ).withColumn("lid", F.monotonically_increasing_id())
    rdf = spark.createDataFrame([(k, float(t), v) for k, t, v in right], ["key", "ts", "val"])
    got = asof_join(ldf, rdf, key="key").orderBy("key", "ts").collect()

    lp = pd.DataFrame(sorted(left), columns=["key", "ts"]).astype({"ts": "float"})
    rp = (
        pd.DataFrame([(k, float(t), v) for k, t, v in right], columns=["key", "ts", "val"])
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp.sort_values("ts"), rp, on="ts", by="key", direction="backward"
    ).sort_values(["key", "ts"])
    got_vals = [(r.key, r.ts, r.val) for r in got]
    want_vals = [
        (int(k), float(t), None if pd.isna(v) else float(v))
        for k, t, v in want[["key", "ts", "val"]].itertuples(index=False)
    ]
    assert sorted(got_vals, key=str) == sorted(want_vals, key=str)


@pytest.mark.parametrize("n", [0])
def test_union_of_zero_frames_raises(n):
    with pytest.raises(ValueError):
        union_by_name([])


# --------------------------------------------------------------------------
# Model-based lakehouse check: a random DML sequence applied to both the
# VersionedTable and an in-memory pandas model must agree on every read,
# and time travel must replay any model snapshot exactly.

_ops = st.sampled_from(["append", "update", "delete", "optimize"])
_thresholds = st.integers(min_value=0, max_value=9)


@given(
    seq=st.lists(st.tuples(_ops, _thresholds), min_size=3, max_size=7),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_versioned_table_matches_model_under_random_dml(spark, tmp_path_factory, seq):
    from data_pipeline_with_spark_spark.lake.versioned import VersionedTable

    root = tmp_path_factory.mktemp("model")
    base = [(i, i % 10, float(i)) for i in range(40)]
    t = VersionedTable(spark, str(root / "t")).create(
        spark.createDataFrame(base, ["id", "k", "v"])
    )
    model = {i: (i, k, v) for i, k, v in base}
    snapshots = {0: dict(model)}
    next_id = 1000

    def check():
        got = {(r.id, r.k, r.v) for r in t.read().collect()}
        assert got == set(model.values())

    for op, th in seq:
        if op == "append":
            rows = [(next_id + j, th, float(th)) for j in range(3)]
            t.append(spark.createDataFrame(rows, ["id", "k", "v"]))
            for r in rows:
                model[r[0]] = r
            next_id += 3
        elif op == "update":
            t.update(where=f"k = {th}", set_exprs={"v": "v + 0.5"})
            model = {
                i: (r[0], r[1], r[2] + 0.5 if r[1] == th else r[2])
                for i, r in model.items()
            }
        elif op == "delete":
            t.delete(f"k = {th}")
            model = {i: r for i, r in model.items() if r[1] != th}
        else:
            t.optimize()
        snapshots[t._latest().version] = dict(model)
        check()

    # time travel replays every recorded model snapshot exactly
    for v, snap in list(snapshots.items())[:: max(1, len(snapshots) // 3)]:
        got = {(r.id, r.k, r.v) for r in t.read(version=v).collect()}
        assert got == set(snap.values()), f"version {v} mismatch"


para_words = st.sampled_from(["alpha", "beta", "gamma", "delta"])
paragraphs = st.lists(para_words, min_size=1, max_size=3).map(" ".join)


@given(
    docs=st.lists(
        st.lists(paragraphs, min_size=1, max_size=4).map("\n\n".join),
        min_size=1,
        max_size=8,
    )
)
@_settings
def test_paragraph_dedup_keep_first_property(spark, docs):
    # Corpus-wide invariants on generated multi-paragraph documents:
    # every distinct paragraph survives EXACTLY once, its survivor is
    # the lexicographically-first (doc_id, para_idx) occurrence, and
    # each doc's kept paragraphs preserve original order. Pure-Python
    # replay is the oracle.
    from data_pipeline_with_spark_spark.llm.dedup import paragraph_dedup

    rows = [(i, text) for i, text in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r for r in paragraph_dedup(df, include_subsumed=True).collect()
    }
    first_owner: dict[str, tuple[int, int]] = {}
    for i, text in rows:
        for idx, para in enumerate(text.split("\n\n")):
            first_owner.setdefault(para, (i, idx))
    for i, text in rows:
        paras = text.split("\n\n")
        kept = [p for idx, p in enumerate(paras) if first_owner[p] == (i, idx)]
        r = out[i]
        assert r.n_paras == len(paras)
        assert r.n_kept == len(kept)
        assert r.text_dedup == "\n\n".join(kept)
    # exactly-once survival across the whole corpus
    survived = [
        p for r in out.values() if r.text_dedup for p in r.text_dedup.split("\n\n")
    ]
    assert sorted(survived) == sorted(set(first_owner))


# ---------------------------------------------------------------- codecs
# Property round-trips for the pure-numpy media containers: any shape,
# any pixel/sample content must survive encode->decode bit-exactly.
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_with_spark_spark.llm import codecs


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_ppm_round_trip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(arr)), arr)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 200),
    channels=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_round_trip_property(n, channels, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=(n, channels)).astype(np.int16)
    dec, got_rate = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert got_rate == rate
    assert dec.shape == (n, channels)
    assert np.array_equal(dec, samples)


@settings(max_examples=30, deadline=None)
@given(
    frames=st.integers(1, 6),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_round_trip_property(frames, h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
    dec, fps = codecs.decode_y4m(codecs.encode_y4m(arr, fps=(30, 1)))
    assert fps == (30, 1)
    assert np.array_equal(dec, arr)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_arbitrary_bytes_never_decode_silently(data):
    # Garbage must raise UnsupportedImageError/ValueError, never return
    # wrong pixels (a parser accepting garbage would poison checksums).
    import pytest as _pytest

    fmt = codecs.sniff_media(data)
    if fmt is None:
        with _pytest.raises(codecs.UnsupportedImageError):
            codecs.decode_image(data)
    else:
        # sniffed: either decodes cleanly or raises the typed error
        try:
            if fmt == "wav":
                codecs.decode_wav(data)
            elif fmt == "y4m":
                codecs.decode_y4m(data)
            else:
                codecs.decode_image(data)
        except (codecs.UnsupportedImageError, ValueError):
            pass

"""Degenerate-input robustness: every registered query must survive
EMPTY tables (schema-correct, zero rows).

At 100 TB an empty slice is a normal event — a partition with no
matching files, a date range with no data, a tenant with no documents.
An operator that crashes on it (driver-side ``collect()[0]``,
``np.stack([])``, seed draws from an empty corpus) fails the whole job
for a state the pipeline will certainly reach. The r5 sweep found two:
IVF centroid fitting (np.stack on an empty sample) and the semantic
dedup seed draw (hard ValueError) — both now return the contract
schema empty, pinned here for all 50 queries at once.
"""

import pytest
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_empty")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    return str(dst)


#: Columns NULLed out in the NULL-heavy fixture (nullable payloads only —
#: keys stay, so joins still resolve and the NULLs flow through operators).
_NULL_COLS = {
    "documents": ["text", "source", "lang"],
    "events": ["event_type", "user_id", "value", "props"],
}


@pytest.fixture(scope="module")
def onerow_sf_dir(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_onerow")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def nulls_sf_dir(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_nulls")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        types = dict(df.dtypes)
        for c in _NULL_COLS.get(t, []):
            if c in df.columns:
                df = df.withColumn(c, F.lit(None).cast(types[c]))
        df.limit(50).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    return str(dst)


def _sweep(spark, sf_dir):
    import __spark_entry__ as entry

    failures = []
    for name, fn in sorted(entry.queries().items()):
        try:
            fn(spark, sf_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {str(ex).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    _sweep(spark, empty_sf_dir)


def test_every_query_survives_onerow_tables(spark, onerow_sf_dir):
    """Singleton groups: percentile of one value, stddev NULL, windows
    with a single row, self-joins with no second member."""
    _sweep(spark, onerow_sf_dir)


def test_every_query_survives_null_payloads(spark, nulls_sf_dir):
    """All-NULL text/event payloads (the ADVICE size(NULL) = -1 class):
    every operator must treat NULL as absent, not as a phantom value —
    the r5 sweep caught fingerprint_udf calling len(None)."""
    _sweep(spark, nulls_sf_dir)


@pytest.fixture(scope="module")
def nanf_sf_dir(spark, tmp_path_factory):
    """NaN/±Inf event values and zero-/NaN-component embeddings."""
    dst = tmp_path_factory.mktemp("sf_nanf")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 1000 == 0, F.lit(float("nan")))
                .when(F.col("event_id") % 1000 == 1, F.lit(float("inf")))
                .when(F.col("event_id") % 1000 == 2, F.lit(float("-inf")))
                .otherwise(F.col("value")),
            )
        elif t == "embeddings":
            zero = F.transform("embedding", lambda x: F.lit(0.0))
            nanv = F.transform("embedding", lambda x: F.lit(float("nan")))
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 500 == 0, zero)
                .when(F.col("vec_id") % 500 == 1, nanv)
                .otherwise(F.col("embedding")),
            )
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def skew_sf_dir(spark, tmp_path_factory):
    """Pathological skew: every document identical (the dedup tier's
    max-clique case), every event on one (user_id, event_type) hot key,
    every embedding the same vector."""
    dst = tmp_path_factory.mktemp("sf_skew")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "documents":
            df = df.withColumn(
                "text",
                F.lit(
                    "the same duplicated document text appears everywhere"
                ),
            )
        elif t == "events":
            df = df.withColumn("user_id", F.lit(7).cast("long")).withColumn(
                "event_type", F.lit("click")
            )
        elif t == "embeddings":
            first = df.orderBy("vec_id").limit(1).collect()[0]["embedding"]
            df = df.withColumn(
                "embedding", F.array(*[F.lit(float(x)) for x in first])
            )
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    return str(dst)


def test_every_query_survives_pathological_skew(spark, skew_sf_dir):
    """All-duplicate corpora and single-hot-key streams: candidate
    generators face their max-clique bound, salting and AQE face one
    key owning every row — jobs must complete, not crash or hang."""
    _sweep(spark, skew_sf_dir)


def test_every_query_survives_nan_inf(spark, nanf_sf_dir):
    """NaN/±Inf measures and degenerate (all-zero / NaN-component)
    embedding vectors: aggregates, percentiles, sketches, and every
    similarity lane must complete — NaN similarities from zero-norm
    vectors flow through threshold filters (the documented pre-filter
    contract), they must not abort the job."""
    _sweep(spark, nanf_sf_dir)


@pytest.fixture(scope="module")
def extreme_ts_sf_dir(spark, tmp_path_factory):
    """Events with epoch-zero, year-1900 and year-2262 outlier
    timestamps plus NULL ts — the dirty-ingest timestamps every real
    pipeline sees."""
    dst = tmp_path_factory.mktemp("sf_time")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "events":
            df = df.withColumn(
                "ts",
                F.when(
                    F.col("event_id") % 100 == 0,
                    F.to_timestamp(F.lit("1900-01-01 00:00:00")),
                )
                .when(
                    F.col("event_id") % 100 == 1,
                    F.to_timestamp(F.lit("2262-04-11 00:00:00")),
                )
                .when(
                    F.col("event_id") % 100 == 2,
                    F.to_timestamp(F.lit("1970-01-01 00:00:00")),
                )
                .when(
                    F.col("event_id") % 100 == 3,
                    F.lit(None).cast("timestamp"),
                )
                .otherwise(F.col("ts")),
            )
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    return str(dst)


def test_every_query_survives_extreme_timestamps(spark, extreme_ts_sf_dir):
    """A 362-year timestamp span must never OOM an executor: queries
    either complete, or (the gapfill-composed anomaly arm, whose dense
    hourly spine is genuinely centuries wide here) fail with the
    spine guard's actionable message — the loud error the r5 sweep
    added in place of the Java-heap OOM it measured."""
    import __spark_entry__ as entry

    failures = []
    for name, fn in sorted(entry.queries().items()):
        try:
            fn(spark, extreme_ts_sf_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting a report
            msg = str(ex)
            if "gapfill:" in msg and "max_buckets" in msg:
                continue  # the guard doing its job
            failures.append(f"{name}: {msg.splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)


def test_giant_document_takes_blocked_paths(spark):
    """One multi-hundred-k-token document must stream through the
    blocked per-doc numpy paths (MinHash lane min, SimHash bit sums)
    instead of materializing the full (shingles x lanes) scramble
    matrix — the r5 sweep measured 84 s / ~1 GB for a single 1M-token
    row before blocking. 200k tokens crosses the 64k block size three
    times over; identical results are guaranteed by min/sum
    associativity and pinned by the cross-engine suites."""
    from drill_logfile_plugin_spark.operators import dedup as D

    words = " ".join(f"w{i % 5000}" for i in range(200_000))
    docs = spark.createDataFrame(
        [(0, words)] + [(i, f"doc {i} text") for i in range(1, 20)],
        "doc_id long, text string",
    )
    assert D.lsh_candidate_pairs(docs).count() == 0
    assert D.simhash_pairs(docs, bits=64).count() == 0


def test_embedding_ops_handle_null_and_ragged_vectors(spark):
    """NULL embeddings are absent values (filtered at every numpy-lane
    operator's input — SQL aggregate semantics), and a RAGGED embedding
    column (mixed dimensions, the corrupted-ingest shape) fails with an
    actionable error naming the dimensions seen, not numpy's opaque
    shape complaint from inside an executor."""
    import pytest as _pytest

    from drill_logfile_plugin_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_dup_pairs,
        ivf_topk,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(base.select("embedding").head()[0])
    em_null = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 97 == 1, F.lit(None).cast("array<double>")
        ).otherwise(F.col("embedding")),
    )
    em_ragged = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 97 == 0, F.slice("embedding", 1, dim // 2)
        ).otherwise(F.col("embedding")),
    )
    # NULLs: complete, never crash
    assert ann_lsh_topk(em_null.limit(10), em_null).count() > 0
    assert ivf_topk(em_null.limit(10), em_null).count() > 0
    cosine_dup_pairs(em_null, 0.99).count()
    # ragged: the loud contract error, in both executor and driver lanes
    with _pytest.raises(Exception, match="ragged"):
        ann_lsh_topk(em_ragged.limit(10), em_ragged).count()
    with _pytest.raises(Exception, match="ragged"):
        ivf_topk(em_ragged.limit(10), em_ragged).count()

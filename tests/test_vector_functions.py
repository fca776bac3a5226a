"""Unit checks of the vector kernels against numpy ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vrod_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    vector_lit,
)

A = [1.0, -2.0, 3.5, 0.0]
B = [0.5, 4.0, -1.0, 2.0]


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        [(A, B)], "a array<float>, b array<float>"
    )


def _one(df, col):
    return df.select(col.alias("v")).first()["v"]


def test_dot(pair_df):
    assert _one(pair_df, dot_product("a", "b")) == pytest.approx(float(np.dot(A, B)))


def test_l2_norm(pair_df):
    assert _one(pair_df, l2_norm("a")) == pytest.approx(float(np.linalg.norm(A)))


def test_l2_distance(pair_df):
    expect = float(np.linalg.norm(np.array(A) - np.array(B)))
    assert _one(pair_df, l2_distance("a", "b")) == pytest.approx(expect)


def test_cosine(pair_df):
    expect = float(np.dot(A, B) / (np.linalg.norm(A) * np.linalg.norm(B)))
    assert _one(pair_df, cosine_similarity("a", "b")) == pytest.approx(expect)


def test_vector_lit_roundtrip(spark):
    df = spark.range(1).select(vector_lit([1.5, 2.5]).alias("v"))
    assert df.first()["v"] == [1.5, 2.5]


def test_vector_lit_sql_parse_is_bit_identical(spark):
    """The single-parse fast path (vector_lit_sql -> F.expr) must yield
    bit-identical doubles to per-element F.lit construction, across
    exponent-form, denormal, negative-zero and long-mantissa values;
    non-finite values take the per-element fallback."""
    rng = np.random.RandomState(7)
    exotic = [0.0, -0.0, 1e-300, -1e300, 5e-324, 1.0000000000000002,
              1 / 3, -2 / 7, 1e17, 123456789.123456789]
    vals = exotic + list(rng.randn(64) * np.exp(rng.randn(64) * 20))
    slow = F.array(*[F.lit(float(v)) for v in vals])
    row = spark.range(1).select(
        vector_lit(vals).alias("fast"), slow.alias("slow")
    ).first()
    import struct
    assert [struct.pack("d", v) for v in row["fast"]] == [
        struct.pack("d", v) for v in row["slow"]
    ]
    nf = spark.range(1).select(
        vector_lit([1.0, float("inf"), float("nan")]).alias("v")
    ).first()["v"]
    assert nf[0] == 1.0 and math.isinf(nf[1]) and math.isnan(nf[2])


def test_bucket_expr_parse_matches_column_form(spark):
    """bucket_expr's one-parse SQL tree must bucket identically to the
    original Column composition for random planes and vectors."""
    from vrod_spark.operators.ann import _planes, bucket_expr

    rng = np.random.RandomState(11)
    planes = _planes(16, 6, seed=3)
    vecs = [(i, rng.randn(16).astype("float32").tolist()) for i in range(200)]
    df = spark.createDataFrame(vecs, "id int, v array<float>")

    ref = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(F.col("v"), vector_lit(plane.tolist()),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        ref = ref + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    rows = df.select("id", bucket_expr("v", planes).alias("fast"),
                     ref.alias("slow")).collect()
    assert all(r["fast"] == r["slow"] for r in rows)


def test_l2_distance_to_self_is_zero(pair_df):
    assert _one(pair_df, l2_distance("a", "a")) == pytest.approx(0.0)
    assert math.isclose(_one(pair_df, cosine_similarity("b", "b")), 1.0, rel_tol=1e-9)


def test_int8_quantization_roundtrip_and_knn_recall(spark, sf_dir):
    """quantize_int8/dequantize_int8: per-element reconstruction error is
    bounded by scale/2; kNN over DEQUANTIZED vectors recovers ≥ 8/10 of
    the exact top-10 (int8 is plenty for cosine/L2 ranking); zero vectors
    quantize to all-zero codes without dividing by zero."""
    from pyspark.sql import functions as F

    from vrod_spark.functions.vector import dequantize_int8, l2_distance, quantize_int8, vector_lit
    from vrod_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id",
        "embedding",
        quantize_int8("embedding").alias("qs"),
    ).select(
        "vec_id",
        "embedding",
        dequantize_int8(F.col("qs")).alias("deq"),
        F.col("qs.scale").alias("scale"),
        F.array_max(F.transform(F.col("qs.q"), F.abs)).alias("max_code"),
    )
    checked = staged.select(
        "vec_id",
        "embedding",
        "deq",
        F.zip_with(
            "deq",
            F.transform("embedding", lambda x: x.cast("double")),
            lambda a, b: F.abs(a - b),
        ).alias("err"),
        "scale",
        "max_code",
    ).select(
        "vec_id", "embedding", "deq",
        (F.array_max("err") <= F.col("scale") / 2 + 1e-12).alias("err_ok"),
        (F.col("max_code") <= 127).alias("code_ok"),
    )
    bad = checked.filter(~F.col("err_ok") | ~F.col("code_ok")).count()
    assert bad == 0

    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    exact_top = {
        r["vec_id"]
        for r in emb.select("vec_id", l2_distance("embedding", vector_lit(qv)).alias("d"))
        .orderBy("d", "vec_id").limit(10).collect()
    }
    quant_top = {
        r["vec_id"]
        for r in checked.select("vec_id", l2_distance(F.col("deq"), vector_lit(qv)).alias("d"))
        .orderBy("d", "vec_id").limit(10).collect()
    }
    assert len(exact_top & quant_top) >= 8

    zero = spark.createDataFrame([(0, [0.0, 0.0, 0.0])], "id bigint, embedding array<float>")
    zrow = zero.select(quantize_int8("embedding").alias("qs")).select(
        "qs.scale", "qs.q", dequantize_int8(F.col("qs")).alias("deq")
    ).first()
    assert zrow["scale"] is None or zrow["scale"] == 0.0
    assert list(zrow["q"]) == [0, 0, 0] and list(zrow["deq"]) == [0.0, 0.0, 0.0]


def test_pq_compression_recall_and_determinism(spark, sf_dir):
    """Product quantization: codes are m bytes (32x smaller than the
    64-dim float32 vectors), ADC top-k recall vs exact kNN >= 0.7 at
    m=8/nbits=8 on the real embeddings table, training is deterministic
    (hash-sampled subset + seeded k-means), and ADC distances are within
    quantization error of the true distances for the returned set."""
    import numpy as np

    from vrod_spark.operators.pq import pq_encode, pq_search, pq_train
    from vrod_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb1 = pq_train(emb, m=8, nbits=8, sample_size=4096, seed=7)
    cb2 = pq_train(emb, m=8, nbits=8, sample_size=4096, seed=7)
    assert np.array_equal(cb1, cb2)  # deterministic training
    assert cb1.shape == (8, 256, 8)

    codes = pq_encode(emb, cb1)
    row = codes.first()
    assert len(bytes(row["code"])) == 8  # 256B float32 -> 8B code

    q = [float(v) for v in emb.first()["embedding"]]
    got = [r["vec_id"] for r in pq_search(codes, cb1, q, 20).collect()]
    assert len(got) == 20

    # Exact top-20 by true L2 for recall.
    rows = emb.collect()
    x = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    ids = np.asarray([r["vec_id"] for r in rows])
    d = ((x - np.asarray(q)) ** 2).sum(axis=1)
    exact = set(ids[np.argsort(d, kind="stable")[:20]].tolist())
    recall = len(set(got) & exact) / 20
    assert recall >= 0.7, f"ADC recall {recall}"

    # The query's own (quantized) vector must be the nearest code.
    assert got[0] == rows[0]["vec_id"]


def test_ivfpq_search_prune_scan_rescore(spark, sf_dir):
    """IVF x PQ composition: bucket pruning (driver centroid probe) ->
    ADC scan -> bounded exact rescore. The rescored top-k must carry
    EXACT distances (equal to brute-force kNN's for the same ids) and
    recall vs full exact kNN >= 0.6 at nprobe=4/64 buckets — pruning
    plus quantization loses some neighbors by design; the knobs
    (nprobe, rescore_factor) buy recall back."""
    import numpy as np

    from vrod_spark.operators.ivf import _spherical_kmeans, ivf_assign_expr
    from vrod_spark.operators.knn import knn_exact
    from vrod_spark.operators.pq import ivfpq_search, pq_encode, pq_train
    from vrod_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sample = np.asarray(
        [r["embedding"] for r in emb.limit(2000).collect()], dtype=np.float64
    )
    centroids = _spherical_kmeans(sample, 64)
    cb = pq_train(emb, m=8, nbits=8, sample_size=4096)
    codes = pq_encode(emb, cb).join(
        emb.select(
            "vec_id", ivf_assign_expr(spark, centroids, "embedding").alias("bucket")
        ),
        "vec_id",
    )

    q = [float(v) for v in emb.first()["embedding"]]
    got = ivfpq_search(
        codes, centroids, cb, q, 10, nprobe=4, rescore=emb, rescore_factor=4
    ).collect()
    assert len(got) == 10
    exact = knn_exact(emb, q, 10).collect()
    exact_ids = [r["vec_id"] for r in exact]
    exact_dist = {r["vec_id"]: r["dist"] for r in exact}
    got_ids = [r["vec_id"] for r in got]
    recall = len(set(got_ids) & set(exact_ids)) / 10
    assert recall >= 0.6, f"ivfpq recall {recall}"
    # Rescored distances are EXACT for every id both rankings share.
    for r in got:
        if r["vec_id"] in exact_dist:
            assert abs(r["dist"] - exact_dist[r["vec_id"]]) < 1e-6
    # The query's own vector survives prune+quantize+rescore at rank 1.
    assert got_ids[0] == exact_ids[0]


def test_pq_boundary_conditions(spark):
    """PQ edges (VERDICT r7 #6): tiny corpus with k=2^nbits far above the
    distinct-point count (empty-cluster reseed must NOT collapse the
    codebook — ADVICE r7: distinct farthest points per empty slot),
    top_k > corpus size, nbits < 8 code range, dim % m != 0 rejection,
    and empty-input rejection."""
    from vrod_spark.operators.pq import pq_encode, pq_search, pq_train

    rng = np.random.default_rng(3)
    n, dim = 40, 8
    vecs = rng.normal(size=(n, dim)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )

    # k=256 centroids over 40 distinct points: with per-slot distinct
    # reseeding every distinct training point ends up exactly on a
    # centroid, so each training vector's ADC distance to itself is ~0
    # and self-retrieval is exact.
    cb = pq_train(df, m=4, nbits=8, sample_size=64, iters=12, seed=5)
    assert cb.shape == (4, 256, 2)
    codes = pq_encode(df, cb)
    for probe in (0, 17, 39):
        got = pq_search(codes, cb, [float(x) for x in vecs[probe]], 1).first()
        assert got["vec_id"] == probe and got["adc_dist"] < 1e-9
    # no codebook collapse: each subspace keeps >= n distinct centroids
    for j in range(4):
        assert len({tuple(c) for c in cb[j]}) >= n

    # top_k > corpus: all rows come back, ranked, no error
    all_rows = pq_search(codes, cb, [0.0] * dim, 10_000).collect()
    assert len(all_rows) == n

    # nbits < 8: codes stay one byte per subspace, every index < 2^nbits
    cb4 = pq_train(df, m=4, nbits=4, sample_size=64, iters=6, seed=5)
    assert cb4.shape == (4, 16, 2)
    for r in pq_encode(df, cb4).collect():
        assert all(b < 16 for b in bytes(r["code"]))

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=3, nbits=4, sample_size=64)
    with pytest.raises(ValueError, match="empty input"):
        pq_train(df.filter("vec_id < 0"), m=4, nbits=4)
    with pytest.raises(ValueError, match="nbits"):
        pq_train(df, m=4, nbits=9)


def test_ivfpq_occupancy_aware_probing(spark):
    """Skewed IVF layout (ADVICE r7): the query's nearest centroid bucket
    holds fewer rows than top_k. A fixed nprobe=1 silently returns short;
    passing the layout histogram makes probing expand until the candidate
    budget is covered."""
    from vrod_spark.operators.pq import ivfpq_search, pq_encode, pq_train

    rng = np.random.default_rng(11)
    # bucket 0: 2 vectors near +e0; bucket 1: 50 vectors near -e0
    dim = 8
    near = np.array([[1.0] + [0.0] * 7, [0.99] + [0.01] * 7])
    far = rng.normal(loc=-1.0, scale=0.05, size=(50, dim))
    far[:, 0] = -np.abs(far[:, 0]) - 1.0
    vecs = np.vstack([near, far])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id bigint, embedding array<float>",
    )
    centroids = np.zeros((2, dim))
    centroids[0, 0] = 1.0
    centroids[1, 0] = -1.0
    cb = pq_train(df, m=4, nbits=4, sample_size=64, iters=6, seed=2)
    codes = pq_encode(df, cb).withColumn(
        "bucket", (F.col("vec_id") >= 2).cast("int")
    )
    query = [1.0] + [0.0] * 7

    short = ivfpq_search(codes, centroids, cb, query, 10, nprobe=1).collect()
    assert len(short) == 2  # the silent-short failure mode, now opt-out

    hist = {"0": 2, "1": 50}
    full = ivfpq_search(
        codes, centroids, cb, query, 10, nprobe=1, histogram=hist
    ).collect()
    assert len(full) == 10
    # nearest-bucket rows still rank first
    assert {r["vec_id"] for r in full[:2]} == {0, 1}

    # an EMPTY nearest bucket is skipped entirely under the histogram
    hist_empty = {"0": 0, "1": 50}
    no0 = ivfpq_search(
        codes.filter("bucket = 1"), centroids, cb, query, 5, nprobe=1,
        histogram=hist_empty,
    ).collect()
    assert len(no0) == 5 and all(r["vec_id"] >= 2 for r in no0)


def test_random_projection_deterministic_and_jl_bound(spark, sf_dir):
    """JL random projection (functions/vector.random_project): (a) the
    matrix is bit-stable for (dims, seed); (b) projected pairwise
    SQUARED distances of real embeddings are preserved within a loose JL
    distortion band for most pairs (eps=0.5 at out_dim=32); (c) the
    column is partition-layout independent."""
    import numpy as np

    from vrod_spark.functions.vector import (
        random_project,
        random_projection_matrix,
    )
    from vrod_spark.sources.tables import load_table

    m1 = random_projection_matrix(64, 32, seed=7)
    m2 = random_projection_matrix(64, 32, seed=7)
    assert (m1 == m2).all()
    assert random_projection_matrix(64, 32, seed=8)[0, 0] != m1[0, 0]

    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    rows = random_project(emb, out_dim=32, seed=7).select(
        "vec_id", "embedding", "proj"
    ).collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Y = np.array([r["proj"] for r in rows], dtype=np.float64)
    assert Y.shape == (len(rows), 32)
    # exact vs projected squared distances over all pairs
    dx = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    dy = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(len(rows), 1)
    ratio = dy[iu] / np.maximum(dx[iu], 1e-12)
    # JL: most pairs within (1±eps); allow a small tail at this out_dim
    within = ((ratio > 0.5) & (ratio < 1.5)).mean()
    assert within > 0.9, f"only {within:.2%} of pairs within the band"

    again = {
        r["vec_id"]: r["proj"]
        for r in random_project(
            emb.repartition(7), out_dim=32, seed=7
        ).collect()
    }
    for r in rows:
        assert np.allclose(again[r["vec_id"]], r["proj"], atol=0, rtol=0)


def test_random_project_null_rows_yield_null(spark):
    """r11 review: a NULL embedding row must project to NULL, not crash
    the Arrow batch (and with it the whole job)."""
    from vrod_spark.functions.vector import random_project

    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, None), (2, [0.0, 1.0, 0.0, 0.0])],
        "id long, embedding array<double>",
    )
    out = {r["id"]: r["proj"] for r in
           random_project(df, out_dim=2, in_dim=4, out_col="proj").collect()}
    assert out[1] is None
    assert out[0] is not None and len(out[0]) == 2

"""Product quantization (PQ): vector compression + asymmetric-distance search.

The memory side of ANN that sign-LSH/IVF (bucket pruning) don't cover:
at 100 TB of embeddings the vectors themselves are the cost — a 64-dim
float32 vector is 256 B, its PQ code is ``m`` bytes (32× smaller at
m=8). PQ splits each vector into ``m`` subspaces, k-means-quantizes each
subspace to 2^nbits centroids (the codebook), and stores only the
per-subspace centroid indices. Search uses the ADC (asymmetric distance
computation) scheme of Jégou et al., "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011): the query stays un-quantized, a per-query
(m × k) distance table is computed once driver-side, and each stored
code's approximate distance is m table lookups — no decompression.

Scale design:
- **training is bounded**: codebooks are fit on a deterministically
  hash-sampled subset (``sample_size`` rows max — same bounded-collect
  class as the IVF trainer), never the full corpus; numpy Lloyd
  iterations on 65k × dim floats are milliseconds.
- **encoding/search shuffle nothing**: both are ``mapInPandas`` over the
  stored codes; the (m, k, dsub) codebook array (~64 KB at defaults)
  ships inside the closure (on a real cluster, a broadcast variable —
  the seam is the closure capture, one line). Top-k goes through
  ``orderBy().limit(k)`` → TakeOrderedAndProject, the same pinned plan
  shape as exact kNN.
- **composes with IVF**: IVF prunes WHICH vectors to score (bucket
  partition pruning, operators/ivf.py); PQ shrinks WHAT is scored.
  IVF-PQ is the standard pairing — run ``pq_search`` over an IVF
  bucket's rows.

vRod parity: SEARCHSIMILAR (src/command/builder.rs:68-72) declares kNN
over stored embeddings; PQ is the [N] scale path for the memory axis,
beside the recall axis the LSH/IVF indexes cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pq_train(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    sample_size: int = 65536,
    iters: int = 12,
    seed: int = 7,
):
    """Fit PQ codebooks: returns a numpy array of shape (m, k, dim/m)
    with k = 2^nbits. Deterministic: the training subset is the
    ``sample_size`` rows with the smallest xxhash64(vector) — a pure
    function of the data, independent of partitioning — and k-means
    init/empty-cluster reseeding derive from ``seed``.
    """
    import numpy as np

    if nbits < 1 or nbits > 8:
        raise ValueError("nbits must be in 1..8 (codes are stored as bytes)")
    k = 1 << nbits
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<float>")))
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty input")
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    codebooks = np.empty((m, k, dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        # k-means++-lite init: distinct random picks; fewer points than
        # centroids duplicates picks, which the empty-cluster reseed fixes.
        idx = rng.choice(len(sub), size=min(k, len(sub)), replace=False)
        cent = sub[idx]
        if len(cent) < k:
            cent = np.vstack([cent, cent[rng.integers(0, len(cent), k - len(cent))]])
        x2 = (sub * sub).sum(axis=1)[:, None]
        for _ in range(iters):
            # ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2 via one matmul — the
            # broadcasted (n, k, dsub) difference tensor would be ~1 GB
            # of transients per iteration at default sample_size.
            d2 = x2 - 2.0 * (sub @ cent.T) + (cent * cent).sum(axis=1)[None, :]
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
                else:
                    # Deterministic reseed: the point farthest from its
                    # centroid claims the empty slot.
                    cent[c] = sub[d2.min(axis=1).argmax()]
        codebooks[j] = cent
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, code BINARY)`` — each vector compressed to m bytes (one
    codebook index per subspace). Arrow-batched numpy argmin; the blob
    of floats never leaves its partition."""
    import numpy as np

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = cb.shape

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                # Yield nothing: an empty pandas frame types its []
                # columns float64, which Arrow can't cast to binary.
                continue
            x = np.asarray(list(pdf["v"]), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                # Same matmul expansion as pq_train: no 3D temporaries.
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ cb[j].T)
                    + (cb[j] * cb[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"], "code": [c.tobytes() for c in codes]}
            )

    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .mapInPandas(encode, "id long, code binary")
        .select(F.col("id").alias(id_col), "code")
    )


def pq_search(
    codes: DataFrame,
    codebooks,
    query,
    top_k: int,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: ``(id, adc_dist)`` for the ``top_k`` stored codes
    nearest the (un-quantized) query. The (m × k) distance table is
    computed ONCE on the driver; scanning a code costs m byte lookups +
    adds — the decompression-free search that makes PQ usable at scale.
    Plan shape: mapInPandas → orderBy().limit() = TakeOrderedAndProject.
    ADC returns APPROXIMATE distances; re-score survivors against raw
    vectors when exact ranking matters (the IVF/kNN exact paths)."""
    import numpy as np

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = cb.shape
    q = np.asarray(query, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != codebook dim {m * dsub}")
    # table[j, c] = ||q_j - centroid_jc||^2 ; ADC(x) = sum_j table[j, code_j(x)]
    table = np.stack(
        [((cb[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1) for j in range(m)]
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue  # see encode(): empty [] columns mistype under Arrow
            c = np.frombuffer(b"".join(pdf["code"]), dtype=np.uint8).reshape(-1, m)
            dist = table[np.arange(m)[None, :], c].sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "adc_dist": dist})

    return (
        codes.select(F.col(id_col).alias("id"), "code")
        .mapInPandas(scan, "id long, adc_dist double")
        .select(F.col("id").alias(id_col), "adc_dist")
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(top_k)
    )


def ivfpq_search(
    codes: DataFrame,
    centroids,
    codebooks,
    query,
    top_k: int,
    *,
    bucket_col: str = "bucket",
    nprobe: int = 4,
    id_col: str = "vec_id",
    rescore: DataFrame | None = None,
    rescore_factor: int = 4,
) -> DataFrame:
    """IVF × PQ — the standard large-scale ANN pairing, composed from the
    two operators this module and operators/ivf.py already provide:

    1. **prune**: probe the ``nprobe`` IVF centroids nearest the query
       (driver-side argsort over the centroid matrix) and keep only codes
       in those buckets — when ``codes`` is read from a
       ``bucket=``-partitioned layout (the REINDEX ivf layout), this
       filter is partition-PRUNED at the scan, so the 100 TB corpus is
       never touched outside the probed buckets;
    2. **scan**: ADC over the surviving m-byte codes (``pq_search``) —
       decompression-free table lookups;
    3. **rescore** (optional): join the top ``top_k * rescore_factor``
       ADC survivors — a BOUNDED broadcast — back to the raw vectors in
       ``rescore`` and return the exact-distance top ``top_k``
       (TakeOrderedAndProject, same plan as exact kNN). Without
       ``rescore`` the ADC ranking is returned as-is.
    """
    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    nq = np.linalg.norm(q)
    qu = q / nq if nq else q
    cents = np.asarray(centroids, dtype=np.float64)
    probes = [int(b) for b in np.argsort(-(cents @ qu))[:nprobe]]
    cand = codes.filter(F.col(bucket_col).isin(probes))
    n_adc = top_k * rescore_factor if rescore is not None else top_k
    adc = pq_search(cand, codebooks, query, n_adc, id_col=id_col)
    if rescore is None:
        return adc
    from vrod_spark.operators.knn import knn_exact

    survivors = adc.select(id_col)
    exact_pool = rescore.join(F.broadcast(survivors), id_col)
    return knn_exact(exact_pool, [float(v) for v in q], top_k, id_col=id_col)

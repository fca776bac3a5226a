"""Property-based tests (SURVEY §5.2 item 4): ingest/read roundtrip
identity, COW snapshot isolation under concurrent mutation, dedup
idempotence, and vector-kernel metric laws — hypothesis-generated inputs."""

from __future__ import annotations

import math
import threading

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vrod_spark.engine import Engine
from vrod_spark.errors import CommandArgError
from vrod_spark.functions.vector import cosine_similarity, l2_distance
from vrod_spark.operators.dedup import exact_dedup

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vec4 = st.lists(finite, min_size=4, max_size=4)

SETTINGS = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


_counter = {"n": 0}


@pytest.fixture(scope="module")
def prop_engine(spark, tmp_path_factory):
    return Engine.create(spark, str(tmp_path_factory.mktemp("prop")), "db")


@given(vecs=st.lists(vec4, min_size=1, max_size=6), payloads=st.lists(st.text(max_size=20)))
@SETTINGS
def test_ingest_read_roundtrip(spark, prop_engine, vecs, payloads):
    eng = prop_engine
    _counter["n"] += 1
    cname = f"c{_counter['n']}"
    eng.execute("CREATE", collection=cname)
    rows = [
        {
            "id": i,
            "embedding": v,
            "payload": payloads[i] if i < len(payloads) else None,
            "meta": None,
        }
        for i, v in enumerate(vecs)
    ]
    eng.execute("INSERT", collection=cname, arg=rows)
    back = {
        r["id"]: (r["embedding"], r["payload"])
        for r in eng.db.collection(cname).read().collect()
    }
    assert set(back) == set(range(len(vecs)))
    for i, v in enumerate(vecs):
        got_vec, got_payload = back[i]
        assert got_vec == pytest.approx(np.float32(v).tolist())
        assert got_payload == rows[i]["payload"]


@given(pairs=st.lists(st.tuples(vec4, vec4), min_size=1, max_size=10))
@SETTINGS
def test_vector_metric_laws(spark, pairs):
    df = spark.createDataFrame(pairs, "a array<float>, b array<float>")
    rows = df.select(
        l2_distance("a", "b").alias("dab"),
        l2_distance("b", "a").alias("dba"),
        l2_distance("a", "a").alias("daa"),
        cosine_similarity("a", "b").alias("cab"),
    ).collect()
    for (a, b), row in zip(pairs, rows):
        expect = float(np.linalg.norm(np.float64(np.float32(a)) - np.float64(np.float32(b))))
        assert row["dab"] == pytest.approx(expect, abs=1e-6)
        assert row["dab"] == pytest.approx(row["dba"])  # symmetry
        assert row["daa"] == 0.0
        # norms in float64 over the float32-rounded inputs — matching the
        # engine's cast-then-accumulate-in-double; float32 accumulation
        # would underflow on subnormal inputs and miscall zero-norm.
        na = np.linalg.norm(np.float64(np.float32(a)))
        nb = np.linalg.norm(np.float64(np.float32(b)))
        if na == 0 or nb == 0:
            assert row["cab"] is None  # undefined, never an ANSI error
        elif not math.isnan(row["cab"]):
            assert -1.0 - 1e-9 <= row["cab"] <= 1.0 + 1e-9


@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8))
@SETTINGS
def test_exact_dedup_idempotent(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    once = exact_dedup(df)
    twice = exact_dedup(once)
    got_once = sorted(r["doc_id"] for r in once.collect())
    got_twice = sorted(r["doc_id"] for r in twice.collect())
    assert got_once == got_twice
    # normalized texts are unique after dedup
    kept = [r["text"].strip().lower() for r in once.collect()]
    assert len(kept) == len(set(kept))


def test_cow_snapshot_isolation_under_concurrent_updates(spark, tmp_path):
    """Readers racing a writer must only ever observe fully-committed
    snapshots: every read returns a payload set equal to SOME committed
    state, never a mix."""
    eng = Engine.create(spark, str(tmp_path), "racedb")
    eng.execute("CREATE", collection="c")
    n = 50
    eng.execute(
        "INSERT",
        collection="c",
        arg=[{"id": i, "embedding": [1.0], "payload": "v0", "meta": None} for i in range(n)],
    )
    col = eng.db.collection("c")
    valid_states = {("v0",), ("v1",), ("v2",), ("v3",)}
    errors: list[str] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            rows = col.read().select("payload").collect()
            payloads = tuple(sorted({r["payload"] for r in rows}))
            if len(rows) != n or payloads not in valid_states:
                errors.append(f"torn read: {len(rows)} rows, states={payloads}")
                return

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for gen in (1, 2, 3):
            eng.execute(
                "UPDATE", collection="c", arg={"where": "true", "set": {"payload": f"'v{gen}'"}}
            )
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    assert {r["payload"] for r in col.read().collect()} == {"v3"}


def test_percentile_approx_bounds_exact(spark, sf_dir):
    """The GK sketch's median must land within the exact 20th–80th
    percentile band per group (loose but meaningful: a broken sketch or
    mis-specified accuracy falls outside immediately)."""
    from pyspark.sql import functions as F

    from vrod_spark.queries import QUERIES

    rows = [
        r
        for r in QUERIES["q26b_prob_near_dup"](spark, sf_dir).collect()
        if r["method"] == "gk_percentile"
    ]
    assert rows
    cust = None
    for r in rows:
        if cust is None:
            from vrod_spark.sources.tables import load_table

            cust = load_table(spark, sf_dir, "customer")
        band = (
            cust.filter(F.col("c_mktsegment") == r["key"])
            .agg(F.expr("percentile(c_acctbal, array(0.2, 0.8))").alias("b"))
            .first()["b"]
        )
        assert band[0] <= r["a"] <= band[1]


@given(
    samples=st.lists(
        st.integers(min_value=-30000, max_value=30000), min_size=8, max_size=1200
    )
)
@SETTINGS
def test_adpcm_codec_roundtrip_property(samples):
    """IMA-ADPCM encode→decode over arbitrary int16 waveforms: exact
    frame count, first sample exact (block header carries it verbatim),
    and every reconstructed sample within the codec's worst-case step
    bound of a signal that the encoder could track."""
    import numpy as np

    from vrod_spark.operators.multimodal import _wav_parser, encode_wav_adpcm

    pcm = np.array(samples, dtype=np.int64)
    blob, recon = encode_wav_adpcm(pcm, rate=8000, with_reconstruction=True)
    rate, n, dec = _wav_parser()(blob)
    assert rate == 8000 and n == len(pcm)
    # Block headers carry the first sample of each block verbatim.
    assert int(dec[0]) == int(pcm[0])
    # Codec consistency: the decoder must reproduce the encoder's own
    # predicted waveform EXACTLY — any recurrence mismatch (step table,
    # clamping, nibble order, block boundary) breaks this immediately.
    assert np.array_equal(dec, recon)


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    n_frames=st.integers(min_value=1, max_value=5),
    step=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**16),
)
@SETTINGS
def test_avi_mjpeg_roundtrip_property(spark, w, h, n_frames, step, seed):
    """AVI/MJPEG container+codec roundtrip for arbitrary dims/frame
    counts/sampling steps: sampled indices exact, dims exact, per-frame
    luma within JPEG tolerance."""
    import numpy as np

    from vrod_spark.operators.multimodal import (
        extract_avi_mjpeg_frames,
        make_avi_mjpeg_bytes,
    )

    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(n_frames)
    ]
    df = spark.createDataFrame(
        [(0, "video", make_avi_mjpeg_bytes(frames))],
        "media_id bigint, kind string, content binary",
    )
    out = {r["frame_idx"]: r for r in extract_avi_mjpeg_frames(df, every_n=step).collect()}
    assert sorted(out) == list(range(0, n_frames, step))
    for idx, r in out.items():
        src = frames[idx].astype(np.float64)
        want = (0.299 * src[..., 0] + 0.587 * src[..., 1] + 0.114 * src[..., 2]).mean() / 255
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_luma"] - want) < 0.04, idx


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    k=st.integers(min_value=2, max_value=5),
    scope=st.sampled_from(["cross_doc", "any"]),
)
def test_duplicate_spans_match_bruteforce_reference(spark, seed, k, scope):
    """Property: duplicate_span_arrays == a brute-force Python reference
    (gram duplication sets + interval merge) on random small-vocabulary
    corpora — positions, span boundaries, token counts and doc_tokens all
    exact, for both scopes and several k. Small vocab forces heavy
    natural duplication, including the hot-gram and adjacent-merge paths."""
    import random

    from vrod_spark.operators.dedup import duplicate_span_arrays

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 24))))
        for i in range(rng.randint(3, 7))
    ]

    # -- reference --
    gram_docs: dict = {}
    toks_by_doc = {}
    for i, text in docs:
        toks = text.split()
        toks_by_doc[i] = toks
        for p in range(len(toks) - k + 1):
            g = tuple(toks[p : p + k])
            gram_docs.setdefault(g, []).append(i)
    expected = {}
    for i, toks in toks_by_doc.items():
        if len(toks) < k:
            continue
        marked = []
        for p in range(len(toks) - k + 1):
            occ = gram_docs[tuple(toks[p : p + k])]
            dup = (
                len(set(occ)) >= 2 if scope == "cross_doc" else len(occ) >= 2
            )
            if dup:
                marked.append(p)
        if not marked:
            continue
        spans = []
        s = e = marked[0]
        for p in marked[1:]:
            if p - e > k:
                spans.append((s, e + k - 1, e - s + k))
                s = p
            e = p
        spans.append((s, e + k - 1, e - s + k))
        expected[i] = (len(toks), spans)

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (
            r["doc_tokens"],
            [(sp["span_start"], sp["span_end"], sp["n_tokens"]) for sp in r["spans"]],
        )
        for r in duplicate_span_arrays(
            df, min_tokens=k, scope=scope
        ).collect()
    }
    assert got == expected, (seed, k, scope)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    qp=st.integers(min_value=24, max_value=46),
    smooth=st.integers(min_value=1, max_value=6),
)
def test_h264_cavlc_roundtrip_property(seed, qp, smooth):
    """Property: any frame encodes to a conformant stream (per-MB I_PCM
    fallback) and decodes with bounded error — I_PCM macroblocks exactly,
    CAVLC macroblocks within a qp-scaled quantization bound; the stream
    never exceeds the all-PCM size by more than the per-MB mode overhead."""
    import numpy as np

    from vrod_spark.operators.multimodal import _h264_decoder, make_h264_bytes

    rng = np.random.RandomState(seed)
    base = rng.randint(30, 220)
    noise = rng.randn(32, 32) * smooth
    img = np.clip(base + noise.cumsum(axis=0).cumsum(axis=1) / 8, 0, 255).astype(
        np.uint8
    )
    b = make_h264_bytes([img], width=32, height=32, mode="cavlc", qp=qp)
    w, h, p = _h264_decoder()(b)
    assert (w, h) == (32, 32)
    err = np.abs(p[0].astype(int) - img.astype(int))
    # Reconstruction error is bounded by the quantization step of the
    # coarsest path (DC step ~ 2^(qp/6) scaled); generous envelope.
    assert err.max() <= 2 ** (qp // 6 + 1), (seed, qp, err.max())
    pcm_len = len(make_h264_bytes([img], width=32, height=32))
    assert len(b) <= pcm_len + 8

    # Multi-slice picture (one MB per slice — the hardest layout): both
    # sides must treat cross-slice neighbors as unavailable (clause
    # 6.4.9, nC contexts AND DC prediction), so the stream stays within
    # the same reconstruction bound. A decoder that let contexts leak
    # across slices would pick the wrong VLC table or DC predictor here.
    bs = make_h264_bytes(
        [img], width=32, height=32, mode="cavlc", qp=qp, mbs_per_slice=1
    )
    # 4 MBs -> 4 IDR-slice NALs (type 5) after SPS/PPS.
    assert sum(1 for i in range(len(bs) - 4)
               if bs[i:i + 4] == b"\x00\x00\x00\x01" and bs[i + 4] & 0x1F == 5) == 4
    ws, hs, ps = _h264_decoder()(bs)
    assert (ws, hs) == (32, 32)
    errs = np.abs(ps[0].astype(int) - img.astype(int))
    assert errs.max() <= 2 ** (qp // 6 + 1), (seed, qp, errs.max())

    # Intra_4x4 (mode="i4x4", clause 8.3.1 V/H/DC subset): same bound,
    # single- and one-MB-per-slice layouts (mode prediction, nC contexts
    # and sample availability must all respect slice boundaries).
    for mps in (None, 1):
        b4 = make_h264_bytes(
            [img], width=32, height=32, mode="i4x4", qp=qp, mbs_per_slice=mps
        )
        w4, h4, p4 = _h264_decoder()(b4)
        assert (w4, h4) == (32, 32)
        err4 = np.abs(p4[0].astype(int) - img.astype(int))
        assert err4.max() <= 2 ** (qp // 6 + 1), (seed, qp, mps, err4.max())


# --- model-based random mutation sequences (r11) ---------------------------
# A random sequence of INSERT(on_conflict=replace/ignore) / UPDATE /
# DELETE / DEDUP / RESTORE verbs mirrored against a plain Python dict
# model (RESTORE: per-version model snapshots); after every sequence the
# collection's (id -> payload) state must equal the model exactly.
# Catches cross-verb interactions (a replace after a delete, dedup after
# an update rewrote payloads, mutations stacked on a rollback) that
# per-verb tests never sequence.

_op = st.one_of(
    st.tuples(st.just("insert_replace"), st.integers(0, 9), st.text("abc", max_size=4)),
    st.tuples(st.just("insert_ignore"), st.integers(0, 9), st.text("abc", max_size=4)),
    st.tuples(st.just("update"), st.integers(0, 9), st.text("xyz", min_size=1, max_size=4)),
    st.tuples(st.just("delete"), st.integers(0, 9), st.just("")),
    st.tuples(st.just("dedup"), st.just(0), st.just("")),
    st.tuples(st.just("restore"), st.integers(0, 9), st.just("")),
    st.tuples(st.just("truncate"), st.just(0), st.just("")),
)


@given(ops=st.lists(_op, min_size=1, max_size=5), seed=st.integers(0, 1000))
@SETTINGS
def test_engine_mutation_sequence_matches_model(spark, tmp_path_factory, ops, seed):
    _counter["n"] += 1
    eng = Engine.create(
        spark, str(tmp_path_factory.mktemp(f"model{_counter['n']}")), "db"
    )
    eng.execute("CREATE", collection="m")
    # seed rows 0..3 with distinct payloads (dedup keeps them all)
    model: dict[int, str] = {i: f"seed{i}{seed % 7}" for i in range(4)}
    eng.execute(
        "INSERT",
        collection="m",
        arg=[{"id": i, "payload": p} for i, p in model.items()],
    )
    col = eng.db.collection("m")
    # committed version -> model state at that version (for RESTORE)
    snapshots: dict[int, dict[int, str]] = {col.version: dict(model)}
    for verb, rid, text in ops:
        if verb == "insert_replace":
            eng.execute(
                "INSERT",
                collection="m",
                arg={"rows": [{"id": rid, "payload": text}],
                     "on_conflict": "replace"},
            )
            model[rid] = text
        elif verb == "insert_ignore":
            eng.execute(
                "INSERT",
                collection="m",
                arg={"rows": [{"id": rid, "payload": text}],
                     "on_conflict": "ignore"},
            )
            model.setdefault(rid, text)
        elif verb == "update":
            eng.execute(
                "UPDATE",
                collection="m",
                arg={"where": f"id = {rid}", "set": {"payload": f"'{text}'"}},
            )
            if rid in model:
                model[rid] = text
        elif verb == "delete":
            eng.execute("DELETE", collection="m", arg=f"id = {rid}")
            model.pop(rid, None)
        elif verb == "dedup":
            eng.execute("DEDUP", collection="m")
            # exact dedup on normalized payload, keep smallest id
            keep: dict[str, int] = {}
            for i in sorted(model):
                key = model[i].strip().lower()
                keep.setdefault(key, i)
            model = {i: model[i] for i in keep.values()}
        elif verb == "restore":
            # time-travel write: roll back to any committed version; the
            # model becomes the state recorded at that version. Restoring
            # the current version is rejected and changes nothing.
            target = sorted(snapshots)[rid % len(snapshots)]
            if target == col.version:
                with pytest.raises(CommandArgError):
                    eng.execute("RESTORE", collection="m", arg=target)
            else:
                eng.execute("RESTORE", collection="m", arg=target)
                model = dict(snapshots[target])
        elif verb == "truncate":
            # TRUNCATEWAL reclaims every superseded snapshot: only the
            # CURRENT version remains a legal restore target afterwards
            # (r12 — sequences truncation between mutations/rollbacks).
            eng.execute("TRUNCATEWAL", collection="m")
            snapshots = {col.version: dict(model)}
        snapshots[col.version] = dict(model)
    got = {
        r["id"]: r["payload"]
        for r in eng.db.collection("m").read().select("id", "payload").collect()
    }
    assert got == model
    # HISTORY stays coherent through any sequence: exactly one CURRENT
    # row, it is the max version, and it is retained on disk.
    hist = eng.execute("HISTORY", collection="m").df.collect()
    cur_rows = [r for r in hist if r["current"]]
    assert len(cur_rows) == 1
    assert cur_rows[0]["version"] == max(r["version"] for r in hist)
    assert cur_rows[0]["version"] == col.version and cur_rows[0]["retained"]


# --- generative SEARCH-predicate fuzz vs a Python model (r12) ---------------
# The partition-pruning conjunct extraction (catalog.partition_literal)
# decides when SEARCH narrows a meta-key-partitioned scan to one pk= dir.
# A false-positive prune silently DROPS matching rows — the worst failure
# class the engine has. Fuzz a small predicate grammar (equalities on the
# partition key and other columns under AND/OR/NOT nesting) against a
# plain Python evaluation of the same predicate over the model rows.

_pred_leaf = st.one_of(
    st.builds(
        lambda v: (f"meta['region'] = '{v}'", lambda r: r["region"] == v),
        st.sampled_from(["EU", "US", "APAC", "ZZ"]),
    ),
    st.builds(
        lambda n: (f"id % 7 = {n}", lambda r: r["id"] % 7 == n),
        st.integers(0, 6),
    ),
    st.builds(
        lambda n: (f"id >= {n}", lambda r: r["id"] >= n),
        st.integers(0, 25),
    ),
    st.builds(
        lambda v: (f"payload = 'p{v}'", lambda r: r["payload"] == f"p{v}"),
        st.integers(0, 30),
    ),
)


def _pred_tree(depth: int):
    if depth <= 0:
        return _pred_leaf
    sub = _pred_tree(depth - 1)
    return st.one_of(
        _pred_leaf,
        st.builds(
            lambda a, b: (f"({a[0]}) AND ({b[0]})",
                          lambda r, fa=a[1], fb=b[1]: fa(r) and fb(r)),
            sub, sub,
        ),
        st.builds(
            lambda a, b: (f"({a[0]}) OR ({b[0]})",
                          lambda r, fa=a[1], fb=b[1]: fa(r) or fb(r)),
            sub, sub,
        ),
        st.builds(
            lambda a: (f"NOT ({a[0]})", lambda r, fa=a[1]: not fa(r)),
            sub,
        ),
    )


@pytest.fixture(scope="module")
def search_fuzz_engine(spark, tmp_path_factory):
    eng = Engine.create(
        spark, str(tmp_path_factory.mktemp("searchfuzz")), "db"
    )
    eng.execute("CREATE", collection="sf", arg={"partition_by": "region"})
    regions = ["EU", "US", "APAC"]
    rows = [
        {
            "id": i,
            "embedding": [float(i)],
            "payload": f"p{i}",
            "meta": {"region": regions[i % 3]},
        }
        for i in range(30)
    ]
    eng.execute("INSERT", collection="sf", arg=rows)
    model = [
        {"id": i, "payload": f"p{i}", "region": regions[i % 3]}
        for i in range(30)
    ]
    return eng, model


@given(pred=_pred_tree(2))
@SETTINGS
def test_search_predicate_fuzz_matches_model(search_fuzz_engine, pred):
    sql, pyfn = pred
    eng, model = search_fuzz_engine
    got = sorted(
        r["id"]
        for r in eng.execute("SEARCH", collection="sf", arg=sql).df.collect()
    )
    want = sorted(r["id"] for r in model if pyfn(r))
    assert got == want, (sql, got, want)

"""Numeric-fragility audit of the q28b/q49 gate pins.

Every remaining quantization in the two formerly driver-red gates has a
boundary; cross-engine float drift is ~1e-13 (summation order inside one
cosine/ratio), so a pin is safe when its minimum distance to the nearest
boundary is many orders of magnitude above that. This tool MEASURES those
minima on the actual test data so "the pins are safe" is a number in the
repo, not an assertion. Run: ``python tools/pin_margins.py [sf_dir]``.

Audited boundaries:
- q28b semdedup ``sum_ccos_u6``: per-row distance of ccos*1e6 to the
  nearest x.5 rounding boundary (a flip changes the integer sum by 1).
- q28b assignment: per-row gap between best and second-best centroid
  cosine (a flip moves a row between clusters).
- q28b semdedup pruning: within-cluster pairwise cosines' distance to
  the 0.99 threshold (exact planted duplicates sit AT 1.0; natural
  pairs must sit far below).
- q28b pairs: surviving pair cosines vs the 0.9999 join threshold and
  the 4dp output rounding grid; non-surviving natural pairs' distance
  below the threshold.
- q28b edecon: per-row max-eval-cosine distance to the 0.95 / 0.5
  count thresholds.
- q49 top-20 selection cuts: the ratio gap between ranks 20 and 21 for
  the repetition / dup_spans / decon_spans legs (the LIMIT is the only
  float-ordering-sensitive construct left after the r10 integer pins).
- q53 hybrid leg: adjacent cosine gaps among the vector candidate list
  (each engine computes the cosines independently, so the rank order is
  only as safe as those gaps).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb])
    mat = np.array([r[1] for r in emb], dtype=np.float64)
    u = unit(mat)
    report: list[tuple[str, float]] = []
    info: list[tuple[str, float]] = []

    # --- q28b semdedup universe: corpus + 40 planted copies of smallest ids
    uni = np.vstack([u, u[:40]])
    cents = unit(mat[:8])
    sims = uni @ cents.T
    order = np.argsort(-sims, axis=1)
    best = sims[np.arange(len(uni)), order[:, 0]]
    second = sims[np.arange(len(uni)), order[:, 1]]
    report.append(("q28b_assignment_margin_min", float(np.min(best - second))))
    snap = best * 1e6
    report.append(
        ("q28b_ccos_u6_snap_margin_min", float(np.min(np.abs((snap % 1.0) - 0.5))))
    )
    # within-cluster pairwise cosines vs the 0.99 prune threshold
    cl = order[:, 0]
    prune_margin = np.inf
    for c in range(len(cents)):
        members = uni[cl == c]
        if len(members) < 2:
            continue
        s = members @ members.T
        iu = np.triu_indices(len(members), k=1)
        vals = s[iu]
        # exact duplicates sit at ~1.0 (>= 0.99 by a wide margin); the
        # margin of interest is the closest approach from EITHER side.
        prune_margin = min(prune_margin, float(np.min(np.abs(vals - 0.99))))
    report.append(("q28b_semdedup_prune_margin_min", prune_margin))

    # --- q28b pairs leg: corpus + 50 planted, threshold 0.9999
    uni50 = np.vstack([u, u[:50]])
    s = uni50 @ uni50.T
    iu = np.triu_indices(len(uni50), k=1)
    vals = s[iu]
    surviving = vals[vals >= 0.9999]
    rest = vals[vals < 0.9999]
    report.append(("q28b_pairs_threshold_margin_min",
                   float(np.min(np.abs(vals - 0.9999)))))
    if len(surviving):
        g = surviving * 1e4
        report.append(("q28b_pairs_round4_margin_min",
                       float(np.min(np.abs((g % 1.0) - 0.5)))))
    # Informational only (a raw cosine, not a boundary distance) — kept
    # out of the worst-margin verdict below.
    info.append(("q28b_pairs_natural_max_cosine",
                 float(np.max(rest)) if len(rest) else -1.0))

    # --- q28b edecon: max cosine vs 5 smallest-id eval rows
    ev = unit(mat[:5])
    mx = (u @ ev.T).max(axis=1)
    for thr in (0.95, 0.5):
        report.append((f"q28b_edecon_margin_{thr}", float(np.min(np.abs(mx - thr)))))

    # --- q53 hybrid leg: the vector list's rank ORDER is a float
    # ordering each engine computes independently (unlike the integer-
    # division ratios) — the pin is safe iff adjacent cosine gaps among
    # the candidates dwarf cross-engine drift. Audit the top-25 to vec 0
    # (the top-20 cut plus margin on both sides).
    q = u[ids == 0][0] if (ids == 0).any() else u[0]
    cos = u @ q
    # A zero gap is safe only for bit-identical vectors (both engines
    # then tie exactly and the vec_id tie-break agrees); coincidental
    # ties between DISTINCT vectors are reported as 0, not filtered.
    corder = np.lexsort((ids, -cos))[:25]
    ctop = cos[corder]
    cgaps = []
    for a in range(len(corder) - 1):
        gap = ctop[a] - ctop[a + 1]
        if gap == 0.0 and np.array_equal(u[corder[a]], u[corder[a + 1]]):
            continue
        cgaps.append(gap)
    report.append(
        ("q53_hybrid_vecrank_gap_min",
         float(np.min(cgaps)) if cgaps else float("inf"))
    )

    # --- q05 legs (incl. the r11 pq_exact leg): the top-10 cut is a
    # float ordering on l2 / cosine distance each engine computes
    # independently. Audit adjacent distance gaps around the k=10
    # boundary (top-12) and the distance of each kept value to the 4dp
    # output rounding grid. A zero gap is SAFE only when the tied rows'
    # vectors are bit-identical (then every engine computes the same
    # distance for both and the id tie-break agrees); a coincidental tie
    # between DISTINCT vectors can split by 1 ulp in opposite directions
    # across engines, so those are reported as 0, not filtered.
    qv0 = mat[ids == 0][0] if (ids == 0).any() else mat[0]
    l2d = np.linalg.norm(mat - qv0, axis=1)
    for tag, vals in (("l2", l2d), ("cos", 1.0 - cos)):
        order = np.lexsort((ids, vals))[:12]
        srt = vals[order]
        safe_gaps = []
        for a, b in zip(range(len(order) - 1), range(1, len(order))):
            gap = srt[b] - srt[a]
            if gap == 0.0 and np.array_equal(mat[order[a]], mat[order[b]]):
                continue  # identical vectors: both engines tie exactly
            safe_gaps.append(gap)
        report.append(
            (f"q05_{tag}_top10_gap_min",
             float(np.min(safe_gaps)) if safe_gaps else float("inf"))
        )
        d4 = srt[:10] * 1e4
        # distance of each kept value to the nearest x.5 rounding
        # boundary (where a 1-ulp drift flips the 4dp output)
        report.append(
            (f"q05_{tag}_round4_margin",
             float(np.min(0.5 - np.abs(d4 - np.round(d4)))))
        )

    # --- q05 pq_exact ADC budget margin: the leg rescores only the ADC
    # top-256, so the gate is load-bearing on the ADC ordering — safe
    # iff every true l2 top-10 member sits WELL inside the budget.
    # Reproduces the leg's training config exactly (seeded, bounded).
    from vrod_spark.operators.pq import pq_fit

    sample_order = np.argsort(
        [hash(tuple(v)) for v in mat.astype(np.float32).tolist()], kind="stable"
    )[:1024]
    # NOTE: the engine samples by xxhash64 of the float32 vector; the
    # sample CHOICE only varies which deterministic codebook we audit,
    # not the invariant itself, so a plain-python stand-in hash is fine.
    cb = pq_fit(mat[sample_order], m=8, nbits=8, iters=4, seed=7)
    m_, k_, dsub = cb.shape
    codes = np.empty((len(mat), m_), dtype=np.int64)
    for j in range(m_):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        d2 = (
            (sub * sub).sum(1)[:, None]
            - 2.0 * (sub @ cb[j].T)
            + (cb[j] * cb[j]).sum(1)[None, :]
        )
        codes[:, j] = d2.argmin(1)
    table = np.stack(
        [((cb[j] - qv0[j * dsub : (j + 1) * dsub]) ** 2).sum(1) for j in range(m_)]
    )
    adc = table[np.arange(m_)[None, :], codes].sum(1)
    adc_rank = {ids[i]: r + 1 for r, i in enumerate(np.lexsort((ids, adc)))}
    exact10 = np.lexsort((ids, l2d))[:10]
    worst = max(adc_rank[ids[i]] for i in exact10)
    info.append(("q05_pq_adc_worst_true_rank_vs_budget_256", float(worst)))

    # --- q49 top-20 ordering cuts (rank-20 vs rank-21 ratio gap) for all
    # three float-ordered LIMIT legs: repetition, dup_spans, decon_spans.
    _span_ctes = """
        WITH dg AS (
          SELECT doc_id, len(toks)::BIGINT AS n_toks,
                 [md5(array_to_string(toks[i : i + 7], ' '))
                  FOR i IN range(1, len(toks) - 6)] AS grams
          FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
          WHERE len(toks) >= 8
        ),
        dgu AS (
          SELECT doc_id, n_toks, unnest(grams) AS g,
                 generate_subscripts(grams, 1) - 1 AS pos
          FROM dg
        ),
    """
    _gap_tail = """
        grp AS (
          SELECT doc_id, n_toks, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM brk
        ),
        spn AS (
          SELECT doc_id, n_toks, min(pos) AS p0, max(pos) AS p1
          FROM grp GROUP BY doc_id, n_toks, grp
        ),
        r AS (
          SELECT sum(p1 - p0 + 8)::DOUBLE / any_value(n_toks) AS ratio
          FROM spn GROUP BY doc_id ORDER BY ratio DESC LIMIT 21
        )
        SELECT max(CASE WHEN rn = 20 THEN ratio END)
             - max(CASE WHEN rn = 21 THEN ratio END) FROM
          (SELECT ratio, row_number() OVER (ORDER BY ratio DESC) rn FROM r)
    """
    cuts = {
        "q49_repetition_cut_gap": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word,
                     generate_subscripts(string_split(trim(text), ' '), 1) AS pos
              FROM documents WHERE len(string_split(trim(text), ' ')) >= 3),
            tri AS (
              SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
              FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
            r AS (SELECT count(DISTINCT sh)::DOUBLE / count(*) AS ratio
                  FROM tri GROUP BY doc_id ORDER BY ratio ASC LIMIT 21)
            SELECT max(CASE WHEN rn = 21 THEN ratio END)
                 - max(CASE WHEN rn = 20 THEN ratio END) FROM
              (SELECT ratio, row_number() OVER (ORDER BY ratio ASC) rn FROM r)
        """,
        "q49_dup_spans_cut_gap": _span_ctes + """
        dkeep AS (SELECT g FROM dgu GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        brk AS (
          SELECT doc_id, n_toks, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                           OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                      THEN 1 ELSE 0 END AS brk
          FROM dgu WHERE g IN (SELECT g FROM dkeep)
        ),
        """ + _gap_tail,
        "q49_decon_spans_cut_gap": _span_ctes + """
        ekeep AS (SELECT DISTINCT g FROM dgu WHERE doc_id < 20),
        brk AS (
          SELECT doc_id, n_toks, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                           OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                      THEN 1 ELSE 0 END AS brk
          FROM dgu WHERE doc_id >= 20 AND g IN (SELECT g FROM ekeep)
        ),
        """ + _gap_tail,
    }
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for name, sql in cuts.items():
        row = con.execute(sql).fetchone()
        gap = row[0] if row else None
        # The ordering doubles are single integer divisions — correctly
        # rounded, hence BIT-IDENTICAL across engines. gap == 0 is an
        # exact tie, broken by doc_id the same way on both sides: safe.
        # gap is NULL when fewer than 21 ranked rows exist — the LIMIT
        # never truncates, so no cut boundary exists: also safe. The
        # only (theoretical) fragile zone is 0 < gap < ~1e-12, which
        # cannot occur for identical doubles; reported for visibility.
        report.append(
            (name, float("inf") if gap is None or gap == 0 else float(gap))
        )

    worst = min(v for _, v in report if np.isfinite(v))
    for name, v in report:
        print(f"{name:45s} {v:.3e}")
    for name, v in info:
        print(f"{name:45s} {v:.3e}  (informational)")
    print(f"\nworst margin: {worst:.3e} (cross-engine drift ~1e-13)")
    return 0 if worst > 1e-9 else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Name-keyed memoization for expression builders.

A PySpark Column is an immutable UNRESOLVED expression tree; the analyzer
resolves it against each plan it is used in, so one built tree is freely
reusable across queries and DataFrames as long as the referenced column
NAMES resolve. Building the tree, however, costs one py4j round-trip per
operator node — the large builders (url_normalize ~50 nodes,
quality_score ~30) each burn 0.2-0.3 s of driver time PER QUERY BUILD,
which at bench scale is the dominant share of a small query's cold
latency (PERF.md, "driver-side cold-plan floor").

``memo_column`` caches the built Column when every argument is a plain
hashable primitive (column NAMES, thresholds, flags) and builds fresh
when any argument is a Column or other live object — by-name callers get
session-lifetime expression reuse, expression-valued callers keep exact
semantics. The cache is per-process and unbounded in principle but in
practice holds one entry per (builder, signature) — dozens, not
millions.
"""

from __future__ import annotations

import functools
import threading

_PRIMITIVES = (str, int, float, bool, bytes, frozenset, type(None))


def _hashable(v) -> bool:
    if isinstance(v, _PRIMITIVES):
        return True
    if isinstance(v, tuple):
        return all(_hashable(x) for x in v)
    return False


def _session_token() -> object:
    """Identity of the live gateway the cached Column trees belong to.

    A built Column pins py4j objects from the JVM gateway that was active
    at build time; after a SparkSession/JVM restart in a long-lived
    process those objects are stale and fail with opaque py4j errors
    (ADVICE r9). The token is the context's ``applicationId`` — unique
    per SparkContext by construction, unlike ``id()`` of a wrapper
    object, which CPython can recycle after the old context is GC'd."""
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if sc is None or sc._jsc is None:
            return None
        return sc.applicationId
    except Exception:
        return None


def memo_column(fn):
    """Memoize a Column builder on primitive-only call signatures.

    Entries are keyed by the live session token; when the token changes
    (session restart) the stale generation's entries are dropped, so the
    cache never grows across restarts nor serves a dead gateway's
    Columns."""
    cache: dict = {}
    # Queries build these columns concurrently (per-key build locks in
    # queries.py); two threads missing simultaneously after a session
    # restart must not race the stale-eviction loop (ADVICE r10). The
    # lock guards only the cache dict bookkeeping — the (idempotent)
    # builder call runs outside it so concurrent DIFFERENT-key builds
    # don't serialize on py4j round-trips.
    lock = threading.Lock()

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if all(_hashable(a) for a in args) and all(
            _hashable(v) for v in kwargs.values()
        ):
            token = _session_token()
            key = (token, args, tuple(sorted(kwargs.items())))
            with lock:
                hit = cache.get(key)
                if hit is not None:
                    return hit
                for k in [k for k in cache if k[0] != token]:
                    cache.pop(k, None)
            built = fn(*args, **kwargs)
            with lock:
                # First writer wins so every caller shares one tree.
                return cache.setdefault(key, built)
        return fn(*args, **kwargs)

    wrapper.__wrapped__ = fn
    return wrapper

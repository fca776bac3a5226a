"""The command engine: vRod's verb surface executed as Spark plans.

Mirrors the reference's dispatch (case-insensitive verb match,
src/command/builder.rs:29-80) — but where every reference `execute()` body
is an empty stub (src/command/types.rs:15-153), each verb here builds a
declarative DataFrame plan (Catalyst optimizes) or a catalog/COW action.

    engine = Engine.create(spark, "/tmp/warehouse", "mydb")
    engine.execute("CREATE", collection="vectors")
    engine.execute("BULKINSERT", collection="vectors", arg="/path/data.parquet")
    engine.execute("SEARCHSIMILAR", collection="vectors", arg="0.1,0.2,...;k=5")
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from vrod_spark.catalog import Collection, Database
from vrod_spark.errors import (
    CommandArgError,
    DimensionMismatchError,
    UnrecognizedCommandError,
)
from vrod_spark.operators.knn import knn_exact


def validate_records(collection: Collection, df: DataFrame) -> DataFrame:
    """Ingest-time schema coercion — PLAN-ONLY, runs no Spark job.

    The reference never validates dimension (it is only observed at runtime,
    embeddings.rs:35); we enforce it at the ingest boundary so every stored
    vector is scoreable — but the enforcement itself rides the ingest WRITE
    job as ``df.observe`` metrics (min/max vector size), checked by
    ``Collection.insert`` before the commit pointer swap. One job per
    ingest, not a validation pre-pass that re-scans the whole input
    (VERDICT r1 "What's wrong" #4).
    """
    target = StructType.fromDDL(collection.meta["schema"])
    required = {"id"}
    missing_required = required - set(df.columns)
    if missing_required:
        raise CommandArgError(f"ingest missing columns: {sorted(missing_required)}")
    # Coerce to the declared schema: absent nullable columns fill with
    # NULL, present columns cast to the declared type (so CSV/JSON string
    # ids land as BIGINT). A cast that cannot hold raises at execution —
    # the ingest boundary fails loudly, never stores mistyped data.
    cols = []
    for field in target.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


@dataclass
class CommandResult:
    """Uniform result: a DataFrame for queries, a status dict for DDL/DML."""

    verb: str
    df: DataFrame | None = None
    info: dict[str, Any] | None = None


class Engine:
    """One database's command executor (holds what the reference's
    `Rc<RefCell<Database>>` holds, types.rs:10)."""

    def __init__(self, db: Database):
        self.db = db
        self.spark: SparkSession = db.spark

    # -- lifecycle (main.rs:51-62 / database/mod.rs:13-21) -----------------
    @classmethod
    def create(cls, spark: SparkSession, parent: str, name: str) -> "Engine":
        return cls(Database.create(spark, parent, name))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Engine":
        return cls(Database.load(spark, path))

    # -- dispatch (builder.rs:29-80) ---------------------------------------
    def execute(
        self, verb: str, *, collection: str | None = None, arg: Any = None
    ) -> CommandResult:
        verb_up = verb.upper()
        handlers = {
            "CREATE": self._create,
            "DROP": self._drop,
            "LISTCOLLECTIONS": self._list_collections,
            "TRUNCATEWAL": self._truncate_wal,
            "INSERT": self._insert,
            "BULKINSERT": self._bulkinsert,
            "UPDATE": self._update,
            "DELETE": self._delete,
            "RESTORE": self._restore,
            "HISTORY": self._history,
            "SEARCH": self._search,
            "SEARCHSIMILAR": self._search_similar,
            "REINDEX": self._reindex,
            "DEDUP": self._dedup,
            "ANALYZE": self._analyze,
            "EXPLAIN": self._explain,
            "EXPORT": self._export,
        }
        if verb_up not in handlers:
            # builder.rs:77-79 → UnrecognizedCommand
            raise UnrecognizedCommandError(f"unrecognized command: {verb}")
        return handlers[verb_up](collection, arg)

    # -- SQL surface -------------------------------------------------------
    def sql(self, query: str, *collections: str) -> DataFrame:
        """Run SQL over collections: each named collection (or all, when
        none are given) is registered as a temp view of its CURRENT
        committed snapshot, then the query runs through spark.sql —
        Catalyst planning, same as the DataFrame surface. Views are
        snapshot-stable: a concurrent COW commit does not change what a
        running query sees. Each call runs on a private child session
        (``newSession``: shared SparkContext, private temp-view catalog),
        so collection names can never clobber — or be clobbered by —
        views other tenants register on the shared session."""
        session = self.spark.newSession()
        # CBO is session-scoped and only bites when catalog stats exist
        # (ANALYZE/auto-analyze below); with stats it buys join reordering
        # and filter-selectivity-aware broadcast decisions on the deep-join
        # shapes that dominate at scale.
        session.conf.set("spark.sql.cbo.enabled", "true")
        session.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        names = collections or self.db.list_collections()
        for name in names:
            col = self.db.collection(name)
            tbl = col.analyzed_table_if_fresh(session)
            if tbl is not None:
                # Fresh catalog registration: bridge it into the session as
                # a temp view that EXPANDS to the qualified catalog relation
                # — Catalyst still plans with its CBO statistics, but the
                # current database (and so resolution of every identifier
                # the query mentions that is NOT one of these collections)
                # is untouched. Switching setCurrentDatabase here would make
                # unrelated-name resolution depend on stats freshness. The
                # registered location is an immutable COW version dir, so
                # this is as snapshot-stable as the plain temp-view path.
                ns, leaf = tbl.rsplit(".", 1)
                session.sql(
                    f"CREATE OR REPLACE TEMPORARY VIEW `{name}` "
                    f"AS SELECT * FROM `{ns}`.`{leaf}`"
                )
                continue
            # Build the snapshot read ON the child session so the view
            # registers in (and the query resolves from) its catalog. Temp
            # views take precedence over catalog tables, so a stale
            # registration can never shadow the current snapshot.
            col.read(spark=session).createOrReplaceTempView(name)
        return session.sql(query)

    def _require_collection(self, collection: str | None) -> Collection:
        if not collection:
            raise CommandArgError("command requires --collection")
        return self.db.collection(collection)

    def _require_arg(self, arg: Any, what: str) -> Any:
        if arg is None:
            raise CommandArgError(f"command requires an argument: {what}")
        return arg

    @staticmethod
    def _require_int(val: Any, what: str) -> int:
        """Exact integers only for snapshot-identity arguments: int(2.9)
        would silently name a DIFFERENT snapshot than the user did, and
        True is not a version (id-fidelity rule, r11 review)."""
        if isinstance(val, bool) or not isinstance(val, int):
            raise CommandArgError(f"{what} must be an integer, got {val!r}")
        return val

    # -- DDL ---------------------------------------------------------------
    def _create(self, collection: str | None, arg: Any) -> CommandResult:
        name = collection or self._require_arg(arg, "collection name")
        if not isinstance(name, str):
            # execute('CREATE', arg={'dimension': 3}) without collection=
            # used to adopt the options dict as the name and crash in
            # os.path.join (r11 review).
            raise CommandArgError(
                "CREATE needs a collection NAME (string); got "
                f"{type(name).__name__} — pass collection='name' and the "
                "options dict as arg"
            )
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9_.-]+", name):
            # The name becomes a directory AND a backtick-quoted SQL view
            # identifier (engine.sql's temp-view bridge); a backtick or
            # other metacharacter would splice into the DDL statement.
            raise CommandArgError(
                f"invalid collection name {name!r}: use letters, digits, "
                "'_', '.', '-'"
            )
        opts = arg if isinstance(arg, dict) else {}
        col = self.db.create_collection(
            name,
            dimension=opts.get("dimension"),
            metric=opts.get("metric", "l2"),
            partition_by=opts.get("partition_by"),
        )
        return CommandResult("CREATE", info={"collection": col.name, "path": col.path})

    def _drop(self, collection: str | None, arg: Any) -> CommandResult:
        name = collection or self._require_arg(arg, "collection name")
        self.db.drop_collection(name)
        return CommandResult("DROP", info={"collection": name})

    def _list_collections(self, collection: str | None, arg: Any) -> CommandResult:
        from vrod_spark.localdf import local_df

        names = self.db.list_collections()
        df = local_df(self.spark, [(n,) for n in names], "collection string")
        return CommandResult("LISTCOLLECTIONS", df=df, info={"collections": names})

    def _truncate_wal(self, collection: str | None, arg: Any) -> CommandResult:
        info = self.db.truncate_wal(collection)
        return CommandResult("TRUNCATEWAL", info=info)

    # -- DML ---------------------------------------------------------------
    def _insert(self, collection: str | None, arg: Any) -> CommandResult:
        """INSERT (builder.rs:43-47). ``arg``: one record dict, a list of
        them, a DataFrame, or ``{"rows": <any of those>, "on_conflict":
        "append" (default) | "error" | "ignore" | "replace"}``.

        The reference never specifies key semantics (types.rs:56-67 —
        UPDATE/DELETE imply ids matter, INSERT says nothing), so the
        engine makes all four standard behaviors explicit:
        - append  — blind O(delta) hard-link append (the default; plain
          appends commute, no corpus read);
        - error   — reject the whole batch if any incoming id already
          exists or repeats within the batch (one semi-join on id);
        - ignore  — drop conflicting/repeated rows, append the rest
          (INSERT IF NOT EXISTS);
        - replace — upsert: existing rows with incoming ids are replaced
          in a COW rewrite commit (O(corpus), invalidates indexes — the
          same contract as UPDATE, because it IS one).
        """
        col = self._require_collection(collection)
        arg = self._require_arg(arg, "record(s)")
        on_conflict = "append"
        # The envelope is keyed on "on_conflict" ALONE: a record dict is
        # allowed to have a user column named "rows", and sniffing on it
        # would misparse that record as an envelope.
        if isinstance(arg, dict) and "on_conflict" in arg:
            on_conflict = str(arg.get("on_conflict", "append")).lower()
            arg = self._require_arg(arg.get("rows"), "record(s)")
        if on_conflict not in ("append", "error", "ignore", "replace"):
            raise CommandArgError(
                f"unknown on_conflict {on_conflict!r}; expected "
                "append/error/ignore/replace"
            )
        if isinstance(arg, DataFrame):
            df = arg
        else:
            from pyspark.sql.types import ArrayType, DoubleType, FloatType

            # Build tuples BY THE COLLECTION'S SCHEMA, not a hardcoded
            # (id, embedding, payload, meta) shape — custom-schema
            # collections (e.g. an extra score column) would otherwise
            # have their extra fields silently nulled. Unknown keys are
            # rejected loudly for the same reason: silently dropping a
            # record field is corpus corruption, not convenience.
            schema = StructType.fromDDL(col.meta["schema"])
            known = {f.name for f in schema.fields}
            rows = arg if isinstance(arg, list) else [arg]
            for r in rows:
                unknown = set(r) - known
                if unknown:
                    raise CommandArgError(
                        f"record field(s) {sorted(unknown)} not in collection "
                        f"schema {sorted(known)}"
                    )

            def _coerce(r: dict, f) -> Any:
                v = r.get(f.name)
                if (
                    v is not None
                    and isinstance(f.dataType, ArrayType)
                    and isinstance(f.dataType.elementType, (FloatType, DoubleType))
                ):
                    return [float(x) for x in v]
                return v

            rows = [tuple(_coerce(r, f) for f in schema.fields) for r in rows]
            # Arrow path: the pickled-RDD list scan costs ~1.3 s PER
            # EXECUTION (vrod_spark/localdf.py), and the COW append
            # executes this frame.
            from vrod_spark.localdf import local_df

            df = local_df(self.spark, rows, col.meta["schema"])

        info: dict[str, Any] = {"collection": col.name}
        if on_conflict != "append":
            if df.filter(F.col("id").isNull()).limit(1).count():
                raise CommandArgError(
                    f"on_conflict={on_conflict!r} needs non-null ids"
                )
            existing = col.read().select("id")
            if on_conflict == "error":
                batch_dups = (
                    df.groupBy("id").count().filter("count > 1").limit(1).count()
                )
                n_exist = df.join(existing, "id", "left_semi").limit(1).count()
                if batch_dups or n_exist:
                    raise CommandArgError(
                        "INSERT on_conflict=error: conflicting id(s) "
                        + ("within the batch" if batch_dups else "already in the collection")
                    )
            elif on_conflict == "ignore":
                # A batch repeating an id is the same which-row-wins
                # ambiguity replace rejects — reject it here too instead
                # of persisting an arbitrary one via dropDuplicates (r11
                # review; a full-row comparison is not an option: the
                # meta map column forbids set operations).
                if df.groupBy("id").count().filter("count > 1").limit(1).count():
                    raise CommandArgError(
                        "INSERT on_conflict=ignore: the batch repeats an "
                        "id; make the batch one row per id"
                    )
                before = df.count()
                df = df.join(existing, "id", "left_anti")
                info["skipped"] = before - df.count()
            elif on_conflict == "replace":
                # An upsert batch with a repeated id is ambiguous (which
                # row wins?) and would persist DUPLICATE ids — reject it
                # loudly, matching the error mode's batch check.
                if df.groupBy("id").count().filter("count > 1").limit(1).count():
                    raise CommandArgError(
                        "INSERT on_conflict=replace: the batch repeats an "
                        "id; an upsert needs one row per id"
                    )
                survivors = col.read().join(
                    df.select("id").distinct(), "id", "left_anti"
                ).unionByName(df)
                # WAL op "UPSERT", not "INSERT": this path is a full
                # rewrite (every file renamed), and read_delta's
                # append-only fast path trusts the op string — logging
                # it as an insert would make a later since_version
                # export ship the ENTIRE snapshot as "new files".
                n = col._rewrite(survivors, "UPSERT", {"on_conflict": "replace"})
                info.update(rows=n, on_conflict="replace")
                return CommandResult("INSERT", info=info)
            info["on_conflict"] = on_conflict
        n = col.insert(df)
        info["rows"] = n
        return CommandResult("INSERT", info=info)

    def _bulkinsert(self, collection: str | None, arg: Any) -> CommandResult:
        """BULKINSERT <src>: the canonical batch-ingest path
        (builder.rs:48-52). `arg` is a path (parquet, or the reference's
        text vector format via sources.vectors_txt) or a DataFrame."""
        col = self._require_collection(collection)
        arg = self._require_arg(arg, "source path or DataFrame")
        if isinstance(arg, DataFrame):
            df = arg
        elif isinstance(arg, str) and arg.endswith((".txt", ".vtxt")):
            from vrod_spark.sources.vectors_txt import read_vectors_txt

            df = read_vectors_txt(self.spark, arg)
        elif isinstance(arg, str) and arg.endswith((".csv", ".csv.gz")):
            # CSV with header; the embedding column arrives as a
            # "v1,...,vN"-style quoted string → parsed to ARRAY<FLOAT>.
            # try_cast: under ANSI mode a malformed component would throw
            # a raw executor NumberFormatException mid-ingest — degrading
            # to a NULL element lets the collection's dimension/type
            # validation report the clean engine error instead.
            raw = self.spark.read.option("header", "true").csv(arg)
            if "embedding" in raw.columns:
                raw = raw.withColumn(
                    "embedding",
                    F.transform(
                        F.split(F.col("embedding"), ","), lambda x: x.try_cast("float")
                    ),
                )
            df = raw
        elif isinstance(arg, str) and arg.endswith(
            (".json", ".jsonl", ".ndjson", ".json.gz", ".jsonl.gz", ".ndjson.gz")
        ):
            # Spark's text-based sources decompress .gz transparently
            # (per-file tasks — a gzip member is not splittable, which is
            # why corpora ship as many shards; same contract as WARC).
            df = self.spark.read.schema(col.meta["schema"]).json(arg)
        elif isinstance(arg, str) and arg.endswith((".warc", ".warc.gz")):
            # Common Crawl shape: web archives → one row per response
            # record with extracted text (sources/warc.py — binaryFile
            # scan + mapInPandas parse; blobs never shuffle). Mapped into
            # the collection model like vectors_txt: minted id, extracted
            # text as payload, WARC/HTTP metadata in the meta map.
            from vrod_spark.sources.warc import read_warc

            rec = read_warc(self.spark, arg)
            # Deterministic content-derived ids (r11 review):
            # monotonically_increasing_id restarts at the same
            # (partition, offset) values every ingest, so two WARC
            # bulkinserts into one collection silently collide — and it
            # changes under task retry. WARC-Record-ID is a unique URN
            # per record; its xxhash64 is stable across retries and
            # ingests (the DEDUP machinery already treats xxhash64 as
            # injective-with-check at corpus scale).
            df = rec.select(
                F.xxhash64(
                    F.coalesce(
                        F.col("record_id"),
                        F.concat_ws("|", F.col("url"), F.col("warc_date")),
                    )
                ).alias("id"),
                F.col("text").alias("payload"),
                F.map_filter(
                    F.create_map(
                        F.lit("url"), F.col("url"),
                        F.lit("date"), F.col("warc_date"),
                        F.lit("record_id"), F.col("record_id"),
                        F.lit("content_type"), F.col("content_type"),
                        F.lit("http_status"),
                        F.col("http_status").cast("string"),
                    ),
                    lambda _k, v: v.isNotNull(),
                ).alias("meta"),
            )
        elif isinstance(arg, str) and arg.endswith(".orc"):
            df = self.spark.read.orc(arg)
        elif isinstance(arg, str):
            df = self.spark.read.parquet(arg)
        else:
            raise CommandArgError(f"unsupported BULKINSERT source: {type(arg)}")
        n = col.insert(df)
        # SURVEY §4.2: ANALYZE after BULKINSERT — one distributed stats
        # pass on freshly-ingested data so every subsequent CBO-planned
        # query sees real cardinalities. BEST-EFFORT: the insert already
        # committed durably, so a stats failure must not fail the command
        # (a retry would duplicate rows); queries just plan without stats
        # until the next ANALYZE succeeds.
        info: dict[str, Any] = {"collection": col.name, "rows": n}
        try:
            info["stats_version"] = col.analyze()["version"]
        except Exception as exc:  # noqa: BLE001 — post-commit, report not raise
            info["stats_error"] = f"{type(exc).__name__}: {exc}"
        return CommandResult("BULKINSERT", info=info)

    def _update(self, collection: str | None, arg: Any) -> CommandResult:
        """UPDATE (builder.rs:53-57). `arg`: {"where": <sql-bool>,
        "set": {col: <sql-expr>}} or a JSON string of the same."""
        col = self._require_collection(collection)
        spec = self._require_arg(arg, "update spec")
        if isinstance(spec, str):
            spec = json.loads(spec)
        if "where" not in spec or "set" not in spec:
            raise CommandArgError("UPDATE spec needs 'where' and 'set'")
        n = col.update(spec["where"], spec["set"])
        return CommandResult("UPDATE", info={"collection": col.name, "matched": n})

    def _delete(self, collection: str | None, arg: Any) -> CommandResult:
        """DELETE (builder.rs:58-62). `arg`: SQL boolean predicate, or
        {"where": ...}, or an id list."""
        col = self._require_collection(collection)
        spec = self._require_arg(arg, "delete predicate")
        if isinstance(spec, dict):
            if "where" not in spec:
                raise CommandArgError('DELETE dict form needs {"where": <predicate>}')
            predicate = spec["where"]
        elif isinstance(spec, list):
            if not spec:
                predicate = "false"  # empty id list deletes nothing
            elif all(isinstance(i, int) and not isinstance(i, bool) for i in spec):
                predicate = f"id in ({','.join(str(i) for i in spec)})"
            else:
                # string-id collections: quote (and escape) the literals
                quoted = ",".join(
                    "'" + str(i).replace("'", "''") + "'" for i in spec
                )
                predicate = f"id in ({quoted})"
        else:
            predicate = str(spec)
        n = col.delete(predicate)
        return CommandResult("DELETE", info={"collection": col.name, "deleted": n})

    def _restore(self, collection: str | None, arg: Any) -> CommandResult:
        """RESTORE — [N] lifecycle verb (time-travel WRITE; the read half
        is SEARCH's ``version=``): commit a NEW version whose content is
        a committed historical snapshot's. History stays append-only, so
        a bad DEDUP/UPDATE/DELETE is reversible until TRUNCATEWAL
        reclaims the superseded dirs. ``arg``: a version number,
        {"version": N}, or {"ts": <unix seconds>} — "as of" semantics:
        the LATEST commit at-or-before that instant, resolved from the
        WAL's commit timestamps (the same ts column HISTORY shows).
        Metadata-only (hard-link) when the historical layout matches the
        collection's conventions — zero Spark jobs; see
        Collection.restore for the layout rules."""
        col = self._require_collection(collection)
        spec = self._require_arg(arg, "restore version")
        if isinstance(spec, str):
            try:
                spec = json.loads(spec)
            except json.JSONDecodeError:
                pass
        if isinstance(spec, dict):
            if ("version" in spec) == ("ts" in spec):
                raise CommandArgError(
                    'RESTORE dict form needs {"version": N} or {"ts": T}, '
                    "not both"
                )
            if "ts" in spec:
                ts = spec["ts"]
                if isinstance(ts, bool) or not isinstance(ts, (int, float)):
                    raise CommandArgError(
                        f"RESTORE ts must be unix seconds, got {ts!r}"
                    )
                spec = self._version_as_of(col, float(ts))
            else:
                spec = spec["version"]
        version = self._require_int(spec, "RESTORE version")
        n = col.restore(version)
        return CommandResult(
            "RESTORE",
            info={
                "collection": col.name,
                "restored_from": version,
                "version": col.version,
                "rows": n,
            },
        )

    @staticmethod
    def _version_as_of(col: Collection, ts: float) -> int:
        """Latest committed version whose commit time is <= ``ts`` —
        v0's time is the collection's created_at; every later commit's
        is its WAL line. Only versions still retained on disk qualify
        (a reclaimed snapshot can't be restored anyway, and the error
        should say "nothing at that time", not "missing dir")."""
        candidates = [(float(col.meta.get("created_at") or 0.0), 0)]
        for e in col.wal_entries():
            v = e.get("version")
            if isinstance(v, int):
                candidates.append((float(e.get("ts", 0.0)), v))
        eligible = [
            v
            for t, v in candidates
            if t <= ts and os.path.isdir(col.version_dir(v))
        ]
        if not eligible:
            raise CommandArgError(
                f"no retained commit of {col.name} at or before ts={ts} "
                "(before creation, or reclaimed by TRUNCATEWAL)"
            )
        return max(eligible)

    def _history(self, collection: str | None, arg: Any) -> CommandResult:
        """HISTORY — [N] introspection verb pairing with RESTORE/time
        travel: one row per commit (version, op, ts, rows touched,
        restored_from for RESTOREs), plus whether each snapshot dir is
        still retained on disk (restorable/readable) and which is
        CURRENT. v0 is CREATE's empty snapshot (committed outside the
        collection WAL, so synthesized from meta). After TRUNCATEWAL the
        log restarts — retained=false rows disappear with their dirs.

        Driver-side O(commits): the WAL is line-JSON on the driver and a
        collection's commit count is bounded by its mutation history,
        not its data. The result is a local Arrow DataFrame."""
        from vrod_spark.localdf import local_df

        col = self._require_collection(collection)
        cur = col.version
        rows = [
            {
                "version": 0,
                "op": "CREATE",
                "ts": float(col.meta.get("created_at") or 0.0),
                "rows": None,
                "restored_from": None,
            }
        ]
        for e in col.wal_entries():
            rows.append(
                {
                    "version": int(e.get("version", -1)),
                    "op": str(e.get("op", "")),
                    "ts": float(e.get("ts", 0.0)),
                    "rows": e.get("rows"),
                    "restored_from": e.get("restored_from"),
                }
            )
        # TRUNCATEWAL clears the log but keeps the CURRENT snapshot: a
        # post-truncation history must still show it (it is the restore
        # horizon), so synthesize a CHECKPOINT row when unlogged.
        if all(r["version"] != cur for r in rows):
            try:
                ts = os.path.getmtime(col.version_dir(cur))
            except OSError:
                ts = 0.0
            rows.append(
                {
                    "version": cur,
                    "op": "CHECKPOINT",
                    "ts": float(ts),
                    "rows": None,
                    "restored_from": None,
                }
            )
        # Dedup/sort in plain Python and build via the NaN-safe local_df
        # helper: pd.DataFrame(rows) would coerce the int+None "rows"
        # column to float64/NaN, and createDataFrame(pdf, "... bigint")
        # then dies on the NON-Arrow conversion path ("LongType() can
        # not accept object nan") — exactly the driver's session
        # (arrow.pyspark.enabled unset). localdf.local_df keeps Nones
        # as NULLs on both paths.
        by_version: dict[int, dict] = {}
        for r in rows:
            by_version[r["version"]] = r  # keep="last"
        out = []
        for v in sorted(by_version):
            r = by_version[v]
            out.append(
                (
                    int(v),
                    r["op"],
                    r["ts"],
                    None if r["rows"] is None else int(r["rows"]),
                    None
                    if r["restored_from"] is None
                    else int(r["restored_from"]),
                    os.path.isdir(col.version_dir(int(v))),
                    int(v) == cur,
                )
            )
        df = local_df(
            self.spark,
            out,
            "version bigint, op string, ts double, rows bigint, "
            "restored_from bigint, retained boolean, current boolean",
        )
        return CommandResult(
            "HISTORY", df=df, info={"collection": col.name, "current": cur}
        )

    # -- queries -----------------------------------------------------------
    def _explain(self, collection: str | None, arg: Any) -> CommandResult:
        """EXPLAIN — [N] introspection verb (no reference analog; the
        natural face of §4's "plan audit" for engine users): return the
        Catalyst plan of a READ command without executing it.

        ``arg``: {"command": "SEARCH" | "SEARCHSIMILAR",
                  "arg": <the inner command's arg>,
                  "mode": "formatted" (default) | "simple" | "extended"
                        | "cost" | "codegen"}

        Only read-path verbs are explainable: their handlers build a lazy
        DataFrame and run no job until collect, so EXPLAIN is free and
        side-effect-less. Mutation verbs (INSERT/UPDATE/DELETE/REINDEX/
        DEDUP) commit COW rewrites inside their handlers — asking for
        their plan would run them; use ``{"dry_run": true}`` on DEDUP for
        its inspect-first equivalent. The plan string is returned in
        ``info["plan"]`` (and the verb/mode echoed), so callers can
        assert pushdown/pruning the way tests/test_plans.py does."""
        from vrod_spark.plans.inspect import explain_str

        spec = self._require_arg(arg, "explain spec")
        if not isinstance(spec, dict) or "command" not in spec:
            raise CommandArgError(
                'EXPLAIN needs {"command": VERB, "arg": ..., "mode": ...}'
            )
        verb = str(spec["command"]).upper()
        readonly = {"SEARCH": self._search, "SEARCHSIMILAR": self._search_similar}
        if verb not in readonly:
            raise CommandArgError(
                f"EXPLAIN supports read commands {sorted(readonly)}, got {verb!r}"
            )
        if (
            verb == "SEARCHSIMILAR"
            and isinstance(spec.get("arg"), dict)
            and spec["arg"].get("diversify") is not None
        ):
            # The MMR rerank collects its candidate pool and runs the
            # first-stage search during plan CONSTRUCTION — explaining it
            # would execute the query and return a plan over the already-
            # materialized local result (r11 review). The lazy part of a
            # diversified search IS the pool search: explain that.
            raise CommandArgError(
                "EXPLAIN of a diversified SEARCHSIMILAR would execute the "
                "query (MMR materializes its pool at plan time); EXPLAIN "
                "the same spec without 'diversify' to see the pool "
                "search's plan"
            )
        mode = str(spec.get("mode", "formatted"))
        modes = ("simple", "extended", "codegen", "cost", "formatted")
        if mode not in modes:
            raise CommandArgError(
                f"unknown explain mode {mode!r}; expected one of {modes}"
            )
        inner = readonly[verb](collection, spec.get("arg"))
        return CommandResult(
            "EXPLAIN",
            info={
                "command": verb,
                "mode": mode,
                "plan": explain_str(inner.df, mode),
            },
        )

    def _export(self, collection: str | None, arg: Any) -> CommandResult:
        """EXPORT — [N] sink verb (no reference analog; the reference's
        storage layer is a `todo!` — src/database/mod.rs:20): write a
        collection snapshot out as training-data shards, the last step
        of every curation pipeline.

        ``arg``: {"path": <dir>,              (required)
                  "format": "jsonl" | "parquet" (default "jsonl"),
                  "where": optional SQL predicate (pushed to the scan),
                  "columns": optional projection list,
                  "version": optional time-travel snapshot,
                  "since_version": optional INCREMENTAL export — only
                      rows added after that snapshot (file-level O(delta)
                      when the history is append-only, anti-join
                      otherwise; Collection.read_delta),
                  "shards": optional fixed shard count (one exchange),
                  "max_records_per_file": shard-size cap (default 100k),
                  "compression": jsonl codec (default "gzip"),
                  "mode": writer mode (default "error")}

        The row count rides the WRITE job via ``observe`` (no second
        scan). jsonl shards read straight back through BULKINSERT —
        pytest pins the roundtrip (full and incremental). A
        ``_manifest.json`` shard inventory (names, sizes, per-shard rows
        for parquet, snapshot provenance) is written next to the shards;
        the underscore name keeps it invisible to Spark listings and the
        re-ingest glob."""
        col = self._require_collection(collection)
        spec = self._require_arg(arg, "export spec")
        if not isinstance(spec, dict) or "path" not in spec:
            raise CommandArgError('EXPORT needs {"path": <directory>, ...}')
        fmt = str(spec.get("format", "jsonl")).lower()
        if fmt not in ("jsonl", "parquet"):
            raise CommandArgError(
                f'unknown export format {fmt!r}; expected "jsonl" or "parquet"'
            )
        from pyspark.sql import Observation

        version = spec.get("version")
        since = spec.get("since_version")
        if since is not None and version is not None:
            raise CommandArgError(
                'EXPORT takes "version" (a snapshot) OR "since_version" '
                "(the delta after one), not both"
            )
        if since is not None:
            since = self._require_int(since, "EXPORT since_version")
            df = col.read_delta(since)
            snapshot_version = None
        else:
            # Pin the snapshot by NUMBER before building the read: the
            # write job below can run for minutes, and a concurrent
            # commit must not make the manifest claim a version whose
            # rows the export never saw.
            snapshot_version = (
                self._require_int(version, "EXPORT version")
                if version is not None
                else col.version
            )
            df = col.read(version=snapshot_version)
        if spec.get("where"):
            df = df.filter(F.expr(str(spec["where"])))
        if spec.get("columns"):
            df = df.select(*[str(c) for c in spec["columns"]])
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        path = str(spec["path"])
        mode = str(spec.get("mode", "error"))
        if fmt == "jsonl":
            from vrod_spark.sources.export import export_jsonl_shards

            export_jsonl_shards(
                df,
                path,
                max_records_per_file=int(spec.get("max_records_per_file", 100_000)),
                shards=int(spec["shards"]) if spec.get("shards") else None,
                compression=str(spec.get("compression", "gzip")),
                mode=mode,
            )
        else:
            out = df.repartition(int(spec["shards"])) if spec.get("shards") else df
            out.write.mode(mode).option(
                "maxRecordsPerFile", int(spec.get("max_records_per_file", 100_000))
            ).parquet(path)
        rows = int(obs.get["rows"])
        from vrod_spark.sources.export import write_export_manifest

        manifest = write_export_manifest(
            path,
            fmt=fmt,
            rows=rows,
            collection=col.name,
            version=snapshot_version,
            since_version=since,
            columns=[str(c) for c in spec["columns"]] if spec.get("columns") else None,
            where=str(spec["where"]) if spec.get("where") else None,
        )
        return CommandResult(
            "EXPORT",
            info={
                "collection": col.name,
                "path": path,
                "format": fmt,
                "rows": rows,
                "manifest": manifest,
            },
        )

    def _search(self, collection: str | None, arg: Any) -> CommandResult:
        """SEARCH (builder.rs:63-67): predicate/metadata search. `arg`: SQL
        boolean expression over (id, payload, meta), or {"where": ...,
        "limit": n, "rank": {"bm25": "query terms"}}. Runs as filter →
        (optional) limit with full predicate pushdown to the Parquet scan.

        With ``rank``, the filtered rows are scored by BM25 over the
        payload (operators.retrieval.bm25_rank — Okapi/Lucene idf; only
        query-term postings shuffle, corpus stats broadcast, top-k plans
        as TakeOrderedAndProject) and the result is the ranked row set
        (id, rank, n_matched, score, payload) instead of the id-ordered
        filter output — the full-text face of the reference's SEARCH
        intent."""
        col = self._require_collection(collection)
        spec = self._require_arg(arg, "search predicate")
        limit = None
        rank = None
        version = None
        facet = None
        if isinstance(spec, dict):
            predicate, limit = spec.get("where", "true"), spec.get("limit")
            rank = spec.get("rank")
            # Time travel: search a PAST committed snapshot (the COW
            # version dirs are immutable, so this is just a different
            # scan root — the audit/repro face of the snapshot lifecycle;
            # TRUNCATEWAL GC bounds how far back it reaches).
            version = spec.get("version")
            facet = spec.get("facet")
        else:
            predicate = str(spec)
        if facet is not None:
            if rank is not None:
                raise CommandArgError(
                    "SEARCH cannot combine 'facet' and 'rank': faceting "
                    "aggregates the filtered rows, ranking returns them"
                )
            # Faceting: value counts of a meta key over the filtered rows
            # (the search-engine aggregation face of SEARCH) — one
            # map-side-combined groupBy on a low-cardinality key.
            base = col.read(
                version=int(version) if version is not None else None
            ).filter(F.expr(predicate))
            out = (
                base.groupBy(
                    F.element_at(F.col("meta"), F.lit(str(facet))).alias("value")
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), "value")
            )
            if limit is not None:
                out = out.limit(int(limit))
            return CommandResult("SEARCH", df=out)
        if isinstance(rank, dict) and "vector" in rank:
            # HYBRID SEARCH: BM25 candidates over the payload ∪ vector
            # candidates over the embedding (under the collection's
            # declared metric, through its ANN index when REINDEXed),
            # combined by reciprocal-rank fusion — rank-based, so no
            # score calibration between the two modalities is needed.
            # The candidate depth is per-list ("candidates", default
            # 20); `limit` caps the fused output (default 10).
            from pyspark.sql import Window

            from vrod_spark.operators.retrieval import bm25_rank, rrf_fuse

            qtext = rank.get("bm25")
            qvec = rank.get("vector")
            if not qtext or not isinstance(qvec, (list, tuple)) or not qvec:
                raise CommandArgError(
                    'hybrid rank needs BOTH {"bm25": "query terms", '
                    '"vector": [floats]} — with only one modality use '
                    "plain rank.bm25 or SEARCHSIMILAR"
                )
            terms = [t for t in str(qtext).lower().split() if t]
            if not terms:
                raise CommandArgError("rank.bm25 needs at least one query term")
            list_k = int(rank.get("candidates", 20))
            fusion_k = int(rank.get("fusion_k", 60))
            if list_k <= 0 or fusion_k <= 0:
                raise CommandArgError("candidates and fusion_k must be >= 1")
            top_k = 10 if limit is None else int(limit)
            if top_k <= 0:
                raise CommandArgError("rank mode needs limit >= 1")
            if version is not None:
                # Past snapshots predate the current index layout; the
                # versioned read path in SEARCHSIMILAR has no index
                # routing, so hybrid-over-time-travel is rejected rather
                # than silently served from a different snapshot per list.
                raise CommandArgError(
                    "hybrid rank does not support version= time travel "
                    "(the index describes the CURRENT snapshot); SEARCH "
                    "the past snapshot with rank.bm25 and SEARCHSIMILAR "
                    "it separately instead"
                )
            base = col.read().filter(F.expr(predicate))
            if "embedding" not in base.columns:
                raise CommandArgError(
                    f"collection {col.name!r} has no 'embedding' column "
                    "for the hybrid vector list"
                )
            bm = bm25_rank(
                base, terms, text_col="payload", id_col="id", top_k=list_k
            ).select("id", "rank")
            # The vector list DELEGATES to SEARCHSIMILAR: a REINDEXed
            # collection probes its LSH/IVF/PQ index instead of brute-
            # forcing, the collection's declared metric defines
            # similarity, and dimension validation comes free — the
            # 100 TB hybrid shape (first-stage candidates from the
            # index, fusion over k-sized lists).
            vspec: dict[str, Any] = {
                "vector": [float(x) for x in qvec],
                "k": list_k,
                "where": f"({predicate}) AND embedding IS NOT NULL",
            }
            vres = self._search_similar(collection, vspec).df
            vw = Window.orderBy(F.col("dist").asc(), F.col("id").asc())
            vec = (
                vres.select("id", "dist")
                .withColumn("rank", F.row_number().over(vw))
                .select("id", "rank")
            )
            fused = rrf_fuse(
                {"bm25": bm, "vector": vec}, k=fusion_k, top_k=top_k
            )
            df = (
                fused.join(base.select("id", "payload"), "id")
                .select("id", "fused_rank", "rrf_score", "n_lists", "payload")
                .orderBy("fused_rank")
            )
            return CommandResult("SEARCH", df=df)
        if rank is not None:
            from vrod_spark.operators.retrieval import bm25_rank

            query = rank.get("bm25") if isinstance(rank, dict) else rank
            terms = [t for t in str(query).lower().split() if t]
            if not terms:
                raise CommandArgError("rank.bm25 needs at least one query term")
            # `limit or 10` would silently turn an explicit 0 into 10
            # (ADVICE r8) — default only on None, reject non-positive.
            top_k = 10 if limit is None else int(limit)
            if top_k <= 0:
                raise CommandArgError("rank mode needs limit >= 1")
            base = col.read(
                version=int(version) if version is not None else None
            ).filter(F.expr(predicate))
            ranked = bm25_rank(
                base,
                terms,
                text_col="payload",
                id_col="id",
                top_k=top_k,
            )
            df = (
                ranked.join(base.select("id", "payload"), "id")
                .select("id", "rank", "n_matched", "score", "payload")
                .orderBy("rank")
            )
            return CommandResult("SEARCH", df=df)
        if version is not None:
            # Past snapshots predate layout knowledge the pk-pruning path
            # assumes is CURRENT — take the plain versioned read.
            df = col.read(version=int(version)).filter(F.expr(predicate)).orderBy("id")
            if limit is not None:
                df = df.limit(int(limit))
            return CommandResult("SEARCH", df=df)
        pk_lit = col.partition_literal(predicate)
        if pk_lit is not None:
            # Meta-key-partitioned collection + predicate pinning that key:
            # conjoin the equivalent pk filter so the scan partition-prunes
            # (reads only the matching pk=<val>/ directory).
            fields = [
                f.name
                for f in StructType.fromDDL(col.meta["schema"]).fields
            ]
            df = (
                col.read_raw()
                .filter(F.col("pk") == F.lit(pk_lit))
                .filter(F.expr(predicate))
                .select(*fields)
                .orderBy("id")
            )
        else:
            df = col.read().filter(F.expr(predicate)).orderBy("id")
        if limit is not None:
            df = df.limit(int(limit))
        return CommandResult("SEARCH", df=df)

    def _search_similar(self, collection: str | None, arg: Any) -> CommandResult:
        """SEARCHSIMILAR (builder.rs:68-72): kNN for a query vector.
        `arg`: {"vector": [...], "k": 10, "where": optional prefilter} or
        "v1,v2,...;k=5". Exact path scores with codegen'd expressions and
        plans TakeOrderedAndProject; REINDEXed collections use the
        LSH-bucketed fast path (operators.ann).

        ``{"within": r}`` switches to RANGE search (everything with
        distance ≤ r, operators.knn.range_search), with optional ``k`` as
        a cap. Range semantics promise COMPLETENESS, which bucket probes
        can't (a radius can straddle any bucket boundary), so `within`
        always runs the exact scan-filter path — the indexed-scale shape
        for "all pairs within ε" is the dedup operator family, not a
        per-query probe."""
        col = self._require_collection(collection)
        spec = self._require_arg(arg, "query vector")
        if isinstance(spec, dict) and "vectors" in spec:
            # Batch form: Q query vectors, one plan, per-query top-k
            # (operators.knn.knn_batch). Exact path by design: the batch
            # shape is the eval-harness use case where per-query bucket
            # probing would run Q separate pruned scans anyway.
            if spec.get("diversify") is not None:
                # Silently ignoring it would let a caller believe a
                # diversified batch ran (the keep="first"+score lesson).
                raise CommandArgError(
                    "diversify composes with the single-vector form only; "
                    "run per-query SEARCHSIMILAR calls to diversify a batch"
                )
            from vrod_spark.operators.knn import knn_batch

            vectors = [[float(x) for x in v] for v in spec["vectors"]]
            meta = col.meta
            declared = meta.get("dimension")
            for v in vectors:
                if declared is not None and len(v) != declared:
                    raise DimensionMismatchError(
                        f"query vector dimension {len(v)} != collection "
                        f"dimension {declared}"
                    )
            df = col.read()
            if spec.get("where"):
                df = df.filter(F.expr(spec["where"]))
            result = knn_batch(
                df,
                vectors,
                int(spec.get("k", 10)),
                vec_col="embedding",
                id_col="id",
                metric=meta.get("metric", "l2"),
                payload_cols=("payload",),
            )
            return CommandResult("SEARCHSIMILAR", df=result)
        if isinstance(spec, dict) and spec.get("diversify") is not None:
            # MMR DIVERSIFICATION (Carbonell & Goldstein 1998): fetch a
            # candidate POOL through the normal routing (index probe when
            # REINDEXed — recursion reuses every existing path), then
            # greedily select k balancing query relevance against
            # similarity to already-selected results. `diversify`:
            # {"lambda": 0..1 (default 0.5), "pool": candidates fetched
            # (default 4k)} or a bare lambda number.
            dv = spec["diversify"]
            if not isinstance(dv, dict):
                dv = {"lambda": dv}
            try:
                lam = float(dv.get("lambda", 0.5))
            except (TypeError, ValueError):
                raise CommandArgError("diversify.lambda must be a number in [0, 1]")
            if not 0.0 <= lam <= 1.0:
                raise CommandArgError("diversify.lambda must be in [0, 1]")
            if "within" in spec:
                raise CommandArgError(
                    "diversify composes with top-k search, not range search"
                )
            if not spec.get("vector"):
                raise CommandArgError(
                    'diversify needs the single-vector form: {"vector": '
                    '[...], "k": n, "diversify": {...}}'
                )
            k_out = int(spec.get("k", 10))
            pool = int(dv.get("pool", 4 * k_out))
            if pool < k_out:
                raise CommandArgError("diversify.pool must be >= k")
            inner = {kk: v for kk, v in spec.items() if kk != "diversify"}
            inner["k"] = pool
            pool_ids = self._search_similar(collection, inner).df.select("id")
            from vrod_spark.operators.retrieval import mmr_rerank

            base = col.read().select("id", "embedding", "payload")
            cand = base.join(F.broadcast(pool_ids), "id")
            sel = mmr_rerank(
                cand,
                [float(x) for x in spec["vector"]],
                k=k_out,
                lambda_=lam,
                vec_col="embedding",
                id_col="id",
                # Rerank in the collection's declared metric so λ=1
                # (pure relevance) reproduces the first-stage order on
                # l2 collections too (ADVICE r10).
                metric=col.meta.get("metric", "l2"),
            )
            df = (
                sel.join(base.select("id", "payload"), "id")
                .select("id", "mmr_rank", "relevance", "mmr_score", "payload")
                .orderBy("mmr_rank")
            )
            return CommandResult("SEARCHSIMILAR", df=df)
        tuning: dict[str, int] = {}
        within = None
        if isinstance(spec, str):
            vec_part, _, k_part = spec.partition(";")
            vector = [float(x) for x in vec_part.split(",") if x.strip()]
            k = int(k_part.split("=")[1]) if "=" in k_part else 10
            where = None
        else:
            vector = [float(x) for x in spec["vector"]]
            k = int(spec.get("k", 10))
            where = spec.get("where")
            within = spec.get("within")
            # Recall knobs, monotone and exact in the limit: probe more
            # buckets (sign-LSH/IVF) / rescore more ADC survivors
            # (pq/ivfpq). Each index kind consumes the knob it has.
            for knob in ("candidate_factor", "rescore_factor"):
                if spec.get(knob) is not None:
                    tuning[knob] = int(spec[knob])
        meta = col.meta
        declared = meta.get("dimension")
        if declared is not None and len(vector) != declared:
            raise DimensionMismatchError(
                f"query vector dimension {len(vector)} != collection dimension {declared}"
            )
        df = col.read()
        if where:
            df = df.filter(F.expr(where))
        if within is not None:
            from vrod_spark.operators.knn import range_search

            result = range_search(
                df,
                vector,
                float(within),
                vec_col="embedding",
                id_col="id",
                metric=meta.get("metric", "l2"),
                payload_cols=("payload",),
                limit=int(spec["k"]) if isinstance(spec, dict) and "k" in spec else None,
            )
            return CommandResult("SEARCHSIMILAR", df=result)
        live_idx = col.live_index(meta)
        if live_idx:
            kind = live_idx.get("kind")
            if kind == "ivf":
                from vrod_spark.operators.ivf import ivf_search

                opts = {"candidate_factor": tuning["candidate_factor"]} if "candidate_factor" in tuning else {}
                result = ivf_search(col, vector, k, prefilter=where, **opts)
            elif kind in ("pq", "ivfpq"):
                from vrod_spark.operators.pq import pq_collection_search

                opts = {"rescore_factor": tuning["rescore_factor"]} if "rescore_factor" in tuning else {}
                result = pq_collection_search(col, vector, k, prefilter=where, **opts)
            else:
                from vrod_spark.operators.ann import ann_search_bucketed

                opts = {"candidate_factor": tuning["candidate_factor"]} if "candidate_factor" in tuning else {}
                result = ann_search_bucketed(col, vector, k, prefilter=where, **opts)
            return CommandResult("SEARCHSIMILAR", df=result)
        result = knn_exact(
            df,
            vector,
            k,
            vec_col="embedding",
            id_col="id",
            metric=meta.get("metric", "l2"),
            payload_cols=("payload",),
        )
        return CommandResult("SEARCHSIMILAR", df=result)

    def _dedup(self, collection: str | None, arg: Any) -> CommandResult:
        """DEDUP — [N] extension verb (no reference analog): remove
        duplicate records from a collection, keep-first by id. The LLM-
        corpus maintenance op the dedup operator family exists for, wired
        into the COW lifecycle: survivors are computed distributed, the
        snapshot is rewritten, the pointer swaps atomically.

        ``arg``: {"strategy": "exact" (default) | "url" | "minhash"
                  | "simhash" | "embedding" | "semdedup" | "winnow"
                  | "imagehash" | "audiohash" | "spans" | "lines"
                  | "decontaminate",
                  "url_key": "url" — meta key holding the record's URL
                  (strategy "url" only),
                  "against": "<collection>" — the eval-set collection a
                  "decontaminate" run scrubs k-gram overlaps with
                  ("eval_column" selects its text column, default
                  payload; min_tokens defaults to the published 13;
                  "method": "ngram" (default, span removal) |
                  "embedding" — DROP rows within "threshold" cosine
                  (default 0.95) of any eval vector, the paraphrase-
                  robust scrub n-grams miss),
                  "dry_run": False — when True, NO rewrite happens: the
                  result DataFrame reports the ids that would be removed
                  (for "spans": the (id, span_start, span_end, n_tokens)
                  ranges that would be cut) — inspect-first maintenance,
                  "column": "payload" (text strategies),
                  "threshold": strategy-specific similarity cutoff,
                  "k": cluster count (semdedup, default 8),
                  "since_version": V — INCREMENTAL dedup: rows already
                  present in snapshot V are ESTABLISHED and are never
                  dropped; only rows appended after V may drop, when
                  they duplicate an established row or an earlier delta
                  row. This makes dedup MONOTONE: re-running after each
                  append never flips a past survivor (append-order
                  reproducibility — at 100 TB you dedup the 1 GB delta
                  against the corpus, not the corpus against itself, and
                  yesterday's training manifest stays valid). Established
                  x established candidate pairs are pruned before
                  verification-closure; supported for exact/minhash/
                  simhash/embedding/winnow (semdedup's rank and spans'
                  text rewriting are corpus-global — loudly rejected)}
        - exact:      sha2 of normalized text, keep min id. Deterministic.
        - url:        keep-first by NORMALIZED URL from meta[url_key]
                      (functions/url.py spec: case/port/fragment/
                      tracking-param/trailing-slash canonicalization) —
                      the C4/CCNet web-corpus step that dedups refetches
                      of the same logical page before any text compares.
                      Rows whose URL is absent or unparseable keep a NULL
                      key and always survive (a malformed URL is no
                      evidence two rows are the same page).
        - minhash:    MinHash-LSH candidates ≥ threshold Jaccard (default .8)
        - simhash:    SimHash pairs within Hamming distance (default 3)
        - embedding:  LSH-bucketed cosine near-dups ≥ threshold (default .99)
        - semdedup:   SemDeDup (Abbas et al. 2023): k-means cluster the
                      embeddings (deterministic bounded-sample training),
                      then drop rows within threshold cosine (default
                      .99) of an earlier-ranked member of the SAME
                      cluster (rank = centroid cosine desc, id) — the
                      data-adaptive blocking for semantic dedup. Drop
                      decisions use exact float64 cosines; clustering
                      only scopes the candidates. Works on any orderable
                      id type directly (no hash mapping needed).
        - spans:      exact-substring span REMOVAL (Lee et al. 2022):
                      rows are kept but every maximal duplicated token
                      range of ≥ min_tokens (default 8) that also occurs
                      elsewhere in the collection is cut out of the text
                      column, every occurrence (the released tool's
                      default). The only strategy that rewrites text
                      instead of dropping rows; reports n_cut_tokens.
                      {"min_tokens": N, "scope": "cross_doc"|"any"}
        - lines:      CCNet-style corpus-global LINE dedup: every line
                      whose normalized form (lowercase, digits→0,
                      letters-only) occurs elsewhere in the collection is
                      cut from all but its first occurrence — the
                      boilerplate (navbar/footer/banner) killer. Rewrites
                      text like "spans"; reports n_cut_lines.
                      {"min_chars": N — normalized-length exemption}
        - winnow:     MOSS winnowing-fingerprint overlap ≥ threshold
                      (default .5 of the smaller doc's fingerprints) —
                      the contiguous-passage/boilerplate signal that
                      set-similarity misses; fingerprint matches ARE
                      shared substrings, so no post-verification pass
                      is needed (md5-collision odds aside)
        For the near-dup strategies every pair is exact-verified before a
        row is dropped, and the keep-rule is TRANSITIVE: pairs are closed
        into connected components (operators.dedup.connected_components,
        large-star/small-star) and only the smallest id of each component
        survives. Pairwise "drop the larger id of each pair" would leave
        a local-minimum id alive when its only links run through larger
        intermediaries (B-C-A with C largest keeps both A and B) — the
        exact transitivity gap component closure exists to fix.

        ``keep`` (near-dup strategies only): "first" (default — smallest
        id survives) or "best" — the highest-SCORING member of each
        component survives (ties → smallest id). Score is ``score``: a
        numeric column of the collection if named, else the built-in
        ``quality_score`` of the text column. Keep-best is the curation
        rule real pipelines want — near-dup clusters usually contain one
        clean page and N boilerplate-wrapped copies, and keep-first
        throws away the clean one whenever a wrapper crawled earlier.
        Rejected with ``since_version``: best-of-cluster is a corpus-
        global rank, and a better-scoring late arrival would evict an
        established survivor, breaking incremental monotonicity.
        """
        from pyspark.sql import functions as F

        col = self._require_collection(collection)
        opts = dict(arg) if isinstance(arg, dict) else ({"strategy": arg} if arg else {})
        strategy = (opts.get("strategy") or "exact").lower()
        # Validate the strategy name FIRST (r11 review): a typo used to
        # pay the full-corpus count — and on non-integral-id collections
        # the xxhash64 collision-check jobs — before erroring.
        _strategies = (
            "exact", "url", "minhash", "simhash", "embedding", "semdedup",
            "winnow", "imagehash", "audiohash", "spans", "lines",
            "decontaminate",
        )
        if strategy not in _strategies:
            raise CommandArgError(
                f"unknown dedup strategy {strategy!r}; expected one of "
                f"{sorted(_strategies)}"
            )
        text_col = opts.get("column", "payload")
        # dry_run: report what WOULD be removed (drop ids; for spans, the
        # span ranges) without committing a rewrite — the inspect-first
        # step of any corpus-maintenance run against a large collection.
        dry_run = bool(opts.get("dry_run", False))
        df = col.read()
        before = df.count()
        # keep/score are near-dup-component options; validate them BEFORE
        # any strategy branch returns, so {"strategy": "exact",
        # "keep": "best"} errors loudly instead of silently running
        # keep-first (the user would believe the best-quality duplicate
        # survived when the smallest id did).
        keep_rule = str(opts.get("keep", "first")).lower()
        _near_dup = ("minhash", "simhash", "embedding", "winnow", "imagehash", "audiohash")
        if keep_rule not in ("first", "best"):
            raise CommandArgError(
                f'unknown keep rule {keep_rule!r}; expected "first" or "best"'
            )
        if (keep_rule != "first" or "score" in opts) and strategy not in _near_dup:
            raise CommandArgError(
                f'"keep"/"score" apply only to the near-dup component '
                f"strategies {_near_dup}, not {strategy!r}"
            )
        if "score" in opts and keep_rule != "best":
            # Silently ignoring "score" under the default keep="first"
            # would let a user believe score-based survivor selection ran
            # when smallest-id-wins did (ADVICE r9).
            raise CommandArgError(
                '"score" requires keep="best" — under keep="first" the '
                "score expression would be ignored"
            )
        since_version = opts.get("since_version")
        established = None  # native-id DataFrame of immutable rows
        if since_version is not None:
            if strategy in ("semdedup", "spans", "decontaminate", "lines"):
                raise CommandArgError(
                    f"since_version is not supported for strategy "
                    f"{strategy!r}: its decisions are corpus-global "
                    "(text rewriting breaks the established-rows-never-"
                    "change contract)"
                )
            established = col.read(version=int(since_version)).select("id")

        def dry_result(dropped: DataFrame, extra: dict | None = None) -> CommandResult:
            return CommandResult(
                "DEDUP",
                df=dropped,
                info={
                    "collection": col.name,
                    "strategy": strategy,
                    "dry_run": True,
                    "rows": before,
                    **(extra or {}),
                },
            )

        # Non-integral id schema (ADVICE r7): the near-dup pair generators
        # and component closure run on xxhash64(id) longs; the KEEP
        # decision happens on ORIGINAL ids (min over the native type, so
        # lexicographic for strings — hash order never leaks into
        # semantics). The mapping is collision-CHECKED first: a 64-bit
        # collision would silently fuse two distinct documents.
        # simpleString() names (r11 review: Spark prints 'tinyint'/
        # 'smallint'/'bigint', never 'byte'/'short'/'long' — the wrong
        # names sent small-int-id collections through the hash mapping).
        integral = {"tinyint", "smallint", "int", "bigint"}
        # exact/url dedup on digests and semdedup carries the native id
        # type through its applyInPandas schema — none needs (or uses)
        # the hash mapping, so don't pay the collision-check jobs for them.
        hashed_ids = (
            strategy not in ("exact", "url", "semdedup", "spans", "decontaminate", "lines")
            and df.schema["id"].dataType.simpleString() not in integral
        )
        if hashed_ids:
            mapping = (
                df.select("id")
                .distinct()
                .withColumn("hid", F.xxhash64(F.col("id").cast("string")))
            )
            chk = mapping.agg(
                F.count(F.lit(1)).alias("a"), F.countDistinct("hid").alias("b")
            ).first()
            if chk["a"] != chk["b"]:
                raise CommandArgError(
                    "xxhash64 collision among collection ids; DEDUP needs an "
                    "injective id mapping — use an integral id schema"
                )
            work = df.select(
                F.xxhash64(F.col("id").cast("string")).alias("id"),
                *[c for c in df.columns if c != "id"],
            )
        else:
            work = df

        if strategy == "exact":
            from vrod_spark.operators.dedup import exact_dedup

            if established is not None:
                # Incremental: established rows all survive; a delta row
                # survives iff its digest is new to the established set
                # AND it is the keep-first row within the delta. Digest
                # work is one scan; no established-established pairing.
                fp = F.sha2(F.lower(F.trim(F.col(text_col))), 256)
                est_rows = df.join(established, "id", "left_semi")
                delta_rows = df.join(established, "id", "left_anti")
                est_digests = est_rows.select(fp.alias("_fp")).distinct()
                delta_kept = (
                    exact_dedup(delta_rows, text_col=text_col, id_col="id")
                    .withColumn("_fp", fp)
                    .join(est_digests, "_fp", "left_anti")
                    .drop("_fp")
                )
                survivors = est_rows.unionByName(delta_kept)
            else:
                survivors = exact_dedup(df, text_col=text_col, id_col="id")
            if dry_run:
                dropped = (
                    df.select("id")
                    .join(survivors.select("id"), "id", "left_anti")
                    .orderBy("id")
                )
                return dry_result(dropped)
            n_after = col._rewrite(survivors, "DEDUP", {"strategy": strategy})
            info = {
                "collection": col.name,
                "strategy": strategy,
                "removed": before - n_after,
                "rows": n_after,
            }
            if since_version is not None:
                info["since_version"] = int(since_version)
            return CommandResult("DEDUP", info=info)

        if strategy == "url":
            from vrod_spark.functions.url import url_dedup, url_normalize

            url_key = opts.get("url_key", "url")
            ucol = F.element_at(F.col("meta"), F.lit(url_key))
            ukey = F.md5(url_normalize(ucol))  # NULL when absent/malformed

            def _url_keep_first(frame: DataFrame) -> DataFrame:
                # One keep-first implementation repo-wide: project the
                # meta key to a column and run functions/url.url_dedup
                # (window on the normalized digest, NULL keys isolated).
                return url_dedup(
                    frame.withColumn(
                        "__url", F.element_at(F.col("meta"), F.lit(url_key))
                    ),
                    url_col="__url",
                    id_col="id",
                ).drop("__url")

            if established is not None:
                # Incremental mirror of the exact branch: established rows
                # all survive; a delta row survives iff its URL key is new
                # to the established set AND it is keep-first in the delta.
                est_rows = df.join(established, "id", "left_semi")
                delta_rows = df.join(established, "id", "left_anti")
                est_keys = (
                    est_rows.select(ukey.alias("_uk"))
                    .where(F.col("_uk").isNotNull())
                    .distinct()
                )
                delta_kept = (
                    _url_keep_first(delta_rows)
                    .withColumn("_uk", ukey)
                    .join(est_keys, "_uk", "left_anti")
                    .drop("_uk")
                )
                survivors = est_rows.unionByName(delta_kept)
            else:
                survivors = _url_keep_first(df)
            if dry_run:
                dropped = (
                    df.select("id")
                    .join(survivors.select("id"), "id", "left_anti")
                    .orderBy("id")
                )
                return dry_result(dropped)
            n_after = col._rewrite(survivors, "DEDUP", {"strategy": strategy})
            info = {
                "collection": col.name,
                "strategy": strategy,
                "removed": before - n_after,
                "rows": n_after,
            }
            if since_version is not None:
                info["since_version"] = int(since_version)
            return CommandResult("DEDUP", info=info)

        if strategy == "semdedup":
            from vrod_spark.operators.cluster import kmeans_train, semantic_dedup

            vecs = df.select("id", "embedding")
            k = int(opts.get("k", 8))
            cents = kmeans_train(vecs, k, vec_col="embedding")
            marked = semantic_dedup(
                vecs,
                cents,
                vec_col="embedding",
                id_col="id",
                min_cosine=float(opts.get("threshold", 0.99)),
            )
            drop_ids = marked.filter(~F.col("kept")).select("id")
            if dry_run:
                return dry_result(drop_ids.orderBy("id"), {"clusters": k})
            survivors = df.join(drop_ids, "id", "left_anti")
            n_after = col._rewrite(
                survivors, "DEDUP", {"strategy": strategy, "k": k}
            )
            return CommandResult(
                "DEDUP",
                info={
                    "collection": col.name,
                    "strategy": strategy,
                    "clusters": k,
                    "removed": before - n_after,
                    "rows": n_after,
                },
            )

        if strategy == "spans":
            from vrod_spark.operators.dedup import remove_duplicate_spans

            if dry_run:
                from vrod_spark.operators.dedup import duplicate_spans

                report = duplicate_spans(
                    df,
                    text_col=text_col,
                    id_col="id",
                    min_tokens=int(opts.get("min_tokens", 8)),
                    scope=opts.get("scope", "cross_doc"),
                    mark_join=opts.get("mark_join", "broadcast"),
                ).orderBy("id", "span_start")
                return dry_result(report)
            rewritten = remove_duplicate_spans(
                df,
                text_col=text_col,
                id_col="id",
                min_tokens=int(opts.get("min_tokens", 8)),
                scope=opts.get("scope", "cross_doc"),
                mark_join=opts.get("mark_join", "broadcast"),
            )
            # Verb-level accounting needs the cut total BEFORE the
            # schema-stable rewrite drops the column. Two executions of
            # the span pipeline at verb granularity — acceptable for a
            # lifecycle command; a pipeline caller wanting one pass uses
            # remove_duplicate_spans directly.
            n_cut = rewritten.agg(F.sum("n_cut_tokens")).first()[0] or 0
            survivors = rewritten.drop("n_cut_tokens")
            n_after = col._rewrite(survivors, "DEDUP", {"strategy": strategy})
            return CommandResult(
                "DEDUP",
                info={
                    "collection": col.name,
                    "strategy": strategy,
                    "removed": before - n_after,
                    "n_cut_tokens": int(n_cut),
                    "rows": n_after,
                },
            )

        if strategy == "lines":
            from vrod_spark.operators.dedup import dedup_lines

            unit = str(opts.get("unit", "line")).lower()
            if unit not in ("line", "paragraph"):
                raise CommandArgError(
                    f'unknown lines unit {unit!r}; expected "line" or '
                    '"paragraph" (CCNet §3.1 granularity)'
                )
            kw = dict(
                text_col=text_col,
                id_col="id",
                min_chars=int(opts.get("min_chars", 1)),
                unit=unit,
            )
            rewritten = dedup_lines(df, **kw)
            if dry_run:
                report = (
                    rewritten.filter(F.col("n_cut_lines") > 0)
                    .select("id", "n_cut_lines")
                    .orderBy("id")
                )
                return dry_result(report)
            n_cut = rewritten.agg(F.sum("n_cut_lines")).first()[0] or 0
            survivors = rewritten.drop("n_cut_lines")
            n_after = col._rewrite(survivors, "DEDUP", {"strategy": strategy})
            return CommandResult(
                "DEDUP",
                info={
                    "collection": col.name,
                    "strategy": strategy,
                    "removed": before - n_after,
                    "n_cut_lines": int(n_cut),
                    "rows": n_after,
                },
            )

        if strategy == "decontaminate":
            from vrod_spark.operators.dedup import (
                contaminated_span_arrays,
                decontaminate_spans,
            )

            against = opts.get("against")
            if not against:
                raise CommandArgError(
                    'strategy "decontaminate" needs {"against": "<collection '
                    "holding the eval set>\"}"
                )
            eval_df = self._require_collection(str(against)).read()
            method = str(opts.get("method", "ngram")).lower()
            if method == "embedding":
                # Embedding-space decontamination: DROP any row whose
                # vector sits within `threshold` cosine of ANY eval
                # vector (paraphrased eval items share no 13-gram but
                # sit at cosine ~0.9+ of their source). The eval matrix
                # is driver-bounded by the same contract as k-means
                # centroids; one broadcast + one Arrow stage, only
                # (id, double) ever shuffles.
                import numpy as np

                from vrod_spark.operators.cluster import (
                    semantic_contamination_scores,
                )

                threshold = float(opts.get("threshold", 0.95))
                # A text-only collection on either side must be a typed
                # command error, not a raw AnalysisException (ADVICE r9).
                if "embedding" not in eval_df.columns:
                    raise CommandArgError(
                        f"eval collection {against!r} has no 'embedding' "
                        'column — method="embedding" decontamination needs '
                        "embedded rows on both sides"
                    )
                if "embedding" not in df.columns:
                    raise CommandArgError(
                        f"collection {col.name!r} has no 'embedding' column "
                        'for method="embedding" decontamination'
                    )
                ev = np.array(
                    [
                        r[0]
                        for r in eval_df.select("embedding")
                        .filter(F.col("embedding").isNotNull())
                        .collect()
                    ],
                    dtype=np.float64,
                )
                if not len(ev):
                    raise CommandArgError(
                        f"eval collection {against!r} has no embeddings to "
                        "decontaminate against"
                    )
                scored, ev_bc = semantic_contamination_scores(
                    df, ev, return_broadcast=True
                )
                if dry_run:
                    report = (
                        scored.filter(F.col("max_eval_cos") >= threshold)
                        .select(
                            "id", F.round("max_eval_cos", 6).alias("max_eval_cos")
                        )
                        .orderBy("id")
                    )
                    return dry_result(report, {"against": str(against)})
                survivors = scored.filter(
                    (F.col("max_eval_cos") < threshold)
                    | F.col("max_eval_cos").isNull()
                ).drop("max_eval_cos")
                n_after = col._rewrite(survivors, "DEDUP", {"strategy": strategy})
                # The rewrite executed the scoring plan; the eval matrix
                # no longer needs to sit in executor memory. (The dry_run
                # path returns a LAZY report and must keep it alive.)
                ev_bc.unpersist()
                return CommandResult(
                    "DEDUP",
                    info={
                        "collection": col.name,
                        "strategy": strategy,
                        "method": method,
                        "against": str(against),
                        "removed": before - n_after,
                        "rows": n_after,
                    },
                )
            if method != "ngram":
                raise CommandArgError(
                    f'unknown decontaminate method {method!r}; expected '
                    '"ngram" or "embedding"'
                )
            kw = dict(
                text_col=text_col,
                id_col="id",
                eval_text_col=opts.get("eval_column", "payload"),
                min_tokens=int(opts.get("min_tokens", 13)),
                mark_join=opts.get("mark_join", "broadcast"),
            )
            if dry_run:
                report = (
                    contaminated_span_arrays(df, eval_df, **kw)
                    .select("id", F.explode("spans").alias("s"))
                    .select("id", "s.span_start", "s.span_end", "s.n_tokens")
                    .orderBy("id", "span_start")
                )
                return dry_result(report, {"against": str(against)})
            rewritten = decontaminate_spans(df, eval_df, **kw)
            n_cut = rewritten.agg(F.sum("n_cut_tokens")).first()[0] or 0
            survivors = rewritten.drop("n_cut_tokens")
            n_after = col._rewrite(survivors, "DEDUP", {"strategy": strategy})
            return CommandResult(
                "DEDUP",
                info={
                    "collection": col.name,
                    "strategy": strategy,
                    "against": str(against),
                    "removed": before - n_after,
                    "n_cut_tokens": int(n_cut),
                    "rows": n_after,
                },
            )

        # keep_rule was parsed and range-checked before the strategy
        # branches; the remaining checks need df/since_version context.
        if keep_rule == "best" and since_version is not None:
            raise CommandArgError(
                'keep="best" is not supported with since_version: best-of-'
                "cluster is a corpus-global rank — a better-scoring late "
                "arrival would evict an established survivor"
            )
        score_name = opts.get("score")
        if keep_rule == "best":
            if score_name is not None and str(score_name) not in df.columns:
                raise CommandArgError(
                    f"score column {score_name!r} not in collection columns "
                    f"{df.columns}"
                )
            if score_name is None and strategy in ("imagehash", "audiohash"):
                # The quality_score fallback is a TEXT heuristic; ranking
                # duplicate images/audio by the byte blob cast to string
                # would pick survivors by mojibake statistics.
                raise CommandArgError(
                    f'keep="best" on {strategy!r} needs an explicit "score" '
                    "column (the text-quality fallback is meaningless for "
                    "binary media columns)"
                )
            if score_name is None and text_col not in df.columns:
                raise CommandArgError(
                    f'keep="best" needs either a "score" column or a text '
                    f"column {text_col!r} to derive quality from"
                )

        # Incremental: delta ids in the work-id space. minhash/embedding
        # take them INSIDE candidate generation (pair expansion becomes
        # O(delta x bucket), not O(bucket²)); simhash/winnow get a
        # post-generation pair filter below.
        delta_work = None
        if established is not None:
            est_work_ids = (
                established.select(
                    F.xxhash64(F.col("id").cast("string")).alias("id")
                )
                if hashed_ids
                else established
            )
            delta_work = work.select("id").join(est_work_ids, "id", "left_anti")

        if strategy == "minhash":
            from vrod_spark.operators.dedup import minhash_lsh_pairs

            pairs = minhash_lsh_pairs(
                work,
                text_col=text_col,
                id_col="id",
                min_jaccard=float(opts.get("threshold", 0.8)),
                delta_ids=delta_work,
            )
        elif strategy == "simhash":
            from vrod_spark.operators.dedup import simhash_pairs

            pairs = simhash_pairs(
                work,
                text_col=text_col,
                id_col="id",
                max_hamming=int(opts.get("threshold", 3)),
                delta_ids=delta_work,
            )
        elif strategy == "embedding":
            from vrod_spark.operators.dedup import embedding_near_dup_bucketed

            pairs = embedding_near_dup_bucketed(
                work.select("id", "embedding"),
                vec_col="embedding",
                id_col="id",
                min_cosine=float(opts.get("threshold", 0.99)),
                delta_ids=delta_work,
            )
        elif strategy == "winnow":
            from vrod_spark.operators.dedup import winnow_overlap_pairs

            pairs = winnow_overlap_pairs(
                work,
                text_col=text_col,
                id_col="id",
                min_shared=int(opts.get("min_shared", 3)),
                delta_ids=delta_work,
            ).filter(F.col("overlap") >= float(opts.get("threshold", 0.5))).select(
                "id_a", "id_b"
            )
        elif strategy == "imagehash":
            # Perceptual image dedup: dHash each blob (re-encodes hash
            # equal; small edits land within a few Hamming bits), then
            # the shared pigeonhole band join. threshold = max Hamming
            # distance (default 6). Only (id, 8-byte hash) ever
            # shuffles; blobs stay in their scan tasks.
            from vrod_spark.operators.dedup import hamming64_pairs
            from vrod_spark.operators.multimodal import image_dhash

            max_ham = int(opts.get("threshold", 6))
            if not 0 <= max_ham < 16:
                raise CommandArgError(
                    f"imagehash threshold must be in [0, 16), got {max_ham} "
                    "(the 16-band pigeonhole join guarantees recall only "
                    "below the band count)"
                )
            sigs = image_dhash(
                work.select(
                    F.col("id").alias("media_id"),
                    F.col(text_col).alias("content"),
                ),
                on_error=str(opts.get("on_error", "raise")),
            )
            pairs = hamming64_pairs(
                sigs.select("media_id", "dhash"),
                sig_col="dhash",
                id_col="media_id",
                max_hamming=max_ham,
                # bands must exceed max_hamming for the pigeonhole
                # guarantee; 8 or 16 both divide 64 exactly.
                bands=16 if max_ham >= 8 else 8,
                # Incremental: only pairs touching the delta generate
                # (O(delta x bucket)); established x established never
                # exist, so no post-closure pruning is needed.
                delta_ids=delta_work,
            ).select("id_a", "id_b")
        elif strategy == "audiohash":
            # Perceptual audio dedup: Haitsma-Kalker-style band-energy
            # sign fingerprint (re-encodes/amplitude scaling land within
            # a few Hamming bits), same band join as imagehash.
            from vrod_spark.operators.dedup import hamming64_pairs
            from vrod_spark.operators.multimodal import audio_fingerprint

            max_ham = int(opts.get("threshold", 6))
            if not 0 <= max_ham < 16:
                raise CommandArgError(
                    f"audiohash threshold must be in [0, 16), got {max_ham} "
                    "(the 16-band pigeonhole join guarantees recall only "
                    "below the band count)"
                )
            sigs = audio_fingerprint(
                work.select(
                    F.col("id").alias("media_id"),
                    F.col(text_col).alias("content"),
                ),
                on_error=str(opts.get("on_error", "raise")),
            )
            pairs = hamming64_pairs(
                sigs.select("media_id", "fp"),
                sig_col="fp",
                id_col="media_id",
                max_hamming=max_ham,
                bands=16 if max_ham >= 8 else 8,
                delta_ids=delta_work,
            ).select("id_a", "id_b")
        else:
            raise CommandArgError(
                f"unknown dedup strategy {strategy!r}; expected "
                "exact/url/minhash/simhash/embedding/semdedup/winnow/"
                "imagehash/audiohash/spans/lines/decontaminate"
            )

        # Keep-first, transitively: close the verified pairs into
        # connected components and keep only each component's minimum id.
        from vrod_spark.operators.dedup import connected_components

        comps = connected_components(pairs, src_col="id_a", dst_col="id_b")
        if hashed_ids:
            # Translate components back to original ids and keep the min
            # ORIGINAL id per component (NOT the min hash).
            labeled = mapping.join(
                comps, mapping["hid"] == comps["id"], "inner"
            ).select(mapping["id"].alias("oid"), "component")
        else:
            labeled = comps.select(F.col("id").alias("oid"), "component")
        if established is not None:
            # Established rows are immune; a component containing any
            # established member drops ALL its delta members (they
            # duplicate corpus content that already won), otherwise the
            # smallest ORIGINAL delta id survives.
            labeled = labeled.join(
                established.select(F.col("id").alias("oid"), F.lit(True).alias("_est")),
                "oid",
                "left",
            ).withColumn("_est", F.coalesce("_est", F.lit(False)))
            aggd = labeled.groupBy("component").agg(
                F.max(F.col("_est").cast("int")).alias("_has_est"),
                F.min(F.when(~F.col("_est"), F.col("oid"))).alias("_min_delta"),
            )
            drop_ids = (
                labeled.join(aggd, "component")
                .filter(
                    ~F.col("_est")
                    & ((F.col("_has_est") == 1) | (F.col("oid") != F.col("_min_delta")))
                )
                .select(F.col("oid").alias("id"))
            )
        elif keep_rule == "best":
            # Highest score per component survives (tie -> smallest id).
            # One row_number window over the component key — components
            # are tiny relative to the corpus (only near-dup members ever
            # reach this join), so the extra shuffle is on the duplicate
            # sliver, not the collection.
            from pyspark.sql import Window

            from vrod_spark.functions.text import quality_score

            score_expr = (
                F.col(str(score_name)).cast("double")
                if score_name is not None
                else quality_score(F.col(text_col))
            )
            scores = df.select(F.col("id").alias("oid"), score_expr.alias("_score"))
            w = Window.partitionBy("component").orderBy(
                F.col("_score").desc_nulls_last(), F.col("oid")
            )
            drop_ids = (
                labeled.join(scores, "oid")
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") > 1)
                .select(F.col("oid").alias("id"))
            )
        elif hashed_ids:
            keep = labeled.groupBy("component").agg(F.min("oid").alias("keep_id"))
            drop_ids = (
                labeled.join(keep, "component")
                .filter(F.col("oid") != F.col("keep_id"))
                .select(F.col("oid").alias("id"))
            )
        else:
            # Integral ids: the component label IS the min member id.
            drop_ids = comps.filter(F.col("component") != F.col("id")).select("id")
        if dry_run:
            return dry_result(drop_ids.orderBy("id"))
        survivors = df.join(drop_ids, "id", "left_anti")
        n_after = col._rewrite(survivors, "DEDUP", {"strategy": strategy})
        info = {
            "collection": col.name,
            "strategy": strategy,
            "removed": before - n_after,
            "rows": n_after,
        }
        if since_version is not None:
            info["since_version"] = int(since_version)
        return CommandResult("DEDUP", info=info)

    def _reindex(self, collection: str | None, arg: Any) -> CommandResult:
        """REINDEX (builder.rs:73-76): rebuild the ANN index and rewrite
        the snapshot bucket-partitioned. ``arg={"kind": "ivf", ...}``
        selects the centroid-partitioned IVF index (operators.ivf);
        default is data-oblivious sign-LSH (operators.ann)."""
        col = self._require_collection(collection)
        if col.meta.get("partition_by"):
            # An ANN index rewrites the snapshot bucket-partitioned, which
            # would destroy the meta-key partition layout. One physical
            # clustering per collection — declared, not silently replaced.
            raise CommandArgError(
                "REINDEX is not supported on a partition_by collection: the "
                "bucket layout would replace the pk= partition layout. "
                "Create a separate unpartitioned collection for ANN search."
            )
        opts = dict(arg) if isinstance(arg, dict) else {}
        kind = opts.pop("kind", "sign_lsh")
        if kind == "ivf":
            from vrod_spark.operators.ivf import reindex_ivf

            info = reindex_ivf(col, **opts)
        elif kind == "pq":
            from vrod_spark.operators.pq import reindex_pq

            info = reindex_pq(col, **opts)
        elif kind == "ivfpq":
            from vrod_spark.operators.pq import reindex_ivfpq

            info = reindex_ivfpq(col, **opts)
        elif kind == "sign_lsh":
            from vrod_spark.operators.ann import reindex_collection

            info = reindex_collection(col, **opts)
        else:
            raise CommandArgError(
                f"unknown index kind {kind!r}; expected "
                "'sign_lsh', 'ivf', 'pq' or 'ivfpq'"
            )
        # SURVEY §4.2: ANALYZE after REINDEX — the rewrite changed the
        # physical layout (and registered any previous stats stale).
        # Best-effort for the same post-commit reason as BULKINSERT.
        try:
            col.analyze()
        except Exception as exc:  # noqa: BLE001
            info = {**info, "stats_error": f"{type(exc).__name__}: {exc}"}
        return CommandResult("REINDEX", info=info)

    def _analyze(self, collection: str | None, arg: Any) -> CommandResult:
        """ANALYZE [--collection c] [{"columns": [...]}]: compute catalog
        statistics for CBO (Collection.analyze). Extension verb beyond the
        reference's 11 (its planner has no stats notion to port)."""
        col = self._require_collection(collection)
        opts = dict(arg) if isinstance(arg, dict) else {}
        stats = col.analyze(columns=opts.get("columns"))
        return CommandResult("ANALYZE", info={"collection": col.name, **stats})

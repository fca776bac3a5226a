"""CLI — flag-for-flag parity with the reference's entry point
(/root/reference/src/main.rs:11-40), executed against the Spark engine.

Reference flags (clap derive, main.rs:19-33) → here:

    --database PATH            (main.rs:21)    target database to load
    --collection NAME          (main.rs:22-23) target collection
    --execute VERB             (main.rs:24-26) command verb
    --command-arg ARG          (main.rs:27-29) command argument
    --init-database PATH       (main.rs:30-31) create a database under PATH
    --init-database-name NAME  (main.rs:32-33 analog of the name flag)
    --generate-embeddings N    (main.rs:32-33) run the embedding pipeline

Dispatch order matches main.rs:42-77: generate-embeddings short-circuits
(main.rs:46-49), then init-database (main.rs:51-62, requiring the name
flag else the MissingInitDatabaseNameFlag error, main.rs:36-40), then the
command path (main.rs:64-74 — the part the reference left as todo!(),
made real here).
"""

from __future__ import annotations

import argparse
import json
import sys

from vrod_spark.errors import VrodError


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vrod-spark",
        description="PySpark-native vRod engine (reference CLI parity)",
    )
    p.add_argument("--database", help="path of the database to load")
    p.add_argument("--collection", help="collection name")
    p.add_argument("-e", "--execute", help="command verb (CREATE/INSERT/SEARCH/...)")
    p.add_argument("-a", "--command-arg", dest="command_arg", help="command argument")
    p.add_argument("--init-database", dest="init_database", help="parent dir for a new database")
    p.add_argument(
        "--init-database-name", dest="init_database_name", help="name for the new database"
    )
    p.add_argument(
        "--generate-embeddings",
        dest="generate_embeddings",
        type=int,
        help="embed the first N words of the corpus file",
    )
    p.add_argument("--corpus", default="alice_in_wonderland.txt",
                   help="corpus path for --generate-embeddings (reference hardcodes "
                        "alice_in_wonderland.txt, embeddings.rs:8)")
    p.add_argument("--output", default="alice_embeddings.txt",
                   help="vector sink path (embeddings.rs:53)")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)

    def _spark():
        # Lazy: error/help paths must not pay a JVM launch, and argument
        # validation runs before any session exists (r11 review).
        nonlocal spark
        if spark is None:
            from vrod_spark.session import get_spark

            spark = get_spark("vrod-spark-cli")
        return spark

    # 1. --generate-embeddings short-circuit (main.rs:46-49)
    if args.generate_embeddings is not None:
        if args.generate_embeddings < 0:
            print("error: --generate-embeddings takes N >= 0", file=sys.stderr)
            return 2
        from vrod_spark.pipeline import embed_corpus, embedding_stats
        from vrod_spark.sources.vectors_txt import write_vectors_txt

        df = embed_corpus(_spark(), args.corpus, limit=args.generate_embeddings)
        # ONE pipeline execution for stats + sink: the embed UDF is the
        # expensive stage (real-model inference), and unpersisted it ran
        # once for embedding_stats and again for the write (r11 review).
        df = df.persist()
        try:
            stats = embedding_stats(df)
            write_vectors_txt(df, args.output, single_file=True)
        finally:
            df.unpersist()
        print(json.dumps({"embeddings": stats, "output": args.output}))
        return 0

    # 2. --init-database (main.rs:51-62)
    if args.init_database is not None:
        if not args.init_database_name:
            # main.rs:36-40 MissingInitDatabaseNameFlag
            print("error: --init-database requires --init-database-name", file=sys.stderr)
            return 2
        from vrod_spark.engine import Engine

        try:
            eng = Engine.create(_spark(), args.init_database, args.init_database_name)
        except VrodError as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 1
        print(json.dumps({"created": eng.db.path}))
        return 0

    # 3. command path (main.rs:64-74, unwired in the reference)
    if args.database and args.execute:
        from vrod_spark.engine import Engine

        # JSON-looking command args parse into dicts/lists so the full
        # engine arg surface (CREATE {"partition_by": ...}, INSERT
        # [{record}, ...], UPDATE {"where": ..., "set": ...}) is reachable
        # from the shell; anything else stays a plain string (predicates,
        # "v1,v2;k=5" vectors, file paths).
        arg = args.command_arg
        if isinstance(arg, str) and arg.lstrip()[:1] in ("{", "["):
            try:
                arg = json.loads(arg)
            except ValueError:
                pass
        try:
            eng = Engine.load(_spark(), args.database)
            result = eng.execute(
                args.execute, collection=args.collection, arg=arg
            )
        except VrodError as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 1
        if result.df is not None:
            rows = [r.asDict(recursive=True) for r in result.df.collect()]
            print(json.dumps({"verb": result.verb, "rows": rows}, default=str))
        else:
            print(json.dumps({"verb": result.verb, "info": result.info}, default=str))
        return 0

    build_parser().print_help()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())

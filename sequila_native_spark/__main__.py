"""CLI entry point — the ``sequila-cli`` analogue.

The reference ships ``sequila-cli`` (``sequila-cli/src/main.rs:33-61``), a
datafusion-cli wrapper whose only job is starting a session with the sequila
extensions installed and feeding it SQL files / an interactive prompt. The
Spark equivalent:

    python -m sequila_native_spark -f queries/q1.sql
    python -m sequila_native_spark -e "SELECT ..." [-e "..."]
    python -m sequila_native_spark            # interactive: ';'-terminated

Scripts get the full surface of :func:`sequila_native_spark.run_sql_script`:
SET sequila.* knobs, CREATE EXTERNAL TABLE, and the interval-join rewrite on
every query statement.
"""

from __future__ import annotations

import argparse
import sys


def _show(df) -> None:
    if df is not None:
        df.show(100, truncate=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="sequila-spark",
        description="Run SQL through the sequila-native-spark engine "
                    "(also invocable as: python -m sequila_native_spark).",
    )
    from sequila_native_spark import __version__

    ap.add_argument("--version", action="version",
                    version=f"sequila-native-spark {__version__}")
    ap.add_argument("-f", "--file", action="append", default=[],
                    help="SQL script file to execute (repeatable)")
    ap.add_argument("-e", "--execute", action="append", default=[],
                    help="SQL text to execute (repeatable)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--bin-width", type=int, default=None,
                    help="fixed interval-join bin width (default: engine auto)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from sequila_native_spark import sequila_session
    from sequila_native_spark.sql import run_sql_file, run_sql_script

    spark = sequila_session(
        SparkSession.builder.master(args.master).appName("sequila-cli").getOrCreate(),
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.bin_width is not None:
        spark.conf.set("spark.sequila.intervalJoinBinWidth", str(args.bin_width))

    try:
        for path in args.file:
            _show(run_sql_file(spark, path))
        for text in args.execute:
            _show(run_sql_script(spark, text))
        if not args.file and not args.execute:
            print("sequila-native-spark SQL shell — end statements with ';', "
                  "Ctrl-D to exit", file=sys.stderr)
            buf: list[str] = []
            for line in sys.stdin:
                buf.append(line)
                if line.rstrip().endswith(";"):
                    stmt = "".join(buf)
                    buf = []
                    try:
                        _show(run_sql_script(spark, stmt))
                    except Exception as exc:  # keep the shell alive
                        print(f"error: {exc}", file=sys.stderr)
            if "".join(buf).strip():
                _show(run_sql_script(spark, "".join(buf)))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

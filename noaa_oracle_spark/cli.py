"""CLI twin of the reference's engine-relevant REST endpoints.

A user of the reference queries `GET /stations/...` over HTTP; here the
same requests are CLI subcommands printing one JSON object per row
(JSON-lines — the streaming-friendly shape of the handlers' Json(Vec<row>)
responses):

    python -m noaa_oracle_spark.cli stations            --data-dir D
    python -m noaa_oracle_spark.cli observations        --data-dir D \
        --stations KATL,KBOS --start 2026-01-15T00:00:00Z \
        --end 2026-01-18T00:00:00Z [--temperature-unit fahrenheit]
    python -m noaa_oracle_spark.cli daily-observations  ... (same params)
    python -m noaa_oracle_spark.cli forecasts           ... (+ --generated-start/--generated-end)
    python -m noaa_oracle_spark.cli files               --data-dir D [--start --end]
    python -m noaa_oracle_spark.cli raw                 --data-dir D --sql "SELECT ..."

`raw` registers the observations/forecasts views the way the browser page
does (raw_data.js:199-218) and accepts DuckDB-dialect SQL via the rewriter.

    python -m noaa_oracle_spark.cli serve --data-dir D [--host H --port P]

runs the stdlib HTTP twin (http_service.py) of the reference's actual
server — same routes, same request/response shapes.

    python -m noaa_oracle_spark.cli explain --query q57_shipping_priority \
        [--sf-dir /root/testdata/sf0.001] [--mode formatted]

prints any suite query's plan — the scale-review loop (PushedFilters,
ReadSchema width, broadcast vs sort-merge joins, exchange count) as a
one-liner instead of a python snippet.
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime

from noaa_oracle_spark import service
from noaa_oracle_spark.sources.catalog import parse_rfc3339


def _add_common(p: argparse.ArgumentParser, times: bool = True) -> None:
    p.add_argument("--data-dir", required=True)
    if times:
        p.add_argument("--stations", help="comma-separated station ids")
        p.add_argument("--start", help="RFC3339")
        p.add_argument("--end", help="RFC3339")
        p.add_argument("--temperature-unit", choices=["celsius", "fahrenheit"])


def _ts(s: str | None) -> datetime | None:
    return parse_rfc3339(s) if s else None


def _stations_list(s: str | None) -> list[str] | None:
    # CSV split, same as weather_routes.rs:60-67
    return [x.strip() for x in s.split(",") if x.strip()] if s else None


def _emit(df, limit: int | None) -> None:
    rows = df.limit(limit).collect() if limit else df.collect()
    for r in rows:
        print(json.dumps(r.asDict(recursive=True), default=str))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="noaa-oracle-spark")
    ap.add_argument("--limit", type=int, help="cap emitted rows")
    sub = ap.add_subparsers(dest="cmd", required=True)

    _add_common(sub.add_parser("stations"), times=False)
    _add_common(sub.add_parser("observations"))
    _add_common(sub.add_parser("daily-observations"))
    fc = sub.add_parser("forecasts")
    _add_common(fc)
    fc.add_argument("--generated-start")
    fc.add_argument("--generated-end")
    fl = sub.add_parser("files")
    fl.add_argument("--data-dir", required=True)
    fl.add_argument("--start")
    fl.add_argument("--end")
    raw = sub.add_parser("raw")
    raw.add_argument("--data-dir", required=True)
    raw.add_argument("--sql", required=True)
    sv = sub.add_parser(
        "serve",
        help="run the stdlib HTTP twin of the reference's API "
        "(http_service.py) until interrupted",
    )
    sv.add_argument("--data-dir", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    ex = sub.add_parser(
        "explain",
        help="print a suite query's physical plan (the scale-review tool: "
        "check PushedFilters/ReadSchema/broadcasts/exchange count)",
    )
    ex.add_argument("--query", required=True, help="suite name, e.g. q57_shipping_priority")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )

    args = ap.parse_args(argv)

    if args.cmd == "files":
        for p in service.files_request(
            args.data_dir, _ts(args.start), _ts(args.end)
        ):
            print(json.dumps({"path": p}))
        return 0

    # Spark-backed commands share a session
    from noaa_oracle_spark.session import get_spark

    spark = get_spark(app_name="noaa-oracle-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "stations":
        _emit(service.stations_request(spark, args.data_dir), args.limit)
    elif args.cmd == "observations":
        _emit(
            service.observations_request(
                spark, args.data_dir, _stations_list(args.stations),
                _ts(args.start), _ts(args.end), args.temperature_unit,
            ),
            args.limit,
        )
    elif args.cmd == "daily-observations":
        _emit(
            service.daily_observations_request(
                spark, args.data_dir, _stations_list(args.stations),
                _ts(args.start), _ts(args.end), args.temperature_unit,
            ),
            args.limit,
        )
    elif args.cmd == "forecasts":
        _emit(
            service.forecasts_request(
                spark, args.data_dir, _stations_list(args.stations),
                _ts(args.start), _ts(args.end),
                _ts(args.generated_start), _ts(args.generated_end),
                temperature_unit=args.temperature_unit,
            ),
            args.limit,
        )
    elif args.cmd == "raw":
        from noaa_oracle_spark.sql.rewriter import (
            register_raw_tables,
            run_raw_sql,
        )

        register_raw_tables(spark, args.data_dir)
        _emit(run_raw_sql(spark, args.sql), args.limit)
    elif args.cmd == "serve":
        from noaa_oracle_spark.http_service import make_server

        srv = make_server(spark, args.data_dir, args.host, args.port)
        print(
            json.dumps(
                {"serving": f"http://{args.host}:{srv.server_address[1]}"}
            ),
            flush=True,
        )
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.server_close()
    elif args.cmd == "explain":
        from noaa_oracle_spark.suite import QUERIES as _SUITE_QUERIES
        from noaa_oracle_spark.suite_pipeline import (
            PIPELINE_QUERIES as _PIPELINE_QUERIES,
        )

        qs = {**_SUITE_QUERIES, **_PIPELINE_QUERIES}
        if args.query not in qs:
            print(
                f"unknown query {args.query!r}; one of: "
                + " ".join(sorted(qs)),
                file=sys.stderr,
            )
            return 2
        df = qs[args.query](spark, args.sf_dir)
        df.explain(mode=args.mode)
    return 0


if __name__ == "__main__":
    sys.exit(main())

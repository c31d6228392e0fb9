"""Run the control-plane server standalone:

    python -m tabsdata_spark.api --root /data/warehouse --port 8080

Serves the REST surface (auth/collections/tables/functions/transactions)
over a TableStore at --root, with a local Spark session for table reads.
Functions registered programmatically (PubSubEngine) can be attached by
embedding ApiServer instead; this entry point serves the storage/read
surface, which is what external clients (CLI, SDK) need.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tabsdata-spark-server")
    ap.add_argument("--root", required=True, help="TableStore root directory")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--user", default="admin")
    ap.add_argument("--password", default="tabsdata")
    ap.add_argument("--ssl-cert", default=None,
                    help="PEM cert: serve HTTPS (needs --ssl-key)")
    ap.add_argument("--ssl-key", default=None)
    args = ap.parse_args(argv)

    import tabsdata_spark as td
    from tabsdata_spark.store import TableStore

    from .auth import Authenticator
    from .server import ApiServer

    spark = td.get_spark(app_name="tabsdata-spark-api")
    spark.sparkContext.setLogLevel("WARN")
    store = TableStore(args.root)
    server = ApiServer(spark, store,
                       auth=Authenticator({args.user: args.password}),
                       host=args.host, port=args.port,
                       ssl_cert=args.ssl_cert, ssl_key=args.ssl_key)
    server.start()
    print(f"serving {args.root} at {server.base_url} "
          f"(login: {args.user})", flush=True)
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

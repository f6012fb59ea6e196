"""KV query service: serve LocalTableQuery point lookups over HTTP.

≈ the reference's lookup service (ref:
paimon-service/paimon-service-runtime/.../server/KvQueryServer.java:39
+ client/KvQueryClient.java, messages/KvRequest.java): dedicated
workers hold per-bucket lookup state and answer key requests without
running a batch job; clients route a key to the worker owning its
bucket. The wire protocol here is JSON-over-HTTP (stdlib, in-sandbox)
instead of the reference's netty frames — the routing, sharding and
serving semantics are the parity surface, the byte framing is not.

Sharding follows KvServerHandler: server i of n owns the buckets with
`bucket % n == i`; the client computes the key's bucket with the same
write-path hash the tables use and targets exactly one server.

    addr = serve_table(table, num_servers=2)      # background threads
    client = KvQueryClient(addr)
    row = client.lookup({"id": 42})               # dict or None
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import urlparse
from urllib.request import urlopen

from paimon_spark.query import LocalTableQuery


class KvQueryServer:
    """One shard: answers lookups for buckets with bucket % n == id."""

    def __init__(self, table, server_id: int = 0, num_servers: int = 1,
                 host: str = "127.0.0.1", port: int = 0):
        self.query = LocalTableQuery(table)
        self.server_id, self.num_servers = server_id, num_servers
        query, sid, n = self.query, server_id, num_servers

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):        # quiet
                pass

            def do_POST(self):
                if urlparse(self.path).path != "/lookup":
                    self.send_error(404)
                    return
                body = self.rfile.read(
                    int(self.headers.get("Content-Length", 0)))
                try:
                    key = json.loads(body)
                    bucket = query._bucket_of(key)
                    if bucket % n != sid:
                        # wrong shard: the reference's server rejects
                        # mis-routed requests the same way
                        out = {"error": "wrong-shard",
                               "owner": bucket % n}
                        code = 421
                    else:
                        out = {"row": query.lookup(key)}
                        code = 200
                except Exception as exc:      # noqa: BLE001
                    out, code = {"error": str(exc)}, 400
                payload = json.dumps(out, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.address = f"http://{host}:{self._httpd.server_port}"
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)

    def start(self) -> str:
        self._thread.start()
        return self.address

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


class KvQueryClient:
    """Routes each key to the shard owning its bucket (the client-side
    half of the reference's QueryLocationImpl + KvQueryClient)."""

    def __init__(self, table, addresses: list[str]):
        from paimon_spark.query import LocalTableQuery
        self._router = LocalTableQuery(table)   # hash routing only
        self.addresses = addresses

    def lookup(self, key: dict[str, Any]) -> dict | None:
        bucket = self._router._bucket_of(key)
        addr = self.addresses[bucket % len(self.addresses)]
        req = urlopen(f"{addr}/lookup",
                      data=json.dumps(key, default=str).encode(),
                      timeout=30)
        out = json.loads(req.read())
        return out.get("row")


def serve_table(table, num_servers: int = 1) -> tuple[list, list[str]]:
    """Start `num_servers` shard servers for the table (background
    threads). Returns (servers, addresses); callers stop() the servers.
    (ref: flink/service/QueryService.java — one executor per shard.)"""
    servers = [KvQueryServer(table, i, num_servers)
               for i in range(num_servers)]
    return servers, [s.start() for s in servers]

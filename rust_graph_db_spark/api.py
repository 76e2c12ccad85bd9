"""REST entry point: the reference's social-network API surface over
the Spark engine (SURVEY.md §3.3; reference social-network-api/src —
route table main.rs:61-108, models models/user.rs, models/post.rs).

Route parity (17 routes):

    GET    /health
    POST   /api/v1/users
    GET    /api/v1/users/<username>
    PUT    /api/v1/users/<username>
    DELETE /api/v1/users/<username>
    POST   /api/v1/users/<username>/follow/<target>
    DELETE /api/v1/users/<username>/follow/<target>
    GET    /api/v1/users/<username>/followers
    GET    /api/v1/users/<username>/following
    GET    /api/v1/users/<username>/suggested-friends
    GET    /api/v1/users/<username>/network?other=<username>
    GET    /api/v1/users/<username>/timeline
    POST   /api/v1/posts
    GET    /api/v1/posts/<id>
    DELETE /api/v1/posts/<id>
    POST   /api/v1/posts/<id>/like      body {"username": ...}
    DELETE /api/v1/posts/<id>/like      body {"username": ...}
    GET    /api/v1/posts/<id>/likes

plus two engine extensions: POST /api/v1/admin/commit {"root": path}
durably commits the current graph via storage.save_graph (the reference
persists every mutation through RocksDB; here mutations are the
session WriteBatch and commit is explicit), and POST
/api/v1/admin/cypher {"query": ..., "params": {...}, "limit": n} runs
any (parameterized) Cypher query against the live service graph — the
reference's API layer never exposes its query language.

Architecture: pure-stdlib ``http.server`` (the sandbox ships no web
framework) in front of ``SocialGraphService``, which keeps the graph as
the same DataFrames the X1-X6 library dataflows
(``rust_graph_db_spark.social``) operate on. Serving-path point
lookups (username→id) use a driver-side dict — at scale that becomes
an external KV/index; the ANALYTICS (suggestions, timeline, network)
stay Spark dataflows, which is the part that must scale.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_graph_db_spark import social
from rust_graph_db_spark.model import pack_graphid

USER_LABID = 1
POST_LABID = 2

_USER_SCHEMA = ("id LONG, username STRING, email STRING, "
                "display_name STRING, bio STRING, avatar_url STRING, "
                "created_at LONG")
_POST_SCHEMA = "post_id LONG, author LONG, content STRING, ts LONG"
_EDGE_SCHEMA = "src LONG, dst LONG"


def _has_write_clause(query: str) -> bool:
    """True if the parsed query contains any write clause, at any
    nesting depth (UNION branches, CALL {} subqueries, FOREACH bodies).
    Parse-based, not regex — a property named 'create' or a string
    literal 'DELETE x' must not trip it. Parse errors return False;
    the compiler will surface them with a proper message."""
    from rust_graph_db_spark.parser.ast_nodes import (
        CallSubquery, Create, Delete, Foreach, Merge, Query, SetClause,
        UnionQuery,
    )
    from rust_graph_db_spark.parser.parser import parse_cypher

    def walk(node) -> bool:
        if isinstance(node, UnionQuery):
            return any(walk(p) for p in node.parts)
        if isinstance(node, Query):
            return any(walk(c) for c in node.clauses)
        if isinstance(node, (Create, Merge, Delete, SetClause, Foreach)):
            return True
        if isinstance(node, CallSubquery):
            return walk(node.query)
        return False

    try:
        return walk(parse_cypher(query))
    except Exception:  # noqa: BLE001 — let cypher() report the syntax error
        return False


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class SocialGraphService:
    """The handlers' application state (reference AppState,
    main.rs:55-59): user/post vertex frames + FOLLOWS/LIKES edge
    frames, mutated copy-on-write through the social.py dataflows."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.users = spark.createDataFrame([], _USER_SCHEMA)
        self.posts = spark.createDataFrame([], _POST_SCHEMA)
        self.follows = spark.createDataFrame([], _EDGE_SCHEMA)
        self.likes = spark.createDataFrame([], _EDGE_SCHEMA)
        self._by_username: dict[str, int] = {}
        self._next_user = 0
        self._next_post = 0
        self._lock = threading.RLock()

    # ------------------------------------------------------------- users

    def _uid(self, username: str) -> int:
        uid = self._by_username.get(username)
        if uid is None:
            raise ApiError(404, f"user {username!r} not found")
        return uid

    def create_user(self, body: dict) -> dict:
        for field in ("username", "email", "display_name"):
            if not body.get(field):
                raise ApiError(400, f"missing {field}")
        with self._lock:
            if body["username"] in self._by_username:
                raise ApiError(409, "username taken")
            locid = self._next_user
            self._next_user += 1
            uid = (USER_LABID << 48) | locid
            row = (uid, body["username"], body["email"], body["display_name"],
                   body.get("bio"), body.get("avatar_url"), int(time.time()))
            self.users = self.users.unionByName(
                self.spark.createDataFrame([row], _USER_SCHEMA))
            self._by_username[body["username"]] = uid
        return self.get_user(body["username"])

    def get_user(self, username: str) -> dict:
        uid = self._uid(username)
        row = self.users.where(F.col("id") == uid).first()
        if row is None:
            raise ApiError(404, f"user {username!r} not found")
        return dict(row.asDict())

    def update_user(self, username: str, body: dict) -> dict:
        uid = self._uid(username)
        updatable = ("email", "display_name", "bio", "avatar_url")
        with self._lock:
            df = self.users
            for field in updatable:
                if field in body:
                    df = df.withColumn(field, F.when(
                        F.col("id") == uid,
                        F.lit(body[field])).otherwise(F.col(field)))
            self.users = df
        return self.get_user(username)

    def delete_user(self, username: str) -> None:
        uid = self._uid(username)
        with self._lock:
            self.users = self.users.where(F.col("id") != uid)
            self.follows = self.follows.where(
                (F.col("src") != uid) & (F.col("dst") != uid))
            self.likes = self.likes.where(F.col("src") != uid)
            self.posts = self.posts.where(F.col("author") != uid)
            del self._by_username[username]

    # ------------------------------------------------------- social graph

    def follow(self, username: str, target: str) -> None:
        a, b = self._uid(username), self._uid(target)
        if a == b:
            raise ApiError(400, "cannot follow yourself")
        with self._lock:
            self.follows = social.follow(self.follows, a, b) \
                .localCheckpoint(eager=True)

    def unfollow(self, username: str, target: str) -> None:
        a, b = self._uid(username), self._uid(target)
        with self._lock:
            self.follows = social.unfollow(self.follows, a, b) \
                .localCheckpoint(eager=True)

    def get_followers(self, username: str) -> list[dict]:
        uid = self._uid(username)
        return [r.asDict() for r in
                social.followers(self.follows, self.users, uid).collect()]

    def get_following(self, username: str) -> list[dict]:
        uid = self._uid(username)
        return [r.asDict() for r in
                social.following(self.follows, self.users, uid).collect()]

    def suggestions(self, username: str) -> list[dict]:
        uid = self._uid(username)
        out = social.friend_suggestions(self.follows, uid)
        named = out.join(self.users.select(F.col("id").alias("cand"),
                                           "username"), "cand")
        return [r.asDict() for r in named.collect()]

    def network(self, username: str, other: str) -> dict:
        a, b = self._uid(username), self._uid(other)
        return social.network_analysis(self.follows, a, b)

    # -------------------------------------------------------------- posts

    def create_post(self, body: dict) -> dict:
        author = self._uid(body.get("username") or "")
        if not body.get("content"):
            raise ApiError(400, "missing content")
        with self._lock:
            locid = self._next_post
            self._next_post += 1
            pid = (POST_LABID << 48) | locid
            row = (pid, author, body["content"], int(time.time()))
            self.posts = self.posts.unionByName(
                self.spark.createDataFrame([row], _POST_SCHEMA))
        return self.get_post(pid)

    def get_post(self, pid: int) -> dict:
        row = self.posts.where(F.col("post_id") == pid).first()
        if row is None:
            raise ApiError(404, f"post {pid} not found")
        return dict(row.asDict())

    def delete_post(self, pid: int) -> None:
        self.get_post(pid)
        with self._lock:
            self.posts = self.posts.where(F.col("post_id") != pid)
            self.likes = self.likes.where(F.col("dst") != pid)

    def timeline(self, username: str, k: int = 10) -> list[dict]:
        uid = self._uid(username)
        return [r.asDict() for r in
                social.timeline(self.follows, self.posts, uid, k=k).collect()]

    def like(self, pid: int, username: str) -> None:
        uid = self._uid(username)
        self.get_post(pid)
        with self._lock:
            self.likes = social.like(self.likes, uid, pid) \
                .localCheckpoint(eager=True)

    def unlike(self, pid: int, username: str) -> None:
        uid = self._uid(username)
        with self._lock:
            self.likes = social.unlike(self.likes, uid, pid) \
                .localCheckpoint(eager=True)

    def post_likes(self, pid: int) -> list[dict]:
        self.get_post(pid)
        return [r.asDict() for r in
                social.likers(self.likes, self.users, pid).collect()]

    # -------------------------------------------------------- persistence

    def _graph(self):
        """The service state as a PropertyGraph (shared by commit and
        the Cypher endpoint)."""
        from rust_graph_db_spark.model import PropertyGraph

        g = PropertyGraph(self.spark, "social")
        g._labels = {"User": USER_LABID, "Post": POST_LABID,
                     "FOLLOWS": 3, "LIKES": 4}
        g._vertices["User"] = self.users
        g._vertices["Post"] = self.posts.select(
            F.col("post_id").alias("id"), "author", "content", "ts")
        g._edges["FOLLOWS"] = self.follows.select(
            pack_graphid(3, F.monotonically_increasing_id()).alias("id"),
            "src", "dst")
        g._edges["LIKES"] = self.likes.select(
            pack_graphid(4, F.monotonically_increasing_id()).alias("id"),
            "src", "dst")
        return g

    def commit(self, root: str) -> dict:
        """Engine extension: durably commit users/posts/follows/likes as
        a PropertyGraph version (storage.py manifest-swap)."""
        from rust_graph_db_spark.storage import save_graph

        version = save_graph(self._graph(), root)
        return {"root": root, "version": version}

    def run_cypher(self, query: str, params: dict = None,
                   limit: int = 1000) -> dict:
        """Engine extension: run a (parameterized) READ-ONLY Cypher
        query against the live service graph — the reference's API
        layer never exposes its query language; here the whole Cypher
        read surface is one route. Results are capped at ``limit``
        rows (use LIMIT for paging).

        Write clauses (CREATE/MERGE/SET/REMOVE/DELETE/FOREACH) are
        rejected with 400: ``_graph()`` builds a throwaway snapshot of
        the service frames, so a write would mutate a discarded copy
        while reporting success (r3 ADVICE item). Mutations go through
        the typed routes; durability through POST /admin/commit.

        Trust model: like every route in this dev server, /admin/cypher
        is UNAUTHENTICATED and the query plan's cost is unbounded (only
        the returned rows are capped) — deploy behind a gateway that
        adds authn and timeouts; this process is a test/dev harness,
        not a hardened endpoint.
        """
        if _has_write_clause(query):
            raise ApiError(
                400, "write clauses are not allowed on /admin/cypher; "
                     "use the typed mutation routes")

        def _plain(v):
            if hasattr(v, "asDict"):
                return {k: _plain(x) for k, x in v.asDict().items()}
            if isinstance(v, (list, tuple)):
                return [_plain(x) for x in v]
            if isinstance(v, (str, int, float, bool)) or v is None:
                return v
            return str(v)

        df = self._graph().cypher(query, params or {})
        rows = df.limit(int(limit)).collect()
        return {"columns": df.columns,
                "rows": [{c: _plain(r[c]) for c in df.columns}
                         for r in rows],
                "row_count": len(rows)}


_ROUTES = [
    ("GET", r"^/health$", lambda s, m, b, q: {"status": "ok"}),
    ("POST", r"^/api/v1/users$", lambda s, m, b, q: s.create_user(b)),
    ("GET", r"^/api/v1/users/([^/]+)$", lambda s, m, b, q: s.get_user(m[0])),
    ("PUT", r"^/api/v1/users/([^/]+)$",
     lambda s, m, b, q: s.update_user(m[0], b)),
    ("DELETE", r"^/api/v1/users/([^/]+)$",
     lambda s, m, b, q: s.delete_user(m[0])),
    ("POST", r"^/api/v1/users/([^/]+)/follow/([^/]+)$",
     lambda s, m, b, q: s.follow(m[0], m[1])),
    ("DELETE", r"^/api/v1/users/([^/]+)/follow/([^/]+)$",
     lambda s, m, b, q: s.unfollow(m[0], m[1])),
    ("GET", r"^/api/v1/users/([^/]+)/followers$",
     lambda s, m, b, q: s.get_followers(m[0])),
    ("GET", r"^/api/v1/users/([^/]+)/following$",
     lambda s, m, b, q: s.get_following(m[0])),
    ("GET", r"^/api/v1/users/([^/]+)/suggested-friends$",
     lambda s, m, b, q: s.suggestions(m[0])),
    ("GET", r"^/api/v1/users/([^/]+)/network$",
     lambda s, m, b, q: s.network(m[0], q.get("other", ""))),
    ("GET", r"^/api/v1/users/([^/]+)/timeline$",
     lambda s, m, b, q: s.timeline(m[0], int(q.get("k", 10)))),
    ("POST", r"^/api/v1/posts$", lambda s, m, b, q: s.create_post(b)),
    ("GET", r"^/api/v1/posts/(\d+)$",
     lambda s, m, b, q: s.get_post(int(m[0]))),
    ("DELETE", r"^/api/v1/posts/(\d+)$",
     lambda s, m, b, q: s.delete_post(int(m[0]))),
    ("POST", r"^/api/v1/posts/(\d+)/like$",
     lambda s, m, b, q: s.like(int(m[0]), b.get("username", ""))),
    ("DELETE", r"^/api/v1/posts/(\d+)/like$",
     lambda s, m, b, q: s.unlike(int(m[0]), b.get("username", ""))),
    ("GET", r"^/api/v1/posts/(\d+)/likes$",
     lambda s, m, b, q: s.post_likes(int(m[0]))),
    ("POST", r"^/api/v1/admin/commit$",
     lambda s, m, b, q: s.commit(b["root"])),
    ("POST", r"^/api/v1/admin/cypher$",
     lambda s, m, b, q: s.run_cypher(b["query"], b.get("params"),
                                     int(b.get("limit", 1000)))),
]


def _make_handler(service: SocialGraphService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):                     # silence stderr
            pass

        def _dispatch(self, method: str) -> None:
            from urllib.parse import parse_qsl, urlparse

            url = urlparse(self.path)
            query = dict(parse_qsl(url.query))
            length = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(length) if length else b""
            try:
                body = json.loads(raw) if raw else {}
            except json.JSONDecodeError:
                return self._send(400, {"error": "invalid JSON body"})
            for verb, pattern, fn in _ROUTES:
                if verb != method:
                    continue
                m = re.match(pattern, url.path)
                if m:
                    try:
                        result = fn(service, m.groups(), body, query)
                    except ApiError as e:
                        return self._send(e.status, {"error": str(e)})
                    except Exception as e:          # noqa: BLE001
                        return self._send(500, {"error": str(e)})
                    status = 201 if method == "POST" and result else 200
                    return self._send(status, result if result is not None
                                      else {"ok": True})
            self._send(404, {"error": f"no route {method} {url.path}"})

        def _send(self, status: int, payload) -> None:
            blob = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_PUT(self):
            self._dispatch("PUT")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def serve(spark: SparkSession, host: str = "127.0.0.1", port: int = 8080,
          service: Optional[SocialGraphService] = None,
          background: bool = False) -> ThreadingHTTPServer:
    """Start the API server (reference main.rs:123-129). ``port=0``
    picks a free port (see ``server.server_address``);
    ``background=True`` serves from a daemon thread and returns."""
    svc = service or SocialGraphService(spark)
    server = ThreadingHTTPServer((host, port), _make_handler(svc))
    server.service = svc
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
    else:
        server.serve_forever()
    return server

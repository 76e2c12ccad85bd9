"""REST API surface (api.py) — e2e over a live HTTP server, mirroring
the reference route table (social-network-api/src/main.rs:61-108)."""

import json
import urllib.request

import pytest

from rust_graph_db_spark.api import serve


@pytest.fixture(scope="module")
def api(spark):
    server = serve(spark, port=0, background=True)
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def call(base, method, path, body=None):
    req = urllib.request.Request(
        base + path, method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_full_social_flow(api):
    # users
    for name in ("alice", "bob", "carol", "dave"):
        status, user = call(api, "POST", "/api/v1/users", {
            "username": name, "email": f"{name}@x.io", "display_name": name.title()})
        assert status == 201 and user["username"] == name
    assert call(api, "GET", "/health")[1] == {"status": "ok"}
    assert call(api, "GET", "/api/v1/users/alice")[1]["email"] == "alice@x.io"
    assert call(api, "GET", "/api/v1/users/nobody")[0] == 404
    status, _ = call(api, "POST", "/api/v1/users", {
        "username": "alice", "email": "dup@x.io", "display_name": "Dup"})
    assert status == 409

    # update
    status, u = call(api, "PUT", "/api/v1/users/alice", {"bio": "hi"})
    assert status == 200 and u["bio"] == "hi"

    # follow graph: alice→bob, alice→carol, bob→dave, carol→dave
    for a, b in [("alice", "bob"), ("alice", "carol"),
                 ("bob", "dave"), ("carol", "dave")]:
        assert call(api, "POST", f"/api/v1/users/{a}/follow/{b}")[0] == 200
    assert call(api, "POST", "/api/v1/users/alice/follow/alice")[0] == 400

    followers = call(api, "GET", "/api/v1/users/dave/followers")[1]
    assert {u["username"] for u in followers} == {"bob", "carol"}
    following = call(api, "GET", "/api/v1/users/alice/following")[1]
    assert {u["username"] for u in following} == {"bob", "carol"}

    # X4: dave is the friend-of-friends suggestion for alice (2 mutuals)
    sugg = call(api, "GET", "/api/v1/users/alice/suggested-friends")[1]
    assert sugg[0]["username"] == "dave" and sugg[0]["mutual_count"] == 2

    # X5: network analysis alice→dave
    net = call(api, "GET", "/api/v1/users/alice/network?other=dave")[1]
    assert net["degrees_of_separation"] == 2
    # mutuals = followee-set intersection; dave follows nobody → 0
    assert net["mutual_friends"] == 0

    # posts + timeline
    status, p1 = call(api, "POST", "/api/v1/posts",
                      {"username": "bob", "content": "hello"})
    assert status == 201
    _, p2 = call(api, "POST", "/api/v1/posts",
                 {"username": "carol", "content": "world"})
    _, p3 = call(api, "POST", "/api/v1/posts",
                 {"username": "dave", "content": "unseen"})
    tl = call(api, "GET", "/api/v1/users/alice/timeline")[1]
    assert {t["content"] for t in tl} == {"hello", "world"}

    # likes (dup-checked)
    pid = p1["post_id"]
    assert call(api, "POST", f"/api/v1/posts/{pid}/like",
                {"username": "alice"})[0] == 200
    call(api, "POST", f"/api/v1/posts/{pid}/like", {"username": "alice"})
    likes = call(api, "GET", f"/api/v1/posts/{pid}/likes")[1]
    assert [u["username"] for u in likes] == ["alice"]
    call(api, "DELETE", f"/api/v1/posts/{pid}/like", {"username": "alice"})
    assert call(api, "GET", f"/api/v1/posts/{pid}/likes")[1] == []

    # delete post + user
    assert call(api, "DELETE", f"/api/v1/posts/{p3['post_id']}")[0] == 200
    assert call(api, "GET", f"/api/v1/posts/{p3['post_id']}")[0] == 404
    assert call(api, "DELETE", "/api/v1/users/dave")[0] == 200
    assert call(api, "GET", "/api/v1/users/bob/following")[1] == []


def test_commit_endpoint_durable(api, spark, tmp_path):
    from rust_graph_db_spark.storage import load_graph

    root = str(tmp_path / "social_store")
    status, out = call(api, "POST", "/api/v1/admin/commit", {"root": root})
    assert status == 201 and out["version"] == 1
    g = load_graph(spark, root)
    names = {r.username for r in g.vertex_frame("User").collect()}
    assert "alice" in names and "dave" not in names


def test_cypher_endpoint(api):
    status, out = call(api, "POST", "/api/v1/admin/cypher", {
        "query": "MATCH (u:User) WHERE u.username = $n "
                 "RETURN u.username AS username",
        "params": {"n": "alice"}})
    assert status in (200, 201)
    assert out["columns"] == ["username"]
    assert out["rows"] == [{"username": "alice"}]
    # graph-shaped query over the service's FOLLOWS edges
    status, out = call(api, "POST", "/api/v1/admin/cypher", {
        "query": "MATCH (a:User)-[:FOLLOWS]->(b:User) "
                 "RETURN a.username AS a, b.username AS b ORDER BY a, b",
        "limit": 5})
    assert status in (200, 201) and out["row_count"] <= 5


def test_cypher_endpoint_rejects_writes(api):
    """r4 (ADVICE): /admin/cypher runs against a throwaway graph
    snapshot, so write clauses must 400 instead of claiming success —
    at any nesting depth, and without tripping on look-alike strings."""
    for q in [
        "CREATE (u:User {username: 'eve'})",
        "MATCH (u:User) SET u.username = 'x'",
        "MATCH (u:User) DELETE u",
        "MERGE (u:User {username: 'eve'})",
        "MATCH (u:User) FOREACH (x IN [1] | SET u.username = 'x')",
        "MATCH (u:User) CALL { WITH u SET u.username = 'x' "
        "RETURN 1 AS one } RETURN one",
        "MATCH (u:User) RETURN u.username AS n UNION "
        "CREATE (v:User {username: 'e2'})",
    ]:
        status, out = call(api, "POST", "/api/v1/admin/cypher",
                           {"query": q})
        assert status == 400, (q, status, out)
        assert "write" in out["error"]
    # look-alike read queries must still pass
    status, out = call(api, "POST", "/api/v1/admin/cypher", {
        "query": "MATCH (u:User) WHERE u.username = 'DELETE u' "
                 "RETURN count(*) AS c"})
    assert status in (200, 201) and out["rows"] == [{"c": 0}]

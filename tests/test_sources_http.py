"""S4/S5 remote-ingestion patterns: token bucket, rate-limited REST
enrichment, SPARQL endpoint fetch — all against injected mock transports
(no network in this sandbox)."""

from __future__ import annotations

from kgsum_spark.sources_http import TokenBucket, rest_enrich, sparql_endpoint_fetch


def test_token_bucket_enforces_rate():
    clock = [0.0]
    slept = []

    def sleep(s):
        slept.append(s)
        clock[0] += s

    b = TokenBucket(rate_per_sec=2.0, capacity=1.0,
                    clock=lambda: clock[0], sleep=sleep)
    for _ in range(5):
        b.acquire()
    # first token free, 4 more at 0.5s spacing → 2s of enforced sleep
    assert abs(sum(slept) - 2.0) < 1e-9
    assert clock[0] >= 2.0


def test_rest_enrich_bodies_and_errors(spark):
    df = spark.createDataFrame(
        [(1, "http://ok/a"), (2, "http://fail/b"), (3, "http://ok/c")],
        "id long, url string")

    def fetch(url):
        if "fail" in url:
            raise OSError("boom")
        return f"body-of:{url}"

    out = rest_enrich(df, "url", fetch=fetch, rate_per_sec=1e9,
                      max_retries=2, backoff_base_sec=0.0).collect()
    got = {r["id"]: (r["response"], r["fetch_err"]) for r in out}
    assert got[1] == ("body-of:http://ok/a", None)
    assert got[3] == ("body-of:http://ok/c", None)
    assert got[2][0] is None and "OSError" in got[2][1]


def test_rest_enrich_retries_transient(spark):
    df = spark.createDataFrame([(1, "http://flaky/x")], "id long, url string")
    calls = {"n": 0}

    # fetch state lives per-executor; single partition → one worker replays it
    def fetch(url):
        calls["n"] += 1
        if calls["n"] < 2:
            raise OSError("transient")
        return "ok"

    out = rest_enrich(df.coalesce(1), "url", fetch=fetch, rate_per_sec=1e9,
                      max_retries=3, backoff_base_sec=0.0).collect()
    assert out[0]["response"] == "ok" and out[0]["fetch_err"] is None


def test_sparql_endpoint_fetch(spark):
    eps = spark.createDataFrame(
        [("http://e1",), ("http://dead",), ("http://e2",)], "endpoint string")

    def fetch(url):
        if "dead" in url:
            raise OSError("down")
        tag = "e1" if "e1" in url else "e2"
        return f"{tag}-s\trdf:type\t{tag}-class\n{tag}-s2\trdf:type\t{tag}-class"

    out = sparql_endpoint_fetch(eps, "endpoint", "SELECT ...", fetch=fetch,
                                rate_per_sec=1e9).collect()
    assert len(out) == 4  # 2 rows per live endpoint; dead endpoint skipped
    assert {r["endpoint"] for r in out} == {"http://e1", "http://e2"}
    assert all(r["p"] == "rdf:type" for r in out)

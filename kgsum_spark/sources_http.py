"""S4/S5 — remote ingestion patterns: SPARQL-endpoint fetch and
rate-limited REST enrichment (SURVEY.md §2.1, declared out of CORE scope
but the orchestration pattern itself belongs in the engine).

Reference behaviors mirrored:
- endpoint fetch: one query per endpoint/dataset, results appended to the
  corpus (/root/reference/src/dataset_preparation_remote.py:21-24);
- rate-limited REST: a fixed inter-call delay + retry loop
  (/root/reference/src/lov_data_preparation.py:41-47).

Spark-first shape: the driver never loops over HTTP calls. Requests ride
inside `mapInPandas` partitions — each task owns a token-bucket limiter
and a retry loop, failures land in an error COLUMN (a bad row must not
kill a 1000-executor stage). The transport is an injected callable
(`fetch(url) -> str`), defaulting to stdlib urllib — tests inject a mock,
and no network is touched in this sandbox.

Global-rate note: a per-task bucket enforces rate_per_sec PER TASK. For a
global cap against one upstream API, either divide the budget by the
number of concurrent tasks (`rate_per_sec=global_rate / min(n_partitions,
max_concurrent_tasks)`) or coalesce the request table to a few partitions
— the request table is usually tiny next to the corpus, so shrinking it
is free. This mirrors how the reference's single-process sleep loop maps
onto a cluster.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


class TokenBucket:
    """Steady-rate limiter: `acquire()` blocks until a token is available.
    capacity > 1 allows short bursts after idle periods."""

    def __init__(self, rate_per_sec: float, capacity: float = 1.0,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        self.rate = float(rate_per_sec)
        self.capacity = float(capacity)
        self.tokens = float(capacity)
        self.clock = clock
        self.sleep = sleep
        self._last = clock()

    def acquire(self) -> None:
        while True:
            now = self.clock()
            self.tokens = min(self.capacity, self.tokens + (now - self._last) * self.rate)
            self._last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            self.sleep((1.0 - self.tokens) / self.rate)


def _default_fetch(url: str, timeout: float = 10.0) -> str:
    from urllib.request import urlopen  # stdlib only; injected away in tests

    with urlopen(url, timeout=timeout) as r:  # noqa: S310 — caller-supplied URL
        return r.read().decode("utf-8", errors="replace")


def rest_enrich(
    df: DataFrame,
    url_col: str,
    fetch: Callable[[str], str] | None = None,
    rate_per_sec: float = 2.0,
    max_retries: int = 3,
    backoff_base_sec: float = 0.5,
    out_col: str = "response",
    err_col: str = "fetch_err",
    bucket_factory: Callable[[], TokenBucket] | None = None,
) -> DataFrame:
    """S5 — enrich every row by fetching `url_col`, rate-limited per task.

    Adds `out_col` (body or null) and `err_col` (null or the final error).
    Retries transient failures with exponential backoff, like the
    reference's retry-sleep loop, but distributed and non-fatal per row."""
    fetch = fetch or _default_fetch
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes] + [f"{out_col} string", f"{err_col} string"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = bucket_factory() if bucket_factory else TokenBucket(rate_per_sec)
        for pdf in batches:
            bodies, errs = [], []
            for url in pdf[url_col]:
                body, err = None, None
                for attempt in range(max_retries):
                    bucket.acquire()
                    try:
                        body = fetch(url)
                        err = None
                        break
                    except Exception as e:  # noqa: BLE001 — recorded, not raised
                        err = f"{type(e).__name__}: {e}"
                        if attempt + 1 < max_retries:
                            time.sleep(backoff_base_sec * (2 ** attempt))
                bodies.append(body)
                errs.append(err)
            out = pdf.copy()
            out[out_col] = bodies
            out[err_col] = errs
            yield out

    return df.mapInPandas(run, schema)


def sparql_endpoint_fetch(
    endpoints: DataFrame,
    endpoint_col: str,
    query: str,
    fetch: Callable[[str], str] | None = None,
    parse_rows: Callable[[str], list[tuple]] | None = None,
    row_schema: str = "s string, p string, o string",
    rate_per_sec: float = 1.0,
) -> DataFrame:
    """S4 — run `query` against every endpoint row, explode the parsed
    result rows, tagged with their source endpoint. `parse_rows` turns a
    response body into result tuples (default: one N-Triples-ish line per
    row, split on tabs) — the reference's per-endpoint SPARQL loop
    (/root/reference/src/dataset_preparation_remote.py:21-24) as one
    distributed stage."""
    from urllib.parse import quote

    fetch = fetch or _default_fetch
    parse = parse_rows or (lambda body: [
        tuple(ln.split("\t")) for ln in body.splitlines() if ln.strip()
    ])
    schema = f"endpoint string, {row_schema}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate_per_sec)
        cols = [c.strip().split()[0] for c in schema.split(",")]
        for pdf in batches:
            rows = []
            for ep in pdf[endpoint_col]:
                bucket.acquire()
                try:
                    body = fetch(f"{ep}?query={quote(query)}")
                except Exception:  # noqa: BLE001 — dead endpoint: skip, like the reference
                    continue
                rows.extend((ep, *r) for r in parse(body))
            yield pd.DataFrame(rows, columns=cols)

    return endpoints.mapInPandas(run, schema)

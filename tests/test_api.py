"""REST API surface: reference app.py:58-428 parity over the engine.

Covers health/config/run/job-CRUD/results/statistics/validation plus
the JSON error handlers, against a real ingest into a temp warehouse
and the sf0.001 read models.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request

import pytest

from gene_etl_spark.api import ApiServer
from gene_etl_spark.config import IngestConfig, config_hash
from gene_etl_spark.ledger import Ledger
from gene_etl_spark.sources.simulate import generate_change_stream

SF_DIR = "/root/testdata/sf0.001"


def _call(
    method: str, url: str, body: dict | None = None, headers: dict | None = None
):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("api_wh")
    events = str(base / "events")
    generate_change_stream(events, n_convs=40, n_events=3000, n_tranches=2)
    cfg = IngestConfig(
        lake_path=str(base / "wh" / "transcripts"),
        events_path=events,
        ledger_path=str(base / "wh" / "ledger"),
        metrics_path=str(base / "wh" / "metrics"),
        validation_path=str(base / "wh" / "validation"),
        num_buckets=8,
        slice_lsn_width=2000,
    )
    server = ApiServer(spark, sf_dir=SF_DIR, default_config=cfg).start()
    yield server
    server.stop()


def test_health(api):
    status, out = _call("GET", api.url + "/health")
    assert status == 200 and out["status"] == "healthy"
    assert out["service"] == "gene-etl-spark-api"


def test_get_config_and_hash(api):
    status, out = _call("GET", api.url + "/api/v1/config")
    assert status == 200
    assert out["config_hash"] == config_hash(api.default_config)
    assert out["config"]["num_buckets"] == 8


def test_validate_config(api):
    good = {"merge_mode": "mor", "num_buckets": 4}
    status, out = _call("POST", api.url + "/api/v1/config/validate", good)
    assert status == 200 and out["valid"] is True and out["config_hash"]

    bad = {"merge_mode": "zzz"}
    status, out = _call("POST", api.url + "/api/v1/config/validate", bad)
    assert status == 400 and out["valid"] is False

    unknown = {"not_a_field": 1}
    status, out = _call("POST", api.url + "/api/v1/config/validate", unknown)
    assert status == 400 and "not_a_field" in out["details"]

    status, out = _call("POST", api.url + "/api/v1/config/validate", None)
    assert status == 400


def test_run_jobs_validation_flow(api, spark):
    # 1) run with empty body -> default config, synchronous completion
    status, out = _call("POST", api.url + "/api/v1/etl/run", {})
    assert status == 200 and out["status"] == "completed"
    job_id = out["job_id"]
    assert out["results"]["n_batches"] >= 1
    assert out["results"]["events_read"] > 0

    # durable state: ledger has committed batches, lake holds live rows
    ledger = Ledger(api.default_config.ledger_path)
    assert len(ledger.committed()) >= 1
    from gene_etl_spark.lake.table import LakeTable

    table = LakeTable.load(spark, api.default_config.lake_path)
    assert table.read().count() > 0

    # 2) job tracker CRUD
    status, out = _call("GET", api.url + "/api/v1/etl/jobs")
    assert status == 200 and job_id in out["jobs"] and out["count"] >= 1
    status, out = _call("GET", api.url + f"/api/v1/etl/jobs/{job_id}")
    assert status == 200 and out["status"] == "completed"
    assert out["config_hash"] == config_hash(api.default_config)

    # 3) rerun resumes from the ledger (idempotent, no duplicate batches)
    status, out2 = _call("POST", api.url + "/api/v1/etl/run", {})
    assert status == 200 and out2["results"]["n_batches"] == 0

    # 4) validation log is served, newest first, batch filter works
    status, out = _call("GET", api.url + "/api/v1/validation")
    assert status == 200 and out["count"] >= 1
    checks = {v["check_name"] for v in out["validations"]}
    assert "non_null_keys" in checks
    some_batch = out["validations"][0]["batch_id"]
    status, out = _call(
        "GET", api.url + f"/api/v1/validation?batch_id={some_batch}"
    )
    assert status == 200 and out["count"] >= 1
    assert all(v["batch_id"] == some_batch for v in out["validations"])

    # 5) delete job, then 404
    status, out = _call("DELETE", api.url + f"/api/v1/etl/jobs/{job_id}")
    assert status == 200
    status, out = _call("GET", api.url + f"/api/v1/etl/jobs/{job_id}")
    assert status == 404


def test_run_bad_config_is_400(api):
    status, out = _call("POST", api.url + "/api/v1/etl/run", {"merge_mode": "zzz"})
    assert status == 400 and "merge_mode" in out["details"]


def test_queries_listing(api):
    status, out = _call("GET", api.url + "/api/v1/queries")
    assert status == 200 and out["count"] >= 50
    names = {q["name"] for q in out["queries"]}
    assert {"dim_join", "candidate_view_q", "cdc_replay"} <= names
    gated = [q for q in out["queries"] if q["oracle_gated"]]
    assert len(gated) >= 50


def test_results_pagination_and_filters(api):
    base = api.url + "/api/v1/results?query=dim_join&limit=5"
    status, p0 = _call("GET", base + "&offset=0")
    status1, p1 = _call("GET", base + "&offset=5")
    assert status == 200 and status1 == 200
    assert p0["count"] == 5 and p0["limit"] == 5 and p0["offset"] == 0
    k0 = [json.dumps(r, sort_keys=True) for r in p0["results"]]
    k1 = [json.dumps(r, sort_keys=True) for r in p1["results"]]
    assert not set(k0) & set(k1)  # disjoint pages
    # deterministic: same page twice
    _, p0b = _call("GET", base + "&offset=0")
    assert p0["results"] == p0b["results"]

    # equality filter on a column
    val = p0["results"][0]["nation_name"]
    quoted = urllib.parse.quote(val)
    status, out = _call(
        "GET", f"{api.url}/api/v1/results?query=dim_join&nation_name={quoted}"
    )
    assert status == 200 and out["count"] >= 1
    assert all(r["nation_name"] == val for r in out["results"])

    status, out = _call("GET", api.url + "/api/v1/results?query=nope")
    assert status == 404
    status, out = _call(
        "GET", api.url + "/api/v1/results?query=dim_join&bogus_col=1"
    )
    assert status == 400


def test_statistics(api):
    status, out = _call("GET", api.url + "/api/v1/statistics")
    assert status == 200
    total = sum(b["total_pairs"] for b in out["cohort_breakdown"])
    sig = sum(b["significant_pairs"] for b in out["cohort_breakdown"])
    assert out["total_correlations"] == total
    assert out["significant_correlations"] == sig
    assert out["highly_significant_correlations"] <= sig
    expected_rate = (sig / total) if total else 0
    assert out["significance_rate"] == expected_rate


def test_unknown_endpoint_is_json_404(api):
    status, out = _call("GET", api.url + "/api/v1/nope")
    assert status == 404 and out["error"] == "Endpoint not found"


def test_known_route_wrong_method_is_json_405(api):
    status, out = _call("PUT", api.url + "/api/v1/results")
    assert status == 405 and out["error"] == "Method not allowed"
    assert out["allowed"] == ["GET"]
    status, out = _call("POST", api.url + "/api/v1/etl/jobs/some-id")
    assert status == 405 and sorted(out["allowed"]) == ["DELETE", "GET"]


def test_typed_numeric_filters(api):
    # dim_join: n_customers bigint, avg_acctbal double (rounded to 4)
    status, p0 = _call("GET", api.url + "/api/v1/results?query=dim_join&limit=1")
    assert status == 200 and p0["count"] == 1
    row = p0["results"][0]

    # double filter with a non-canonical string rendering: extra trailing
    # zeros never match under string comparison, must match under typed
    val = row["avg_acctbal"]
    status, out = _call(
        "GET",
        f"{api.url}/api/v1/results?query=dim_join&avg_acctbal={val:.10f}",
    )
    assert status == 200 and out["count"] >= 1
    assert any(r["avg_acctbal"] == val for r in out["results"])

    # bigint filter
    n = row["n_customers"]
    status, out = _call(
        "GET", f"{api.url}/api/v1/results?query=dim_join&n_customers={n}"
    )
    assert status == 200 and out["count"] >= 1
    assert all(r["n_customers"] == n for r in out["results"])

    # unparsable numeric filter is a 400, not a silently empty 200
    status, out = _call(
        "GET", api.url + "/api/v1/results?query=dim_join&n_customers=abc"
    )
    assert status == 400 and out["column"] == "n_customers"


def test_bearer_token_auth(api, spark):
    from gene_etl_spark.api import ApiServer

    secured = ApiServer(spark, sf_dir=SF_DIR, token="sekrit").start()
    try:
        # /health stays open (readiness probes)
        status, _ = _call("GET", secured.url + "/health")
        assert status == 200
        status, out = _call("GET", secured.url + "/api/v1/config")
        assert status == 401 and out["error"] == "Unauthorized"
        status, _ = _call(
            "GET",
            secured.url + "/api/v1/config",
            headers={"Authorization": "Bearer wrong"},
        )
        assert status == 401
        status, out = _call(
            "GET",
            secured.url + "/api/v1/config",
            headers={"Authorization": "Bearer sekrit"},
        )
        assert status == 200 and "config_hash" in out
    finally:
        secured.stop()


def test_workspace_root_confinement(api, spark, tmp_path):
    from gene_etl_spark.api import ApiServer

    confined = ApiServer(spark, workspace_root=str(tmp_path)).start()
    try:
        inside = str(tmp_path / "wh")
        body = {
            "lake_path": "/somewhere/else/lake",  # outside the root
            "events_path": inside,
            "ledger_path": inside,
            "metrics_path": inside,
            "validation_path": inside,
        }
        status, out = _call("POST", confined.url + "/api/v1/etl/run", body)
        assert status == 400
        assert out["error"] == "Path outside the server's workspace root"
        assert out["field"] == "lake_path"
        # no job is tracked for a rejected request
        status, out = _call("GET", confined.url + "/api/v1/etl/jobs")
        assert status == 200 and out["count"] == 0
    finally:
        confined.stop()


def test_lake_snapshots_tags_and_staged(api):
    """Lake operational surface: snapshot listing, tag CRUD (scoped to
    the server's configured lake — never a request-supplied path), and
    the staged-WAP listing."""
    # make sure the configured lake exists (idempotent: fencing skips
    # already-committed batches)
    status, _ = _call("POST", api.url + "/api/v1/etl/run", {})
    assert status == 200

    status, out = _call("GET", api.url + "/api/v1/lake/snapshots")
    assert status == 200 and out["count"] >= 1
    assert out["current"] == max(s["version"] for s in out["snapshots"])
    assert all(s["live"] for s in out["snapshots"])

    status, out = _call(
        "POST", api.url + "/api/v1/lake/tags", {"name": "rel-1", "version": 1}
    )
    assert status == 200 and out["created"]["version"] == 1
    status, out = _call("GET", api.url + "/api/v1/lake/tags")
    assert status == 200 and out["tags"]["rel-1"]["version"] == 1

    # immutable: duplicate name refused; bad version refused
    status, out = _call(
        "POST", api.url + "/api/v1/lake/tags", {"name": "rel-1"}
    )
    assert status == 400 and "already exists" in out["error"]
    status, out = _call(
        "POST", api.url + "/api/v1/lake/tags", {"name": "ghost", "version": 999}
    )
    assert status == 400 and "not a live snapshot" in out["error"]

    status, out = _call("DELETE", api.url + "/api/v1/lake/tags/rel-1")
    assert status == 200 and out["dropped"] == "rel-1"
    status, out = _call("DELETE", api.url + "/api/v1/lake/tags/rel-1")
    assert status == 404

    status, out = _call("GET", api.url + "/api/v1/lake/staged")
    assert status == 200 and out["staged"] == {}

    # data-skipping dry-run: metadata-only, scoped to the configured lake
    status, out = _call(
        "POST", api.url + "/api/v1/lake/prune-report",
        {"where": [["conv_id", ">=", "conv_000000"]]},
    )
    assert status == 200
    n_files = out["kept_files"] + out["skipped_files"]
    assert n_files + out["unprunable_dirty_files"] > 0
    # undeclared stats column: conservative (every clean file kept)
    status, out2 = _call(
        "POST", api.url + "/api/v1/lake/prune-report",
        {"where": [["tool", "not_null", None]]},
    )
    assert status == 200 and out2["kept_files"] == n_files
    status, out = _call(
        "POST", api.url + "/api/v1/lake/prune-report",
        {"where": [["conv_id", "!=", "x"]]},
    )
    assert status == 400 and "unsupported where op" in out["error"]
    status, out = _call("POST", api.url + "/api/v1/lake/prune-report", {})
    assert status == 400

"""REST job/query API over the engine — stdlib ``http.server`` only.

Reference parity (the one capability the SURVEY scoped out of the
spark-submit surface): health (app.py:58-66), config get/validate
(app.py:68-109), synchronous run + in-memory job tracker and job CRUD
(app.py:112-233), paginated/filtered results (app.py:236-322),
statistics rollup (app.py:323-384), validation log (app.py:386-428),
and JSON 400/404/405/500 handlers (app.py:431-446) — re-expressed over
the engine's own surfaces:

- jobs run the ``CdcIngestRunner`` synchronously in the request, like
  the reference's synchronous ``etl.run()``; durable job state is the
  ledger + lake snapshot chain, the tracker is a per-process cache;
- ``/results`` pages ANY registry read model (default: the candidate
  q-value pipeline, the reference's correlation-results analogue) with
  equality filters on arbitrary columns;
- ``/statistics`` is one bounded Spark aggregate (per-cohort breakdown,
  ≤ |cohorts| rows collected; totals derived driver-side);
- ``/validation`` reads the Validator's parquet log.

Scale notes: the API is a control/read surface, not a data path. Every
response is bounded — ``limit`` capped at 1000, statistics collects one
row per cohort, validation is windowed to the latest 100 entries — and
the heavy lifting stays in Spark jobs. A process-wide lock serializes
Spark access (one driver, many HTTP threads); read models are persisted
in a small cache so paging never re-executes the pipeline per request.

Security: optional ``token`` enables Bearer auth on every route but
``/health``; optional ``workspace_root`` confines every path field in
POSTed run configs (without it, any client can point the runner at
arbitrary filesystem paths — loopback/dev use only). ``jobs/api_job.py``
refuses non-loopback binds without a token unless ``--insecure``.
"""

from __future__ import annotations

import base64
import datetime as dt
import hmac
import decimal
import glob
import json
import os
import threading
import uuid
from dataclasses import asdict, fields
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.config import IngestConfig, config_hash

RESULTS_MAX_LIMIT = 1000
VALIDATION_WINDOW = 100
DEFAULT_RESULTS_QUERY = "candidate_view_q"
DF_CACHE_CAPACITY = 2  # persisted read models kept warm across pages

_CONFIG_FIELDS = {f.name for f in fields(IngestConfig)}
_PATH_CONFIG_FIELDS = (
    "lake_path",
    "events_path",
    "ledger_path",
    "metrics_path",
    "validation_path",
)


def _contains_map(dtype: T.DataType) -> bool:
    """True if the type tree contains a MapType anywhere (maps are not
    orderable, even nested inside arrays/structs)."""
    if isinstance(dtype, T.MapType):
        return True
    if isinstance(dtype, T.ArrayType):
        return _contains_map(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return any(_contains_map(f.dataType) for f in dtype.fields)
    return False


class ApiError(Exception):
    def __init__(self, status: int, payload: dict):
        super().__init__(payload.get("error", "api error"))
        self.status = status
        self.payload = payload


def _jsonable(v):
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _utcnow_iso() -> str:
    return dt.datetime.now(dt.timezone.utc).isoformat()


def _build_config(data: dict) -> IngestConfig:
    unknown = set(data) - _CONFIG_FIELDS
    if unknown:
        raise ValueError(f"unknown config fields: {sorted(unknown)}")
    for tup in ("key_cols",):
        if tup in data and isinstance(data[tup], list):
            data[tup] = tuple(data[tup])
    cfg = IngestConfig(**data)
    cfg.validate()
    return cfg


class ApiServer:
    """Threaded HTTP server exposing the engine's control/read API.

    ``sf_dir`` scopes the query read models (``/results``,
    ``/statistics``); ``default_config`` (optional) backs
    ``GET /config`` and body-less ``POST /etl/run``, mirroring the
    reference's ``create_example_config`` fallback (app.py:119-121).
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        default_config: IngestConfig | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        token: str | None = None,
        workspace_root: str | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.default_config = default_config
        self.token = token  # Bearer auth on every route but /health
        # all path fields in POSTed run configs must resolve under this
        # root (None = unconfined, for loopback/dev use only)
        self.workspace_root = (
            os.path.realpath(workspace_root) if workspace_root else None
        )
        self.jobs: dict[str, dict] = {}
        self._lock = threading.Lock()  # one Spark driver, many HTTP threads
        self._jobs_lock = threading.Lock()  # tracker mutations vs listings
        self._df_cache: dict[str, object] = {}  # name -> persisted DataFrame
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self._httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------------ #
    @property
    def address(self) -> tuple[str, int]:
        return self._httpd.server_address[:2]

    @property
    def url(self) -> str:
        host, port = self.address
        return f"http://{host}:{port}"

    def start(self) -> "ApiServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="gene-etl-api", daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        for df in self._df_cache.values():
            df.unpersist()
        self._df_cache.clear()

    # ------------------------------------------------------------------ #
    # endpoint implementations (handler delegates here)

    def handle_health(self, params: dict) -> dict:
        return {
            "status": "healthy",
            "timestamp": _utcnow_iso(),
            "service": "gene-etl-spark-api",
        }

    def handle_get_config(self, params: dict) -> dict:
        cfg = self.default_config or IngestConfig()
        return {
            "config": _jsonable(asdict(cfg)),
            "config_hash": config_hash(cfg),
            "message": "Example configuration retrieved successfully",
        }

    def handle_validate_config(self, body: dict | None) -> dict:
        if not body:
            raise ApiError(400, {"error": "No configuration data provided"})
        try:
            cfg = _build_config(dict(body))
        except (TypeError, ValueError) as e:
            raise ApiError(
                400,
                {"valid": False, "error": "Invalid configuration", "details": str(e)},
            )
        return {
            "valid": True,
            "message": "Configuration is valid",
            "config_hash": config_hash(cfg),
        }

    def _check_workspace(self, cfg: IngestConfig) -> None:
        """Confine client-supplied paths: the runner writes/reads at every
        path field in the config, so an unconfined server would hand any
        HTTP client arbitrary-path filesystem access through the Spark
        process. Operator-supplied default_config is exempt."""
        if self.workspace_root is None:
            return
        root = self.workspace_root + os.sep
        for field in _PATH_CONFIG_FIELDS:
            p = os.path.realpath(getattr(cfg, field))
            if p != self.workspace_root and not p.startswith(root):
                raise ApiError(
                    400,
                    {
                        "error": "Path outside the server's workspace root",
                        "field": field,
                        "workspace_root": self.workspace_root,
                    },
                )

    def handle_run(self, body: dict | None) -> dict:
        if body:
            try:
                cfg = _build_config(dict(body))
            except (TypeError, ValueError) as e:
                raise ApiError(
                    400, {"error": "Invalid configuration", "details": str(e)}
                )
            self._check_workspace(cfg)
        elif self.default_config is not None:
            cfg = self.default_config
        else:
            raise ApiError(
                400,
                {
                    "error": "No configuration data provided",
                    "details": "POST a config body or start the server with a default_config",
                },
            )

        job_id = str(uuid.uuid4())
        with self._jobs_lock:
            self.jobs[job_id] = {
                "status": "running",
                "start_time": _utcnow_iso(),
                "config": _jsonable(asdict(cfg)),
                "config_hash": config_hash(cfg),
            }
        # synchronous, like the reference (app.py:135 "in production, use
        # Celery or similar"); durable state is the ledger + snapshot chain
        try:
            from gene_etl_spark.runner import CdcIngestRunner

            with self._lock:
                summary = CdcIngestRunner(self.spark, cfg).run()
            summary.pop("batches", None)
            with self._jobs_lock:
                self.jobs[job_id].update(
                    status="completed",
                    end_time=_utcnow_iso(),
                    results=_jsonable(summary),
                )
            return {
                "job_id": job_id,
                "status": "completed",
                "results": _jsonable(summary),
                "message": "Ingest run completed successfully",
            }
        except Exception as e:  # noqa: BLE001 — reported, not swallowed
            with self._jobs_lock:
                self.jobs[job_id].update(
                    status="failed", end_time=_utcnow_iso(), error=str(e)
                )
            raise ApiError(
                500,
                {
                    "job_id": job_id,
                    "status": "failed",
                    "error": str(e),
                    "message": "Ingest run failed",
                },
            )

    def handle_list_jobs(self, params: dict) -> dict:
        # snapshot under the lock: a concurrent run/delete mutating the
        # dict mid-json.dumps would RuntimeError the listing
        with self._jobs_lock:
            jobs = {k: dict(v) for k, v in self.jobs.items()}
        return {"jobs": jobs, "count": len(jobs)}

    def handle_get_job(self, job_id: str) -> dict:
        with self._jobs_lock:
            if job_id not in self.jobs:
                raise ApiError(404, {"error": "Job not found", "job_id": job_id})
            return dict(self.jobs[job_id])

    def handle_delete_job(self, job_id: str) -> dict:
        with self._jobs_lock:
            if job_id not in self.jobs:
                raise ApiError(404, {"error": "Job not found", "job_id": job_id})
            del self.jobs[job_id]
        return {"message": "Job deleted successfully", "job_id": job_id}

    def handle_list_queries(self, params: dict) -> dict:
        from gene_etl_spark.queries import all_queries

        q, o = all_queries()
        return {
            "queries": [{"name": k, "oracle_gated": k in o} for k in q],
            "count": len(q),
        }

    def _registry_df(self, name: str):
        """Build (or reuse) a registry read model. The result is persisted
        and cached so paging / repeated statistics polls don't re-execute
        the full pipeline per request (read models are deterministic over
        the static sf_dir tables). Callers hold self._lock."""
        from gene_etl_spark.queries import all_queries

        q, _ = all_queries()
        if name not in q:
            raise ApiError(404, {"error": "Unknown query", "query": name})
        if self.sf_dir is None:
            raise ApiError(
                400, {"error": "Server started without an sf_dir data root"}
            )
        if name not in self._df_cache:
            while len(self._df_cache) >= DF_CACHE_CAPACITY:
                evicted = next(iter(self._df_cache))
                self._df_cache.pop(evicted).unpersist()
            self._df_cache[name] = q[name](self.spark, self.sf_dir).persist()
        return self._df_cache[name]

    @staticmethod
    def _typed_filter(df, col: str, raw: str):
        """Equality filter with the value parsed to the column's type —
        a string-render comparison would silently miss numeric columns
        (rho=1 never matches Spark's '1.0' rendering)."""
        dtype = dict(df.dtypes)[col]
        try:
            if dtype in ("tinyint", "smallint", "int", "bigint"):
                val = int(raw)
            elif dtype in ("float", "double") or dtype.startswith("decimal"):
                val = float(raw)
            elif dtype == "boolean":
                low = raw.lower()
                if low not in ("true", "false", "0", "1"):
                    raise ValueError(f"not a boolean: {raw!r}")
                val = low in ("true", "1")
            else:
                # strings / dates / timestamps: compare on the string form
                return df.filter(F.col(col).cast("string") == raw)
        except ValueError as e:
            raise ApiError(
                400,
                {
                    "error": "Filter value does not parse as the column type",
                    "column": col,
                    "type": dtype,
                    "value": raw,
                    "details": str(e),
                },
            )
        return df.filter(F.col(col) == F.lit(val))

    def handle_results(self, params: dict) -> dict:
        params = dict(params)
        name = params.pop("query", DEFAULT_RESULTS_QUERY)
        try:
            limit = min(int(params.pop("limit", 100)), RESULTS_MAX_LIMIT)
            offset = int(params.pop("offset", 0))
        except ValueError as e:
            raise ApiError(400, {"error": "Bad paging parameter", "details": str(e)})
        if limit < 0 or offset < 0:
            raise ApiError(400, {"error": "limit/offset must be non-negative"})

        with self._lock:
            df = self._registry_df(name)
            for col, val in params.items():
                if col not in df.columns:
                    raise ApiError(
                        400, {"error": "Unknown filter column", "column": col}
                    )
                df = self._typed_filter(df, col, val)
            # deterministic pagination: order by every sortable column
            # (maps are unorderable even nested inside arrays/structs)
            sortable = [
                f.name for f in df.schema.fields if not _contains_map(f.dataType)
            ]
            if sortable:
                df = df.orderBy(*sortable)
            rows = df.offset(offset).limit(limit).collect()
        return {
            "query": name,
            "results": [_jsonable(r.asDict(recursive=True)) for r in rows],
            "count": len(rows),
            "limit": limit,
            "offset": offset,
        }

    def handle_statistics(self, params: dict) -> dict:
        """Significance statistics over the candidate q-value read model
        (reference: app.py:323-384). One groupBy job collecting one row
        per cohort; global totals derived driver-side from the breakdown."""
        with self._lock:
            df = self._registry_df(DEFAULT_RESULTS_QUERY)
            rows = (
                df.groupBy("cohort_nation")
                .agg(
                    F.count(F.lit(1)).alias("total_pairs"),
                    F.sum((F.col("q_value") <= 0.05).cast("long")).alias(
                        "significant_pairs"
                    ),
                    F.sum((F.col("q_value") <= 0.01).cast("long")).alias(
                        "highly_significant_pairs"
                    ),
                    F.sum(F.abs("rho")).alias("sum_abs_rho"),
                )
                .orderBy("cohort_nation")
                .collect()
            )
        breakdown = []
        total = sig = hisig = 0
        for r in rows:
            d = r.asDict()
            breakdown.append(
                {
                    "cohort": d["cohort_nation"],
                    "total_pairs": d["total_pairs"],
                    "significant_pairs": d["significant_pairs"],
                    "avg_abs_correlation": (
                        d["sum_abs_rho"] / d["total_pairs"] if d["total_pairs"] else 0.0
                    ),
                }
            )
            total += d["total_pairs"]
            sig += d["significant_pairs"]
            hisig += d["highly_significant_pairs"]
        return {
            "total_correlations": total,
            "significant_correlations": sig,
            "highly_significant_correlations": hisig,
            "significance_rate": (sig / total) if total else 0,
            "cohort_breakdown": breakdown,
        }

    def _validation_path(self) -> str | None:
        with self._jobs_lock:
            jobs = list(self.jobs.values())
        for job in reversed(jobs):
            p = (job.get("config") or {}).get("validation_path")
            if p:
                return p
        if self.default_config is not None:
            return self.default_config.validation_path
        return None

    def handle_validation(self, params: dict) -> dict:
        path = self._validation_path()
        if path is None or not glob.glob(os.path.join(path, "*.parquet")):
            return {"validations": [], "count": 0}
        from gene_etl_spark.schemas import VALIDATION_SCHEMA

        with self._lock:
            df = self.spark.read.schema(VALIDATION_SCHEMA).parquet(path)
            batch_id = params.get("batch_id")
            if batch_id:
                df = df.filter(F.col("batch_id") == batch_id)
            rows = (
                df.orderBy(F.desc("validated_at"), "check_name")
                .limit(VALIDATION_WINDOW)
                .collect()
            )
        return {
            "validations": [_jsonable(r.asDict()) for r in rows],
            "count": len(rows),
        }

    # ------------------------------------------------------------------ #
    # lake operational surface: snapshots / tags / staged WAP commits.
    # Always scoped to the server's CONFIGURED lake (never a request-
    # supplied path — no traversal surface); tag create/drop are the only
    # write verbs and they touch refs, not data.

    def _lake(self):
        from gene_etl_spark.lake.table import LakeTable

        cfg = self.default_config
        if cfg is None or not LakeTable.exists(cfg.lake_path):
            raise ApiError(
                404, {"error": "No lake table configured (or not yet created)"}
            )
        return LakeTable.load(self.spark, cfg.lake_path)

    def handle_lake_snapshots(self, params: dict) -> dict:
        table = self._lake()
        rows = [
            {
                "version": m["version"],
                "committed_at_ms": m.get("committed_at_ms"),
                "operation": (m.get("summary") or {}).get("operation"),
                "batch_id": (m.get("properties") or {}).get("batch_id"),
                "clustering": (m.get("summary") or {}).get("clustering"),
                "live": os.path.exists(table._manifest_path(m["version"])),
            }
            for m in table.history()
        ]
        return {"snapshots": rows, "count": len(rows), "current": table.version}

    def handle_lake_tags(self, params: dict) -> dict:
        from gene_etl_spark.lake.maintenance import list_tags

        tags = list_tags(self._lake())
        return {"tags": tags, "count": len(tags)}

    def handle_lake_tag_create(self, body: dict | None) -> dict:
        from gene_etl_spark.lake.maintenance import tag as create_tag

        body = body or {}
        name = body.get("name")
        if not name or not isinstance(name, str):
            raise ApiError(400, {"error": "Body must carry a string 'name'"})
        try:
            rec = create_tag(
                self._lake(), name, version=body.get("version")
            )
        except ValueError as e:
            raise ApiError(400, {"error": str(e)}) from None
        return {"created": rec}

    def handle_lake_tag_delete(self, name: str) -> dict:
        from gene_etl_spark.lake.maintenance import drop_tag

        try:
            return drop_tag(self._lake(), name)
        except ValueError as e:
            raise ApiError(404, {"error": str(e)}) from None

    def handle_lake_staged(self, params: dict) -> dict:
        from gene_etl_spark.lake import wap

        staged = wap.list_staged(self._lake())
        return {"staged": staged, "count": len(staged)}

    def handle_lake_prune_report(self, body: dict | None) -> dict:
        """Data-skipping dry-run: how many base files the persisted
        column metrics keep vs skip for a ``where`` conjunction —
        metadata-only (one piece load per bucket, zero data I/O), scoped
        to the server's configured lake like every lake endpoint."""
        body = body or {}
        where = body.get("where")
        if not isinstance(where, list) or not where:
            raise ApiError(
                400, {"error": "Body must carry 'where': [[col, op, value], ...]"}
            )
        # JSON has no tuples: 'between' pairs arrive as 2-element lists,
        # which _validate_where accepts; is_null/not_null carry null
        try:
            rep = self._lake().prune_report(
                [tuple(c) if isinstance(c, list) else c for c in where]
            )
        except ValueError as e:
            raise ApiError(400, {"error": str(e)}) from None
        return {"where": where, **rep}

    # ------------------------------------------------------------------ #
    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _send(self, status: int, payload: dict) -> None:
                body = json.dumps(payload, default=_jsonable).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict | None:
                length = int(self.headers.get("Content-Length") or 0)
                if not length:
                    return None
                raw = self.rfile.read(length)
                try:
                    return json.loads(raw) if raw.strip() else None
                except json.JSONDecodeError as e:
                    raise ApiError(400, {"error": "Bad JSON body", "details": str(e)})

            def _check_auth(self, route: str) -> None:
                if server.token is None or route == "/health":
                    return
                supplied = self.headers.get("Authorization", "")
                # constant-time compare: a plain != leaks a timing side
                # channel on non-loopback binds
                if not hmac.compare_digest(supplied, f"Bearer {server.token}"):
                    raise ApiError(401, {"error": "Unauthorized"})

            def _dispatch(self, method: str) -> None:
                parsed = urlparse(self.path)
                route = parsed.path.rstrip("/") or "/"
                params = dict(parse_qsl(parsed.query))
                try:
                    self._check_auth(route)
                    payload = self._route(method, route, params)
                    self._send(200, payload)
                except ApiError as e:
                    self._send(e.status, e.payload)
                except Exception as e:  # noqa: BLE001 — JSON 500, app.py:439-446
                    self._send(
                        500, {"error": "Internal server error", "details": str(e)}
                    )

            def _route(self, method: str, route: str, params: dict) -> dict:
                table = {
                    "/health": {"GET": lambda: server.handle_health(params)},
                    "/api/v1/config": {
                        "GET": lambda: server.handle_get_config(params)
                    },
                    "/api/v1/config/validate": {
                        "POST": lambda: server.handle_validate_config(self._body())
                    },
                    "/api/v1/etl/run": {
                        "POST": lambda: server.handle_run(self._body())
                    },
                    "/api/v1/etl/jobs": {
                        "GET": lambda: server.handle_list_jobs(params)
                    },
                    "/api/v1/queries": {
                        "GET": lambda: server.handle_list_queries(params)
                    },
                    "/api/v1/results": {
                        "GET": lambda: server.handle_results(params)
                    },
                    "/api/v1/statistics": {
                        "GET": lambda: server.handle_statistics(params)
                    },
                    "/api/v1/validation": {
                        "GET": lambda: server.handle_validation(params)
                    },
                    "/api/v1/lake/snapshots": {
                        "GET": lambda: server.handle_lake_snapshots(params)
                    },
                    "/api/v1/lake/tags": {
                        "GET": lambda: server.handle_lake_tags(params),
                        "POST": lambda: server.handle_lake_tag_create(
                            self._body()
                        ),
                    },
                    "/api/v1/lake/staged": {
                        "GET": lambda: server.handle_lake_staged(params)
                    },
                    "/api/v1/lake/prune-report": {
                        "POST": lambda: server.handle_lake_prune_report(
                            self._body()
                        )
                    },
                }
                handlers = table.get(route)
                if handlers is None and route.startswith("/api/v1/lake/tags/"):
                    tag_name = route.rsplit("/", 1)[1]
                    handlers = {
                        "DELETE": lambda: server.handle_lake_tag_delete(tag_name)
                    }
                if handlers is None and route.startswith("/api/v1/etl/jobs/"):
                    job_id = route.rsplit("/", 1)[1]
                    handlers = {
                        "GET": lambda: server.handle_get_job(job_id),
                        "DELETE": lambda: server.handle_delete_job(job_id),
                    }
                if handlers is None:
                    raise ApiError(
                        404, {"error": "Endpoint not found", "path": route}
                    )
                handler = handlers.get(method)
                if handler is None:  # known route, wrong verb (app.py 405)
                    raise ApiError(
                        405,
                        {
                            "error": "Method not allowed",
                            "path": route,
                            "allowed": sorted(handlers),
                        },
                    )
                return handler()

            def do_GET(self):  # noqa: N802
                self._dispatch("GET")

            def do_POST(self):  # noqa: N802
                self._dispatch("POST")

            def do_DELETE(self):  # noqa: N802
                self._dispatch("DELETE")

            def do_PUT(self):  # noqa: N802 — JSON 405, not stdlib HTML 501
                self._dispatch("PUT")

            def do_PATCH(self):  # noqa: N802
                self._dispatch("PATCH")

        return Handler

"""DuckDB oracle SQL — an independent SQL implementation of the pipeline
semantics, generated from the same ``PipelineConfig``.

DuckDB's regex functions are RE2 (same engine as Go's regexp and
pyarrow.compute), so rule semantics transfer: ``regexp_matches`` is the
unanchored match gate (Go FindStringSubmatch), ``regexp_replace(..,
'g')`` is ReplaceAllString, and ``\\1`` backrefs equal the translated
value_expr.  The driver compares each Ray query against the matching
SQL here (row count + schema + order-insensitive value hash).

The SQL is one CTE chain per query, all derived from a shared prelude;
every intermediate mirrors a pipeline stage (parse → enrich → assemble
→ decide → winners → route → aggregates).
"""

from __future__ import annotations

from asserts_otel_processor_ray.config import PipelineConfig
from asserts_otel_processor_ray.functions.keys import (
    ATTR_ERROR_TYPE,
    ATTR_REQUEST_CONTEXT,
    attr_column,
)
from asserts_otel_processor_ray.stages.parse import _ATTR_PATTERNS


def _q(s: str) -> str:
    """SQL single-quote a literal."""
    return "'" + s.replace("'", "''") + "'"


def _pattern_group1(pattern: str) -> str:
    """Our parse patterns use one named group (?P<v>...) → plain group
    for DuckDB's regexp_extract."""
    return pattern.replace("(?P<v>", "(")


def parse_cte(config: PipelineConfig, src: str) -> str:
    kind_case = "CASE role " + " ".join(
        f"WHEN {_q(r)} THEN {_q(k)}"
        for r, k in config.role_kind_map.items()) + " ELSE 'Internal' END"
    attrs = ",\n      ".join(
        f"NULLIF(regexp_extract(text, {_q(_pattern_group1(p))}, 1), '') "
        f"AS {col}" for col, p in _ATTR_PATTERNS)
    return f"""
  raw AS (SELECT * FROM {src}),
  parsed0 AS (
    SELECT conv_id, turn_idx, role, text, tool, ts,
      {kind_case} AS kind,
      CASE WHEN contains(tool, '#') THEN split_part(tool, '#', 1)
           ELSE '' END AS namespace,
      CASE WHEN contains(tool, '#') THEN regexp_replace(tool, '^[^#]*#', '')
           ELSE tool END AS service,
      (turn_idx = 0) AS is_root,
      {attrs}
    FROM raw),
  parsed AS (
    SELECT *,
      role || ':' || service AS span_name,
      COALESCE(regexp_matches(attr_status, '^[45]'), FALSE) AS has_error,
      CASE WHEN COALESCE(regexp_matches(attr_status, '^[45]'), FALSE)
           THEN 'ERROR' ELSE 'OK' END AS status_code
    FROM parsed0
    WHERE service IS NOT NULL AND service <> '')"""


def _rule_expr(rule) -> str:
    """SQL for one compiled rule: NULL when not applicable/no match."""
    srcs = list(rule.source_attributes)
    joined = " || ';' || ".join(srcs) if len(srcs) > 1 else srcs[0]
    kinds = ", ".join(_q(k) for k in rule.span_kinds)
    return (f"CASE WHEN kind IN ({kinds}) AND ({joined}) IS NOT NULL "
            f"AND regexp_matches({joined}, {_q(rule.regex)}) "
            f"THEN NULLIF(regexp_replace({joined}, {_q(rule.regex)}, "
            f"{_q(rule.replacement_re2)}, 'g'), '') END")


def enrich_cte(config: PipelineConfig) -> str:
    """The rule engine as generated SQL (resolution chain ns#svc → ns →
    svc, then default when no value — span_enrichment.go:199-241)."""
    rules = config.compiled_rules()
    target_exprs = []
    for target in sorted(rules):
        by_key = rules[target]
        keys = [k for k in by_key if k != "default"]
        resolved = ("CASE WHEN skey IN ({k}) THEN skey "
                    "WHEN namespace IN ({k}) THEN namespace "
                    "WHEN service IN ({k}) THEN service END").format(
            k=", ".join(_q(k) for k in keys)) if keys else "NULL"
        chains = []
        for k in keys:
            chain = "COALESCE(" + ", ".join(
                _rule_expr(r) for r in by_key[k]) + ")"
            chains.append(f"WHEN {_q(k)} THEN {chain}")
        primary = ("CASE (" + resolved + ") " + " ".join(chains) + " END"
                   if chains else "NULL")
        if by_key.get("default"):
            default_chain = "COALESCE(" + ", ".join(
                _rule_expr(r) for r in by_key["default"]) + ")"
            expr = f"COALESCE({primary}, {default_chain})"
        else:
            expr = primary
        # only non-internal spans (or root) are enriched
        expr = f"CASE WHEN eligible THEN ({expr}) END"
        target_exprs.append(f"{expr} AS {attr_column(target)}")

    ctx_col = attr_column(ATTR_REQUEST_CONTEXT)
    err_col = attr_column(ATTR_ERROR_TYPE)
    extra = ""
    if err_col not in {attr_column(t) for t in rules}:
        extra = f", CAST(NULL AS VARCHAR) AS {err_col}"

    # threshold lookup CASEs generated from config (J1/T2)
    req_cases, svc_cases = [], []
    for (ek, req), thr in sorted(config.latency_thresholds.items()):
        if req == "":
            svc_cases.append(f"WHEN entity_key = {_q(ek)} THEN {thr!r}")
        else:
            req_cases.append(
                f"WHEN entity_key = {_q(ek)} AND "
                f"COALESCE({ctx_col}, '') = {_q(req)} THEN {thr!r}")
    req_case = ("CASE " + " ".join(req_cases) + " END") if req_cases \
        else "NULL"
    svc_case = ("CASE " + " ".join(svc_cases) + " END") if svc_cases \
        else "NULL"
    default_thr = config.sampling_latency_threshold_seconds

    return f"""
  elig AS (
    SELECT *,
      CASE WHEN namespace <> '' THEN namespace || '#' || service
           ELSE service END AS skey,
      (kind <> 'Internal' OR is_root) AS eligible
    FROM parsed),
  enriched0 AS (
    SELECT *,
      CASE WHEN eligible THEN
        CASE WHEN kind IN ('Client', 'Producer') THEN 'outbound'
             WHEN kind IN ('Server', 'Consumer') THEN 'inbound'
             WHEN kind = 'Internal' THEN 'internal' END
      END AS asserts_request_type,
      {", ".join(target_exprs)}{extra}
    FROM elig),
  enriched1 AS (
    SELECT * REPLACE (
      CASE WHEN eligible THEN COALESCE({ctx_col}, span_name) END
        AS {ctx_col})
    FROM enriched0),
  enriched AS (
    SELECT *,
      '{{env={config.env}, namespace=' || namespace ||
      ', site={config.site}}}#Service#' || service AS entity_key,
      COALESCE({req_case}, {svc_case}, {default_thr!r})
        AS latency_threshold_s
    FROM enriched1)"""


def assemble_cte(config: PipelineConfig) -> str:
    bucket_us = config.normal_sampling_rate_minutes * 60 * 1_000_000
    ignore = "TRUE" if config.ignore_client_errors else "FALSE"
    err_col = attr_column(ATTR_ERROR_TYPE)
    ctx_col = attr_column(ATTR_REQUEST_CONTEXT)
    return f"""
  lat AS (
    SELECT *,
      COALESCE((epoch_us(lead(ts) OVER (PARTITION BY conv_id
        ORDER BY turn_idx)) - epoch_us(ts)) / 1e6, 0.0) AS latency_s,
      CASE WHEN is_root THEN 0
           WHEN kind IN ('Server', 'Consumer') THEN 1
           WHEN kind IN ('Client', 'Producer') THEN 2
           ELSE 3 END AS class_order,
      min(turn_idx) OVER (PARTITION BY conv_id, namespace, service)
        AS seg_first,
      min(epoch_us(ts)) OVER (PARTITION BY conv_id) AS conv_arrival_us
    FROM enriched),
  seg AS (
    SELECT *,
      dense_rank() OVER (PARTITION BY conv_id ORDER BY seg_first) - 1
        AS seg_order,
      row_number() OVER (PARTITION BY conv_id, namespace, service
        ORDER BY (class_order >= 3), class_order, turn_idx) AS seg_rn
    FROM lat),
  segm AS (
    SELECT *,
      (seg_rn = 1 AND class_order < 3) AS is_seg_main,
      bool_or(class_order < 3) OVER (PARTITION BY conv_id, namespace,
        service) AS seg_has_main,
      max(CASE WHEN seg_rn = 1 AND class_order < 3 THEN latency_s END)
        OVER (PARTITION BY conv_id, namespace, service) AS seg_latency0,
      max(CASE WHEN seg_rn = 1 AND class_order < 3
        THEN COALESCE({ctx_col}, '') END)
        OVER (PARTITION BY conv_id, namespace, service) AS seg_request0
    FROM seg),
  assembled AS (
    SELECT *,
      COALESCE(seg_latency0, 0.0) AS seg_latency,
      COALESCE(seg_request0, '') AS seg_request,
      row_number() OVER (PARTITION BY conv_id
        ORDER BY seg_order, class_order, turn_idx) - 1 AS scan_rank,
      lpad(CAST(conv_arrival_us AS VARCHAR), 20, '0') || '|' || conv_id
        AS arrival_key,
      (has_error AND NOT ({ignore} AND COALESCE({err_col}, '')
        = 'client_errors') AND class_order < 3) AS is_error_turn,
      (latency_s > latency_threshold_s AND class_order < 3)
        AS is_slow_turn,
      conv_arrival_us // {bucket_us} AS ncand_bucket0
    FROM segm),
  cand AS (
    SELECT *,
      CASE WHEN is_error_turn THEN 'error'
           WHEN is_slow_turn AND NOT is_error_turn THEN 'slow' END
        AS turn_cand
    FROM assembled)"""


def decide_cte(config: PipelineConfig) -> str:
    limit = config.limit_per_service
    return f"""
  seg_firsts AS (
    SELECT entity_key, seg_request,
      min(arrival_key || '|' || lpad(CAST(seg_order AS VARCHAR), 5, '0'))
        AS first_seen
    FROM cand WHERE is_seg_main
    GROUP BY entity_key, seg_request),
  allowed AS (
    SELECT entity_key, seg_request FROM (
      SELECT *, row_number() OVER (PARTITION BY entity_key
        ORDER BY first_seen) AS rnk
      FROM seg_firsts) WHERE rnk <= {limit}),
  cand2 AS (
    SELECT c.*,
      (a.entity_key IS NOT NULL) AS seg_allowed
    FROM cand c LEFT JOIN allowed a
      ON c.entity_key = a.entity_key AND c.seg_request = a.seg_request),
  cand3 AS (
    SELECT *,
      (turn_cand IS NOT NULL AND seg_has_main AND seg_allowed)
        AS cand_ok
    FROM cand2),
  tdec AS (
    SELECT conv_id,
      min_by(turn_cand, scan_rank) AS trace_sample_type,
      min_by(entity_key, scan_rank) AS trace_entity,
      min_by(seg_request, scan_rank) AS trace_request,
      min_by(seg_latency, scan_rank) AS trace_latency
    FROM cand3 WHERE cand_ok GROUP BY conv_id),
  ncm AS (
    SELECT conv_id,
      min_by(entity_key, scan_rank) AS ncand_entity,
      min_by(seg_request, scan_rank) AS ncand_request,
      min_by(seg_latency, scan_rank) AS ncand_latency,
      min_by(scan_rank, scan_rank) AS ncand_scan_rank
    FROM cand3
    WHERE is_seg_main AND seg_allowed
      AND conv_id NOT IN (SELECT conv_id FROM tdec)
    GROUP BY conv_id),
  decided AS (
    SELECT c.*,
      CASE WHEN c.cand_ok THEN c.turn_cand END AS turn_sample_type,
      (c.scan_rank = 0) AS is_trace_row,
      t.trace_sample_type, t.trace_entity, t.trace_request,
      t.trace_latency,
      (n.conv_id IS NOT NULL AND c.scan_rank = 0) AS is_ncand,
      (n.conv_id IS NOT NULL AND c.scan_rank = n.ncand_scan_rank)
        AS is_ncand_main,
      n.ncand_entity, n.ncand_request, n.ncand_latency,
      CASE WHEN n.conv_id IS NOT NULL THEN c.ncand_bucket0 END
        AS ncand_bucket
    FROM cand3 c
    LEFT JOIN tdec t ON c.conv_id = t.conv_id
    LEFT JOIN ncm n ON c.conv_id = n.conv_id)"""


def winners_cte(config: PipelineConfig) -> str:
    k = config.per_request_topk
    return f"""
  traces AS (
    SELECT * FROM decided WHERE is_trace_row),
  es_items AS (
    SELECT conv_id, trace_entity AS entity, trace_request AS request,
      CASE WHEN trace_sample_type = 'error' THEN 'error' ELSE 'slow' END
        AS qtype,
      trace_sample_type AS sample_type, trace_latency AS latency,
      arrival_key
    FROM traces WHERE trace_sample_type IS NOT NULL),
  norm_winners AS (
    SELECT conv_id, ncand_entity AS entity, ncand_request AS request,
      'slow' AS qtype, 'normal' AS sample_type,
      ncand_latency AS latency, arrival_key
    FROM (
      SELECT *, row_number() OVER (PARTITION BY ncand_entity,
        ncand_request, ncand_bucket ORDER BY arrival_key) AS rn
      FROM traces WHERE is_ncand) WHERE rn = 1),
  items AS (
    SELECT * FROM es_items UNION ALL SELECT * FROM norm_winners),
  winners AS (
    SELECT * FROM (
      SELECT *, row_number() OVER (PARTITION BY entity, request, qtype
        ORDER BY latency DESC, arrival_key DESC) AS rn
      FROM items) WHERE rn <= {k})"""


def full_prelude(config: PipelineConfig, src: str) -> str:
    return ("WITH" + parse_cte(config, src) + ","
            + enrich_cte(config) + ","
            + assemble_cte(config) + ","
            + decide_cte(config) + ","
            + winners_cte(config))


PARSED_COLS = ("conv_id, turn_idx, role, text, tool, ts, kind, namespace, "
               "service, span_name, is_root, status_code, has_error, "
               "attr_url, attr_status, attr_route, attr_db_op, attr_table, "
               "attr_peer")


def build_oracle_queries(config: PipelineConfig, src: str) -> dict[str, str]:
    """All oracle SQL strings, keyed like __ray_entry__.queries()."""
    rules = config.compiled_rules()
    target_cols = sorted({attr_column(t) for t in rules}
                         | {attr_column(ATTR_REQUEST_CONTEXT),
                            attr_column(ATTR_ERROR_TYPE)})
    enrich_cols = (PARSED_COLS + ", asserts_request_type, "
                   + ", ".join(target_cols)
                   + ", entity_key, latency_threshold_s")
    routed_cols = ("conv_id, turn_idx, role, text, tool, ts, kind, "
                   "namespace, service, span_name, status_code, "
                   "asserts_request_type, asserts_request_context, "
                   "asserts_error_type, asserts_sample_type, sample_type, "
                   "entity_key, latency_s, seg_order, class_order, "
                   "scan_rank")
    p = lambda body: full_prelude(config, src) + body  # noqa: E731

    hist_labels = ("namespace, service, span_kind, status_code, "
                   + ", ".join(sorted(
                       ["asserts_request_type", "asserts_request_context",
                        "asserts_error_type"]
                       + [c.lower().replace(".", "_")
                          for c in config.attributes_as_metric_labels])))

    # metric-side cardinality cap (A5/T5): service_key + request context
    metric_cap = f""",
  mfirsts AS (
    SELECT skey, COALESCE(asserts_request_context, '') AS ctx,
      min(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' || conv_id
          || '|' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')) AS fs
    FROM decided WHERE class_order < 3
    GROUP BY skey, ctx),
  mallowed AS (
    SELECT skey, ctx FROM (
      SELECT *, row_number() OVER (PARTITION BY skey ORDER BY fs) AS rnk
      FROM mfirsts) WHERE rnk <= {config.limit_per_service}),
  mrows AS (
    SELECT d.* FROM decided d
    JOIN mallowed m ON d.skey = m.skey
      AND COALESCE(d.asserts_request_context, '') = m.ctx
    WHERE d.class_order < 3)"""

    edges = config.latency_histogram_buckets
    le_case = ("CASE " + " ".join(
        f"WHEN latency_s <= {e!r} THEN {e!r}" for e in edges)
        + " ELSE CAST('inf' AS DOUBLE) END")
    from asserts_otel_processor_ray.functions.keys import (
        apply_prom_conventions as _apc)
    extra_hrows = "".join(
        f"COALESCE({src}, '') AS {_apc(src)},\n      "
        for src in config.attributes_as_metric_labels)

    routed_sel = """,
  routed AS (
    SELECT d.*, w.sample_type,
      CASE WHEN w.sample_type = 'normal' AND d.is_ncand_main
             THEN 'normal'
           ELSE d.turn_sample_type END AS asserts_sample_type
    FROM decided d JOIN winners w ON d.conv_id = w.conv_id)"""

    queries = {
        "t_parse": p(" SELECT " + PARSED_COLS + " FROM parsed"),
        "t_enrich": p(" SELECT " + enrich_cols + " FROM enriched"),
        "t_latency": p(
            " SELECT conv_id, turn_idx, latency_s, class_order, "
            "conv_arrival_us FROM lat"),
        "t_assemble": p(
            " SELECT conv_id, turn_idx, seg_order, scan_rank, "
            "is_seg_main, seg_has_main, seg_request, seg_latency, "
            "is_error_turn, is_slow_turn, turn_cand, arrival_key "
            "FROM cand"),
        "t_allowed": p(
            " SELECT entity_key, seg_request AS request_context "
            "FROM allowed"),
        "t_trace_decisions": p(
            " SELECT conv_id, trace_sample_type, trace_entity, "
            "trace_request, trace_latency FROM tdec"),
        "t_normal_winners": p(
            " SELECT conv_id, entity, request, latency FROM norm_winners"),
        "t_winners": p(
            " SELECT conv_id, entity, request, qtype, sample_type, "
            "latency FROM winners"),
        # K4 incremental-flush mode: top-K per event-time flush window
        # (window = conv arrival bucket parsed from arrival_key[:20];
        # 600s mirrors queries.WINDOWED_QUERY_SECONDS)
        "t_windowed_winners": p(f""",
  wtraces AS (
    SELECT *, CAST(substr(arrival_key, 1, 20) AS BIGINT) // 600000000
      AS flush_window
    FROM decided WHERE is_trace_row),
  wes AS (
    SELECT flush_window, conv_id, trace_entity AS entity,
      trace_request AS request,
      CASE WHEN trace_sample_type = 'error' THEN 'error' ELSE 'slow' END
        AS qtype,
      trace_sample_type AS sample_type, trace_latency AS latency,
      arrival_key
    FROM wtraces WHERE trace_sample_type IS NOT NULL),
  wnorm AS (
    SELECT flush_window, conv_id, ncand_entity AS entity,
      ncand_request AS request, 'slow' AS qtype, 'normal' AS sample_type,
      ncand_latency AS latency, arrival_key
    FROM (
      SELECT *, row_number() OVER (PARTITION BY flush_window,
        ncand_entity, ncand_request, ncand_bucket
        ORDER BY arrival_key) AS rn
      FROM wtraces WHERE is_ncand) WHERE rn = 1),
  witems AS (
    SELECT * FROM wes UNION ALL SELECT * FROM wnorm),
  wwinners AS (
    SELECT * FROM (
      SELECT *, row_number() OVER (PARTITION BY flush_window, entity,
        request, qtype ORDER BY latency DESC, arrival_key DESC) AS rn
      FROM witems) WHERE rn <= {config.per_request_topk})
  SELECT flush_window, conv_id, entity, request, qtype, sample_type,
    latency FROM wwinners"""),
        # error-turn taxonomy per (namespace, service, error type)
        "t_error_taxonomy": p(""",
  et AS (
    SELECT namespace, service,
      COALESCE(asserts_error_type, '') AS asserts_error_type,
      CASE WHEN is_error_turn THEN 1 ELSE 0 END AS e
    FROM decided),
  esvc AS (
    SELECT namespace, service, count(*) AS svc_turns
    FROM et GROUP BY 1, 2),
  tax AS (
    SELECT namespace, service, asserts_error_type,
      CAST(sum(e) AS BIGINT) AS n_errors
    FROM et GROUP BY 1, 2, 3 HAVING sum(e) > 0)
  SELECT t.namespace, t.service, t.asserts_error_type, t.n_errors,
    CAST(s.svc_turns AS BIGINT) AS svc_turns,
    CAST(t.n_errors AS DOUBLE) / CAST(s.svc_turns AS DOUBLE)
      AS error_share
  FROM tax t JOIN esvc s USING (namespace, service)"""),
        # conversation-length distribution over the RAW transcripts
        "t_conv_sizes": f"""
WITH c AS (
  SELECT conv_id, count(*) AS n FROM {src} GROUP BY 1)
SELECT CAST(n AS BIGINT) AS conv_turns, count(*) AS n_convs
FROM c GROUP BY 1""",
        # within-conversation tool bigrams over the RAW transcript
        # table (no prelude needed — pure lead() window)
        "t_tool_transitions": f"""
WITH w AS (
  SELECT conv_id, tool,
    lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
      AS next_tool
  FROM {src})
SELECT tool, next_tool, count(*) AS n_pairs
FROM w WHERE next_tool IS NOT NULL GROUP BY 1, 2""",
        # exact per-service latency percentiles (discrete quantile =
        # value at 1-based rank ceil(p·n/100) — the g_quantiles
        # convention; latency in exact integer µs)
        "t_latency_quantiles": p(""",
  lq AS (
    SELECT namespace, service,
      CAST(round(latency_s * 1000000) AS BIGINT) AS lat_us
    FROM decided),
  lqr AS (
    SELECT namespace, service, lat_us,
      row_number() OVER (PARTITION BY namespace, service
                         ORDER BY lat_us) AS rn,
      count(*) OVER (PARTITION BY namespace, service) AS n
    FROM lq)
  SELECT namespace, service, CAST(max(n) AS BIGINT) AS n_turns,
    max(CASE WHEN rn = (50 * n + 99) // 100 THEN lat_us END) AS p50_us,
    max(CASE WHEN rn = (90 * n + 99) // 100 THEN lat_us END) AS p90_us,
    max(CASE WHEN rn = (99 * n + 99) // 100 THEN lat_us END) AS p99_us
  FROM lqr GROUP BY namespace, service"""),
        "t_routed_error": p(routed_sel + " SELECT " + routed_cols
                            + " FROM routed WHERE sample_type = 'error'"),
        "t_routed_slow": p(routed_sel + " SELECT " + routed_cols
                           + " FROM routed WHERE sample_type = 'slow'"),
        "t_routed_normal": p(routed_sel + " SELECT " + routed_cols
                             + " FROM routed WHERE sample_type = 'normal'"),
        "t_agg_trace_count": p(
            f" SELECT '{config.env}' AS asserts_env, "
            f"'{config.site}' AS asserts_site, "
            "count(DISTINCT conv_id) AS trace_count_total FROM decided"),
        "t_agg_span_count": p(
            f" SELECT '{config.env}' AS asserts_env, "
            f"'{config.site}' AS asserts_site, namespace, service, "
            "count(*) AS span_count_total FROM decided "
            "GROUP BY namespace, service"),
        "t_agg_sampled_count": p(routed_sel +
            f" SELECT '{config.env}' AS asserts_env, "
            f"'{config.site}' AS asserts_site, sample_type, "
            "count(*) AS trace_sampled_count_total "
            "FROM winners GROUP BY sample_type"),
        "t_agg_span_sampled": p(routed_sel +
            f" SELECT '{config.env}' AS asserts_env, "
            f"'{config.site}' AS asserts_site, namespace, service, "
            "count(*) AS span_sampled_count_total FROM routed "
            "GROUP BY namespace, service"),
        "t_agg_latency_hist": p(metric_cap + f""",
  hrows AS (
    SELECT namespace, service, kind AS span_kind, status_code,
      COALESCE(asserts_request_type, '') AS asserts_request_type,
      COALESCE(asserts_request_context, '') AS asserts_request_context,
      COALESCE(asserts_error_type, '') AS asserts_error_type,
      {extra_hrows}
      {le_case} AS le, latency_s
    FROM mrows)
  SELECT '{config.env}' AS asserts_env, '{config.site}' AS asserts_site,
    {hist_labels}, le,
    count(*) AS bucket_count,
    -- exact-µs sum, divided once: latency_s is k/1e6 by construction,
    -- so this is order-independent and bitwise-equal to the engine's
    -- integer-microsecond partial sums (stages/aggregate.py)
    CAST(sum(CAST(round(latency_s * 1000000) AS BIGINT)) AS DOUBLE)
      / 1000000.0 AS latency_sum,
    count(latency_s) AS latency_count
  FROM hrows GROUP BY {hist_labels}, le"""),
    }
    jq = jaeger_oracle_sql()
    if jq is not None:
        queries["t_jaeger"] = jq
    return queries


def jaeger_oracle_sql(paths: list[str] | None = None) -> str | None:
    """S2 oracle: the Jaeger-JSON → transcript conversion
    (sources/jaeger.py, reference span shape:
    assertsprocessor/testdata/sample-trace-*.json) re-expressed over
    DuckDB's read_json — an independent implementation of the same
    semantics: spans ordered by (startTime, spanID) per trace, span.kind
    → role, process serviceName → tool, tag markers flattened into text
    in fixed order.  Returns None when the fixtures are absent (keeps
    queries() and oracle_sql() keys in lockstep)."""
    if paths is None:
        from asserts_otel_processor_ray.pipelines.queries import (
            jaeger_fixture_paths)
        paths = jaeger_fixture_paths()
    if not paths:
        return None
    plist = "['" + "','".join(paths) + "']"

    def tagv(key: str) -> str:
        return (f"list_filter(tags, x -> ((x->>'key') = '{key}'))[1]"
                "->>'value'")

    return f"""
WITH docs AS (
  SELECT unnest(data) AS tr
  FROM read_json({plist}, columns={{data: 'JSON[]'}})
),
spans AS (
  SELECT tr->>'traceID' AS conv_id,
         tr->'processes' AS procs,
         unnest(CAST(tr->'spans' AS JSON[])) AS s
  FROM docs
),
ex AS (
  SELECT conv_id,
    COALESCE(s->>'spanID', '') AS span_id,
    COALESCE(CAST(s->'startTime' AS BIGINT), 0) AS start_us,
    COALESCE(s->>'operationName', '') AS op,
    COALESCE(procs -> (s->>'processID') ->> 'serviceName', '') AS tool,
    CAST(s->'tags' AS JSON[]) AS tags
  FROM spans
),
tagext AS (
  SELECT conv_id, span_id, start_us, op, tool,
    {tagv('span.kind')} AS kind,
    {tagv('http.url')} AS v_url,
    {tagv('http.status_code')} AS v_status,
    {tagv('http.route')} AS v_route,
    {tagv('db.operation')} AS v_dbop,
    {tagv('aws.table.name')} AS v_table,
    {tagv('peer.address')} AS v_peer
  FROM ex
)
SELECT conv_id,
  CAST(row_number() OVER (PARTITION BY conv_id
       ORDER BY start_us, span_id) - 1 AS INTEGER) AS turn_idx,
  CASE WHEN kind IN ('server', 'consumer') THEN 'user'
       WHEN kind IN ('client', 'producer') THEN 'tool'
       ELSE 'assistant' END AS role,
  concat_ws(' ', nullif(op, ''),
    'url=' || v_url, 'status=' || v_status, 'route=' || v_route,
    'db.op=' || v_dbop, 'table=' || v_table, 'peer=' || v_peer) AS text,
  tool, make_timestamp(start_us) AS ts
FROM tagext"""

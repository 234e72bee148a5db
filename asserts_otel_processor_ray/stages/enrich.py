"""Stage 2 — rule-based span enrichment + threshold lookup.

Replicates the reference's enrichment semantics vectorized over Arrow:

* M3 request-type tagging (assertsprocessor/span_enrichment.go:243-253)
* M4 custom-attribute regex extraction: per rule, if span kind ∈
  span_kinds and *all* source attributes present → join their values with
  ";" → if the regex matches anywhere, value = global replace with
  value_expr; empty result counts as no match; first matching rule wins
  (assertsprocessor/custom_attribute.go:79-100,
  assertsprocessor/span_enrichment.go:199-223)
* M5 rule resolution by service key: ``ns#svc`` → ``ns`` → ``svc``, then
  the "default" rules whenever no value was produced
  (assertsprocessor/span_enrichment.go:231-241,211-218)
* M6 request-context fallback to span name
  (assertsprocessor/span_enrichment.go:225-228)
* J1/T2 threshold lookup with request → service-default → config-default
  fallback (assertsprocessor/thresholds.go:34-55)

Only non-internal spans — root, entry (Server|Consumer), exit
(Client|Producer) — are enriched; pure-internal turns pass through with
null enrichment columns (processor.go enriches trace.getNonInternalSpans,
where a root span counts as non-internal even if its kind is Internal,
assertsprocessor/trace.go:22-35).

Designed as an actor-pool stage: rule compilation/validation happens once
per actor in ``__init__``; ``__call__`` is fully vectorized RE2 via
pyarrow.compute (the same regex engine as Go's regexp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from asserts_otel_processor_ray.config import CompiledRule, PipelineConfig
from asserts_otel_processor_ray.functions.keys import (
    ATTR_ERROR_TYPE,
    ATTR_REQUEST_CONTEXT,
    KIND_CLIENT,
    KIND_CONSUMER,
    KIND_INTERNAL,
    KIND_PRODUCER,
    KIND_SERVER,
    attr_column,
    service_key,
)

_REQUEST_TYPE_BY_KIND = {
    KIND_CLIENT: "outbound",
    KIND_PRODUCER: "outbound",
    KIND_SERVER: "inbound",
    KIND_CONSUMER: "inbound",
    KIND_INTERNAL: "internal",
}


class EntityThresholdDeriver:
    """entity_key + latency_threshold_s from (namespace, service,
    request context) — keys.go:13-30 key format and thresholds.go:34-55
    request → service-default → config-default lookup, computed over the
    DISTINCT (ns, svc, ctx) triples of a batch and scattered back.

    Shared by EnrichStage (the canonical computation) and the assemble
    scan, which re-derives the two columns after the sort because they
    are dropped from the sort payload (pipelines/pipeline.py:
    slim_columns — entity_key alone is ~30% of the exchanged bytes).
    Single implementation ⇒ the re-derived columns are bitwise-equal by
    construction."""

    def __init__(self, config: PipelineConfig):
        self.env, self.site = config.env, config.site
        # T2: broadcast threshold store, two-level fallback
        self.request_thresholds: dict[str, float] = {}
        self.service_thresholds: dict[str, float] = {}
        for (entity_key, request), thr in config.latency_thresholds.items():
            if request == "":
                self.service_thresholds[entity_key] = thr
            else:
                self.request_thresholds[entity_key + "#" + request] = thr
        self.default_threshold = config.sampling_latency_threshold_seconds

    def derive(self, ns_np: np.ndarray, svc_np: np.ndarray,
               ctx_np: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(entity_key, threshold) arrays; ctx nulls must already be
        '' (matching the enrich threshold lookup's fillna(''))."""
        ni, nu = pd.factorize(ns_np)
        si, su = pd.factorize(svc_np)
        ci, cu = pd.factorize(ctx_np)
        n_svc, n_ctx = max(len(su), 1), max(len(cu), 1)
        pair_codes = ni.astype(np.int64) * n_svc + si
        up, pinv = np.unique(pair_codes, return_inverse=True)
        ek_by_pair = {
            p: ("{env=" + self.env + ", namespace=" + nu[p // n_svc]
                + ", site=" + self.site + "}#Service#" + su[p % n_svc])
            for p in up}
        ek_u = np.array([ek_by_pair[p] for p in up], dtype=object)
        triple_codes = pair_codes * n_ctx + ci
        ut, tinv = np.unique(triple_codes, return_inverse=True)
        thr_u = np.empty(len(ut), np.float64)
        for j, tc in enumerate(ut):
            ek = ek_by_pair[tc // n_ctx]
            thr = self.request_thresholds.get(ek + "#" + cu[tc % n_ctx])
            if thr is None:
                thr = self.service_thresholds.get(ek,
                                                  self.default_threshold)
            thr_u[j] = thr
        return ek_u[pinv], thr_u[tinv]

    def attach(self, t: pa.Table) -> pa.Table:
        """Append the two derived columns to a table carrying
        namespace / service / asserts_request_context."""
        if t.num_rows == 0:
            return (t.append_column("entity_key", pa.nulls(0, pa.string()))
                    .append_column("latency_threshold_s",
                                   pa.nulls(0, pa.float64())))
        ns_np = t.column("namespace").to_numpy(zero_copy_only=False)
        svc_np = t.column("service").to_numpy(zero_copy_only=False)
        ctx_np = (t.column("asserts_request_context").to_pandas()
                  .fillna("").to_numpy())
        ek, thr = self.derive(ns_np, svc_np, ctx_np)
        return (t.append_column("entity_key", pa.array(ek, pa.string()))
                .append_column("latency_threshold_s",
                               pa.array(thr, pa.float64())))


class EnrichStage:
    """Callable class for ``map_batches(EnrichStage, concurrency=N,
    fn_constructor_args=(config,))`` — state built once per actor."""

    def __init__(self, config: PipelineConfig):
        self.config = config
        self.rules = config.compiled_rules()          # T1: validated once
        self.targets = sorted(self.rules)             # deterministic order
        self.deriver = EntityThresholdDeriver(config)
        self.request_thresholds = self.deriver.request_thresholds
        self.service_thresholds = self.deriver.service_thresholds
        self.default_threshold = self.deriver.default_threshold

    # ---- rule machinery -------------------------------------------------

    @staticmethod
    def _resolve(by_skey: dict[str, list[CompiledRule]], ns: str,
                 svc: str) -> list[CompiledRule] | None:
        """span_enrichment.go:231-241 lookup order."""
        for key in (service_key(ns, svc), ns, svc):
            rules = by_skey.get(key)
            if rules is not None:
                return rules
        return None

    def _rule_result(self, batch: pa.Table, rule: CompiledRule,
                     cache: dict) -> tuple[pa.Array, pa.Array]:
        """(assignable_mask, value) for a rule over the whole batch,
        ignoring service scoping (applied by the caller's pair mask)."""
        ck = (rule.regex, rule.source_attributes, rule.replacement_re2,
              rule.span_kinds)
        if ck in cache:
            return cache[ck]
        kind = batch.column("kind")
        kind_ok = pc.is_in(kind, value_set=pa.array(rule.span_kinds))
        cols = [batch.column(sa) for sa in rule.source_attributes]
        # ";"-join; emit_null when any source missing = all-present gate
        joined = (cols[0] if len(cols) == 1
                  else pc.binary_join_element_wise(*cols, ";"))
        # log payloads repeat heavily: run the regex over DISTINCT
        # joined values and scatter back (dictionary-style), which cuts
        # regex work by the duplication factor
        uniq = pc.unique(
            joined.combine_chunks() if isinstance(joined, pa.ChunkedArray)
            else joined)
        if len(uniq) * 2 < batch.num_rows:
            m_u = pc.match_substring_regex(uniq, rule.regex)
            v_u = pc.replace_substring_regex(uniq, rule.regex,
                                             rule.replacement_re2)
            idx = pc.index_in(joined, uniq)
            matched = pc.take(m_u, idx)
            value = pc.take(v_u, idx)
        else:
            matched = pc.match_substring_regex(joined, rule.regex)
            value = pc.replace_substring_regex(joined, rule.regex,
                                               rule.replacement_re2)
        ok = pc.and_kleene(kind_ok, matched)
        ok = pc.and_kleene(ok, pc.not_equal(value, ""))  # empty = no match
        ok = pc.fill_null(ok, False)
        out = (ok, value)
        cache[ck] = out
        return out

    # ---- batch transform ------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return self._empty_like(batch)
        kind = batch.column("kind")
        is_root = batch.column("is_root")
        eligible = pc.or_(pc.not_equal(kind, KIND_INTERNAL), is_root)

        # M3: request type (only set on enriched spans)
        kinds = list(_REQUEST_TYPE_BY_KIND)
        rt_values = pa.array([_REQUEST_TYPE_BY_KIND[k] for k in kinds])
        rt = pc.take(rt_values, pc.index_in(kind, pa.array(kinds)))
        request_type = pc.if_else(eligible, rt, pa.scalar(None, pa.string()))

        # distinct (ns, svc) pairs in this batch (small).  The packed
        # service key is built with Arrow kernels — np.char.add is a
        # per-element Python-level string op (~µs/row, was 37% of this
        # stage's CPU)
        ns_a = pc.fill_null(batch.column("namespace"), "")
        svc_a = pc.fill_null(batch.column("service"), "")
        skey_arr = pc.if_else(
            pc.not_equal(ns_a, ""),
            pc.binary_join_element_wise(ns_a, svc_a, "#"), svc_a)
        if isinstance(skey_arr, pa.ChunkedArray):
            skey_arr = skey_arr.combine_chunks()
        ns_np = ns_a.to_numpy(zero_copy_only=False)
        svc_np = svc_a.to_numpy(zero_copy_only=False)
        skey_np = skey_arr.to_numpy(zero_copy_only=False)
        pairs = pd.DataFrame({"ns": ns_np, "svc": svc_np,
                              "skey": skey_np}).drop_duplicates("skey")

        cache: dict = {}
        target_cols: dict[str, pa.Array] = {}
        null_str = pa.nulls(n, pa.string())
        for target in self.targets:
            by_skey = self.rules[target]
            value = null_str
            for _, pr in pairs.iterrows():
                rules = self._resolve(by_skey, pr["ns"], pr["svc"])
                if not rules:
                    continue
                pair_mask = pc.equal(skey_arr, pr["skey"])
                for rule in rules:
                    ok, rule_val = self._rule_result(batch, rule, cache)
                    assign = pc.and_(pc.and_(pair_mask, ok),
                                     pc.is_null(value))
                    assign = pc.and_(assign, eligible)
                    value = pc.if_else(assign, rule_val, value)
            default_rules = by_skey.get("default")
            if default_rules:
                for rule in default_rules:
                    ok, rule_val = self._rule_result(batch, rule, cache)
                    assign = pc.and_(pc.and_(ok, pc.is_null(value)), eligible)
                    value = pc.if_else(assign, rule_val, value)
            target_cols[attr_column(target)] = value

        # M6: request-context fallback to span name (eligible rows only)
        ctx_col_name = attr_column(ATTR_REQUEST_CONTEXT)
        ctx = target_cols.get(ctx_col_name, null_str)
        ctx = pc.if_else(eligible, pc.coalesce(ctx, batch.column("span_name")),
                         pa.scalar(None, pa.string()))
        target_cols[ctx_col_name] = ctx
        if attr_column(ATTR_ERROR_TYPE) not in target_cols:
            target_cols[attr_column(ATTR_ERROR_TYPE)] = null_str

        # entity key (keys.go:13-30 format) + J1 threshold lookup —
        # shared deriver (also used by the post-sort re-derive)
        ctx_np = pd.Series(ctx.to_pandas()).fillna("").to_numpy()
        ek_np, thr_np = self.deriver.derive(ns_np, svc_np, ctx_np)

        out = batch
        out = out.append_column("asserts_request_type", request_type)
        for name in sorted(target_cols):
            out = out.append_column(name, target_cols[name])
        out = out.append_column("entity_key", pa.array(ek_np, pa.string()))
        out = out.append_column(
            "latency_threshold_s", pa.array(thr_np, pa.float64()))
        return out

    def _empty_like(self, batch: pa.Table) -> pa.Table:
        out = batch
        extra = ["asserts_request_type"] + sorted(
            {attr_column(t) for t in self.targets}
            | {attr_column(ATTR_REQUEST_CONTEXT),
               attr_column(ATTR_ERROR_TYPE)})
        for name in extra:
            out = out.append_column(name, pa.nulls(0, pa.string()))
        out = out.append_column("entity_key", pa.nulls(0, pa.string()))
        out = out.append_column("latency_threshold_s",
                                pa.nulls(0, pa.float64()))
        return out


def enrich_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    """Functional form for tests / small runs."""
    return EnrichStage(config)(batch)

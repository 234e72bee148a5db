"""Deterministic synthetic transcript tables (FIXTURES.md F1).

The driver's testdata has no transcript table, so the pipeline's primary
input is synthesized here: seeded, parameter-free, with a Zipf-ish head of
hot conversations and hot tools so the salted/partitioned paths are
exercised at test scale.  The text corpus embeds regex-extractable markers
modeled on the reference's sample configs and Jaeger fixtures
(sample-collector-config.yaml:24-73, assertsprocessor/testdata/
sample-trace-1.json: http.url, http.status_code, db ops, peer address).

Scale: ``n_turns ≈ 6_000_000 × sf`` so sf0.001/0.01/0.1 mirror the
driver's lineitem row counts (6k / 60k / 600k turns).
"""

from __future__ import annotations

import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from asserts_otel_processor_ray.schema import TRANSCRIPT_SCHEMA

SEED = 42
TURNS_PER_SF = 6_000_000
CACHE_ROOT = "/tmp/graft_transcripts"
BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed epoch µs

_AGENT_SERVICES = ["chat#assistant", "agent#planner", "support",
                   "platform#api-server"]
_AGENT_P = [0.50, 0.20, 0.15, 0.15]
_TOOLS = ["db#dynamo", "search", "payments#api", "http#client",
          "cache#redis", ""]
_TOOL_P = [0.40, 0.20, 0.15, 0.10, 0.10, 0.05]
_HOSTS = ["api.example.com", "svc.internal", "shop.example.org"]
_SEGS = ["foo", "bar", "baz", "users", "orders", "cart", "items", "v1",
         "checkout", "search"]
_ROUTES = ["users", "orders", "cart", "payments", "catalog"]
_DB_OPS = ["GetItem", "PutItem", "Query", "Scan"]
_TABLES = ["orders", "carts", "users", "inventory"]
_STATUS = ["200", "201", "301", "404", "429", "500", "503"]
_STATUS_P = [0.82, 0.04, 0.02, 0.05, 0.02, 0.04, 0.01]
_LOREM = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()


def generate_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    """Build a transcript table of ~n_turns rows, fully deterministic."""
    rng = np.random.default_rng(seed)

    # Conversation lengths: 85% short (4-12), 10% medium (13-40),
    # 5% hot (41-200) → mean ≈ 15 turns.
    est_convs = max(1, int(n_turns / 15) + 8)
    bucket = rng.choice(3, size=est_convs, p=[0.85, 0.10, 0.05])
    lengths = np.where(
        bucket == 0, rng.integers(4, 13, est_convs),
        np.where(bucket == 1, rng.integers(13, 41, est_convs),
                 rng.integers(41, 201, est_convs)))
    cum = np.cumsum(lengths)
    n_convs = int(np.searchsorted(cum, n_turns)) + 1
    n_convs = min(n_convs, est_convs)
    lengths = lengths[:n_convs]
    total = int(lengths.sum())

    cum_l = np.cumsum(lengths)
    firsts = np.concatenate([[0], cum_l[:-1]])
    conv_ord = np.repeat(np.arange(n_convs), lengths)
    turn_idx = np.arange(total) - np.repeat(firsts, lengths)
    # build ids per CONV then repeat (string kernels are ~µs/element)
    conv_id_u = np.char.add("c", np.char.zfill(
        np.arange(n_convs).astype("U8"), 8))
    conv_id = np.repeat(conv_id_u, lengths)

    # Roles: turn 0 = user (root); later turns weighted.
    role_pick = rng.choice(["user", "assistant", "tool"], size=total,
                           p=[0.20, 0.45, 0.35])
    role = np.where(turn_idx == 0, "user", role_pick)

    # Services: agent service per conversation; tool turns call tools
    # (hot-key skew); ~2% of non-root turns have empty tool → dropped by M1.
    agent_svc = rng.choice(_AGENT_SERVICES, size=n_convs, p=_AGENT_P)
    svc = agent_svc[conv_ord].astype("U32")
    tool_turn = role == "tool"
    svc[tool_turn] = rng.choice(_TOOLS, size=int(tool_turn.sum()), p=_TOOL_P)
    empty_mask = (rng.random(total) < 0.02) & (turn_idx > 0) & ~tool_turn
    svc[empty_mask] = ""

    # Timestamps: conversation starts spread over 24h; per-turn deltas
    # log-uniform 0.02..22s so a real fraction exceeds the 0.5s threshold.
    conv_start = (BASE_TS_US +
                  rng.integers(0, 86_400_000_000, n_convs))[conv_ord]
    delta_us = (10.0 ** np.clip(rng.normal(-1.3, 0.5, total), -2.3, 1.5)
                * 1e6).astype(np.int64)
    delta_us[turn_idx == 0] = 0
    total_cum = np.cumsum(delta_us)
    within_conv = total_cum - np.repeat(total_cum[firsts], lengths)
    ts = conv_start + within_conv

    # Text pool: a deterministic pool of distinct marker-bearing texts
    # (log lines repeat heavily in practice); rows sample pool indices so
    # generation stays O(pool) for the string work and O(n) for indices.
    pool_n = int(min(total, 20_000))
    url_on = rng.random(pool_n) < 0.85
    nseg = rng.integers(1, 5, pool_n)
    seg_pick = rng.integers(0, len(_SEGS), size=(pool_n, 4))
    host = rng.choice(_HOSTS, pool_n)
    status_on = rng.random(pool_n) < 0.90
    status = rng.choice(_STATUS, pool_n, p=_STATUS_P)
    route_on = rng.random(pool_n) < 0.40
    route = rng.choice(_ROUTES, pool_n)
    db_on = rng.random(pool_n) < 0.30
    db_op = rng.choice(_DB_OPS, pool_n)
    table = rng.choice(_TABLES, pool_n)
    peer_on = rng.random(pool_n) < 0.25
    peer_host = rng.choice(_HOSTS, pool_n)
    peer_port = rng.integers(1024, 9999, pool_n)
    lorem_a = rng.integers(0, len(_LOREM), size=(pool_n, 3))
    lorem_b = rng.integers(0, len(_LOREM), size=(pool_n, 2))

    segs = np.asarray(_SEGS)
    pool = []
    for i in range(pool_n):
        parts = [_LOREM[lorem_a[i, 0]], _LOREM[lorem_a[i, 1]],
                 _LOREM[lorem_a[i, 2]]]
        if url_on[i]:
            path = "/" + "/".join(segs[seg_pick[i, :nseg[i]]])
            parts.append(
                f"url=https://{host[i]}{path}?q={_LOREM[lorem_b[i, 0]]}")
        if status_on[i]:
            parts.append(f"status={status[i]}")
        if route_on[i]:
            parts.append(f"route=/api/{route[i]}/:id")
        if db_on[i]:
            parts.append(f"db.op={db_op[i]} table={table[i]}")
        if peer_on[i]:
            parts.append(f"peer={peer_host[i]};{peer_port[i]}")
        parts.append(_LOREM[lorem_b[i, 1]])
        pool.append(" ".join(parts))

    pool_arr = pa.array(pool, pa.string())
    text_idx = rng.integers(0, pool_n, total)
    import pyarrow.compute as pc
    # chunk the take so no single string chunk exceeds the 2 GiB
    # int32-offset limit at large scale factors
    chunk = 5_000_000
    texts = pa.chunked_array([
        pc.take(pool_arr, pa.array(text_idx[i:i + chunk], pa.int32()))
        for i in range(0, total, chunk)])

    return pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx.astype(np.int32), pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": texts,
        "tool": pa.array(svc, pa.string()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)$", sf_dir.rstrip("/"))
    if not m:
        raise ValueError(f"cannot infer scale factor from {sf_dir!r}")
    return float(m.group(1))


def transcripts_dir(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(CACHE_ROOT, base, "transcripts")


def ensure_transcripts(sf_dir: str) -> str:
    """Generate (once, atomically) the transcript parquet for an sf dir.

    Writes a directory of parquet files (≤100k rows each) so reads
    parallelize; returns the directory path.  Idempotent and safe under
    concurrent callers (tmp dir + atomic rename).
    """
    out = transcripts_dir(sf_dir)
    if os.path.isdir(out) and os.listdir(out):
        return out
    n_turns = int(TURNS_PER_SF * sf_from_dir(sf_dir))
    tbl = generate_transcripts(n_turns)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(out))
    try:
        rows_per_file = 100_000
        n_files = max(1, (tbl.num_rows + rows_per_file - 1) // rows_per_file)
        for i in range(n_files):
            chunk = tbl.slice(i * rows_per_file, rows_per_file)
            pq.write_table(chunk, os.path.join(tmp, f"part-{i:05d}.parquet"),
                           row_group_size=32_768)
        os.rename(tmp, out)
    except OSError:
        # lost the rename race — another process finished first
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        if not (os.path.isdir(out) and os.listdir(out)):
            raise
    return out

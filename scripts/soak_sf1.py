"""sf1 scale soak: build a 10× corpus from the driver's sf0.1 parquet and
run the full bench at it (queries at sf1 + the extraction pipeline at 600k
pages). Publishes one JSON line; the runner stores it as BENCH/BENCH_sf1.json.

Replication design (perf soak, not an oracle run — referential integrity
and distribution shape are what matter):
- fact tables get 10 replicas with consistent key offsets (orders.o_custkey
  moves with customer.c_custkey, lineitem.l_orderkey with orders, and
  events.user_id moves with o_custkey so the as-of join events->orders keeps
  its match rate per replica), so join cardinalities scale exactly 10×;
- dimension tables (nation, region, part, supplier) stay 1× like real
  dims would;
- documents/claims text: every WORD gets a per-replica suffix (replica 0
  untouched). Plain text copies would make each doc a Jaccard-1.0 near-dup
  of its 9 replicas, turning the shared-shingle joins quadratic in the
  replica count (100× wall, not 10×) — an artifact of replication, not of
  scale. Suffixed words keep shingle-sharing strictly within a replica, so
  near-dup work scales linearly like a real 10× corpus;
- doc_id/vec_id offsets are multiples of 10: the derived-corpus block
  structure (id - id % 10 anchors) is preserved inside each replica.

Usage: python scripts/soak_sf1.py [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, "_cache", "sf1")
REPLICAS = 10


def build_sf1() -> None:
    import duckdb

    os.makedirs(SF1_DIR, exist_ok=True)
    marker = os.path.join(SF1_DIR, "_SOAK_READY")
    if os.path.exists(marker):
        print(f"# sf1 already built at {SF1_DIR}", file=sys.stderr)
        return
    con = duckdb.connect()
    rep = f"(SELECT unnest(generate_series(0, {REPLICAS - 1})) AS i) r"
    # per-replica word suffix; replica 0 keeps the original text
    perturb = (
        "CASE WHEN r.i = 0 THEN text ELSE array_to_string("
        "list_transform(string_split(text, ' '), w -> w || '_r' || r.i), ' ') END"
    )
    jobs = {
        "documents": f"""
            SELECT doc_id + r.i * 1000000 AS doc_id, {perturb} AS text,
                   lang, source, length({perturb})::BIGINT AS n_chars
            FROM '{SRC}/documents.parquet', {rep}""",
        "embeddings": f"""
            SELECT vec_id + r.i * 1000000 AS vec_id,
                   CASE WHEN r.i = 0 THEN embedding
                        ELSE list_transform(embedding, x -> x + 0.0001 * r.i)
                   END AS embedding, label
            FROM '{SRC}/embeddings.parquet', {rep}""",
        "events": f"""
            SELECT event_id + r.i * 10000000 AS event_id, ts,
                   user_id + r.i * 1000000 AS user_id, event_type, value, props
            FROM '{SRC}/events.parquet', {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + r.i * 10000000 AS l_orderkey, l_partkey,
                   l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', {rep}""",
        "orders": f"""
            SELECT o_orderkey + r.i * 10000000 AS o_orderkey,
                   o_custkey + r.i * 1000000 AS o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', {rep}""",
        "customer": f"""
            SELECT c_custkey + r.i * 1000000 AS c_custkey,
                   c_name || '_r' || r.i AS c_name, c_nationkey, c_acctbal,
                   c_mktsegment
            FROM '{SRC}/customer.parquet', {rep}""",
    }
    for t, sql in jobs.items():
        out = os.path.join(SF1_DIR, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"# sf1 {t}: {n} rows", file=sys.stderr)
    for t in ("nation", "region", "part", "supplier"):
        out = os.path.join(SF1_DIR, f"{t}.parquet")
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}' (FORMAT PARQUET)"
        )
    open(marker, "w").write("ok")


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH", "BENCH_sf1.json"
    )
    build_sf1()
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = SF1_DIR
    env["SPARK_GRAFT_PAGES"] = env.get("SOAK_PAGES", "600000")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    sys.stderr.write(proc.stderr[-4000:])
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode != 0 or not line.startswith("{"):
        print(f"# bench failed rc={proc.returncode}", file=sys.stderr)
        sys.exit(1)
    payload = json.loads(line)
    payload["sf"] = "1(replicated-10x-from-0.1)"
    with open(out_json, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

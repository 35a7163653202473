#!/usr/bin/env python3
"""Time each headline entry's DuckDB oracle at a given sf dir (dev tool —
the BASELINE_MEASURED.md method: 32 threads, same parquet views the
CORRECTNESS gate uses, warm best-of-N).

Usage: python3 tools/bench_oracle.py [sfdir] [outdir] [passes]
  expects <outdir>/oracle_sql.json from a prior `runMain graft.Verify`
  (or ProbeOne) dump; times only the graft.Bench headline set.
"""
import json, os, sys, glob, time, threading
import duckdb

# Optional per-oracle timeout (seconds) for large fixtures where some
# pair-family oracles exceed single-node capacity — same interrupt-with-
# flag protocol as tools/check.py; timed-out entries report "timeout".
TIMEOUT_S = int(os.environ.get("ORACLE_BENCH_TIMEOUT_S", "0") or "0")
INTERRUPT_EXC = getattr(duckdb, "InterruptException", ())

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

# keep in sync with graft.Bench.headline
HEADLINE = [
    "r9_agg_sum", "r13_order_multi", "ext_global_agg", "route_reagg_type",
    "route_residual_filters", "scan_partition_pruned", "tpch_q1", "tpch_q3",
    "tpch_q5", "tpch_q10", "tpch_q9", "tpch_q13", "tpch_q21",
    "join_shuffle_fact", "join_broadcast_dim", "ext_window_topk_per_group",
    "ext_asof_join", "ext_moving_avg", "ext_rollup", "sessionize",
    "ext_cdc_compact", "ext_merge_upsert", "ext_funnel", "dedup_minhash",
    "dedup_ngram_jaccard", "dedup_ngram_blocked", "dedup_clusters",
    "dedup_substrings", "pipeline_curate_pack", "ann_brute_topk",
    "ann_ivf_topk", "text_quality", "text_gopher_rules", "ext_pack_sequences",
]

con = duckdb.connect()
con.execute("SET threads TO 32")
try:
    con.execute("SET max_temp_directory_size='10GiB'")
    con.execute("SET memory_limit='24GiB'")
except Exception:
    pass


class OracleTimeout(Exception):
    pass


def run_timed(sql):
    if not TIMEOUT_S:
        return con.execute(sql).fetchall()
    for attempt in (1, 2):
        fired = threading.Event()

        def _interrupt():
            fired.set()
            con.interrupt()

        timer = threading.Timer(TIMEOUT_S, _interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchall()
        except INTERRUPT_EXC:
            if fired.is_set():
                raise OracleTimeout()
            continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                if fired.is_set():
                    raise OracleTimeout()
                continue
            raise
        finally:
            timer.cancel()
    raise OracleTimeout()

for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
times = {}
for name in HEADLINE:
    sql = oracle.get(name)
    if sql is None:
        times[name] = None
        continue
    try:
        run_timed(sql)  # untimed warmup
        best = None
        for _ in range(passes):
            t0 = time.time()
            run_timed(sql)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
    except OracleTimeout:
        times[name] = "timeout"
        print(f"{name:28s} TIMEOUT(>{TIMEOUT_S}s)", file=sys.stderr)
        continue
    except Exception as e:
        times[name] = "error"
        print(f"{name:28s} ERROR {str(e)[:80]}", file=sys.stderr)
        continue
    times[name] = round(best, 3)
    print(f"{name:28s} {best:.3f}", file=sys.stderr)

total = sum(v for v in times.values() if isinstance(v, (int, float)))
print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                  "unit": "sec", "queries": times, "sf": sfdir}))

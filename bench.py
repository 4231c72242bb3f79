"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line to stdout:
  {"metric": "...", "value": N, "unit": "sec", "sf": ..., "queries": {...}, ...}

Round-2 postmortem: inlining the full 106-query timing dict made the
line so long that the harness capture clipped its head and recorded
"parsed": null. The stdout line now carries only a bounded top-slowest
slice of the per-query map plus methodology fields; the FULL per-query
map is written to bench_details.json next to this script (and echoed to
stderr), so the machine line stays well under any capture window while
humans still get every number.

The per-query time is wall-clock for plan + execute + collect (the
driver-visible latency), min-of-2 runs after a warm-up pass (JVM +
parquet footer caches warm, as a long-lived cluster would be) —
methodology is recorded in the JSON (runs/policy) so cross-round
comparisons use the same harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # Admissibility gate (r6 postmortem: a +8% total drift at start
    # loadavg 5.03 was unattributable — noise and regression were
    # indistinguishable). Wait for the machine to go quiet before
    # timing; if it never does within the cap, run anyway but FLAG the
    # result so a cross-round comparison knows this number is
    # inadmissible evidence rather than silently noisy.
    gate = float(os.environ.get("SPARK_GRAFT_LOADAVG_GATE", "2.0"))
    wait_cap = float(os.environ.get("SPARK_GRAFT_LOADAVG_WAIT_S", "240"))
    waited = 0.0
    while os.getloadavg()[0] > gate and waited < wait_cap:
        time.sleep(10)
        waited += 10
    load_start = os.getloadavg()  # recorded so a throttled/shared-VM run is visible
    gate_status = "quiet" if load_start[0] <= gate else "exceeded"
    if gate_status == "exceeded":
        print(
            f"loadavg gate: start load {load_start[0]:.2f} > {gate} after "
            f"waiting {waited:.0f}s — timings flagged inadmissible",
            file=sys.stderr,
        )

    from delta_lake_platform_spark.session import get_spark
    import delta_lake_platform_spark.queries.all  # noqa: F401
    from delta_lake_platform_spark.queries.registry import QUERIES

    spark = get_spark("dlp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM JIT + parquet footers, plus one Arrow-batched
    # pandas_udf round-trip so the Python worker pool exists before the
    # first UDF-bearing query is timed (workers are reused afterwards —
    # the long-lived-cluster steady state the bench models). Never let
    # warm-up kill the run.
    try:
        QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _warm(v):
            return v * 1.0

        spark.range(10_000).select(
            _warm(F.col("id").cast("double"))
        ).collect()

        # Compile the heavy codegen shapes once on toy inputs (shingle
        # arrays, minhash signatures, zip_with cosine, window top-k,
        # IVF/PQ pandas paths): the first query of each shape otherwise
        # pays multi-second JIT that a steady-state cluster never sees.
        from delta_lake_platform_spark.operators import dedup, similarity

        docs = spark.createDataFrame(
            [(i, f"warm up shingle text number {i} for codegen") for i in range(40)],
            "doc_id long, text string",
        )
        dedup.minhash_lsh_pairs(docs).collect()
        emb = (
            spark.range(60)
            .select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[(F.rand(seed=7) * 2 - 1).cast("float") for _ in range(64)]
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
        wq = emb.filter(F.col("vec_id") < 3)
        similarity.cosine_topk_bruteforce(wq, emb, k=3).collect()
        similarity.ivf_topk(wq, emb, k=3, nprobe=2).collect()
        similarity.pq_topk(wq, emb, k=3, rerank_factor=2).collect()

        # Versioned-table shapes: a toy SCD surrogate flow + DV delete +
        # change-feed + MV refresh compile the commit/merge/window/ids
        # codegen once, like the long-lived cluster the bench models.
        import shutil
        import tempfile
        from datetime import datetime

        from delta_lake_platform_spark.scd import ScdConfig, apply_scd
        from delta_lake_platform_spark.scd.engine import create_scd_target
        from delta_lake_platform_spark.sources.managed_table import (
            ManagedTable,
        )
        from delta_lake_platform_spark.sources.materialized_view import (
            MaterializedAggView,
        )

        wd = tempfile.mkdtemp(prefix="bench_warm_")
        try:
            cfg = ScdConfig(
                pk_cols=["id"],
                scd_cols=["seg"],
                surrogate_col="sk",
                surrogate_start=10,
                clock=lambda: datetime(2026, 1, 1),
            )
            d1 = spark.range(40).selectExpr("id", "'a' as seg")
            wt = ManagedTable(spark, f"{wd}/dim")
            create_scd_target(wt, d1, cfg)
            apply_scd(d1, wt, cfg)
            apply_scd(
                spark.range(0, 40, 3).selectExpr("id", "'b' as seg"), wt, cfg
            )
            base = ManagedTable(spark, f"{wd}/base")
            base.create(
                spark.range(200).selectExpr("id", "id % 3 as k", "id * 2 as v")
            )
            wmv = MaterializedAggView(
                base, f"{wd}/mv", group_cols=["k"], sum_cols=["v"]
            )
            wmv.create()
            base.delete("id % 17 = 0", rewrite=False)
            base.append(spark.range(300, 320).selectExpr(
                "id", "id % 3 as k", "id * 2 as v"
            ))
            wmv.refresh()
            wmv.state.read().collect()

            from delta_lake_platform_spark.sources.materialized_view import (
                MaterializedJoinAggView,
            )

            dim = ManagedTable(spark, f"{wd}/dim2")
            dim.create(
                spark.range(40).selectExpr("id % 8 as k", "'s' || id as seg")
                .dropDuplicates(["k"])
            )
            wjv = MaterializedJoinAggView(
                base, dim, f"{wd}/jmv",
                on=["k"], group_cols=["seg"], sum_cols=["v"],
            )
            wjv.create()
            base.delete("id % 23 = 0", rewrite=False)
            dim.update({"seg": "'m'"}, "k = 1")
            wjv.refresh()
            wjv.state.read().collect()
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc}", file=sys.stderr)

    # Per-query fault isolation: one broken query must not cost the
    # timings of the other 99 (round-1 postmortem: a loader bug on the
    # first alphabetical query left the whole round with no bench number).
    # Each query runs N_RUNS times and the MIN is reported: the host is
    # a shared VM whose transient CPU throttling produced rotating 10x
    # spikes on random queries across otherwise-identical runs; the min
    # measures the query, not the throttling window. Every repetition's
    # time is persisted (per_run) so spread — not just the min — is
    # auditable across rounds.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    per_run: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    # Block hygiene OUTSIDE the timed region (r11): localCheckpoint
    # pins its RDD in executor block storage and DataFrame.unpersist
    # cannot reach it, so 170 queries x 3 reps in one session used to
    # accumulate thousands of dead block sets — storage squeezing
    # execution memory and inflating later queries' times (measured:
    # repeated runs of the same checkpoint-bearing query grew run over
    # run). Freeing between reps restores the isolation a fresh driver
    # per query would have; each rep still computes from the parquet
    # inputs (nothing result-shaped survives — this deletes state
    # rather than carrying it).
    from delta_lake_platform_spark.blocks import free_persisted_rdds

    import gc

    for name, fn in sorted(QUERIES.items()):
        # Python gc releases py4j references, which lets the JVM
        # ContextCleaner reap dead broadcasts/RDDs from hundreds of
        # prior plans — also outside the timed region.
        gc.collect()
        reps: list[float] = []
        for _ in range(n_runs):
            free_persisted_rdds(spark)
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
                reps.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"query {name} failed: {errors[name]}", file=sys.stderr)
                break
        if reps:
            times[name] = min(reps)
            per_run[name] = reps
            errors.pop(name, None)

    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Cross-round comparison protocol (BASELINE.md "Absolute local
    # anchor"): totals grow with every new registry row, so the
    # comparable number is the COMMON-query ratio against the round-10
    # idle-machine anchor (bench_history.jsonl ts 1786886717). >1.3x on
    # a quiet run is a regression to investigate, not noise.
    ANCHOR_TS = 1786886717
    common_ratio = None
    common_n = 0
    try:
        anchor_q = None
        hist_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"
        )
        with open(hist_path) as fh:
            for line in fh:
                rec = json.loads(line)
                if int(rec.get("ts", 0)) == ANCHOR_TS:
                    anchor_q = rec.get("queries") or {}
                    break
        if anchor_q:
            common = sorted(set(times) & set(anchor_q))
            a = sum(anchor_q[q] for q in common)
            b = sum(times[q] for q in common)
            common_n = len(common)
            if a > 0:
                common_ratio = round(b / a, 3)
                if common_ratio > 1.3 and gate_status == "quiet":
                    print(
                        f"REGRESSION FLAG: common-{common_n} ratio "
                        f"{common_ratio} vs anchor {ANCHOR_TS} exceeds "
                        "1.3x on a quiet run",
                        file=sys.stderr,
                    )
    except (OSError, ValueError) as exc:  # noqa: BLE001
        print(f"anchor comparison unavailable: {exc}", file=sys.stderr)
    loadavg = [round(x, 2) for x in (*load_start[:1], *os.getloadavg()[:1])]
    details = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "runs": n_runs,
        "policy": "min",
        "loadavg_start_end": loadavg,
        "loadavg_gate": gate_status,
        "gate_waited_s": waited,
        "n_queries": len(times),
        "common_ratio_vs_anchor": common_ratio,
        "common_n": common_n,
        "anchor_ts": ANCHOR_TS,
        "queries": times,
        "per_run": per_run,
    }
    if errors:
        details["errors"] = errors
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
    )
    try:
        with open(details_path, "w") as fh:
            json.dump(details, fh, indent=1, sort_keys=True)
    except OSError as exc:  # noqa: BLE001
        print(f"could not write {details_path}: {exc}", file=sys.stderr)
    print(f"full per-query timings: {details_path}", file=sys.stderr)
    # Cross-round archive (r4 postmortem: r3's details were overwritten,
    # so per-query diffs between rounds had to come from the judge's
    # records). One JSON line per run, appended.
    try:
        hist_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"
        )
        with open(hist_path, "a") as fh:
            fh.write(json.dumps({"ts": time.time(), **details}) + "\n")
    except OSError:
        pass

    # Keep the machine line compact: only the slowest queries inline.
    slowest = dict(
        sorted(times.items(), key=lambda kv: -kv[1])[:10]
    )
    out = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "runs": n_runs,
        "policy": "min",
        "loadavg_start_end": loadavg,
        "loadavg_gate": gate_status,
        "n_queries": len(times),
        "n_errors": len(errors),
        "common_ratio_vs_anchor": common_ratio,
        "common_n": common_n,
        "anchor_ts": ANCHOR_TS,
        "queries": slowest,
        "details": "bench_details.json",
    }
    print(json.dumps(out))
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()

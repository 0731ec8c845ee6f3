"""Physical-plan audit for the headline queries.

For every query in bench.py's HEADLINE set, prints a one-line summary of the
plan properties that matter at 100 TB:

- scan columns (ReadSchema) — is column pruning reaching the parquet scan?
- PushedFilters — are predicates reaching the scan?
- number of exchanges (shuffles) — is anything shuffling that shouldn't?
- Arrow crossings (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
  — Python only where per-key kernels or codecs require it.
(WholeStageCodegen spans and exchange reuse only materialize at runtime
under AQE; this audit covers the static plan shape.)

Usage: PYTHONPATH=/root/repo python tools/explain_audit.py [--full q1,q2]
(--full prints the entire formatted plan for the named queries).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--full", default="", help="comma-separated query names")
    args = ap.parse_args()

    from bench import HEADLINE

    import __spark_entry__ as entry_mod
    from streamchange_spark.session import get_spark

    spark = get_spark("explain_audit", shuffle_partitions=8)
    queries = entry_mod.queries()
    full = set(filter(None, args.full.split(",")))

    for name in HEADLINE:
        df = queries[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        # NB: under AQE the pre-execution plan shows isFinalPlan=false and
        # carries no WholeStageCodegen/ReusedExchange markers — those only
        # materialize at runtime, so this audit reports the static plan
        # shape (shuffles, pruning, pushdown, Python stages).
        n_reuse = len(re.findall(r"ReusedExchange", plan))
        n_python = len(
            re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        )
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        scan_cols = sorted({c.split(":")[0] for s in schemas for c in s.split(",") if c})
        print(
            f"{name}: shuffles={n_exchange} reused={n_reuse} "
            f"python_stages={n_python} "
            f"scan_cols={scan_cols} pushed={[p for p in pushed if p]}"
        )
        if name in full:
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()

"""Dump ``explain("formatted")`` for every benched query into plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir-suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt where <tag-dir-suffix> is e.g.
``r14 before`` → plans/r14/q01_pricing_summary_before.txt. With no query
list, dumps the full HEADLINE + EXTENDED bench set. Mostly explain-only:
no query's FULL plan is executed, but BUILDING some is not free — the
q106_ann_lane builder runs a sizing count() for its adaptive band width,
and q75/q76/q132's dimension-size probe can fall back to a full documents
count() on non-parquet layouts — so dumping plans can trigger small real
jobs (r14 ADVICE).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from nsq2kinesis_spark.registry import all_queries  # noqa: E402
from nsq2kinesis_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [n for n in bench.HEADLINE + bench.EXTENDED]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    queries = all_queries()
    for name in names:
        if name == "shared_shingle_postings":
            from nsq2kinesis_spark.operators.llm_dedup import shared_postings

            df = shared_postings(spark, sf_dir)
        elif name == "q106_ann_lane":
            from nsq2kinesis_spark.operators.similarity import ann_user_similarity

            df = ann_user_similarity(spark, sf_dir)
        else:
            df = queries[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Driver-protocol A/B harness for the shingle-dedup family (round 15).

VERDICT r14 item 1: the driver's cold-JVM bench measured q75 −22% and
shared_shingle_postings −14% after round 14, while the builder's
same-session CPU-instrumented A/B had measured the same change (the
llm_dedup sizes persist) as a WIN. Both instruments cannot be right for
the driver's protocol, and the driver is ground truth — so this harness
replicates that protocol exactly for the family, in a FRESH JVM per
variant:

- same run() semantics as bench.py (postings: memoized df.persist()+
  count(); q75/q76: noop sink),
- same warmup-pass-then-three-timed-passes with min-of-3,
- same clearCache discipline (before every timed query EXCEPT the two
  declared postings readers),
- the parallel spark anchor timed in the same session for normalization.

One invocation = one variant in one fresh JVM, printing one JSON line.
The wrapper loop (run from the shell) interleaves variants across several
JVMs so box drift hits all variants equally.

Usage:
    python tools/ab_dedup.py <variant> [extra_query ...]
variants:
    cur   — shipped state (ENRICH_PERSIST_LEVEL = MEMORY_AND_DISK_DESER,
            what bare .persist() meant in round 14)
    off   — persists disabled (the r13 state of q75/q76)
    disk  — persists at DISK_ONLY (VERDICT item 1's suggested variant b)
    confoff — shipped persists, but
            spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false
            (isolates the r14 session-conf's effect on the cached postings)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
     AB_EVENTLOG=1 writes an event log to /tmp/spark-events for per-stage
     attribution via tools/profile_query.py's parser.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = ["shared_shingle_postings", "q75_neardup_jaccard", "q76_neardup_minhash_lsh"]
POSTINGS_READERS = {"q75_neardup_jaccard", "q76_neardup_minhash_lsh"}


def main() -> None:
    variant = sys.argv[1]
    names = FAMILY + sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark import StorageLevel

    from nsq2kinesis_spark.operators import llm_dedup
    from nsq2kinesis_spark.session import get_spark

    extra_conf = {}
    if variant == "off":
        llm_dedup.ENRICH_PERSIST_LEVEL = None
    elif variant == "disk":
        llm_dedup.ENRICH_PERSIST_LEVEL = StorageLevel.DISK_ONLY
    elif variant == "confoff":
        extra_conf["spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"] = (
            "false"
        )
    elif variant != "cur":
        raise SystemExit(f"unknown variant {variant!r}")

    if os.environ.get("AB_EVENTLOG"):
        os.makedirs("/tmp/spark-events", exist_ok=True)
        extra_conf.update(
            {
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": "file:///tmp/spark-events",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            }
        )

    spark = get_spark(app_name=f"ab_dedup_{variant}", extra_conf=extra_conf)

    import bench
    from nsq2kinesis_spark.operators.llm_dedup import shared_postings
    from nsq2kinesis_spark.registry import all_queries

    queries = all_queries()

    def run(name: str) -> None:
        if name == "shared_shingle_postings":
            df = shared_postings(spark, sf_dir)
            df.persist()
            df.count()
            return
        queries[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in names:  # warmup (bench methodology)
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        run(name)
    sanchor = bench.spark_anchor_sec(spark)
    out: dict[str, float] = {}
    for rep in range(3):
        for name in names:
            if name not in POSTINGS_READERS:
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"timed{rep}:{name}")
            start = time.perf_counter()
            run(name)
            elapsed = round(time.perf_counter() - start, 3)
            if name not in out or elapsed < out[name]:
                out[name] = elapsed
    app_id = spark.sparkContext.applicationId
    spark.stop()
    print(
        json.dumps(
            {
                "variant": variant,
                "queries": out,
                "total": round(sum(out.values()), 3),
                "spark_anchor_sec": sanchor,
                "app_id": app_id,
            }
        )
    )


if __name__ == "__main__":
    main()

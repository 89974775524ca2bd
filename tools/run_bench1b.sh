#!/bin/bash
# 1B-row hits suite (BASELINE.md's largest published scale point:
# suite-sum 359.5 s, slowest query 67.7 s). Usage: run_bench1b.sh [cpus].
# Needs ~70 GB free in target/ (the table parquet + the CounterID=62
# disk-materialized filtered projection). Forced cold regime: the table
# exceeds any cacheable size, so every timed query scans parquet — a 60 g
# heap leaves RAM for /dev/shm shuffle scratch and the page cache.
# Writes target/BENCH_hits1b.json.
CPUS=${1:-32}
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_HITS_ROWS=1000000000 \
java $OPENS -Xmx${SPARK_DRIVER_MEM:-60g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.BenchHits100

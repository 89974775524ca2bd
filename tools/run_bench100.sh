#!/bin/bash
# 100M-row hits suite (BASELINE.md's committed comparison scale).
# Usage: run_bench100.sh [cpus] [cold]. Needs ~40 GB free in target/ tmp
# + the 100 g heap (box has 125 GB, matching the reference hardware).
# "cold" runs the disk-backed regime: no in-memory cache of the base
# table (every timed query scans parquet) and the CounterID=62 filtered
# projection registered by the storage-regime policy. Writes
# target/BENCH_hits100m.json (cached) / BENCH_hits100m_cold.json (cold).
CPUS=${1:-32}
COLD=${2:-}
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
if [ "$COLD" = "cold" ]; then export SPARK_GRAFT_HITS_COLD=1; fi
SPARK_GRAFT_CPUS=$CPUS \
java $OPENS -Xmx${SPARK_DRIVER_MEM:-100g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.BenchHits100

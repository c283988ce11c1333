#!/bin/bash
# Cold-session full-suite bench: fresh JVM per invocation (§17 protocol).
set -u
OUT="$1"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.ui.retainedJobs=100 -Dspark.ui.retainedStages=100 \
  -Dspark.ui.retainedTasks=1000 -Dspark.sql.ui.retainedExecutions=50 \
  -Dspark.cleaner.periodicGC.interval=1min \
  -cp "$CP" graft.Bench ${BENCH_FILTER:+"$BENCH_FILTER"} > "$OUT" 2> "${OUT%.json}.log"

#!/bin/bash
# Run a graft main class directly (no sbt): $1 = class, rest = args
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CLS="$1"; shift
# Fixed pre-touched heap + capped malloc arenas: runtime heap commit/uncommit
# triggers TLB-shootdown storms on this Firecracker guest (75-90% sys time)
export MALLOC_ARENA_MAX=2
exec java -Xms${SPARK_DRIVER_MEM:-28g} -Xmx${SPARK_DRIVER_MEM:-28g} -XX:+AlwaysPreTouch -XX:+UseG1GC $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*:$(ls /root/.cache/coursier/v1/https/*/*/org/scala-lang/scala-library/2.13.*/scala-library-2.13.*.jar 2>/dev/null | head -1)" \
  "$CLS" "$@"

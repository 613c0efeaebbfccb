#!/bin/bash
# Direct-JVM BenchOne runner — no sbt process alive during measurement.
cd /root/repo
exec java -Xmx100g -XX:+UseG1GC \
  -XX:ReservedCodeCacheSize="${SPARK_GRAFT_CODECACHE:-512m}" \
  --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  -cp "target/scala-2.13/classes:$(ls -d /opt/spark/jars)/*" \
  graft.BenchOne "$@"

#!/usr/bin/env bash
# Rebuild simspark-ext.jar from ext/src using the Scala compiler that
# ships INSIDE the Spark distribution (scala-compiler-*.jar in
# $SPARK_HOME/jars) — no network, no extra installs. Java 17+ required.
set -euo pipefail
cd "$(dirname "$0")"

SPARK_JARS="${SPARK_JARS:-/opt/spark/jars}"
JAR_TOOL="${JAVA_HOME:-/usr}/bin/jar"

rm -rf classes && mkdir -p classes
java -cp "$SPARK_JARS/*" scala.tools.nsc.Main \
  -classpath "$SPARK_JARS/*" -d classes src/SimSparkExtensions.scala
"$JAR_TOOL" cf simspark-ext.jar -C classes .
echo "built $(pwd)/simspark-ext.jar"

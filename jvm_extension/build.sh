#!/bin/sh
# Build json-spark-ext.jar against the installed pyspark's jars.
# Requires only a JDK (javac/jar) — no sbt/maven/scalac: the extension
# is plain Java implementing the Scala function interfaces via
# scala.runtime.AbstractFunction1/2 and java.lang.reflect.Proxy.
set -e
cd "$(dirname "$0")"
SPARK_JARS="${SPARK_JARS:-$(python -c 'import pyspark, os; print(os.path.join(pyspark.__path__[0], "jars"))')}"
OUT="${1:-build}"
mkdir -p "$OUT/classes"
javac -proc:none -encoding UTF-8 -classpath "$SPARK_JARS/*" -d "$OUT/classes" \
    src/jsonsparkext/JsonOperatorRewriter.java \
    src/jsonsparkext/JsonSqlExtension.java
jar cf "$OUT/json-spark-ext.jar" -C "$OUT/classes" jsonsparkext
echo "$OUT/json-spark-ext.jar"

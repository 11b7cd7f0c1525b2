#!/usr/bin/env bash
# Interleaved A/B benchmark driver (r18, VERDICT item 1): runs each
# query in a FRESH JVM (graft.Bench single-query mode — the
# IsolatedBench child protocol) ALTERNATING side A and side B at the
# query level, for N rounds, so host drift hits both sides equally and
# per-query deltas are attributable to code. Adjudication numbers come
# from each child's SPARK_GRAFT_OUT artifact (reps_detail carries raw
# per-rep times; the summarizer takes minima across all rounds).
#
# usage: ab_bench.sh <cpfileA> <cpfileB> <labelA> <labelB> <outdir> \
#                    <rounds> <reps> <sfdir> <query> [query ...]
# cpfileA/B: files containing the java classpath for each side
#            (e.g. from: sbt -batch 'export Runtime/fullClasspath')
set -u
CPA_FILE=$1; CPB_FILE=$2; LA=$3; LB=$4; OUT=$5; ROUNDS=$6; REPS=$7; SF=$8
shift 8
QUERIES=("$@")
CPA=$(cat "$CPA_FILE"); CPB=$(cat "$CPB_FILE")
mkdir -p "$OUT"; OUT=$(cd "$OUT" && pwd)   # absolute: children cd here
JAVA="${JAVA_HOME:-/usr/lib/jvm/default-java}/bin/java"
[ -x "$JAVA" ] || JAVA=$(command -v java)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_child() { # side_label classpath query round
  local lbl=$1 cp=$2 q=$3 r=$4
  local out="$OUT/${lbl}_${q}_round${r}.json"
  rm -f "$out"
  cd "$OUT" || exit 1   # children write BENCH_scratch_* into CWD —
                        # keep that OUT of the repo's round ledger
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_REPS="$REPS" \
  SPARK_GRAFT_OUT="$out" SPARK_GRAFT_ROUND= \
  "$JAVA" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -Xmx8g -XX:ReservedCodeCacheSize=1g \
    -cp "$cp" graft.Bench "$q" >/dev/null 2>&1
  echo "[ab] round=$r side=$lbl q=$q -> $(grep -o "\"$q\":[0-9.]*" "$out" 2>/dev/null | head -1)"
}
for r in $(seq 1 "$ROUNDS"); do
  for q in "${QUERIES[@]}"; do
    run_child "$LA" "$CPA" "$q" "$r"
    run_child "$LB" "$CPB" "$q" "$r"
  done
done
echo "[ab] done -> $OUT"

#!/bin/bash
# Same-day alternating A/B of untouched bench queries between two
# compiled trees (r10 verdict item 1: q01/t02/e01 regressed r9->r10
# with no code change and a 1.24 contention reading — this settles
# binary-vs-box by interleaving the two binaries minute-by-minute).
# Usage: ab_scratch.sh <treeA> <treeB> <queries> <blocks> <reps> <sfdir>
set -u
A=$1; B=$2; Q=$3; BLOCKS=${4:-3}; REPS=${5:-4}; SF=${6:-/root/testdata/sf0.1}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() { # tree tag block
  java $ADD_OPENS -Xmx32g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$1/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Scratch "$SF" "$Q" "$REPS" 2>/dev/null \
    | grep '\[scratch\]' | sed "s/^/[$2 block$3] /"
}
for b in $(seq 1 "$BLOCKS"); do
  run "$A" A "$b"
  run "$B" B "$b"
done

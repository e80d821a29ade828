#!/bin/bash
# Cold-JVM bench canary (see graft.Canary's Scaladoc for the protocol and
# how to read it): launch 3 FRESH JVMs, each running the pinned 15-query
# set once; append the per-query median to the cumulative CANARY.json.
#
#   usage: tools/canary.sh <label>        # e.g. tools/canary.sh r14
#
# Direct `java` (not sbt) so each run is exactly one cold JVM with the
# same module opens / heap the sbt fork uses. Compile first: sbt compile.
set -euo pipefail
cd "$(dirname "$0")/.."
LABEL="${1:?usage: tools/canary.sh <label>}"
CP="target/scala-2.13/classes:$(echo /opt/spark/jars/*.jar | tr ' ' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
RUNS=()
for i in 1 2 3; do
  echo "[canary] cold JVM $i/3..." >&2
  line=$(java $OPENS "-Xmx${SPARK_DRIVER_MEM:-8g}" -Dspark.ui.enabled=false \
    -cp "$CP" graft.Canary 2>/dev/null | grep '"canary"')
  # a failed query would corrupt the drift medians — refuse to append
  if [ "$(echo "$line" | python3 -c 'import json,sys; print(len(json.load(sys.stdin)["failed"]))')" != "0" ]; then
    echo "[canary] run $i had failed queries — aborting without appending:" >&2
    echo "$line" >&2
    exit 1
  fi
  RUNS+=("$line")
done
python3 - "$LABEL" "${RUNS[@]}" <<'EOF'
import json, sys
label = sys.argv[1]
runs = [json.loads(x)["canary"] for x in sys.argv[2:]]
med = {k: round(sorted(r[k] for r in runs)[len(runs)//2], 3)
       for k in runs[0]}
entry = {"label": label, "queries": med,
         "total": round(sum(med.values()), 3), "runs": len(runs)}
try:
    data = json.load(open("CANARY.json"))
except FileNotFoundError:
    data = []
data = [e for e in data if e.get("label") != label] + [entry]
json.dump(data, open("CANARY.json", "w"), indent=1)
print(json.dumps(entry))
EOF

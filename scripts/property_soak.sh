#!/bin/bash
# Wide property-parity soak: run PropertyParitySpec at several seed bases
# with raised iteration counts, and write a committed record
# (PROPERTY_SOAK_r{N}.json) so the "~N configs green" claim is auditable
# from the repo alone (r14 VERDICT "what's wrong" #2).
#
# Usage: scripts/property_soak.sh <out.json> [iters] [base1 base2 ...]
set -u
OUT="${1:?usage: property_soak.sh <out.json> [iters] [bases...]}"
ITERS="${2:-6}"
shift || true; shift || true
BASES=("$@")
if [ ${#BASES[@]} -eq 0 ]; then BASES=(941 1941 555123 7777 31337 424242); fi

# 11 tests per suite run; per iteration each contributes one drawn config
# (family A runs 2 engines per config, family B runs 4 widths per config)
FAMILIES=11
results="["
total=0; failed=0
for base in "${BASES[@]}"; do
  t0=$(date +%s)
  if SPARK_GRAFT_PROP_SEED="$base" SPARK_GRAFT_PROP_ITERS="$ITERS" \
     sbt -batch "testOnly graft.PropertyParitySpec" \
     > "/tmp/prop_soak_${base}.log" 2>&1; then ok=true; else ok=false; failed=$((failed+1)); fi
  t1=$(date +%s)
  n=$((FAMILIES * ITERS))
  total=$((total + n))
  [ "$results" != "[" ] && results+=","
  results+=$'\n'"  {\"seed_base\": $base, \"iters\": $ITERS, \"configs\": $n, \"pass\": $ok, \"wall_sec\": $((t1-t0))}"
  echo "[soak] base=$base pass=$ok wall=$((t1-t0))s"
done
results+=$'\n]'

cat > "$OUT" <<EOF
{
"spec": "graft.PropertyParitySpec",
"families": ["A:window-engines-vs-batch-OVER", "B:fuzzy-join-vs-brute",
             "C:streaming-dedup-parity", "C2:dedup-cap-stress",
             "D:asof-join-vs-brute", "D2:range-join-vs-cross-filter",
             "E:sessionization-vs-batch-def", "F:kmv-vs-replay",
             "F2:cms-vs-replay", "G:sampling-invariance",
             "H:request-pit-http-vs-asof-oracle"],
"iters_per_family": $ITERS,
"total_configs": $total,
"failed_runs": $failed,
"replay": "SPARK_GRAFT_PROP_SEED=<base> SPARK_GRAFT_PROP_ITERS=1 sbt 'testOnly graft.PropertyParitySpec'",
"runs": $results
}
EOF
echo "[soak] wrote $OUT (total_configs=$total failed_runs=$failed)"
[ "$failed" -eq 0 ]

#!/usr/bin/env bash
# Full oracle-parity matrix in one command: the driver fixture plus the
# four adversarial probe corpora (nulls / degenerate / unicode /
# horizon), each through Verify + the strict DuckDB selfcheck, plus the
# hostile-props truth table (the classes the gate corpora must not
# contain). Exit nonzero on the first failing leg. ~12 min on a warm sbt.
set -euo pipefail
cd "$(dirname "$0")/.."

for mode in nulls degenerate unicode horizon; do
  python3 scripts/salted_corpus.py "/tmp/graft-$mode" "$mode"
done
# micros-encoded twins of the two ts-heaviest probe classes: the driver
# fixtures moved to TIMESTAMP(MICROS) in round 8, so the adversarial
# classes must hit that ingest path too (the ns legs keep covering the
# nanos-as-long path and its sub-us boundary salts)
for mode in nulls horizon; do
  python3 scripts/salted_corpus.py "/tmp/graft-$mode-us" "$mode" us
done

run_leg() { # name corpus_dir
  local name="$1" corpus="$2" out="/tmp/graft-verify-$1"
  rm -rf "$out"
  echo "== [$name] Verify + selfcheck over $corpus"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $corpus $out" \
    > "/tmp/graft-verify-$name.log" 2>&1 \
    || { tail -5 "/tmp/graft-verify-$name.log"; exit 1; }
  python3 scripts/selfcheck.py "$out" "$corpus" | tail -1
}

run_leg fixture /root/testdata/sf0.01
run_leg nulls /tmp/graft-nulls
run_leg degenerate /tmp/graft-degenerate
run_leg unicode /tmp/graft-unicode
run_leg horizon /tmp/graft-horizon
run_leg nulls-us /tmp/graft-nulls-us
run_leg horizon-us /tmp/graft-horizon-us

echo "== [props] hostile-props truth table (DuckDB side)"
python3 scripts/props_probe.py | tail -1
echo "== parity matrix green"

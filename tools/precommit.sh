#!/bin/bash
# Pre-commit guard: never commit uncompiled Scala (the round-10 failure
# mode — an end-of-round snapshot with a compile error voided the whole
# round's driver evidence). Install with:
#   ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
# Runs sbt Test/compile (incremental, ~7s warm) only when staged changes
# touch src/ or build.sbt. Any non-zero rc blocks the commit.
set -u
if git diff --cached --name-only | grep -qE '^(src/|build\.sbt)'; then
  echo "[precommit] staged src/ change -> sbt Test/compile" >&2
  if ! sbt -batch Test/compile >/tmp/precommit_sbt.log 2>&1; then
    echo "[precommit] COMPILE FAILED — commit blocked. Tail:" >&2
    tail -15 /tmp/precommit_sbt.log >&2
    exit 1
  fi
  echo "[precommit] compile green" >&2
fi
exit 0

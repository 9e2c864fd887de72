#!/usr/bin/env bash
# Local dry-run of .github/workflows/ci.yml — same steps, same env vars,
# no GitHub runner required (the build sandbox has no Actions executor;
# this is how the workflow logic is verified). Also lints both workflow
# YAMLs. Usage:
#
#   tools/ci_dryrun.sh            # testdata gen + pytest + sf0.001 oracle
#   tools/ci_dryrun.sh --quick    # testdata gen + YAML lint + smoke pytest
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'EOF'
import yaml
for f in (".github/workflows/ci.yml", ".github/workflows/benchmark.yml"):
    d = yaml.safe_load(open(f))
    assert d.get("jobs"), f
    for job in d["jobs"].values():
        assert job.get("runs-on") and job.get("steps"), f
        for s in job["steps"]:
            assert "uses" in s or "run" in s, (f, s)
print("workflow YAML: parse + shape OK")
EOF

TD="$(mktemp -d)/testdata"
python tools/gen_testdata.py "$TD" 0.001 0.01
export SEQUILA_TESTDATA="$TD"
export PYTHONPATH="$PWD"

if [[ "${1:-}" == "--quick" ]]; then
  python -m pytest tests/test_packaging.py tests/test_golden_parity.py -q
  echo "ci_dryrun --quick OK (testdata generated at $TD)"
  exit 0
fi

python -m pytest tests/ -q
python tools/check_oracle.py "$TD/sf0.001"
echo "ci_dryrun OK"

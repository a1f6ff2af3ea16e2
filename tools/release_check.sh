#!/bin/bash
# Full pre-round-end verification: tests, oracle parity at two SFs,
# driver-contract smoke, bench. Run from the repo root.
set -e
echo "== pytest =="
python -m pytest tests/ -x -q
echo "== parity sf0.001 =="
python3 tools/check_parity.py /root/testdata/sf0.001 | tail -1
echo "== parity sf0.01 =="
python3 tools/check_parity.py /root/testdata/sf0.01 | tail -1
echo "== entry smoke =="
python3 - <<'PY'
import warnings, sys; warnings.filterwarnings("ignore")
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, ".")
import __ray_entry__ as e
n = e.entry().count()
assert n > 0, n
qs, sql = e.queries(), e.oracle_sql()
assert set(sql) <= set(qs)
print(f"entry() docs={n}; {len(qs)} queries, {len(sql)} oracles")
ray.shutdown()
PY
echo "== bench =="
python3 bench.py 2>/dev/null
echo "ALL CHECKS PASSED"

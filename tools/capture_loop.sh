#!/bin/bash
# resumable capture loop: one budgeted attempt, then cool-down; stops when
# no tasks remain.  -k 30 matters: plain SIGTERM cannot kill an attempt
# hung on a dead tunnel RPC (NOTES.md).
cd /root/repo
for i in $(seq 1 60); do
  timeout -k 30 650 python tools/tpu_capture.py >> benchmarks/capture_r5.log 2>&1
  n=$(JAX_PLATFORMS=cpu python - <<'PYEOF'
import importlib.util, sys
sys.path.insert(0, "/root/repo")
spec = importlib.util.spec_from_file_location("cap", "/root/repo/tools/tpu_capture.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
print(len(m.pending_tasks(m.load_state())))
PYEOF
)
  echo "[loop] iter $i, pending=$n" >> benchmarks/capture_r5.log
  [ "$n" = "0" ] && break
  sleep 420
done

"""Inference fold-budget sweep: bench.py under PB_S_VMEM_MB /
PB_DCA_VMEM_MB combinations (the raised per-kernel VMEM limit makes
bigger row folds compilable; this measures whether they are faster).
Run as the ONLY TPU client. Results to stdout + /tmp/infsweep.json.
"""
import json
import os
import subprocess
import sys

CONFIGS = [
    ("baseline", {}),
    ("s24", {"PB_S_VMEM_MB": "24"}),
    ("dca24", {"PB_DCA_VMEM_MB": "24"}),
    ("s24_dca24", {"PB_S_VMEM_MB": "24", "PB_DCA_VMEM_MB": "24"}),
    ("s40_dca48", {"PB_S_VMEM_MB": "40", "PB_DCA_VMEM_MB": "48"}),
]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for name, env in CONFIGS:
        e = dict(os.environ, **env)
        p = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                           env=e, capture_output=True, text=True,
                           timeout=3600)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")]
        if line:
            results[name] = json.loads(line[-1])
            print(name, line[-1], flush=True)
        else:
            results[name] = {"error": p.stderr[-400:]}
            print(name, "ERROR", p.stderr[-200:], flush=True)
    with open("/tmp/infsweep.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

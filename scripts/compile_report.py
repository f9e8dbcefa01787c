"""Chip compile-seconds report (VERDICT r04 item 8): aggregate the
compile-time evidence recorded across campaign step logs into one
table — per-step `# compile+first` walls, `# prover init` walls, and
prove cold-vs-warm deltas (compile_est_s in the bench JSON).

Usage: python scripts/compile_report.py [run5 run5c ...]
Prints a markdown table + a JSON summary line.
"""

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def scan(dirs):
    rows = []
    for d in dirs:
        for path in sorted(glob.glob(os.path.join(HERE, f"{d}_steps", "*.log"))):
            step = os.path.basename(path)
            try:
                with open(path, errors="replace") as f:
                    txt = f.read()
            except OSError:
                continue
            row = {"campaign": d, "step": step}
            m = re.findall(r"# compile\+first ([0-9.]+)s", txt)
            if m:
                row["compile_first_s"] = [float(v) for v in m]
            m = re.findall(r"# prover init \(incl\. divisor precompute\) ([0-9.]+)s", txt)
            if m:
                row["prover_init_s"] = float(m[-1])
            m = re.findall(r"# compile ([0-9.]+)s on", txt)
            if m:
                row["bench_compile_s"] = float(m[-1])
            for ln in reversed(txt.splitlines()):
                ln = ln.strip()
                if ln.startswith("{") and '"compile_est_s"' in ln:
                    try:
                        row["compile_est_s"] = json.loads(ln)["compile_est_s"]
                    except (ValueError, KeyError):
                        pass
                    break
            if len(row) > 2:
                rows.append(row)
    return rows


def main():
    dirs = sys.argv[1:] or ["run4c", "run4d", "run5", "run5c"]
    rows = scan(dirs)
    total = 0.0
    print("| campaign | step | prover_init_s | compile_first_s | compile_est_s |")
    print("|---|---|---|---|---|")
    for r in rows:
        cf = r.get("compile_first_s") or ([r["bench_compile_s"]] if "bench_compile_s" in r else [])
        t = sum(cf) + r.get("prover_init_s", 0.0) + r.get("compile_est_s", 0.0)
        total += t
        print(
            f"| {r['campaign']} | {r['step']} | {r.get('prover_init_s','')} "
            f"| {','.join(str(v) for v in cf)} | {r.get('compile_est_s','')} |"
        )
    print()
    print(json.dumps({"campaigns": dirs, "total_compile_ish_s": round(total, 1),
                      "n_steps_with_compiles": len(rows)}))


if __name__ == "__main__":
    main()

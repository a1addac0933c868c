"""Launch the 2-process local-cluster exercise and record MULTIPROC.json.

Spawns two tools/mp_worker.py processes joined through JAX's TCP
coordinator (4 virtual CPU devices each -> one 8-device global mesh).
This is the real `jax.distributed.initialize` path a multi-host pod uses —
the thing VERDICT r2 noted had never actually run (#8).

Usage: python tools/run_multiprocess.py [--port 9911]
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", default="9911")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--out", default=os.path.join(ROOT, "MULTIPROC.json"))
    args = ap.parse_args()

    worker = os.path.join(ROOT, "tools", "mp_worker.py")
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", args.port],
                         cwd=ROOT, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        if p.returncode != 0:
            ok = False
    record = None
    for line in outs[0].splitlines():
        try:
            rec = json.loads(line)
            if isinstance(rec, dict) and "num_processes" in rec:
                record = rec
        except ValueError:
            continue
    if record is None or not ok:
        print("FAILED; worker output follows:")
        for i, o in enumerate(outs):
            print(f"--- worker {i} ---\n{o}")
        sys.exit(1)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()

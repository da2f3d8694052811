"""End-to-end HMM example benchmark (ref ``profiler/hmm.py``): shells out
to examples/hmm.py across model variants and scrapes timing."""

import argparse
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).parent.parent


def main(args):
    for model in args.models.split(","):
        cmd = [
            sys.executable,
            str(ROOT / "examples" / "hmm.py"),
            "--model", model,
            "--num-steps", str(args.num_steps),
            "--time-compilation",
        ]
        out = subprocess.run(cmd, capture_output=True, text=True)
        times = re.findall(r"([\d.]+)\s*s", out.stdout)
        print(f"model={model}: {out.stdout.strip().splitlines()[-1] if out.stdout.strip() else out.stderr.strip()[:200]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="0,1,2")
    p.add_argument("--num-steps", type=int, default=50)
    main(p.parse_args())

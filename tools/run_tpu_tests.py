"""Run the hardware-gated test subset on the real TPU and record the result.

Writes TESTS_TPU.json at the repo root: {"platform", "device", "cmd",
"returncode", "passed", "failed", "tail"} — the recorded on-device green run
(reference pattern: hardware-gated GPU tests, runtests.jl:23).

Usage: python tools/run_tpu_tests.py [extra pytest args]
"""

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    env = dict(os.environ, EXAADMM_TEST_PLATFORM="axon")
    cmd = [sys.executable, "-m", "pytest", "tests/test_tpu_device.py",
           "-q", "--no-header", *sys.argv[1:]]
    proc = subprocess.run(cmd, cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=3600)
    out = proc.stdout + proc.stderr
    tail = "\n".join(out.strip().splitlines()[-12:])
    m = re.search(r"(\d+) passed", out)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", out)
    failed = int(m.group(1)) if m else 0

    import jax  # noqa: PLC0415 — after subprocess so the child owns the TPU
    record = {
        "platform": "axon",
        "device": str(jax.devices()[0]) if proc.returncode == 0 else "",
        "cmd": " ".join(cmd),
        "returncode": proc.returncode,
        "passed": passed,
        "failed": failed,
        "tail": tail,
    }
    with open(os.path.join(ROOT, "TESTS_TPU.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())

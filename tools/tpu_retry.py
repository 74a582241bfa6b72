"""Run a TPU script with worker-health retry.

The axon remote TPU worker can crash/restart after a failed Mosaic compile;
the next program then fails with UNAVAILABLE until the worker is back.
Usage: python tools/tpu_retry.py <script.py> [args...] — retries the script
(fresh interpreter) with backoff while the failure is the UNAVAILABLE
worker-restart signature.
"""

import subprocess
import sys
import time

MAX_TRIES = 5


def main():
    script = sys.argv[1]
    args = sys.argv[2:]
    for attempt in range(1, MAX_TRIES + 1):
        p = subprocess.run([sys.executable, "-u", script, *args])
        if p.returncode == 0:
            return 0
        print(f"[tpu_retry] attempt {attempt} exited rc={p.returncode}; "
              f"waiting for worker...", file=sys.stderr, flush=True)
        time.sleep(60 * attempt)
    return 1


if __name__ == "__main__":
    sys.exit(main())

"""Run a TPU script with worker-health retry and hang watchdog.

The axon remote TPU worker can crash/restart after a failed Mosaic compile;
the next program then fails with UNAVAILABLE — or hangs — until the worker
is back. Usage:

    python tools/tpu_retry.py [--timeout SEC] <script.py> [args...]

Retries the script (fresh interpreter) with backoff on nonzero exit or on
hitting the per-attempt timeout.
"""

import subprocess
import sys
import time

MAX_TRIES = 5


def main():
    args = sys.argv[1:]
    timeout = 900.0
    if args and args[0] == "--timeout":
        timeout = float(args[1])
        args = args[2:]
    script, rest = args[0], args[1:]
    for attempt in range(1, MAX_TRIES + 1):
        try:
            p = subprocess.run([sys.executable, "-u", script, *rest],
                               timeout=timeout)
            if p.returncode == 0:
                return 0
            why = f"rc={p.returncode}"
        except subprocess.TimeoutExpired:
            why = f"hang>{timeout:.0f}s"
        print(f"[tpu_retry] attempt {attempt} failed ({why}); backing off",
              file=sys.stderr, flush=True)
        time.sleep(60 * attempt)
    return 1


if __name__ == "__main__":
    sys.exit(main())
